"""t-digest quantile sketches: DuckDB quantile_cont oracle in the
exact regime, published rank-error bounds in the compressed regime,
merge-vs-rescan equivalence, CDF geometry, and error contracts."""
from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, load
from valkey_search_spark.operators.quantiles import (
    tdigest_cdf, tdigest_merge_arrays, tdigest_merge_frames,
    tdigest_quantile, tdigest_quantiles, tdigest_sketch,
    trim_to_quantiles)

QS = {"p01": 0.01, "p25": 0.25, "p50": 0.5, "p75": 0.75, "p99": 0.99}


def _oracle_global(qs):
    sel = ", ".join(
        f"quantile_cont(n_chars, {q}) AS {name}" for name, q in qs.items())
    return duckdb.sql(
        f"SELECT count(*) AS count, {sel} "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')").df()


def _oracle_by_lang(qs):
    sel = ", ".join(
        f"quantile_cont(n_chars, {q}) AS {name}" for name, q in qs.items())
    return duckdb.sql(
        f"SELECT lang, count(*) AS count, {sel} "
        f"FROM read_parquet('{SF_DIR}/documents.parquet') "
        f"GROUP BY lang ORDER BY lang").df()


# -- exact regime: bit-for-bit percentile_cont ---------------------------

def test_exact_regime_global_matches_duckdb(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # 500 docs < compression=512 -> every centroid a singleton -> exact
    sk = tdigest_sketch(docs, "n_chars", compression=512)
    got = tdigest_quantiles(sk, QS).collect()
    assert len(got) == 1
    want = _oracle_global(QS).iloc[0]
    assert got[0]["count"] == int(want["count"])
    for name in QS:
        assert got[0][name] == pytest.approx(float(want[name]), abs=1e-9)


def test_exact_regime_grouped_matches_duckdb(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # largest lang group is 193 < compression=200
    sk = tdigest_sketch(docs, "n_chars", group_col="lang", compression=200)
    got = {r["lang"]: r
           for r in tdigest_quantiles(sk, QS).collect()}
    want = _oracle_by_lang(QS)
    assert set(got) == set(want["lang"])
    for _, w in want.iterrows():
        g = got[w["lang"]]
        assert g["count"] == int(w["count"])
        for name in QS:
            assert g[name] == pytest.approx(float(w[name]), abs=1e-9)


def test_nulls_and_nans_dropped(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (float("nan"),), (3.0,)], ["v"])
    row = tdigest_quantiles(
        tdigest_sketch(df, "v", compression=64), {"p50": 0.5}).collect()[0]
    assert row["count"] == 3
    assert row["p50"] == pytest.approx(2.0)


def test_sketch_one_row_per_group(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").repartition(8)
    sk = tdigest_sketch(docs, "n_chars", group_col="lang",
                        compression=50).collect()
    langs = [r["lang"] for r in sk]
    assert len(langs) == len(set(langs)) == 5
    for r in sk:
        assert len(r["means"]) == len(r["weights"])
        assert sum(r["weights"]) == pytest.approx(r["count"])
        assert r["means"] == sorted(r["means"])
        assert r["vmin"] <= min(r["means"]) <= max(r["means"]) <= r["vmax"]


# -- compressed regime: rank-error bounds --------------------------------

def _rank_of(values: np.ndarray, x: float) -> float:
    return float(np.searchsorted(np.sort(values), x, side="left")) \
        / values.size


# The oracle regenerates vals through Spark itself (one tiny collect)
# so it sees exactly the sketched population, whatever hash Spark uses.
@pytest.fixture()
def uniform50k(spark):
    n = 50_000
    df = (spark.range(n)
          .withColumn("u", (F.abs(F.hash(F.col("id").cast("string")))
                            % 1_000_003) / 1_000_003.0)
          .withColumn("v", F.exp(F.col("u") * 6.0)))
    vals = np.array([r["v"] for r in df.select("v").collect()])
    return df, vals


def test_compressed_bounds_on_real_population(spark, uniform50k):
    df, vals = uniform50k
    delta = 100
    sk = tdigest_sketch(df, "v", compression=delta).collect()[0]
    assert sk["count"] == vals.size
    # compressed for real: centroid count far below n, near delta scale
    assert len(sk["means"]) < 3 * delta
    # extremes are exact by construction
    assert tdigest_quantile(sk["means"], sk["weights"], sk["count"],
                            sk["vmin"], sk["vmax"], 0.0) \
        == pytest.approx(vals.min())
    assert tdigest_quantile(sk["means"], sk["weights"], sk["count"],
                            sk["vmin"], sk["vmax"], 1.0) \
        == pytest.approx(vals.max())
    for q in (0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999):
        est = tdigest_quantile(sk["means"], sk["weights"], sk["count"],
                               sk["vmin"], sk["vmax"], q)
        err = abs(_rank_of(vals, est) - q)
        assert err <= max(0.015, 8.0 * q * (1 - q) / delta), (q, err)


# -- merge: incremental == rescan ----------------------------------------

def test_merge_frames_exact_regime_equals_rescan(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    merged = tdigest_merge_frames(
        tdigest_sketch(a, "n_chars", group_col="lang", compression=200),
        tdigest_sketch(b, "n_chars", group_col="lang", compression=200),
        group_col="lang")
    whole = tdigest_sketch(docs, "n_chars", group_col="lang",
                           compression=200)
    got = {r["lang"]: r for r in tdigest_quantiles(merged, QS).collect()}
    want = {r["lang"]: r for r in tdigest_quantiles(whole, QS).collect()}
    assert set(got) == set(want)
    for lang, w in want.items():
        g = got[lang]
        assert g["count"] == w["count"]
        for name in QS:
            assert g[name] == pytest.approx(w[name], abs=1e-9)


def test_merge_frames_disjoint_groups_pass_through(spark):
    a = spark.createDataFrame([("x", 1.0), ("x", 2.0)], ["g", "v"])
    b = spark.createDataFrame([("y", 10.0), ("y", 20.0)], ["g", "v"])
    merged = tdigest_merge_frames(
        tdigest_sketch(a, "v", group_col="g", compression=64),
        tdigest_sketch(b, "v", group_col="g", compression=64),
        group_col="g")
    rows = {r["g"]: r for r in
            tdigest_quantiles(merged, {"p50": 0.5}).collect()}
    assert rows["x"]["p50"] == pytest.approx(1.5)
    assert rows["y"]["p50"] == pytest.approx(15.0)


def test_merge_arrays_compressed_still_bounded(spark, uniform50k):
    df, vals = uniform50k
    delta = 100
    half = vals.size // 2
    a = tdigest_sketch(df.where(F.col("id") < half), "v",
                       compression=delta).collect()[0]
    b = tdigest_sketch(df.where(F.col("id") >= half), "v",
                       compression=delta).collect()[0]
    m, w, count, vmin, vmax = tdigest_merge_arrays(
        [a.asDict(), b.asDict()], delta)
    assert count == vals.size
    assert vmin == pytest.approx(vals.min())
    assert vmax == pytest.approx(vals.max())
    for q in (0.01, 0.5, 0.99):
        est = tdigest_quantile(m, w, count, vmin, vmax, q)
        # one extra merge round can at most double the rank error
        assert abs(_rank_of(vals, est) - q) \
            <= max(0.03, 16.0 * q * (1 - q) / delta)


# -- CDF geometry ---------------------------------------------------------

def test_cdf_exact_regime_and_inverse(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    sk = tdigest_sketch(docs, "n_chars", compression=512).collect()[0]
    vals = np.array([r["n_chars"] for r in
                     docs.select("n_chars").collect()], dtype=float)
    svals = np.sort(vals)
    for x in (float(svals[10]), float(svals[250]), float(svals[490])):
        got = tdigest_cdf(sk["means"], sk["weights"], sk["count"],
                          sk["vmin"], sk["vmax"], x)
        want = float(np.searchsorted(svals, x, side="right")) / svals.size
        assert got == pytest.approx(want, abs=1e-9)
    assert tdigest_cdf(sk["means"], sk["weights"], sk["count"],
                       sk["vmin"], sk["vmax"], sk["vmin"] - 1) == 0.0
    assert tdigest_cdf(sk["means"], sk["weights"], sk["count"],
                       sk["vmin"], sk["vmax"], sk["vmax"]) == 1.0
    # cdf(quantile(q)) ~= q in the exact regime
    for q in (0.1, 0.5, 0.9):
        est = tdigest_quantile(sk["means"], sk["weights"], sk["count"],
                               sk["vmin"], sk["vmax"], q)
        assert tdigest_cdf(sk["means"], sk["weights"], sk["count"],
                           sk["vmin"], sk["vmax"], est) \
            == pytest.approx(q, abs=2.0 / sk["count"])


def test_cdf_monotone_compressed(spark, uniform50k):
    df, vals = uniform50k
    sk = tdigest_sketch(df, "v", compression=100).collect()[0]
    xs = np.linspace(sk["vmin"], sk["vmax"], 101)
    cs = [tdigest_cdf(sk["means"], sk["weights"], sk["count"],
                      sk["vmin"], sk["vmax"], float(x)) for x in xs]
    assert all(b >= a - 1e-12 for a, b in zip(cs, cs[1:]))
    assert cs[0] >= 0.0 and cs[-1] == 1.0


# -- error contracts ------------------------------------------------------

def test_error_contracts(spark):
    df = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(ValueError, match="compression"):
        tdigest_sketch(df, "v", compression=10)
    sk64 = tdigest_sketch(df, "v", compression=64)
    sk65 = tdigest_sketch(df, "v", compression=65)
    with pytest.raises(ValueError, match="different compressions"):
        tdigest_merge_frames(sk64, sk65).collect()
    with pytest.raises(ValueError, match="outside"):
        tdigest_quantiles(sk64, {"bad": 1.5})
    with pytest.raises(ValueError, match="quantile must be"):
        tdigest_quantile([1.0], [1.0], 1, 1.0, 1.0, -0.1)
    with pytest.raises(ValueError, match="empty"):
        tdigest_quantile([], [], 0, 0.0, 0.0, 0.5)
    with pytest.raises(ValueError, match="empty"):
        tdigest_cdf([], [], 0, 0.0, 0.0, 0.5)


def test_empty_group_emits_no_row(spark):
    df = spark.createDataFrame(
        [("x", None), ("y", 2.0)], "g string, v double")
    rows = tdigest_sketch(df, "v", group_col="g",
                          compression=64).collect()
    assert [r["g"] for r in rows] == ["y"]


# -- trim_to_quantiles ------------------------------------------------------

def _duck_trim_ids(lo, hi, by_lang):
    if by_lang:
        return {r[0] for r in duckdb.sql(f"""
            WITH b AS (
              SELECT lang, quantile_cont(n_chars, {lo}) lo,
                     quantile_cont(n_chars, {hi}) hi
              FROM read_parquet('{SF_DIR}/documents.parquet') GROUP BY lang)
            SELECT d.doc_id
            FROM read_parquet('{SF_DIR}/documents.parquet') d JOIN b USING (lang)
            WHERE d.n_chars BETWEEN b.lo AND b.hi""").fetchall()}
    return {r[0] for r in duckdb.sql(f"""
        WITH b AS (
          SELECT quantile_cont(n_chars, {lo}) lo,
                 quantile_cont(n_chars, {hi}) hi
          FROM read_parquet('{SF_DIR}/documents.parquet'))
        SELECT d.doc_id
        FROM read_parquet('{SF_DIR}/documents.parquet') d, b
        WHERE d.n_chars BETWEEN b.lo AND b.hi""").fetchall()}


def test_trim_grouped_exact_regime_matches_duckdb(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = {r["doc_id"] for r in
           trim_to_quantiles(docs, "n_chars", lo=0.05, hi=0.95,
                             group_col="lang", compression=200)
           .select("doc_id").collect()}
    assert got == _duck_trim_ids(0.05, 0.95, by_lang=True)
    assert 0 < len(got) < docs.count()


def test_trim_global_exact_regime_matches_duckdb(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = {r["doc_id"] for r in
           trim_to_quantiles(docs, "n_chars", lo=0.01, hi=0.99,
                             compression=512).select("doc_id").collect()}
    assert got == _duck_trim_ids(0.01, 0.99, by_lang=False)


def test_trim_against_reference_sketch(spark, sf_dir):
    # cut a NEW shard at the OLD corpus's percentiles: bounds come from
    # the persisted sketch, not from the trimmed frame
    docs = load(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    sk = tdigest_sketch(old, "n_chars", group_col="lang",
                        compression=200)
    new = docs.where(F.col("doc_id") % 2 == 1)
    got = {r["doc_id"] for r in
           trim_to_quantiles(new, "n_chars", lo=0.25, hi=0.75,
                             group_col="lang", sketch_df=sk)
           .select("doc_id").collect()}
    bounds = {r["lang"]: (r["lo"], r["hi"]) for r in tdigest_quantiles(
        sk, {"lo": 0.25, "hi": 0.75}).collect()}
    want = {r["doc_id"] for r in new.collect()
            if bounds[r["lang"]][0] <= r["n_chars"]
            <= bounds[r["lang"]][1]}
    assert got == want
    assert 0 < len(got) < new.count()


def test_trim_drops_null_values_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0), (4, 30.0)], "i int, v double")
    got = {r["i"] for r in
           trim_to_quantiles(df, "v", lo=0.0, hi=1.0,
                             compression=64).collect()}
    assert got == {1, 3, 4}
    with pytest.raises(ValueError, match="lo <= hi"):
        trim_to_quantiles(df, "v", lo=0.9, hi=0.1)


# -- streaming composition: running digest via foreachBatch ----------------

def test_streaming_running_digest_equals_rescan(spark, sf_dir, tmp_path):
    """Maintain a per-lang corpus digest from a document stream (one
    tdigest_sketch per micro-batch, folded into the persisted digest
    with tdigest_merge_frames) — the incremental-profile loop. In the
    exact regime the maintained digest's quantiles equal a full rescan
    bit-for-bit, so the fold loses nothing batch-over-batch."""
    import os
    docs = load(spark, sf_dir, "documents")
    src = tmp_path / "src"
    os.makedirs(str(src))
    state_dir = str(tmp_path / "digest")

    def fold(batch_df, batch_id):
        sk = tdigest_sketch(batch_df, "n_chars", group_col="lang",
                            compression=200)
        if os.path.exists(state_dir):
            prev = spark.read.parquet(state_dir)
            sk = tdigest_merge_frames(prev, sk, group_col="lang")
        # write-then-swap not needed in-test; land to a sibling and move
        tmp_out = state_dir + ".next"
        sk.write.mode("overwrite").parquet(tmp_out)
        import shutil
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp_out, state_dir)

    # two micro-batches: evens then odds
    docs.where(F.col("doc_id") % 2 == 0).write.mode("append") \
        .parquet(str(src))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    docs.where(F.col("doc_id") % 2 == 1).write.mode("append") \
        .parquet(str(src))
    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    maintained = spark.read.parquet(state_dir)
    got = {r["lang"]: r for r in tdigest_quantiles(maintained, QS).collect()}
    whole = tdigest_sketch(docs, "n_chars", group_col="lang",
                           compression=200)
    want = {r["lang"]: r for r in tdigest_quantiles(whole, QS).collect()}
    assert set(got) == set(want)
    for lang, w in want.items():
        g = got[lang]
        assert g["count"] == w["count"]
        for name in QS:
            assert g[name] == pytest.approx(w[name], abs=1e-9)


def test_trim_new_group_passes_through_untrimmed(spark):
    # a group present in the shard but absent from the reference sketch
    # (a brand-new language) must pass through, not vanish
    old = spark.createDataFrame(
        [("en", float(v)) for v in range(100)], ["g", "v"])
    sk = tdigest_sketch(old, "v", group_col="g", compression=200)
    new = spark.createDataFrame(
        [("en", 50.0), ("en", 9999.0), ("xx", 123.0), ("xx", 456.0)],
        ["g", "v"])
    got = sorted((r["g"], r["v"]) for r in
                 trim_to_quantiles(new, "v", lo=0.05, hi=0.95,
                                   group_col="g", sketch_df=sk).collect())
    # en trimmed at the reference bounds; xx kept whole
    assert got == [("en", 50.0), ("xx", 123.0), ("xx", 456.0)]


def test_trim_invariant_to_partitioning(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    base = {r["doc_id"] for r in
            trim_to_quantiles(docs, "n_chars", lo=0.05, hi=0.95,
                              group_col="lang", compression=200)
            .select("doc_id").collect()}
    got = {r["doc_id"] for r in
           trim_to_quantiles(docs.repartition(13), "n_chars", lo=0.05,
                             hi=0.95, group_col="lang", compression=200)
           .select("doc_id").collect()}
    # exact regime: the digest (and so the cut) is layout-independent
    assert got == base


def test_tdigest_save_load_stamped(spark, tmp_path):
    """r11 artifact stamping: tdigest_save writes sketch parquet +
    versioned meta BESIDE it; tdigest_load round-trips, accepts the
    legacy bare-parquet layout (checked-in v1 fixture), and fails a
    foreign tag with a versioned error."""
    import json
    import os

    import pytest

    from valkey_search_spark.artifact import ArtifactFormatError
    from valkey_search_spark.operators.quantiles import (
        tdigest_load, tdigest_quantiles, tdigest_save, tdigest_sketch,
    )

    df = spark.createDataFrame([(float(i), "g") for i in range(10)],
                               "v double, lang string")
    sk = tdigest_sketch(df, "v", group_col="lang", compression=64)
    path = str(tmp_path / "td")
    tdigest_save(sk, path)
    meta = json.load(open(os.path.join(path, "_tdigest_meta.json")))
    assert meta["format"] == "tdigest-sketch-v1"
    assert meta["group_cols"] == ["lang"]
    back = tdigest_load(spark, path)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, sk.collect()))
    q = tdigest_quantiles(back, {"p50": 0.5}).collect()[0]
    assert q["p50"] == 4.5
    # legacy bare-parquet layout (the pre-stamp persistence convention)
    legacy = os.path.join(os.path.dirname(__file__), "data",
                          "artifacts_v1", "tdigest")
    lg = tdigest_load(spark, legacy)
    assert lg.collect()[0]["count"] == 12
    # foreign tag fails versioned
    meta["format"] = "tdigest-sketch-v9"
    json.dump(meta, open(os.path.join(path, "_tdigest_meta.json"), "w"))
    with pytest.raises(ArtifactFormatError, match="v9"):
        tdigest_load(spark, path)
