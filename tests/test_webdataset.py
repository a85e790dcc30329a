"""WebDataset tar-shard sink/source: round-trip on real documents,
byte-determinism across re-runs, ragged samples, duplicate-key and
unsafe-key guards, overwrite swap, and manifest accounting — all
verified with stdlib tarfile as the independent reader."""
from __future__ import annotations

import io
import os
import tarfile

import pytest

from pyspark.sql import functions as F

from tests.conftest import load
from valkey_search_spark.sources.webdataset import (
    pivot_samples, read_webdataset, write_webdataset)


@pytest.fixture()
def corpus(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(60)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text",
        F.struct("lang", "source").alias("meta"),
        F.encode(F.substring("text", 1, 16), "utf-8").alias("blob"))


COLS = {"text": "txt", "meta": "json", "blob": "bin"}


def test_roundtrip_and_manifest(spark, corpus, tmp_path):
    path = str(tmp_path / "wds")
    manifest = write_webdataset(corpus, path, "doc_id", COLS, n_shards=4)
    rows = manifest.collect()
    assert {r["shard"] for r in rows} <= set(range(4))
    assert sum(r["samples"] for r in rows) == 60
    # independent read: stdlib tarfile over the emitted files
    seen = {}
    for r in rows:
        fp = os.path.join(path, f"shard-{r['shard']:06d}.tar")
        assert os.path.getsize(fp) == r["bytes"]
        with tarfile.open(fp) as tf:
            for m in tf:
                base, _, ext = m.name.rpartition(".")
                seen.setdefault(base, {})[ext] = tf.extractfile(m).read()
    src = {r["doc_id"]: r for r in corpus.collect()}
    assert seen.keys() == src.keys()
    for k, fields in seen.items():
        assert fields["txt"].decode() == src[k]["text"]
        assert fields["bin"] == bytes(src[k]["blob"])
        import json

        meta = json.loads(fields["json"])
        assert meta["lang"] == src[k]["meta"]["lang"]
    # spark-side reader agrees with the independent one
    long_df = read_webdataset(spark, path)
    assert long_df.count() == 3 * 60
    wide = pivot_samples(long_df, ["txt", "json", "bin"])
    got = {r["key"]: r for r in wide.collect()}
    assert got.keys() == src.keys()
    for k in src:
        assert bytes(got[k]["txt"]).decode() == src[k]["text"]


def test_byte_deterministic_across_runs(corpus, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(corpus, a, "doc_id", COLS, n_shards=3, seed=7)
    # different column order + extra unrelated column: same bytes
    shuffled = corpus.withColumn("junk", F.lit("x")).repartition(13)
    write_webdataset(shuffled, b, "doc_id", COLS, n_shards=3, seed=7)
    for i in range(3):
        fa = os.path.join(a, f"shard-{i:06d}.tar")
        fb = os.path.join(b, f"shard-{i:06d}.tar")
        assert open(fa, "rb").read() == open(fb, "rb").read(), i
    # a different seed redraws membership
    c = str(tmp_path / "c")
    write_webdataset(corpus, c, "doc_id", COLS, n_shards=3, seed=8)
    assert any(
        open(os.path.join(a, f"shard-{i:06d}.tar"), "rb").read()
        != open(os.path.join(c, f"shard-{i:06d}.tar"), "rb").read()
        for i in range(3))


def test_ragged_null_members_and_sps(spark, tmp_path):
    df = spark.createDataFrame(
        [("k1", "hello", bytearray(b"\x00\x01")), ("k2", None, None)],
        "k string, text string, blob binary")
    path = str(tmp_path / "r")
    m = write_webdataset(df, path, "k", {"text": "txt", "blob": "bin"},
                         samples_per_shard=10)
    assert sum(r["samples"] for r in m.collect()) == 2
    long_df = read_webdataset(spark, path)
    by_key = {}
    for r in long_df.collect():
        by_key.setdefault(r["key"], set()).add(r["ext"])
    assert by_key["k1"] == {"txt", "bin"}
    # null members omitted entirely -> k2 contributes no tar members
    assert "k2" not in by_key


def test_guards_and_overwrite(spark, corpus, tmp_path):
    path = str(tmp_path / "g")
    with pytest.raises(ValueError, match="exactly one"):
        write_webdataset(corpus, path, "doc_id", COLS)
    with pytest.raises(ValueError, match="not in frame"):
        write_webdataset(corpus, path, "doc_id", {"nope": "txt"},
                         n_shards=1)
    dup = corpus.limit(1).unionAll(corpus.limit(1))
    with pytest.raises(Exception, match="duplicate sample key"):
        write_webdataset(dup, str(tmp_path / "d"), "doc_id", COLS,
                         n_shards=1)
    bad = spark.createDataFrame([("../etc/x", "t")], "k string, t string")
    with pytest.raises(Exception, match="unsafe sample key"):
        write_webdataset(bad, str(tmp_path / "u"), "k", {"t": "txt"},
                         n_shards=1)
    # mode=error refuses an existing corpus; overwrite swaps atomically
    write_webdataset(corpus, path, "doc_id", COLS, n_shards=2)
    with pytest.raises(ValueError, match="overwrite"):
        write_webdataset(corpus, path, "doc_id", COLS, n_shards=2)
    m = write_webdataset(corpus.limit(10), path, "doc_id", COLS,
                         n_shards=1, mode="overwrite")
    assert sum(r["samples"] for r in m.collect()) == 10
    assert sorted(os.listdir(path)) == ["shard-000000.tar"]
    assert not os.path.exists(path + ".building")
    assert not os.path.exists(path + ".old")


def test_tar_metadata_pinned(spark, tmp_path):
    # loaders cache by byte offset: tar member metadata must be inert
    df = spark.createDataFrame([("k", "v")], "k string, t string")
    path = str(tmp_path / "m")
    write_webdataset(df, path, "k", {"t": "txt"}, n_shards=1)
    with tarfile.open(os.path.join(path, "shard-000000.tar")) as tf:
        m = next(iter(tf))
        assert (m.mtime, m.uid, m.gid, m.uname, m.gname, m.mode) == \
            (0, 0, 0, "", "", 0o644)


def test_multimodal_loop_wds_to_image_features(spark, tmp_path):
    """The multimodal last-mile loop end-to-end: curate image binaries
    in a DataFrame -> write WebDataset shards -> read them back ->
    REAL decode through image_features; channel means must match the
    numpy sources exactly (BMP is lossless)."""
    import numpy as np

    from valkey_search_spark.multimodal.codecs import encode_bmp
    from valkey_search_spark.multimodal.columns import image_features

    rng = np.random.RandomState(3)
    imgs = {f"img{i:03d}": rng.randint(0, 256, (9, 7, 3), dtype=np.uint8)
            for i in range(12)}
    df = spark.createDataFrame(
        [(k, bytearray(encode_bmp(v)), f'{{"h":9,"w":7}}')
         for k, v in imgs.items()],
        "k string, image binary, meta string")
    path = str(tmp_path / "imgs")
    write_webdataset(df, path, "k", {"image": "bmp", "meta": "json"},
                     n_shards=3)
    wide = pivot_samples(read_webdataset(spark, path), ["bmp", "json"])
    feats = image_features(wide.select("key",
                                       F.col("bmp").alias("image")),
                           fake=False)
    got = {r["key"]: r["img_mean"] for r in feats.collect()}
    assert got.keys() == imgs.keys()
    for k, arr in imgs.items():
        want = [float(arr[:, :, c].mean()) for c in range(3)]
        assert got[k] == pytest.approx(want, abs=1e-9), k


def test_foreign_corpus_first_dot_and_per_shard_keys(spark, tmp_path):
    """Foreign-corpus conventions (r9 advice): member names split at
    the FIRST dot of the basename (multi-part extensions like
    '.seg.png' stay whole), and keys unique only WITHIN a shard must
    not merge across shards in pivot_samples' default grouping."""
    d = tmp_path / "foreign"
    d.mkdir()

    def make_tar(name, members):
        with tarfile.open(str(d / name), "w") as tf:
            for mname, data in members:
                info = tarfile.TarInfo(name=mname)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

    # same key '000123' in BOTH shards (per-shard uniqueness only),
    # dotted extension, dotted directory, extension-less member
    make_tar("shard-000000.tar", [
        ("000123.seg.png", b"mask-A"), ("000123.txt", b"text-A"),
        ("v1.2/000999.txt", b"nested"),
    ])
    make_tar("shard-000001.tar", [
        ("000123.seg.png", b"mask-B"), ("000123.txt", b"text-B"),
        ("README", b"no-ext"),
    ])
    long_df = read_webdataset(spark, str(d))
    rows = {(r["shard"], r["key"], r["ext"]): bytes(r["content"])
            for r in long_df.collect()}
    assert rows[("shard-000000.tar", "000123", "seg.png")] == b"mask-A"
    assert rows[("shard-000001.tar", "000123", "seg.png")] == b"mask-B"
    # dotted DIRECTORY stays in the key; split is on the basename
    assert rows[("shard-000000.tar", "v1.2/000999", "txt")] == b"nested"
    assert rows[("shard-000001.tar", "README", "")] == b"no-ext"

    wide = pivot_samples(long_df, ["seg.png", "txt"])
    by = {(r["shard"], r["key"]): r for r in wide.collect()}
    # per-shard grouping: two distinct 000123 samples, nothing merged
    assert bytes(by[("shard-000000.tar", "000123")]["seg.png"]) == b"mask-A"
    assert bytes(by[("shard-000001.tar", "000123")]["seg.png"]) == b"mask-B"
    assert bytes(by[("shard-000000.tar", "000123")]["txt"]) == b"text-A"
    # corpus-global grouping remains available for writer-produced sets
    flat = pivot_samples(long_df, ["txt"], within_shard=False)
    assert "shard" not in flat.columns
    assert flat.where(F.col("key") == "000123").count() == 1


def test_dotted_key_write_guard(spark, tmp_path):
    # a dotted key basename cannot round-trip (readers split at the
    # first dot) — the writer must refuse it, not corrupt grouping
    df = spark.createDataFrame([("img.v2", "t")], "k string, t string")
    with pytest.raises(Exception, match="first dot"):
        write_webdataset(df, str(tmp_path / "dk"), "k", {"t": "txt"},
                         n_shards=1)
    # dotted DIRECTORY part is fine
    ok = spark.createDataFrame([("v1.2/img", "t")], "k string, t string")
    m = write_webdataset(ok, str(tmp_path / "ok"), "k", {"t": "txt"},
                         n_shards=1)
    assert sum(r["samples"] for r in m.collect()) == 1
    back = read_webdataset(spark, str(tmp_path / "ok")).collect()
    assert [(r["key"], r["ext"]) for r in back] == [("v1.2/img", "txt")]
