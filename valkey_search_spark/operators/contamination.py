"""Benchmark decontamination, PII redaction, and repetition filtering —
the standard corpus-hygiene passes of a large-scale training pipeline.

Beyond-reference surface (SURVEY.md §2.10). Every operator is pure JVM
expressions/joins by default; ``repetition_stats`` additionally offers
``engine="arrow"`` — a bit-identical Arrow-batched kernel that beats
the interpreted Catalyst higher-order functions ~2.5-4x when many gram
sizes are requested (see its docstring for the measured profile).

- ``ngram_decontaminate``: flag training documents sharing any word
  n-gram (default 13, the common decontamination window) with a held-out
  benchmark corpus. Scale shape: the BENCHMARK side is the small one —
  its distinct grams broadcast; the training side streams through one
  semi-join, no shuffle of the training grams when the broadcast fits.
- ``redact_pii``: C4-style regex scrubbing (emails, phone numbers,
  IPv4s, SSN-shaped ids) with per-category match counts, all
  ``regexp_replace``/``regexp_count`` inside codegen.
- ``repetition_stats``: Gopher-style within-document repetition ratios
  (duplicate line fraction, duplicate paragraph fraction, top-2-gram
  character fraction) used as quality gates.
- ``exact_substring_dedup``: the Lee et al. / RefinedWeb exact-substring
  pass — cross-document duplicated n-gram windows merge into maximal
  token spans and are cut out (leave-one-copy by default), the span
  granularity between document-level dedup and line-level boilerplate
  removal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.analysis import raw_tokens_column


# ---------------------------------------------------------------------------
def gram_set(df: DataFrame, key: str, text_col: str, n: int,
             out_key: str) -> DataFrame:
    """(``out_key``, ``__gram``) rows, one per n-gram window occurrence
    — the shared gram front end of decontamination, the KMV corpus-
    overlap sketches, and the bench's sketch entries. PUBLIC CONTRACT:
    one row per window position (no dedup on either side — callers
    dedup where their plan gets it free), gram identity is xxhash64 of
    the token slice (array hash, not a joined string), and the scan is
    map-only: no shuffle is introduced here at any corpus size.

    Built on dedup's shared staged-token helper (posexplode over the
    materialized token attribute + per-position slice — see
    ``dedup._gram_rows`` for the expression-plumbing rules). NO dedup
    happens here on either side: the training side must not shuffle
    (the broadcast semi-join is map-side and the per-document
    ``count_distinct`` after it deduplicates the leak-bounded rows for
    free), and the benchmark side's single global ``distinct()`` on the
    gram hash subsumes any per-document dedup.

    The gram identity is ``xxhash64`` of the TOKEN SLICE itself (array
    hash), not of a space-joined string: both sides hash the same way
    so equality semantics are identical (in fact stricter — no join
    ambiguity), and skipping the per-window string build is a measured
    ~13% off the gram stage at sf0.1."""
    from .dedup import _staged_tokens

    # barrier=False: the posexplode window shape references the token
    # array only as a top-level attribute (explode + size + slice), so
    # the array stays staged without a corpus shuffle — which would be
    # re-executed per consuming branch anyway (no exchange reuse under
    # pruned projections)
    staged = _staged_tokens(df, key, text_col, barrier=False)
    toks = F.col("__toks")
    rows = (staged.select("k", "__toks",
                          F.posexplode("__toks").alias("__i", "__t"))
            .where(F.col("__i") <= F.size(toks) - n)
            .select("k", F.xxhash64(
                F.slice(toks, F.col("__i") + 1, n)).alias("__gram")))
    return rows.select(F.col("k").alias(out_key), "__gram")


def ngram_decontaminate(train: DataFrame, benchmark: DataFrame,
                        key: str = "doc_id", text_col: str = "text",
                        benchmark_key: str = "doc_id",
                        benchmark_text_col: str = "text",
                        n: int = 13,
                        broadcast_benchmark: bool = True) -> DataFrame:
    """Flag training docs that share any word ``n``-gram with the
    benchmark corpus (the standard train/test-contamination check).

    Returns the training keys + ``contaminated`` flag + the number of
    distinct leaked grams (``leaked_ngrams``). Grams compare by xxhash64
    of the n-token window's SLICE ARRAY (64-bit collisions are the usual
    accepted false-positive rate). The benchmark gram set is deduplicated and —
    being the small side by construction — broadcast into one semi-join,
    so the training corpus is never shuffled on the gram (the training
    gram rows flow straight from the posexplode into the map-side join
    — no pre-join dedup, because ``count_distinct`` below already
    deduplicates the bounded post-join rows); pass
    ``broadcast_benchmark=False`` for an oversized benchmark to fall
    back to a shuffle equi-join (AQE handles gram skew)."""
    tg = gram_set(train, key, text_col, n, "__tk")
    bg = (gram_set(benchmark, benchmark_key, benchmark_text_col, n, "__bk")
          .select("__gram").distinct())
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    leaks = (tg.join(bg, "__gram")
               .groupBy("__tk")
               .agg(F.count_distinct("__gram").alias("leaked_ngrams")))
    keys = train.select(F.col(key).alias("__tk")).distinct()
    return (keys.join(leaks, "__tk", "left")
                .select(F.col("__tk").alias(key),
                        F.coalesce(F.col("leaked_ngrams"),
                                   F.lit(0)).alias("leaked_ngrams"),
                        (F.coalesce(F.col("leaked_ngrams"), F.lit(0)) > 0
                         ).alias("contaminated")))


def fuzzy_decontaminate(train: DataFrame, benchmark: DataFrame,
                        key: str = "doc_id", text_col: str = "text",
                        benchmark_key: str = "doc_id",
                        benchmark_text_col: str = "text",
                        threshold: float = 0.8,
                        **lsh_kwargs) -> DataFrame:
    """WHOLE-DOCUMENT fuzzy contamination: flag training docs that are
    near-duplicates (shingle Jaccard >= ``threshold``) of any benchmark
    document — the complement of ``ngram_decontaminate``'s exact
    n-gram check, catching reformatted / lightly-paraphrased test
    documents that no 13-gram survives verbatim.

    Returns (key, max_benchmark_jaccard double — 0.0 when clean,
    contaminated bool) with one row per training doc.

    Scale shape: rides ``minhash_lsh_pairs``' ASYMMETRIC incremental
    join with the benchmark as the small "new" side — candidate pairs
    always involve a benchmark doc, so the training corpus is never
    self-joined (no train x train quadratic term) and the benchmark
    bands broadcast while the corpus bands stream map-side. Candidates
    are verified with exact hashed-shingle Jaccard before flagging
    (no banding false positives); exact duplicates are always caught
    (identical signatures collide in every band). ``lsh_kwargs`` pass
    through (num_hashes, bands, shingle_n).
    """
    from .dedup import minhash_lsh_pairs

    # surrogate string keys: the two corpora may reuse key values, and
    # the LSH contract needs global uniqueness. "t:"/"b:" prefixes also
    # classify each pair side for free. A NULL key would make its doc
    # silently unjoinable (reported clean whatever its text) — fail
    # loudly at execution instead, with no extra validation job.
    _ck = F.when(F.col(key).isNull(), F.raise_error(F.lit(
        "fuzzy_decontaminate: null training key — a null-keyed doc "
        "cannot be attributed a verdict"))).otherwise(
        F.concat(F.lit("t:"), F.col(key).cast("string")))
    t = train.select(
        _ck.alias("__ck"),
        F.col(text_col).alias("__ctext"), F.lit(False).alias("__bench"))
    # symmetric guard: a null-keyed BENCHMARK doc would ride the LSH
    # but every pair involving it dies in the side-classification
    # filter — contamination against it silently reported clean
    _bk = F.when(F.col(benchmark_key).isNull(), F.raise_error(F.lit(
        "fuzzy_decontaminate: null benchmark key — contamination "
        "against an unkeyed benchmark doc cannot be attributed"))) \
        .otherwise(F.concat(F.lit("b:"),
                            F.col(benchmark_key).cast("string")))
    b = benchmark.select(
        _bk.alias("__ck"),
        F.col(benchmark_text_col).alias("__ctext"),
        F.lit(True).alias("__bench"))
    pairs = minhash_lsh_pairs(t.unionByName(b), "__ck", "__ctext",
                              threshold=threshold, new_col="__bench",
                              **lsh_kwargs)
    # keep train<->benchmark pairs only (benchmark-benchmark pairs are
    # a byproduct of the asymmetric mode), reorient to the train side
    hit = (pairs.where(F.col("a").startswith("t:")
                       != F.col("b").startswith("t:"))
           .select(F.when(F.col("a").startswith("t:"), F.col("a"))
                   .otherwise(F.col("b")).alias("__ck"),
                   F.col("jaccard"))
           .groupBy("__ck")
           .agg(F.max("jaccard").alias("max_benchmark_jaccard")))
    keys = train.select(
        F.col(key),
        F.concat(F.lit("t:"), F.col(key).cast("string")).alias("__ck"))
    return (keys.join(hit, "__ck", "left")
            .select(key,
                    F.coalesce(F.col("max_benchmark_jaccard"),
                               F.lit(0.0)).alias("max_benchmark_jaccard"),
                    F.col("max_benchmark_jaccard").isNotNull()
                    .alias("contaminated")))


# ---------------------------------------------------------------------------
# PII patterns (RE2-safe: no lookaround). Published/standard shapes:
# emails, international-ish phone numbers, dotted-quad IPv4, SSN-style.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{0,3}[-. (]{0,2}\d{3}[-. )]{0,2}\d{3}[-. ]\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               patterns: dict[str, str] | None = None,
               replacement: str = "[REDACTED]") -> DataFrame:
    """Scrub PII shapes from ``text_col`` (C4-style hygiene pass).

    Adds ``<text_col>_redacted`` plus one ``pii_<kind>_count`` column per
    pattern. All regexp work is JVM-side whole-stage codegen — at 100 TB
    this is a single map-only scan, no shuffle, no Python. The
    replacement is ONE fused alternation pass (``(?:p1)|(?:p2)|...`` —
    one regex scan of each row instead of one chained
    ``regexp_replace`` per pattern); alternatives try in dict order at
    each position, matching the sequential-chain semantics whenever
    patterns don't overlap.

    ``pii_<kind>_count`` counts matches of each pattern in the ORIGINAL
    text. Where two patterns overlap on the same characters (e.g. a
    phone-shaped substring inside a longer digit run) the earlier
    pattern wins the redaction, so per-kind counts can exceed the number
    of substitutions actually performed — counts are exposure signals,
    not a substitution ledger."""
    from .dedup import _parallelize

    pats = patterns or PII_PATTERNS
    # spread an under-partitioned scan (1-file inputs otherwise run the
    # whole regex chain on ONE core); no-op on production inputs
    out = _parallelize(df)
    for kind, pat in pats.items():
        out = out.withColumn(
            f"pii_{kind}_count",
            F.coalesce(F.regexp_count(F.col(text_col), F.lit(pat)),
                       F.lit(0)))
    # fusing renumbers capture groups, which would silently break
    # custom patterns with backreferences (\\1) and replacements using
    # $n — those fall back to the chained per-pattern passes
    import re as _re

    fusable = ("$" not in replacement
               and not any(_re.search(r"\\\d", p)    # numeric backrefs
                           or "(?<" in p              # named groups (fused
                           # duplicates fail to compile) / lookbehind
                           for p in pats.values()))
    if fusable:
        fused = "|".join(f"(?:{p})" for p in pats.values())
        red = F.regexp_replace(F.col(text_col), fused, replacement)
    else:
        red = F.col(text_col)
        for pat in pats.values():
            red = F.regexp_replace(red, pat, replacement)
    return out.withColumn(f"{text_col}_redacted", red)


# ---------------------------------------------------------------------------
def _dup_fraction(parts: Column) -> Column:
    """Fraction of non-empty segments that are duplicates of an earlier
    segment (count - distinct) / count."""
    nonempty = F.filter(parts, lambda x: F.trim(x) != "")
    n = F.size(nonempty)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(nonempty))).cast("double") / n
    ).otherwise(F.lit(0.0))


def cross_doc_line_dedup(df: DataFrame, key: str = "doc_id",
                         text_col: str = "text",
                         min_doc_freq: int = 2,
                         separator: str = "\n") -> DataFrame:
    """Remove boilerplate lines that repeat across documents (the
    CCNet/RefinedWeb repeated-line-removal pass): a line occurring in at
    least ``min_doc_freq`` DISTINCT documents is dropped from all of
    them; blank lines never count as boilerplate. Adds
    ``<text_col>_deduped`` plus ``lines_kept``/``lines_dropped``.

    Scale shape: posexplode the split lines (attribute array after one
    staging projection), aggregate document-frequency per line hash
    (one shuffle; hot boilerplate lines combine map-side), hash-join
    the per-line verdicts back, and reassemble each document with
    sort_array(collect_list(struct(pos, line))) — order restored by
    position, one groupBy shuffle. No window over the whole corpus, no
    driver materialization.

    NO input spread here (r13, fixes the one real r12 regression —
    0.98 -> 1.79 s driver-measured at both core counts): this plan
    consumes the input from THREE branches (frequency agg, verdict
    probe, final reattach join), and plans are trees — a RoundRobin
    spread at entry re-executed once per branch (3 RoundRobin
    exchanges, total Exchange 10 -> 14). The gram-frequency groupBy is
    the very next operation and its exchange parallelizes everything
    downstream; only the split+posexplode map side of an
    under-partitioned local scan runs narrow, which costs less than
    one spread execution, let alone three (r11 ran exactly this shape
    at 0.98 s vs r12's spread 1.79 s)."""
    # F.split takes a Java regex but array_join rejoins literally:
    # \Q...\E-quote the separator so both sides agree on metacharacters
    # ('|', '.', ...) as literal text
    sep_re = "\\Q" + separator.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    from .dedup import _pin

    lines_col = F.split(F.col(text_col), sep_re)
    # _pin: blocks the posexplode's inferred size/isnotnull filter from
    # inlining the split below the projection (dedup._pin docs)
    staged = df.withColumn("__lines", _pin(lines_col))
    exploded = (staged.select(key,
                              F.posexplode("__lines").alias("__p", "__l"))
                .withColumn("__h", F.xxhash64("__l")))
    base = exploded.where(F.trim(F.col("__l")) != "").groupBy("__h")
    if min_doc_freq == 2:
        # >= 2 distinct docs == min(key) != max(key): one (hash)-keyed
        # exchange instead of count_distinct's expand rewrite (which
        # first clusters every (hash, DOC) line row on its own exchange)
        freq = (base.agg((F.min(key) != F.max(key)).alias("__multi"))
                .where("__multi")
                .select("__h", F.lit(True).alias("__boiler")))
    else:
        freq = (base.agg(F.count_distinct(key).alias("__df"))
                .where(F.col("__df") >= min_doc_freq)
                .select("__h", F.lit(True).alias("__boiler")))
    marked = exploded.join(freq, "__h", "left")
    rebuilt = (marked.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(
                    F.col("__boiler").isNull(),
                    F.struct(F.col("__p").alias("p"),
                             F.col("__l").alias("l"))))),
                lambda s: s["l"]),
            separator).alias(f"{text_col}_deduped"),
        F.count_if(F.col("__boiler").isNull()).alias("lines_kept"),
        F.count_if(F.col("__boiler").isNotNull()).alias("lines_dropped")))
    return df.join(rebuilt, key, "left")


def _ngram_col(toks: Column, cnt: Column, n: int) -> Column:
    """Word n-gram strings from a STAGED token attribute (lambdas may
    reference attributes freely — only computed expressions re-evaluate
    per element). n=2 keeps the cheaper zip_with form."""
    if n == 2:
        return F.when(cnt >= 2, F.zip_with(
            F.slice(toks, 1, cnt - 1), F.slice(toks, 2, cnt - 1),
            lambda a, b: F.concat(a, F.lit(" "), b)))
    return F.when(cnt >= n, F.transform(
        F.sequence(F.lit(1), cnt - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " ")))


def _top_cover(grams: Column) -> Column:
    """max over distinct grams of occurrences x char length — one fold
    over the sorted gram array (state: prev gram, run length, best)."""
    return F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
             .alias("run"),
            F.greatest(
                acc["best"],
                (F.when(g == acc["prev"], acc["run"] + 1)
                  .otherwise(F.lit(1))) * F.length(g)).alias("best")),
        lambda acc: acc["best"])


def _dup_cover(grams: Column, count_first: bool) -> Column:
    """Characters inside duplicated grams, via the same sorted-run fold.
    ``count_first`` includes every occurrence of a duplicated gram (the
    n-gram convention); False counts only occurrences AFTER the first
    (the duplicate-line/paragraph convention)."""
    first_add = F.length if count_first else (lambda g: F.lit(0))
    return F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("acc")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
             .alias("run"),
            (acc["acc"] + F.when(
                g == acc["prev"],
                # run hits 2: charge the withheld first occurrence too
                F.when(acc["run"] == 1,
                       F.length(g) + first_add(g))
                 .otherwise(F.length(g)))
             .otherwise(F.lit(0))).alias("acc")),
        lambda acc: acc["acc"])


def _repetition_stats_arrow(df: DataFrame, text_col: str,
                            tokens_col: str | None, top_ns: tuple,
                            dup_ns: tuple) -> DataFrame:
    """Arrow-batched twin of the JVM expression form — bit-identical
    signals (pinned in tests/test_repetition_full.py), ~4x faster on
    measured corpora because Catalyst higher-order functions
    (transform/aggregate lambdas) execute INTERPRETED per element, not
    in whole-stage codegen; nine gram arrays per row pay that tax nine
    times, while one Python dict pass per document amortizes it into a
    single Arrow batch. Same map-only shape: every input column passes
    through the kernel, no shuffle, no driver hop. The JVM form stays
    the default because it rides an existing scan with zero Python
    workers (composability with the rest of the quality-signal
    projection); choose this engine when gopher repetition is the
    dominant cost of a hygiene pass (the bench does)."""
    import re as _re

    import pandas as pd

    from pyspark.sql import types as T

    from ..functions.analysis import lex_query_text

    sig_names = (["dup_line_frac", "dup_para_frac",
                  "dup_line_char_frac", "dup_para_char_frac"]
                 + [f"top_{n}gram_char_frac" for n in top_ns]
                 + [f"dup_{n}gram_char_frac" for n in dup_ns])
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(s, T.DoubleType()) for s in sig_names])
    # re.ASCII: Java-regex `\s` is ASCII-only, so a paragraph break of
    # "\n\xa0\n" is NOT blank-line-joined by the JVM engine and must
    # not be here either
    para_re = _re.compile(r"\n\s*\n", _re.ASCII)
    top_list, dup_list = tuple(top_ns), tuple(dup_ns)
    tok_col = tokens_col

    def _r6(v: float) -> float:
        # twin of F.round(_, 6) on DoubleType: Spark goes through
        # BigDecimal.valueOf(d) (shortest decimal repr) then
        # setScale(6, HALF_UP) — Decimal(repr(v)) is the same repr
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(v)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    def _dup_frac(parts: list[str]) -> float:
        # _dup_fraction twin: Spark trim() strips SPACE chars only
        ne = [p for p in parts if p.strip(" ") != ""]
        return (len(ne) - len(set(ne))) / len(ne) if ne else 0.0

    def _dup_chars(parts: list[str], count_first: bool) -> int:
        counts: dict[str, int] = {}
        for p in parts:
            counts[p] = counts.get(p, 0) + 1
        k = 0 if count_first else 1
        return sum((c - k) * len(g) for g, c in counts.items() if c >= 2)

    def kernel(batches):
        for pdf in batches:
            texts = pdf[text_col]
            toklists = pdf[tok_col] if tok_col is not None else None
            out = {s: [] for s in sig_names}
            for ri in range(len(pdf)):
                text = texts.iloc[ri]
                if text is None or (isinstance(text, float)):
                    for s in sig_names:
                        out[s].append(0.0)
                    continue
                chars = len(text)
                if toklists is not None:
                    tl = toklists.iloc[ri]
                    toks = list(tl) if tl is not None else None
                else:
                    toks = lex_query_text(text)
                lines = text.split("\n")
                paras = para_re.split(text)
                out["dup_line_frac"].append(_dup_frac(lines))
                out["dup_para_frac"].append(_dup_frac(paras))
                for nm, parts in (("dup_line_char_frac", lines),
                                  ("dup_para_char_frac", paras)):
                    v = 0.0
                    if chars > 0:
                        ne = [p for p in parts if p.strip(" ") != ""]
                        v = min(_dup_chars(ne, False) / chars, 1.0)
                    out[nm].append(_r6(v))
                nt = len(toks) if toks is not None else -1
                for n in top_list:
                    v = 0.0
                    if toks is not None and nt >= n and chars > 0:
                        counts: dict[str, int] = {}
                        for i in range(nt - n + 1):
                            g = " ".join(toks[i:i + n])
                            counts[g] = counts.get(g, 0) + 1
                        best = max(c * len(g) for g, c in counts.items())
                        v = best / chars          # uncapped, like frac()
                    out[f"top_{n}gram_char_frac"].append(_r6(v))
                for n in dup_list:
                    v = 0.0
                    if toks is not None and nt >= n and chars > 0:
                        counts = {}
                        for i in range(nt - n + 1):
                            g = " ".join(toks[i:i + n])
                            counts[g] = counts.get(g, 0) + 1
                        tot = sum(c * len(g) for g, c in counts.items()
                                  if c >= 2)
                        v = min(tot / chars, 1.0)
                    out[f"dup_{n}gram_char_frac"].append(_r6(v))
            yield pd.concat(
                [pdf.reset_index(drop=True),
                 pd.DataFrame(out, columns=sig_names)], axis=1)

    return df.mapInPandas(kernel, out_schema)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     tokens_col: str | None = None,
                     top_ns: tuple = (2,),
                     dup_ns: tuple = (),
                     engine: str = "jvm") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. table A1):

    - ``dup_line_frac`` / ``dup_para_frac``: fraction of duplicate lines
      (split on newline) and paragraphs (split on blank line)
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: fraction of
      characters inside duplicate lines/paragraphs (occurrences AFTER
      the first, the published convention for these two)
    - ``top_{n}gram_char_frac`` for each n in ``top_ns``: the Gopher
      top-n-gram rule as a deterministic max-coverage form — the
      highest value of (occurrences x gram length) over all word
      n-grams, as a fraction of the text's characters. (Choosing "the
      most frequent gram" is ambiguous under count ties with
      different-length grams; the max product is total-order-free and
      portable to the SQL oracle.)
    - ``dup_{n}gram_char_frac`` for each n in ``dup_ns``: characters
      inside ALL occurrences of duplicated n-grams (the n-gram
      convention counts the first occurrence too) over total
      characters, capped at 1.0 — overlapping windows double-count by
      construction, exactly like the published weighted form.

    One map-only scan, all array expressions. Two expression-plumbing
    rules keep it fast (measured 40x between them on this operator):
    the tokenizer stages through a NAMED column (CollapseProject keeps a
    non-cheap alias referenced more than once, so the regex runs once
    per row), and gram builders' lambdas touch only their own variables
    and staged ATTRIBUTES — computed expressions captured inside array
    lambdas are re-evaluated per element, never CSE'd.

    ``tokens_col`` names an already-materialized token array (e.g. the
    one a composed analysis pass staged) to skip the second tokenize.
    The defaults produce exactly the historical three-signal output;
    ``gopher_repetition_flags`` composes the full thresholded table.

    ``engine``: "jvm" (default) builds every signal as Catalyst array
    expressions — zero Python workers, composable onto any existing
    scan. "arrow" computes the same signals in one Arrow-batched
    kernel (``_repetition_stats_arrow``): measured ~4x faster when
    many gram sizes are requested, because Catalyst higher-order
    functions evaluate interpreted per element (they are excluded from
    whole-stage codegen), and this operator builds nine gram arrays
    per row. Signals are bit-identical between engines (parity pinned
    in tests/test_repetition_full.py)."""
    from .dedup import _parallelize

    # spread an under-partitioned scan before either kernel: a 1-file
    # input otherwise runs the whole signal computation on ONE task
    # (for engine="arrow" that is ONE Python worker — measured ~2x on
    # the bench's gopher-repetition row); no-op on production inputs
    # and on composed upstreams that already repartitioned
    df = _parallelize(df)
    if engine == "arrow":
        return _repetition_stats_arrow(df, text_col, tokens_col,
                                       top_ns, dup_ns)
    if engine != "jvm":
        raise ValueError(f"unknown engine {engine!r} (jvm | arrow)")
    text = F.col(text_col)
    if tokens_col is None:
        df = df.withColumn("__rt", raw_tokens_column(text))
        toks = F.col("__rt")
    else:
        toks = F.col(tokens_col)
    cnt = F.size(toks)
    chars = F.length(text)

    def frac(val, n, cap=False):
        # the historical top_{n} signal is uncapped (overlapping
        # occurrences can exceed 1.0 — the driver oracle replicates the
        # raw ratio); the dup_{n} weighted form caps at 1.0
        v = val.cast("double") / chars
        if cap:
            v = F.least(v, F.lit(1.0))
        return F.when((cnt >= n) & (chars > 0), v).otherwise(F.lit(0.0))

    lines = F.split(text, "\n")
    paras = F.split(text, "\n\\s*\n")
    cols = {
        "dup_line_frac": _dup_fraction(lines),
        "dup_para_frac": _dup_fraction(paras),
        "dup_line_char_frac": F.round(F.when(
            chars > 0,
            F.least(_dup_cover(F.filter(
                lines, lambda x: F.trim(x) != ""), False)
                .cast("double") / chars, F.lit(1.0))).otherwise(0.0), 6),
        "dup_para_char_frac": F.round(F.when(
            chars > 0,
            F.least(_dup_cover(F.filter(
                paras, lambda x: F.trim(x) != ""), False)
                .cast("double") / chars, F.lit(1.0))).otherwise(0.0), 6),
    }
    for n in top_ns:
        cols[f"top_{n}gram_char_frac"] = F.round(
            frac(_top_cover(_ngram_col(toks, cnt, n)), n), 6)
    for n in dup_ns:
        cols[f"dup_{n}gram_char_frac"] = F.round(
            frac(_dup_cover(_ngram_col(toks, cnt, n), True), n,
                 cap=True), 6)
    return df.withColumns(cols).drop("__rt")


# the MassiveText/Gopher table A1 repetition thresholds (value above ->
# document filtered); public constants from Rae et al. 2021
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30, "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20, "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20, "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15, "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13, "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11, "dup_10gram_char_frac": 0.10,
}


def gopher_repetition_flags(df: DataFrame, text_col: str = "text",
                            tokens_col: str | None = None,
                            thresholds: dict | None = None,
                            engine: str = "jvm") -> DataFrame:
    """The COMPLETE Gopher repetition filter table: every signal from
    ``repetition_stats`` at the published thresholds, one boolean
    ``g_<signal>`` per rule (True = passes) plus the ``rep_pass``
    conjunction — the companion to ``textops.gopher_quality_flags``'
    document-shape rules. ONE map-only pass either way; at 100 TB this
    rides the same scan as every other quality signal. ``engine``
    passes through to ``repetition_stats`` — with all nine gram sizes
    requested this table is the case where "arrow" pays off most
    (measured ~4x; see the engine note there). The threshold flags are
    always JVM expressions on top."""
    th = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown repetition signals: {unknown}")
        th.update(thresholds)
    out = repetition_stats(df, text_col, tokens_col,
                           top_ns=(2, 3, 4), dup_ns=tuple(range(5, 11)),
                           engine=engine)
    flags = {f"g_{sig}": (F.col(sig) <= F.lit(limit))
             for sig, limit in th.items()}
    out = out.withColumns(flags)
    allpass = None
    for name in flags:
        c = F.col(name)
        allpass = c if allpass is None else (allpass & c)
    return out.withColumn("rep_pass", allpass)


# ---------------------------------------------------------------------------
def exact_substring_dedup(df: DataFrame, key: str = "doc_id",
                          text_col: str = "text", n: int = 13,
                          min_doc_freq: int = 2,
                          keep_one: bool = True,
                          tokenizer: str = "whitespace") -> DataFrame:
    """Token-span exact-substring dedup (the Lee et al. 2022 /
    RefinedWeb "exact substring" pass at n-gram granularity): any word
    n-gram shared by at least ``min_doc_freq`` DISTINCT documents marks
    its n-token window as duplicated; overlapping duplicated windows
    merge into maximal spans, and the spans are CUT OUT of the text
    (not the whole document — the complement of document-level dedup
    and of ``cross_doc_line_dedup``'s line granularity). With
    ``keep_one`` (default) the minimum-key holder of each duplicated
    gram keeps its copy, matching the published algorithm's
    leave-one-occurrence behavior; ``keep_one=False`` removes the span
    everywhere (the aggressive boilerplate form).

    Deviation from the suffix-array original (documented): duplication
    is detected at fixed n-gram granularity across documents
    (``min_doc_freq`` distinct docs), not at arbitrary-length substring
    granularity over total occurrences — a within-document repeat alone
    does not trigger removal (``repetition_stats`` covers that signal).
    A duplicated span of length L >= n is still removed in full: every
    window inside it is duplicated, and the windows merge.

    Output: ``<text_col>_deduped`` (kept tokens rejoined with single
    spaces), ``tokens_kept`` / ``tokens_dropped`` / ``spans_dropped``.
    Documents shorter than ``n`` tokens pass through untouched (no
    window). The default ``tokenizer="whitespace"`` splits on
    whitespace runs only — punctuation and case survive inside tokens
    (the Lee et al. implementations operate on raw token streams), so
    the only text change outside removed spans is whitespace-run
    normalization; ``tokenizer="analysis"`` runs the engine's analyzer
    instead (case folding + punctuation stripping — the rebuilt text is
    then the ANALYZED stream, matching how the dedup keys were formed).

    Scale shape (mirrors ``cross_doc_line_dedup``): posexplode the
    staged token array into (doc, pos, gram-hash) windows; aggregate
    gram doc-frequency + min-key holder (ONE shuffle, map-side
    combine); inner-join the duplicated grams back to the window rows
    (hash join on the gram — volume after the df-filter is bounded by
    duplicated-window occurrences); collect duplicated start positions
    per doc (one groupBy shuffle); rebuild each doc map-side by merging
    sorted starts into disjoint intervals with one aggregate fold and
    filtering the token array against them. The interval array is
    materialized as a NAMED column before the filter lambda references
    it (expressions captured inside array lambdas re-evaluate per
    element — the same plumbing rule as ``repetition_stats``). No
    corpus-wide window, no driver materialization; the per-token cost
    of the rebuild is O(merged spans), not O(duplicated windows).

    Gram identity is ``xxhash64`` of the token slice — the same 64-bit
    approximation ``cross_doc_line_dedup`` and ``ngram_decontaminate``
    make (a collision spuriously marks one window at ~2^-64 per gram
    pair; there is no exact-verify pass because the verdict is
    per-window, not per-pair).

    The gram frequency agg's first round keys on (gram, doc) — a hot
    boilerplate gram combines across docs map-side before one reducer
    counts it, the skew posture the whole gram family shares. The
    branching DAG recomputes the window map work per consumer (frequency
    branch, verdict branch, rebuild branch) — pruned projections make
    the subtrees non-identical so exchange reuse cannot merge them;
    that is extra embarrassingly-parallel map passes, never an extra
    shuffle, the same recompute shape as ``cross_doc_line_dedup``."""
    from .dedup import _parallelize, _pin, _staged_tokens

    if tokenizer == "analysis":
        # barrier=False, same rationale as the whitespace arm below: the
        # windows subtree re-executes per consuming branch, so a
        # post-tokenize repartition would be THREE full-corpus shuffles
        staged = _staged_tokens(df, key, text_col, barrier=False)
    elif tokenizer == "whitespace":
        # _parallelize spreads an under-partitioned input; NO further
        # repartition — a post-tokenize shuffle is re-run per consuming
        # branch (pruned projections defeat exchange reuse), which at
        # corpus scale is three full-corpus shuffles for zero benefit
        staged = (_parallelize(df)
                  .select(F.col(key).alias("k"),
                          _pin(F.filter(F.split(F.col(text_col), r"\s+"),
                                        lambda w: w != "")).alias("__toks")))
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r} "
                         "(expected 'whitespace' or 'analysis')")
    toks = F.col("__toks")
    # NOTE (r13, measured): persisting `staged` across the three
    # consuming branches was tried (MEMORY_AND_DISK + release handle)
    # and REVERTED — interleaved A/B won only 2 of 3 pairs (means
    # 1.27 vs 1.33 s, within noise) while pinning a corpus-token-scale
    # cache; with the _pin keeping tokenization single-shot per
    # branch, the recompute stays the right trade (r12 judgment).
    windows = (staged.select("k", "__toks",
                             F.posexplode("__toks").alias("__i", "__t"))
               .where(F.col("__i") <= F.size(toks) - n)
               .select("k", "__i", F.xxhash64(
                   F.slice(toks, F.col("__i") + 1, n)).alias("__gram")))
    if min_doc_freq == 2:
        # the common case only asks WHETHER >= 2 distinct docs hold the
        # gram, which min(k) != max(k) answers in the same single
        # (gram)-keyed exchange as the keeper min — count_distinct
        # would force Spark's expand rewrite, an extra exchange
        # clustering every (gram, DOC) window row first
        dup = (windows.groupBy("__gram")
               .agg(F.min("k").alias("__keeper"),
                    F.max("k").alias("__mx"))
               .where(F.col("__keeper") != F.col("__mx"))
               .select("__gram", "__keeper"))
    else:
        dup = (windows.groupBy("__gram")
               .agg(F.count_distinct("k").alias("__df"),
                    F.min("k").alias("__keeper"))
               .where(F.col("__df") >= min_doc_freq)
               .select("__gram", "__keeper"))
    marked = windows.join(dup, "__gram")
    if keep_one:
        marked = marked.where(F.col("k") != F.col("__keeper"))
    starts = (marked.groupBy("k")
              .agg(F.sort_array(F.collect_set("__i")).alias("__starts")))
    # merge sorted starts into disjoint [a, b) token intervals: a new
    # start within the open interval extends it, otherwise opens a new one
    iv_type = "array<struct<a:int,b:int>>"
    merged = F.aggregate(
        F.col("__starts"),
        F.lit(None).cast(iv_type),
        lambda acc, s: F.when(acc.isNull(), F.array(
            F.struct(s.alias("a"), (s + n).alias("b")))
        ).when(
            s <= F.element_at(acc, -1)["b"],
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.struct(
                F.element_at(acc, -1)["a"].alias("a"),
                F.greatest(F.element_at(acc, -1)["b"], s + n).alias("b"))))
        ).otherwise(F.concat(acc, F.array(
            F.struct(s.alias("a"), (s + n).alias("b"))))))
    rebuilt = (staged.join(starts, "k", "left")
               .withColumn("__iv", merged)
               .select(
                   F.col("k").alias(key),
                   F.when(F.col("__iv").isNull(), toks).otherwise(
                       F.filter(toks, lambda t, i: ~F.exists(
                           F.col("__iv"),
                           lambda iv: (iv["a"] <= i) & (i < iv["b"])))
                   ).alias("__kept"),
                   F.size(toks).alias("__ntok"),
                   F.coalesce(F.size("__iv"), F.lit(0))
                    .alias("spans_dropped"))
               .select(
                   key,
                   F.array_join("__kept", " ").alias(f"{text_col}_deduped"),
                   F.size("__kept").alias("tokens_kept"),
                   (F.col("__ntok") - F.size("__kept"))
                   .alias("tokens_dropped"),
                   "spans_dropped"))
    return df.join(rebuilt, key, "left")
