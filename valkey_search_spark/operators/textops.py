"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — all pure
JVM-side Spark expressions over the same tokenizer the TEXT index path
uses (functions/analysis.py), so one scan serves both search and
curation at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.analysis import DEFAULT_STOPWORDS, raw_tokens_column

# Tiny per-language stopword seed lists for the n-gram/stopword language
# heuristic. English list == the search stopword list; others are the
# highest-frequency function words of each language.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": tuple(sorted(DEFAULT_STOPWORDS)),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "un", "des", "du", "pas"),
    "es": ("el", "la", "los", "las", "es", "una", "un", "y", "de", "no"),
}


def token_count_col(text: Column) -> Column:
    """Whitespace/punctuation token count (BPE-ish regex lexer — the same
    token definition the TEXT index uses)."""
    return F.size(raw_tokens_column(text)).cast("long")


def stopword_ratio_col(text: Column, stopwords=DEFAULT_STOPWORDS) -> Column:
    toks = raw_tokens_column(text)
    stop_arr = F.array(*[F.lit(s) for s in sorted(stopwords)])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0))


def avg_token_len_col(text: Column) -> Column:
    toks = raw_tokens_column(text)
    total = F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Heuristic quality score in [0,1]: rewards presence of function words,
    mid-range token length, and some length; penalizes very short docs.
    Deterministic closed formula so it is oracle-checkable in SQL."""
    n = token_count_col(text).cast("double")
    sw = stopword_ratio_col(text)
    alen = avg_token_len_col(text)
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(sw * 4.0, F.lit(1.0))
    alen_term = F.when((alen >= 3.0) & (alen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_term + sw_term + alen_term) / 3.0, 6)


def lang_id_col(text: Column) -> Column:
    """Stopword-marker language heuristic: the language whose marker-word
    hit-ratio is highest; 'und' (undetermined) when all ratios are ~0."""
    toks = raw_tokens_column(text)
    n = F.size(toks)
    best_lang = F.lit("und")
    best_ratio = F.lit(0.02)  # minimum evidence threshold
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        ratio = F.when(
            n > 0,
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("double") / n,
        ).otherwise(F.lit(0.0))
        improved = ratio > best_ratio
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(improved, ratio).otherwise(best_ratio)
    return best_lang


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 of the case-folded token stream — stable
    under whitespace/punctuation-layout changes, joinable at 100 TB."""
    normalized = F.array_join(raw_tokens_column(text), " ")
    return F.md5(normalized)


def rolling_hash_col(text: Column, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprint: min xxhash64 over token
    n-gram windows. Not SQL-oracle-expressible; rows-only checked.

    PERFORMANCE: pass a cheap column (attribute), not a nested
    expression — the slice inside the transform lambda re-evaluates its
    captured input per element (no CSE inside array lambdas)."""
    toks = raw_tokens_column(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    grams = F.transform(idx, lambda i: F.xxhash64(
        F.array_join(F.slice(toks, i + 1, window), " ")))
    return F.when(n > 0, F.array_min(grams))


# GPT-2's published pre-tokenization pattern (Radford et al. 2019, public
# in the gpt-2 repository) — splits contractions, letter runs, digit runs,
# punctuation runs, and whitespace the way BPE vocabularies expect. RE2
# (Spark's regexp engine) lacks lookahead, so the trailing-space variant
# collapses to plain whitespace handling; counts differ from a true BPE
# only by the (vocabulary-dependent) merge step, making this a stable
# upper-ish estimate of LLM token counts.
_BPE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_piece_count_col(text: Column) -> Column:
    """Estimated LLM token count: number of BPE PRE-tokenizer pieces
    (whitespace runs excluded). For budget/packing decisions in a
    training-data pipeline — true BPE counts need the model's merge
    table, but piece counts track them closely and stay all-JVM."""
    pieces = F.regexp_extract_all(text, F.lit(_BPE_PRETOKEN_RE), 0)
    return F.size(F.filter(pieces, lambda p: F.trim(p) != "")).cast("long")


def analyze_documents(df: DataFrame, text_col: str = "text",
                      keep_tokens: bool = False) -> DataFrame:
    """One-pass document analysis: adds token_count, stopword_ratio,
    quality_score, lang_id, fingerprint columns.

    The token array is materialized ONCE in a staged projection and every
    metric derives from that named column — the naive per-metric
    composition re-runs the tokenizer regex ~10x per row (each of the five
    metrics re-tokenizes, and quality/lang re-derive their inputs)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # streaming frames: no partition probe (df.rdd is illegal there) and
    # no repartition — micro-batch parallelism is the source's business
    if not df.isStreaming and df.rdd.getNumPartitions() < target:
        df = df.repartition(target)

    staged = df.withColumn("__toks", raw_tokens_column(F.col(text_col)))
    toks = F.col("__toks")
    n = F.size(toks)

    def marker_ratio(markers) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))

    sw = marker_ratio(sorted(DEFAULT_STOPWORDS))
    total_len = F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t))
    alen = F.when(n > 0, total_len / n).otherwise(F.lit(0.0))

    best_lang, best_ratio = F.lit("und"), F.lit(0.02)
    for lang, markers in _LANG_MARKERS.items():
        ratio = marker_ratio(markers)
        improved = ratio > best_ratio
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(improved, ratio).otherwise(best_ratio)

    len_term = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(sw * 4.0, F.lit(1.0))
    alen_term = F.when((alen >= 3.0) & (alen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))

    out = staged.withColumns({
        "token_count": n.cast("long"),
        "stopword_ratio": F.round(sw, 6),
        "quality_score": F.round((len_term + sw_term + alen_term) / 3.0, 6),
        "lang_id": best_lang,
        "fingerprint": F.md5(F.array_join(toks, " ")),
    })
    # keep_tokens: composed passes (e.g. repetition_stats) reuse the
    # staged array instead of paying a second tokenizer scan
    return out if keep_tokens else out.drop("__toks")


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021 — the published document-level
# filter set). One staged map-only scan, all JVM array expressions.

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")




def diversity_metrics(df: DataFrame, key: str = "doc_id",
                      text_col: str = "text",
                      ns: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Corpus-level lexical diversity — the standard synthetic-data
    curation report (distinct-n from Li et al. 2016's Distinct metric;
    cross-document overlap is the corpus-level complement of Self-BLEU):
    one row per n with

    - ``total_ngrams`` / ``distinct_ngrams`` and ``distinct_ratio``
      (distinct/total — low = the corpus repeats itself),
    - ``cross_doc_fraction``: share of distinct n-grams appearing in
      MORE THAN ONE document (high = documents echo each other — the
      mode-collapse signature in generated corpora),
    - ``entropy_bits``: Shannon entropy of the n-gram distribution
      (log2(distinct) when perfectly uniform).

    Scale shape: all n values ride the SAME two data shuffles (the
    line-dedup family) — gram rows for every n union into one
    (n, gram, doc) pre-aggregation and one (n, gram) aggregation, both
    combiner-reduced map-side (gram identity = xxhash64 of the token
    slice, the gram_set contract), then an n-row final aggregate. No
    driver materialization beyond the len(ns)-row result. The corpus
    tokenizes and position-explodes ONCE for every n (each window
    position emits its ≤len(ns) gram structs inline) instead of once
    per n — the multiset is pinned identical to the per-n gram_set
    union in tests."""
    from .dedup import _staged_tokens

    staged = _staged_tokens(df, key, text_col, barrier=False)
    toks = F.col("__toks")
    # per position: one (n, gram) struct for each n whose window fits;
    # nulls (window overrun) drop via array_compact before the explode
    gram_structs = F.array_compact(F.array(*[
        F.when(
            F.col("__i") <= F.size(toks) - int(n),
            F.struct(
                F.lit(int(n)).alias("n"),
                F.xxhash64(F.slice(toks, F.col("__i") + 1, int(n)))
                .alias("__gram")))
        for n in ns]))
    allg = (staged
            .select("k", "__toks",
                    F.posexplode("__toks").alias("__i", "__t"))
            .select(F.col("k").alias("__dk"),
                    F.explode(gram_structs).alias("__g"))
            .select("__g.n", "__g.__gram", "__dk"))
    # cross_doc only needs WHETHER a gram spans >1 document, so
    # min(doc) != max(doc) replaces count_distinct(doc): the exact
    # distinct count forced Spark's two-phase expand — an extra
    # Exchange clustering per-(n, gram, DOC) rows before the (n, gram)
    # one — while min/max ride the same single (n, gram) exchange with
    # map-side partials (plan: 3 data exchanges -> 2; the widest one,
    # keyed on (n, gram, doc), is gone)
    per_gram = (allg.groupBy("n", "__gram")
                .agg(F.count(F.lit(1)).alias("occ"),
                     (F.min("__dk") != F.max("__dk")).alias("multi_doc")))
    return (per_gram.groupBy("n")
            .agg(F.sum("occ").alias("total_ngrams"),
                 F.count(F.lit(1)).alias("distinct_ngrams"),
                 (F.count(F.lit(1)) / F.sum("occ"))
                 .alias("distinct_ratio"),
                 (F.sum(F.when(F.col("multi_doc"), 1).otherwise(0))
                  / F.count(F.lit(1))).alias("cross_doc_fraction"),
                 (F.log2(F.sum("occ"))
                  - F.sum(F.col("occ") * F.log2("occ")) / F.sum("occ"))
                 .alias("entropy_bits"))
            .orderBy("n"))


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         min_words: int = 50,
                         max_words: int = 100_000) -> DataFrame:
    """The published Gopher document-quality rules as one flag column per
    rule plus the ``gopher_pass`` conjunction:

    - ``g_word_count``: whitespace word count in [min_words, max_words]
    - ``g_mean_word_len``: mean word length in [3, 10]
    - ``g_symbol_ratio``: (# + ellipsis occurrences) / words < 0.1
    - ``g_bullet_lines``: < 90% of lines start with a bullet
    - ``g_ellipsis_lines``: < 30% of lines end with an ellipsis
    - ``g_alpha_words``: > 80% of words contain a letter
    - ``g_stopwords``: >= 2 distinct words from the 8-word Gopher list

    Words are raw whitespace tokens (the paper's definition — NOT the
    search analyzer's), lines split on newline. One map-only scan: the
    word and line arrays stage through named columns so each is computed
    once per row (expression-plumbing rule from repetition_stats);
    thresholds are the paper's defaults. All-JVM, so at 100 TB this
    rides the same codegen scan as the other quality signals."""
    from .dedup import _parallelize

    df = _parallelize(df)        # spread 1-task scans; no-op at scale
    text = F.col(text_col)
    staged = (df
              .withColumn("__gw", F.filter(F.split(text, r"\s+"),
                                           lambda w: w != ""))
              .withColumn("__gl", F.split(text, "\n")))
    words, lines = F.col("__gw"), F.col("__gl")
    wc = F.size(words)
    nl = F.size(lines)
    mean_len = F.when(wc > 0, F.aggregate(
        words, F.lit(0.0), lambda a, w: a + F.length(w)) / wc)
    n_sym = (F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
             + F.regexp_count(text, F.lit(r"\.\.\.|…")))
    bullet = F.size(F.filter(
        lines, lambda ln: F.ltrim(ln).rlike(r"^[•‣▪-]")))
    ell = F.size(F.filter(
        lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.array_intersect(
        F.transform(words, F.lower), stop_arr))
    out = staged.withColumns({
        "g_word_count": (wc >= min_words) & (wc <= max_words),
        "g_mean_word_len": F.coalesce(
            (mean_len >= 3.0) & (mean_len <= 10.0), F.lit(False)),
        "g_symbol_ratio": F.when(
            wc > 0, n_sym.cast("double") / wc < 0.1).otherwise(F.lit(False)),
        "g_bullet_lines": F.when(
            nl > 0, bullet.cast("double") / nl < 0.9).otherwise(F.lit(False)),
        "g_ellipsis_lines": F.when(
            nl > 0, ell.cast("double") / nl < 0.3).otherwise(F.lit(False)),
        "g_alpha_words": F.when(
            wc > 0, alpha.cast("double") / wc > 0.8).otherwise(F.lit(False)),
        "g_stopwords": stop_hits >= 2,
    }).drop("__gw", "__gl")
    flags = ["g_word_count", "g_mean_word_len", "g_symbol_ratio",
             "g_bullet_lines", "g_ellipsis_lines", "g_alpha_words",
             "g_stopwords"]
    pass_col = F.lit(True)
    for f in flags:
        pass_col = pass_col & F.col(f)
    return out.withColumn("gopher_pass", pass_col)


def hashed_embeddings(df: DataFrame, text_col: str = "text",
                      tokens_col: str | None = None, dim: int = 256,
                      binary: bool = False, idf: bool = False,
                      normalize: bool = True,
                      out_col: str = "embedding") -> DataFrame:
    """Feature-hashing document vectors: ``df`` + an ``array<float>``
    column, bridging the text stack to the vector stack — semantic
    dedup, embedding-cosine pairs, and KNN joins run on plain text with
    NO external embedding model.

    Plan shape: HashingTF (fixed-width hashing, no vocabulary build or
    broadcast) and L2 normalization are JVM ML transformers — one
    map-only pass, zero shuffle. ``idf=True`` adds an IDF weighting fit
    (one aggregation job over the corpus; the model is a dim-sized
    broadcast vector). Deterministic: same text -> same vector under
    retries.

    These are bag-of-hashed-words vectors — they capture lexical
    overlap, not semantics; for near-dup detection (the pipeline use
    case) that is exactly the signal MinHash measures, here in a form
    the cosine/IVF machinery consumes. ``dim`` trades collision noise
    for width (256 is plenty for near-dup cosine at ~10^2-10^3 token
    docs)."""
    from pyspark.ml.feature import IDF, HashingTF, Normalizer
    from pyspark.ml.functions import vector_to_array

    if (text_col is None) == (tokens_col is None):
        raise ValueError("pass exactly one of text_col or tokens_col")
    if tokens_col is not None:
        toks = F.coalesce(F.col(tokens_col), F.array().cast("array<string>"))
    else:
        toks = raw_tokens_column(F.coalesce(F.col(text_col), F.lit("")))
    work = df.withColumn("__he_toks", toks)
    tf = HashingTF(inputCol="__he_toks", outputCol="__he_tf",
                   numFeatures=dim, binary=binary)
    vec = tf.transform(work)
    fcol = "__he_tf"
    if idf:
        model = IDF(inputCol="__he_tf", outputCol="__he_idf").fit(vec)
        vec = model.transform(vec)
        fcol = "__he_idf"
    if normalize:
        vec = Normalizer(inputCol=fcol, outputCol="__he_norm",
                         p=2.0).transform(vec)
        fcol = "__he_norm"
    drop = [c for c in vec.columns if c.startswith("__he_") and c != fcol]
    return (vec.withColumn(out_col,
                           vector_to_array(F.col(fcol)).cast("array<float>"))
            .drop(fcol, *drop))


# ---------------------------------------------------------------------------
# Unicode script profiling — the multilingual-corpus routing signal

_SCRIPTS = ("Latin", "Cyrillic", "Greek", "Arabic", "Hebrew",
            "Devanagari", "Han", "Hiragana", "Katakana", "Hangul",
            "Thai")


def script_profile(df: DataFrame, text_col: str = "text",
                   min_dominant_frac: float = 0.5) -> DataFrame:
    """Per-document Unicode script distribution: one
    ``script_<name>_frac`` column per major script (fraction of LETTER
    characters in that script) plus ``dominant_script`` (null when no
    script reaches ``min_dominant_frac`` — mixed-script text, a spam
    signal in web corpora and the router key for per-language
    pipelines).

    All-JVM: Java regex script properties (``\\p{script=Han}``) inside
    ``regexp_count`` — one map-only codegen scan, no Python, no
    shuffle. The letter total is staged as a named column so the text
    is scanned once per script class, not per reference.

    Reference analogue: none — the reference's lexer is
    punctuation-driven and script-blind (src/indexes/text/lexer.cc);
    beyond-reference operator per SURVEY.md §2.10.
    """
    letters = F.regexp_count(F.col(text_col), F.lit(r"\p{L}"))
    staged = df.withColumn("__nletters", letters)
    out = staged
    for s in _SCRIPTS:
        # intersect with \p{L}: scripts also claim combining marks and
        # digits (Thai vowel signs, Devanagari matras), which would push
        # the 'fraction of letters' above 1.0
        cnt = F.regexp_count(F.col(text_col),
                             F.lit(rf"[\p{{script={s}}}&&[\p{{L}}]]"))
        frac = (F.when(F.col("__nletters") > 0,
                       cnt.cast("double") / F.col("__nletters"))
                .otherwise(F.lit(0.0)))
        out = out.withColumn(f"script_{s.lower()}_frac", frac)
    dom_frac, dom_name = F.lit(0.0), F.lit(None).cast("string")
    for s in _SCRIPTS:
        c = F.col(f"script_{s.lower()}_frac")
        better = c > dom_frac
        dom_name = F.when(better, F.lit(s.lower())).otherwise(dom_name)
        dom_frac = F.when(better, c).otherwise(dom_frac)
    return (out.withColumn(
        "dominant_script",
        F.when(dom_frac >= F.lit(float(min_dominant_frac)), dom_name))
        .drop("__nletters"))


# ---------------------------------------------------------------------------
# sentence segmentation: the unit bitext mining, chunking and dedup work
# on when "document" is too coarse. One Java-regex split in whole-stage
# codegen — the abbreviation list and the quote/bracket tolerance are
# the standard pragmatic heuristics (a trained Punkt-style model is a
# client-side seam); pinned against an independent scalar state-machine
# reference in tests/test_sentences.py.

DEFAULT_ABBREVIATIONS = (
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "St", "Mt", "Gen",
    "Rep", "Sen", "Gov", "Capt", "Col", "Sgt", "Lt", "vs", "etc", "approx",
    "Fig", "fig", "Eq", "eq", "No", "no", "Vol", "vol", "Ch", "ch",
    "pp", "ed", "al", "Inc", "Ltd", "Co", "Corp", "Ave", "Blvd", "Rd",
    "Jan", "Feb", "Mar", "Apr", "Jun", "Jul", "Aug", "Sep", "Sept",
    "Oct", "Nov", "Dec", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun",
)


# Java \s is ASCII-only; crawl text separates sentences with NBSP and
# other Unicode spaces all the time (&nbsp;), so the break class and
# the trim must cover \p{Z} too (matches Python re's \s semantics,
# which the scalar reference uses)
_WS_CLASS = "[\\s\\p{Z}\\u0085]"


def _sentence_break_re(abbreviations) -> str:
    # break at whitespace that follows a terminator (+ optional closing
    # quotes/brackets) and precedes a sentence-looking start; never
    # after a known abbreviation+period, a single capital initial
    # ("J. Smith"), or inside an ellipsis. Abbreviations are escaped —
    # a caller-supplied "e.g" must not turn '.' into a wildcard.
    import re as _re

    abbr = "|".join(_re.escape(a) for a in abbreviations)
    # assertion ORDER is the performance: the single-char terminator
    # class eliminates almost every position before the expensive
    # 50-alternative abbreviation lookbehind ever runs (measured 15x ->
    # ~4x time at 20x data when reordered cheapest-first)
    return (
        r"(?<=[.!?][\"'”’)\]]{0,2})"     # terminator (+ closers) behind
        r"(?<!\.\.\.)"                   # not an ellipsis tail
        r"(?<!\b[A-Z]\.)"                # not an initial "J. Smith"
        rf"(?<!\b(?:{abbr})\.)"          # not "Dr. ..."
        f"{_WS_CLASS}+"
        r"(?=[\"'“‘(\[]{0,2}[A-Z0-9])"   # sentence-looking start ahead
    )


def sentences_col(text: Column,
                  abbreviations=DEFAULT_ABBREVIATIONS) -> Column:
    """array<string> of sentences (trimmed incl. Unicode whitespace,
    empties dropped). Text with no terminator comes back whole as one
    sentence."""
    parts = F.split(text, _sentence_break_re(abbreviations))
    trimmed = F.transform(parts, lambda s: F.regexp_replace(
        s, f"^{_WS_CLASS}+|{_WS_CLASS}+$", ""))
    return F.filter(trimmed, lambda s: s != F.lit(""))


def split_sentences(df: DataFrame, text_col: str = "text",
                    key: str = "doc_id",
                    abbreviations=DEFAULT_ABBREVIATIONS) -> DataFrame:
    """Explode documents to ``(key, sent_idx, sentence)`` — one
    map-only posexplode (no shuffle), the staged-attribute shape that
    avoids per-output-row re-evaluation of the split."""
    from .dedup import _parallelize, _pin

    # spread an under-partitioned scan (1-file inputs read as ONE task,
    # serializing the split regexes onto one core — measured 1.4x on
    # the bench row); no-op on well-partitioned production inputs.
    # _pin: InferFiltersFromGenerate otherwise derives size/isnotnull
    # from the posexplode and pushdown inlines the WHOLE splitter into
    # that filter below the spread exchange — two extra serial
    # evaluations of the sentence regex per row (dedup._pin docs)
    df = _parallelize(df)
    staged = df.select(F.col(key),
                       _pin(sentences_col(F.col(text_col),
                                          abbreviations)).alias("__sents"))
    return staged.select(
        key, F.posexplode("__sents").alias("sent_idx", "sentence"))
