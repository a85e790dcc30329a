"""End-to-end corpus curation: the composed training-data pipeline.

One call chains the extension operators into the standard LLM-data flow —
analyze -> quality/language gate -> exact dedup -> near-dedup — returning
the surviving documents plus a per-stage funnel report. Each stage is the
already-tested operator; this module only owns the composition order and
the keep/drop bookkeeping, so the pipeline inherits every scale property
documented in SCALE.md (single analysis scan, fingerprint shuffle, banded
LSH joins).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, functions as F

from . import dedup as dd
from .textops import analyze_documents


@dataclass
class CurationConfig:
    min_quality: float = 0.5
    min_tokens: int = 10
    languages: tuple[str, ...] | None = None     # None = keep all
    near_dup_threshold: float = 0.85             # jaccard; None disables
    minhash_hashes: int = 32
    minhash_bands: int = 8
    # Gopher-style repetition gates (contamination.repetition_stats);
    # None disables the gate AND skips computing the signal entirely
    max_rep2_frac: float | None = None           # max-coverage 2-gram frac
    max_dup_line_frac: float | None = None       # duplicate-line fraction
    # require the full published Gopher rule set
    # (textops.gopher_quality_flags conjunction); False skips the scan
    gopher_rules: bool = False
    gopher_min_words: int = 50
    # CCNet-style LM perplexity gate (operators/lm.py): set lm_model to
    # a pre-trained BigramLM (keeps the composition job-free) or
    # lm_reference to a reference corpus (training runs its eager count
    # jobs at compose time); max_lm_perplexity enables the gate.
    # Unscoreable (<2 token) docs fail the gate like any null signal.
    lm_model: object | None = None               # BigramLM
    lm_reference: object | None = None           # DataFrame
    max_lm_perplexity: float | None = None
    # GPT-3-style model-based quality gate (operators/quality_model.py):
    # a pre-trained QualityClassifier scores map-side (lazy, no jobs at
    # compose time); gate with a hard threshold (min_model_quality)
    # and/or the published Pareto acceptance rule (model_pareto) — the
    # score lands in a `model_quality` column either way (distinct from
    # the heuristic `quality_score`)
    quality_model: object | None = None          # QualityClassifier
    min_model_quality: float | None = None
    model_pareto: bool = False
    model_pareto_alpha: float = 9.0
    model_pareto_seed: int = 0
    # Unicode script gate (textops.script_profile): keep documents whose
    # dominant script is in the set; None skips computing the profile.
    # Mixed-script documents (no dominant script) always fail the gate —
    # the web-spam shape the signal exists for.
    scripts: tuple[str, ...] | None = None
    script_min_frac: float = 0.5
    # Unicode cleanup (operators/cleaning.clean_text) runs FIRST so
    # every downstream signal sees the cleaned text. `clean` alone is
    # the Python-free JVM tier; the other two enable the Arrow tier.
    clean: bool = False
    clean_unicode_form: str | None = None       # "NFC"/"NFKC"/...
    clean_fix_mojibake: bool = False
    extra: dict = dc_field(default_factory=dict)


def curate_documents(df: DataFrame, key: str = "doc_id",
                     text_col: str = "text",
                     config: CurationConfig | None = None,
                     with_funnel: bool = True):
    """Returns (clean_df, funnel) where ``funnel`` maps stage -> surviving
    row count. Stages: analyze -> gate -> exact-dedup -> minhash near-dedup
    (drops the higher-keyed member of each near-dup pair).

    Stage survival is encoded as FLAG COLUMNS on one frame, so the whole
    funnel is a single aggregation job (not one count per stage re-running
    the upstream scan) and ``clean_df`` stays fully lazy. With
    ``with_funnel=False`` the composition triggers NO Spark jobs at all —
    the caller's one consumption is the only action
    (tests/test_curation_pipeline.py::test_pipeline_is_lazy)."""
    cfg = config or CurationConfig()
    from pyspark.sql.window import Window

    if cfg.clean or cfg.clean_unicode_form or cfg.clean_fix_mojibake:
        from .cleaning import clean_text

        df = clean_text(df, text_col,
                        unicode_form=cfg.clean_unicode_form,
                        fix_mojibake=cfg.clean_fix_mojibake)
    rep_gates = (cfg.max_rep2_frac is not None
                 or cfg.max_dup_line_frac is not None)
    lm_on = cfg.lm_model is not None or cfg.lm_reference is not None
    analyzed = analyze_documents(df, text_col,
                                 keep_tokens=rep_gates or lm_on)
    if rep_gates:
        from .contamination import repetition_stats

        # reuse the staged token array — no second tokenizer scan
        analyzed = repetition_stats(analyzed, text_col,
                                    tokens_col="__toks")
    if rep_gates and not lm_on:
        analyzed = analyzed.drop("__toks")
    if cfg.gopher_rules:
        from .textops import gopher_quality_flags

        analyzed = gopher_quality_flags(analyzed, text_col,
                                        min_words=cfg.gopher_min_words)
    lm = cfg.lm_model
    if lm is None and cfg.lm_reference is not None:
        from .lm import BigramLM

        lm = BigramLM.train(cfg.lm_reference, text_col=text_col)
    if cfg.max_lm_perplexity is not None and lm is None:
        raise ValueError("max_lm_perplexity requires lm_model or "
                         "lm_reference")
    if lm is not None:
        # score off the staged token array, then release it
        analyzed = lm.score(analyzed, key=key, text_col=text_col,
                            tokens_col="__toks").drop("__toks")
    model_gate_on = (cfg.min_model_quality is not None or cfg.model_pareto)
    if model_gate_on and cfg.quality_model is None:
        raise ValueError("min_model_quality/model_pareto require "
                         "quality_model")
    if cfg.quality_model is not None:
        # the classifier applies its OWN tokenization (it must match
        # training featurization), so it scores the raw text column —
        # still lazy: PipelineModel.transform adds JVM projections only
        analyzed = cfg.quality_model.score(analyzed, text_col=text_col,
                                           out_col="model_quality")
    if cfg.scripts:
        from .textops import script_profile

        analyzed = script_profile(analyzed, text_col,
                                  min_dominant_frac=cfg.script_min_frac)
    gate = (F.col("quality_score") >= cfg.min_quality) & \
           (F.col("token_count") >= cfg.min_tokens)
    if cfg.gopher_rules:
        gate = gate & F.col("gopher_pass")
    if cfg.languages:
        gate = gate & F.col("lang_id").isin(*cfg.languages)
    if cfg.scripts:
        gate = gate & F.col("dominant_script").isin(
            *[s.lower() for s in cfg.scripts])
    if cfg.max_rep2_frac is not None:
        gate = gate & (F.col("top_2gram_char_frac") <= cfg.max_rep2_frac)
    if cfg.max_dup_line_frac is not None:
        gate = gate & (F.col("dup_line_frac") <= cfg.max_dup_line_frac)
    if cfg.max_lm_perplexity is not None:
        gate = gate & (F.col("lm_perplexity") <= cfg.max_lm_perplexity)
    if cfg.min_model_quality is not None:
        gate = gate & (F.col("model_quality") >= cfg.min_model_quality)
    if cfg.model_pareto:
        from .quality_model import pareto_keep

        gate = gate & pareto_keep(key, "model_quality",
                                  alpha=cfg.model_pareto_alpha,
                                  seed=cfg.model_pareto_seed)
    flagged = analyzed.withColumn("__gate", F.coalesce(gate, F.lit(False)))

    # exact dedup: the min-key GATED row per fingerprint is the
    # representative — one window over the fingerprint shuffle
    w = Window.partitionBy("fingerprint")
    rep_key = F.min(F.when(F.col("__gate"), F.col(key))).over(w)
    flagged = flagged.withColumn("__rep",
                                 F.col("__gate") & (F.col(key) == rep_key))

    exact = flagged.where(F.col("__rep"))
    if cfg.near_dup_threshold is not None:
        pairs = dd.minhash_lsh_pairs(
            exact, key, text_col=text_col,
            num_hashes=cfg.minhash_hashes, bands=cfg.minhash_bands,
            threshold=cfg.near_dup_threshold)
        losers = (pairs.select(F.col("b").alias(key)).distinct()
                  .withColumn("__loser", F.lit(True)))
        flagged = flagged.join(losers, on=key, how="left")
        flagged = flagged.withColumn(
            "__keep", F.col("__rep") & F.col("__loser").isNull())
    else:
        flagged = flagged.withColumn("__keep", F.col("__rep"))
        flagged = flagged.withColumn("__loser", F.lit(None).cast("boolean"))

    clean = (flagged.where(F.col("__keep"))
             .drop("__gate", "__rep", "__loser", "__keep"))
    if cfg.near_dup_threshold is not None:
        # the minhash pairs frame carries persisted-RDD handles; clean's
        # plan references them, so hand them to the caller for release()
        # instead of leaking them in long-lived sessions
        clean._vss_cached = getattr(pairs, "_vss_cached", [])

    funnel = None
    if with_funnel:
        row = flagged.agg(
            F.count(F.lit(1)).alias("input"),
            F.count_if(F.col("__gate")).alias("quality_gate"),
            F.count_if(F.col("__rep")).alias("exact_dedup"),
            F.count_if(F.col("__keep")).alias("near_dedup"),
        ).first()
        funnel = {k: row[k] for k in
                  ("input", "quality_gate", "exact_dedup", "near_dedup")}
    return clean, funnel
