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
    extra: dict = dc_field(default_factory=dict)


def curate_documents(df: DataFrame, key: str = "doc_id",
                     text_col: str = "text",
                     config: CurationConfig | None = None):
    """Returns (clean_df, funnel) where ``funnel`` maps stage -> surviving
    row count. Stages: analyze -> gate -> exact-dedup -> minhash near-dedup
    (drops the higher-keyed member of each near-dup pair)."""
    cfg = config or CurationConfig()
    funnel: dict[str, int] = {"input": df.count()}

    analyzed = analyze_documents(df, text_col)
    gate = (F.col("quality_score") >= cfg.min_quality) & \
           (F.col("token_count") >= cfg.min_tokens)
    if cfg.languages:
        gate = gate & F.col("lang_id").isin(*cfg.languages)
    gated = analyzed.where(gate)
    funnel["quality_gate"] = gated.count()

    # exact dedup: keep the min-key representative per fingerprint
    reps = (gated.groupBy("fingerprint")
                 .agg(F.min(key).alias(key)))
    exact = gated.join(reps, on=[key, "fingerprint"], how="semi")
    funnel["exact_dedup"] = exact.count()

    if cfg.near_dup_threshold is not None:
        pairs = dd.minhash_lsh_pairs(
            exact, key, text_col=text_col,
            num_hashes=cfg.minhash_hashes, bands=cfg.minhash_bands,
            threshold=cfg.near_dup_threshold)
        losers = pairs.select(F.col("b").alias(key)).distinct()
        clean = exact.join(losers, on=key, how="left_anti")
    else:
        clean = exact
    funnel["near_dedup"] = clean.count()
    return clean, funnel
