"""Custom stateful streaming operators via applyInPandasWithState.

Where windows.py uses Spark's built-in stateful operators (windows,
sessions, watermarked dedup), this module shows the escape hatch for
semantics Spark lacks: an arbitrary per-key state machine over Arrow
batches. The example operator maintains running per-key corpus statistics
(doc count, token sum, distinct-fingerprint count via a bounded set) for
a document stream — the continuously-updated FT.INFO counterpart of a
batch analyze_documents pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType([
    T.StructField("group_key", T.StringType()),
    T.StructField("docs", T.LongType()),
    T.StructField("tokens", T.LongType()),
    T.StructField("uniques", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("docs", T.LongType()),
    T.StructField("tokens", T.LongType()),
    T.StructField("fps", T.ArrayType(T.LongType())),
])

_MAX_TRACKED_FPS = 100_000  # bound per-key state (beyond: count-only)


def _update_stats(key, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    docs, tokens, fps = (state.get if state.exists else (0, 0, []))
    seen = set(fps or [])
    for pdf in pdfs:
        docs += len(pdf)
        tokens += int(pdf["n_tokens"].fillna(0).sum())
        for fp in pdf["fp"]:
            if fp is not None and len(seen) < _MAX_TRACKED_FPS:
                seen.add(int(fp))
    state.update((docs, tokens, sorted(seen)))
    yield pd.DataFrame([{"group_key": key[0], "docs": docs,
                         "tokens": tokens, "uniques": len(seen)}])


def running_corpus_stats(stream: DataFrame, group_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Per-group running (docs, tokens, distinct fingerprints) over a
    document stream. Emits the updated totals for every group touched by
    each micro-batch; state lives per group key, Arrow-batched both ways."""
    from ..operators.textops import fingerprint_col

    prepped = stream.select(
        F.col(group_col).cast("string").alias("gk"),
        F.size(F.split(F.col(text_col), r"\s+")).cast("long").alias("n_tokens"),
        F.xxhash64(fingerprint_col(F.col(text_col))).alias("fp"),
    )
    return (prepped.groupBy("gk")
            .applyInPandasWithState(
                _update_stats,
                outputStructType=STATS_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
