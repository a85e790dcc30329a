"""Sequence packing: assign documents to fixed-token-budget packs.

Training pipelines batch documents into sequences of at most
``max_tokens`` (context-window) tokens. Optimal bin packing is NP-hard
and inherently serial, so the scalable strategy is greedy first-fit
WITHIN each partition: state never leaves a task, pack ids are salted
with the partition id, and the wasted space is bounded by one document
per pack boundary — at 100 TB the per-partition greedy is the same
algorithm every serial packer runs, just sharded.

All-JVM prelude (token counts come from textops), one Arrow-batched
mapInPandas for the sequential fill.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def pack_documents(df: DataFrame, count_col: str = "token_count",
                   max_tokens: int = 2048,
                   sort_within: bool = True) -> DataFrame:
    """Adds ``pack_id`` (long, globally unique) and ``pack_tokens`` (the
    pack's running total). Documents larger than ``max_tokens`` get a
    dedicated pack. ``sort_within`` orders each partition by descending
    token count first — first-fit-decreasing packs measurably tighter
    than arrival order at zero extra shuffle."""
    if sort_within:
        df = df.sortWithinPartitions(F.col(count_col).desc())

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("pack_id", T.LongType()),
           T.StructField("pack_tokens", T.LongType())])

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        base = pid << 40                       # partition-salted id space
        # open packs as (remaining, pack_id, filled) — first-fit scans the
        # open list; bounded to keep the scan cheap
        open_packs: list[list[int]] = []
        next_id = 0
        totals: dict[int, int] = {}

        def place(n: int) -> int:
            nonlocal next_id
            for slot in open_packs:
                if slot[0] >= n:
                    slot[0] -= n
                    totals[slot[1]] += n
                    return slot[1]
            pk = base + next_id
            next_id += 1
            totals[pk] = n
            if n < max_tokens:
                open_packs.append([max_tokens - n, pk])
                if len(open_packs) > 64:       # cap the first-fit scan
                    open_packs.pop(0)
            return pk

        staged = []
        for pdf in batches:
            ids = [place(int(n)) for n in pdf[count_col]]
            pdf = pdf.copy()
            pdf["pack_id"] = pd.Series(ids, index=pdf.index, dtype="int64")
            staged.append(pdf)
        # second pass stamps the final pack totals
        for pdf in staged:
            pdf["pack_tokens"] = pdf["pack_id"].map(totals).astype("int64")
            yield pdf

    return df.mapInPandas(fill, out_schema)
