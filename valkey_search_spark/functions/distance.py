"""Vector distance expressions — pure JVM-side (zip_with/aggregate),
no Python in the hot path.

Metrics per /root/reference/src/indexes/vector_base.h:106-110 and
docs/commands/ft.create.md:103-109: L2 = euclidean; IP and COSINE are
returned as ``1 - value``. COSINE assumes ingest-normalized vectors
(VectorField normalizes; the query vector is normalized here), so
cosine distance == 1 - dot (/root/reference/src/indexes/vector_base.h:46).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F


def normalize_query(vec: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec] if n > 0 else vec


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _dot(col: Column, vec: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(col, _lit_vec(vec), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def distance_column(col: Column, vec: list[float], metric: str) -> Column:
    """Distance between an array<float> column and a literal query vector."""
    if metric == "l2":
        sq = F.aggregate(
            F.zip_with(col, _lit_vec(vec), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.sqrt(sq)
    if metric == "ip":
        return F.lit(1.0) - _dot(col, vec)
    if metric == "cosine":
        return F.lit(1.0) - _dot(col, normalize_query(vec))
    raise ValueError(f"unknown metric {metric!r}")
