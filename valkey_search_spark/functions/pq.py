"""Product quantization (PQ) — the 16x+ vector storage tier.

Scalar int8 (functions/quantize.py) cuts vector bytes 4x; PQ goes an
order of magnitude further: the dimension splits into ``m`` subspaces,
each subvector is replaced by the id of its nearest of 256 per-subspace
centroids, so a d-dim float32 vector (4d bytes) becomes m bytes — 32x
for d=64/m=8 — at the cost of quantization error. Search uses
asymmetric distance computation (ADC): the QUERY stays exact, and the
distance to a code is the sum of m lookup-table entries, one per
subspace (the classic IVF-PQ design from the published
product-quantization literature; the reference keeps float32 in RAM,
vector_base.h, so this tier has no analogue there).

Scale shapes:
- **Training** runs driver-side on a BOUNDED sample (default <= 65536
  vectors, ~16 MB at d=64): one vectorized Lloyd's iteration updates
  all m subspace codebooks simultaneously, so training cost is
  independent of corpus size.
- **Encoding** is an Arrow-batched kernel: per batch, one argmin matmul
  per subspace; output is array<tinyint> of length m.
- **ADC scoring** is JVM-expressible for single queries (m element_at
  lookups into literal LUT arrays — whole-stage codegen, no Python) and
  one numpy LUT gather per cogroup batch for batch joins.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


class PQCodebook:
    """m subspace codebooks of 256 centroids each.

    ``centroids`` has shape (m, 256, dsub) float32, dsub = dim // m.
    Codes are stored OFFSET by -128 so they fit Spark's tinyint
    (code byte c in [-128, 127] maps to centroid index c + 128).
    """

    def __init__(self, centroids: np.ndarray,
                 rotation: np.ndarray | None = None):
        self.centroids = np.ascontiguousarray(centroids, dtype=np.float32)
        self.m, self.ksub, self.dsub = self.centroids.shape
        # OPQ: an orthonormal d x d matrix applied BEFORE subspace split
        # (row-vector convention: y = x @ R). L2/IP are rotation-
        # invariant, so codes/LUTs live in rotated space and only
        # reconstruction unrotates.
        self.rotation = (None if rotation is None else
                         np.ascontiguousarray(rotation, dtype=np.float32))

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    # ------------------------------------------------------------------
    @classmethod
    def train(cls, df: DataFrame, vec_col: str, m: int = 8,
              sample_limit: int = 65536, iters: int = 20,
              seed: int = 42) -> "PQCodebook":
        """Train on a bounded RANDOM sample collected to the driver (the
        one deliberate driver materialization — codebooks need
        ~10^4-10^5 points regardless of corpus size). A plain limit()
        would take a deterministic prefix from the fewest partitions —
        on a source-partitioned corpus the codebooks would model one
        source only — so the sample fraction comes from one count job.
        Lloyd's iterations run vectorized across ALL m subspaces at
        once, with the assignment chunked over the sample so the
        distance temp stays a few MB (the unchunked (m, n, 256) tensor
        is ~1 GB at the default sample size)."""
        x = cls._sample(df, vec_col, sample_limit, seed)
        if x.shape[1] % m:
            raise ValueError(f"dim {x.shape[1]} not divisible by m={m}")
        rng = np.random.default_rng(seed)
        cents, _ = cls._lloyd(x, m, iters, rng)
        return cls(cents)

    @classmethod
    def train_opq(cls, df: DataFrame, vec_col: str, m: int = 8,
                  sample_limit: int = 65536, iters: int = 20,
                  opq_iters: int = 10, seed: int = 42) -> "PQCodebook":
        """Optimized PQ (the published OPQ non-parametric algorithm, Ge
        et al.): learn an orthonormal rotation R that redistributes
        correlated variance across subspaces before quantizing —
        alternating (a) a few Lloyd steps on the rotated sample with
        (b) the orthogonal-Procrustes update R = U Vᵀ from
        SVD(Xᵀ·decode(encode(XR))). Same bounded driver-side sample as
        ``train``; plain PQ is the opq_iters=0 special case (R = I is
        then dropped). On isotropic data R buys nothing; on real
        embeddings (correlated dims) it recovers much of the PQ recall
        gap at zero storage or search cost — codes and LUTs live in
        rotated space, only reconstruction unrotates."""
        x = cls._sample(df, vec_col, sample_limit, seed)
        n, dim = x.shape
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        rng = np.random.default_rng(seed)
        r = np.eye(dim, dtype=np.float64)
        cents = None
        for _ in range(max(1, opq_iters)):
            xr = (x @ r).astype(np.float32)
            cents, assign = cls._lloyd(xr, m, 4, rng, init=cents)
            # reconstruction of the rotated sample from its codes
            y = np.concatenate(
                [cents[s][assign[s]] for s in range(m)],
                axis=1).astype(np.float64)                   # (n, dim)
            u, _s, vt = np.linalg.svd(x.T @ y)
            r = u @ vt                                       # Procrustes
        xr = (x @ r).astype(np.float32)
        cents, _ = cls._lloyd(xr, m, iters, rng, init=cents)
        return cls(cents, rotation=r)

    @staticmethod
    def _sample(df: DataFrame, vec_col: str, sample_limit: int,
                seed: int) -> np.ndarray:
        vecs = df.select(vec_col).where(F.col(vec_col).isNotNull())
        n_total = vecs.count()
        if n_total == 0:
            raise ValueError("PQ training needs at least one vector")
        if n_total > sample_limit:
            frac = min(1.0, 1.2 * sample_limit / n_total)
            vecs = vecs.sample(fraction=frac, seed=seed)
        rows = vecs.limit(sample_limit).collect()
        return np.asarray([r[0] for r in rows], dtype=np.float32)

    @staticmethod
    def _lloyd(x: np.ndarray, m: int, iters: int, rng,
               init: np.ndarray | None = None):
        """Vectorized Lloyd's over all m subspaces at once; returns
        (centroids (m,256,dsub), final assignment (m,n)). Chunked so the
        distance temp stays a few MB (the unchunked (m, n, 256) tensor
        is ~1 GB at the default sample size)."""
        n, dim = x.shape
        dsub = dim // m
        sub = x.reshape(n, m, dsub).transpose(1, 0, 2)   # (m, n, dsub)
        ksub = 256
        if init is None:
            # init: distinct random points per subspace (with replacement
            # only when the sample is smaller than the codebook)
            idx = (rng.choice(n, size=ksub, replace=n < ksub))
            cents = np.ascontiguousarray(sub[:, idx, :])  # (m, 256, dsub)
        else:
            cents = np.ascontiguousarray(init, dtype=np.float32)
        sub_sq = (sub * sub).sum(2)                      # (m, n)
        chunk = 4096
        assign = np.empty((m, n), dtype=np.int64)
        for it in range(iters + 1):
            # chunked argmin over n (one extra pass yields the final
            # assignment for the updated centroids)
            cents_sq = (cents * cents).sum(2)            # (m, 256)
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                d = (sub_sq[:, lo:hi, None]
                     - 2.0 * np.einsum("mnd,mkd->mnk", sub[:, lo:hi], cents)
                     + cents_sq[:, None, :])
                assign[:, lo:hi] = d.argmin(axis=2)
            if it == iters:
                break
            for s in range(m):
                counts = np.bincount(assign[s], minlength=ksub)
                sums = np.zeros((ksub, dsub), dtype=np.float64)
                np.add.at(sums, assign[s], sub[s])
                nonzero = counts > 0
                cents[s][nonzero] = (sums[nonzero]
                                     / counts[nonzero, None])
                # re-seed empty cells from random points
                n_empty = int((~nonzero).sum())
                if n_empty:
                    cents[s][~nonzero] = sub[s][
                        rng.choice(sub.shape[1], size=n_empty)]
        return cents, assign

    # -- persistence ----------------------------------------------------
    def to_json(self) -> str:
        # format-stamped like every persisted model artifact
        # (artifact.check_format); pre-r11 IVF metas embed the untagged
        # form, which from_json still accepts as the identical legacy
        # layout
        return json.dumps({
            "format": "pq-codebook-v1",
            "centroids": self.centroids.tolist(),
            "rotation": (None if self.rotation is None
                         else self.rotation.tolist())})

    @classmethod
    def from_json(cls, s: str) -> "PQCodebook":
        from ..artifact import check_format

        d = json.loads(s)
        check_format(d, "pq-codebook-v1", "<pq-codebook json>",
                     allow_missing=True)
        rot = d.get("rotation")
        return cls(np.asarray(d["centroids"], dtype=np.float32),
                   rotation=(None if rot is None
                             else np.asarray(rot, dtype=np.float32)))

    # -- encode ---------------------------------------------------------
    def encode_udf(self):
        """pandas_udf array<float> -> array<tinyint> (codes - 128)."""
        cents = self.centroids
        m, dsub = self.m, self.dsub
        rot = self.rotation

        @F.pandas_udf(T.ArrayType(T.ByteType()))
        def _encode(vs: pd.Series) -> pd.Series:
            mask = vs.notna()
            if not mask.any():
                return pd.Series([None] * len(vs), dtype=object)
            x = np.stack(vs[mask].to_numpy()).astype(np.float32)
            if rot is not None:
                x = (x @ rot).astype(np.float32)
            sub = x.reshape(len(x), m, dsub).transpose(1, 0, 2)
            codes = np.empty((len(x), m), dtype=np.int16)
            for s in range(m):
                d = ((sub[s] * sub[s]).sum(1)[:, None]
                     - 2.0 * sub[s] @ cents[s].T
                     + (cents[s] * cents[s]).sum(1)[None, :])
                codes[:, s] = d.argmin(axis=1)
            codes = (codes - 128).astype(np.int8)
            it = iter(codes)
            return pd.Series(
                [next(it).tolist() if ok else None for ok in mask],
                dtype=object)

        return _encode

    def encode(self, df: DataFrame, vec_col: str,
               out_col: str = "__pqcode") -> DataFrame:
        return df.withColumn(out_col, self.encode_udf()(F.col(vec_col)))

    # -- decode (lossy reconstruction) ----------------------------------
    @staticmethod
    def _attach_const(df: DataFrame, name: str, value, ddl: str) -> DataFrame:
        """Ship a constant table to every row as DATA (a broadcast
        single-row cross join), NOT as literal expression nodes: a
        2048-literal CreateArray costs seconds of per-query analysis /
        codegen (measured 9 s per ADC search as literals, milliseconds
        as a LocalRelation value)."""
        one = df.sparkSession.createDataFrame([(value,)], f"{name}: {ddl}")
        return df.crossJoin(F.broadcast(one))

    def attach_decode(self, df: DataFrame, vec_col: str,
                      code_col: str = "__pqcode") -> DataFrame:
        """Adds ``vec_col`` reconstructed from ``code_col`` — all JVM;
        the codebook rides in as a broadcast value column. The code and
        codebook columns are dropped."""
        flat = self.centroids.reshape(self.m, -1).tolist()  # m x 256*dsub
        out = self._attach_const(df, "__pq_cb", flat,
                                 "array<array<float>>")
        cb = F.col("__pq_cb")
        code = F.col(code_col)

        def subvec(s):
            row = F.element_at(cb, s + 1)
            base = (code[s].cast("int") + 128) * self.dsub
            return F.transform(
                F.sequence(F.lit(1), F.lit(self.dsub)),
                lambda j: F.element_at(row, (base + j).cast("int")))

        rec = F.when(code.isNotNull(),
                     F.concat(*[subvec(s) for s in range(self.m)]))
        if self.rotation is None:
            return (out.withColumn(vec_col, rec)
                       .drop("__pq_cb", code_col))
        # OPQ: reconstruction lives in rotated space — unrotate JVM-side
        # (x̂_i = dot(R[i,:], ŷ), R shipped as a broadcast value column).
        # The rotated reconstruction is STAGED as a named column first:
        # referencing the concat expression d times would re-evaluate it
        # per output element (the documented array-lambda plumbing rule).
        out = (out.withColumn("__pq_y", rec)
               .drop("__pq_cb", code_col))
        rows = self.rotation.tolist()
        out = self._attach_const(out, "__pq_rot", rows,
                                 "array<array<float>>")
        rot = F.col("__pq_rot")
        y = F.col("__pq_y")
        unrot = F.when(y.isNotNull(), F.transform(
            F.sequence(F.lit(1), F.lit(self.dim)),
            lambda i: F.aggregate(
                F.zip_with(F.element_at(rot, i.cast("int")), y,
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, v: acc + v).cast("float")))
        return (out.withColumn(vec_col, unrot)
                   .drop("__pq_y", "__pq_rot"))

    # -- ADC ------------------------------------------------------------
    def adc_tables(self, qvec, metric: str) -> np.ndarray:
        """(m, 256) float64 lookup tables for one query: L2 -> squared
        partial distances (sum then sqrt); ip/cosine -> negative partial
        dots shifted into the engine's 1 - dot form by the caller. An
        OPQ query rotates into code space first (L2/IP are rotation-
        invariant, so distances are unchanged)."""
        q = np.asarray(qvec, dtype=np.float32)
        if self.rotation is not None:
            q = (q @ self.rotation).astype(np.float32)
        q = q.reshape(self.m, self.dsub)
        if metric == "l2":
            d = ((self.centroids - q[:, None, :]) ** 2).sum(axis=2)
        else:
            d = -(self.centroids @ q[:, :, None])[:, :, 0]
        return d.astype(np.float64)

    def attach_adc(self, df: DataFrame, qvec, metric: str,
                   score_name: str = "__score",
                   code_col: str = "__pqcode") -> DataFrame:
        """Adds the ADC distance for one query: sum over m subspaces of
        element_at(LUT_s, code[s]+129), the LUTs shipped as a broadcast
        value column (see _attach_const — literals would pay seconds of
        analysis per query). L2 takes a final sqrt; ip/cosine return the
        engine's ``1 - dot`` convention (ft.create.md:103-109)."""
        luts = self.adc_tables(qvec, metric).tolist()
        out = self._attach_const(df, "__adc_lut", luts,
                                 "array<array<double>>")
        lut = F.col("__adc_lut")
        code = F.col(code_col)
        total = F.lit(0.0)
        for s in range(self.m):
            total = total + F.element_at(
                F.element_at(lut, s + 1), (code[s].cast("int") + 129))
        if metric == "l2":
            score = F.sqrt(F.greatest(total, F.lit(0.0)))
        else:
            score = F.lit(1.0) + total     # 1 - dot (total holds -dot)
        return out.withColumn(score_name, score).drop("__adc_lut")

    def adc_score_batch(self, codes: np.ndarray, qvec,
                        metric: str) -> np.ndarray:
        """Vectorized ADC for a batch: codes (n, m) int8 -> distances."""
        luts = self.adc_tables(qvec, metric)              # (m, 256)
        idx = codes.astype(np.int16) + 128                # (n, m)
        d = luts[np.arange(self.m)[None, :], idx].sum(axis=1)
        if metric == "l2":
            return np.sqrt(np.maximum(d, 0.0))
        return 1.0 + d
