"""HNSW ANN tier: segment-local navigable small-world graphs.

The reference's flagship vector index is an hnswlib HNSW graph
(/root/reference/src/indexes/vector_hnsw.cc:315-340) — one mutable
in-memory graph per shard, searched with a beam (ef_runtime) and
filtered IN-traversal when a predicate is attached. This module is the
Spark-native restatement of that design:

- The corpus is hash-split into **segments** of bounded size
  (``max_segment_rows``); each segment builds an immutable HNSW graph
  in one ``applyInPandas`` task (numpy kernel, Malkov & Yashunin
  algorithm with the Alg-4 neighbor-selection heuristic) and persists
  it as parquet partitioned by segment id. This is the Lucene/Vespa
  per-segment-graph shape: build parallelism == segments, graph memory
  per task is capped by the segment cap, and at 100 TB the build is a
  single pass with no shuffle beyond the hash partition.
- Search fans each query out to every segment (queries are the small
  side: a broadcast cross join against the tiny segment-id range, then
  ONE cogroup with the graph parquet), beam-searches each segment
  locally, and merges per-segment top-k with a window — shuffle volume
  is |Q|·segments in and |Q|·segments·k candidate rows out, never the
  corpus.
- Inline filtering == the reference's in-traversal predicate
  (vector_hnsw.cc's filtered search): an arbitrary SQL predicate over
  payload columns is evaluated JVM-side in the segment scan into an
  ``__allowed`` mask; the beam TRAVERSES the full graph (termination
  is driven by an unfiltered working heap, so a sparse filter widens
  the explored region exactly like hnswlib's filtered search) but only
  allowed nodes are collected as results.
- Mutations mirror hnswlib's add/markDelete under the segment model:
  ``append`` builds NEW segments (graphs stay immutable), ``delete``
  writes generation tombstones that mask results without touching the
  graph (the reference marks nodes deleted in place), ``compact``
  rebuilds from live rows.

With ``ef >= segment rows`` the beam degenerates to an exhaustive
walk of each (connected) graph, so full-explore search is EXACT and
shares the brute-force oracle — the property the driver row pins.

Metrics follow vector_base.h:106-110: l2 -> euclidean, ip/cosine ->
1 - dot (cosine vectors are normalized at ingest, queries here).

Artifact paths must be LOCAL (or shared-POSIX) filesystem paths: the
graph data is written via Spark, but the meta file, tombstone listing
and compact()'s crash-safe sibling-swap use os.path/open/rename
(sources/swap.py's contract) — scheme-qualified paths (hdfs://,
s3a://) are rejected at build/load.
"""

from __future__ import annotations

import heapq
import json
import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..sources.swap import require_local_path, sibling_swap

_META = "_hnsw_meta.json"
_TOMBS = "_hnsw_tombstones"
_CENTROIDS = "_hnsw_centroids.npy"


# ---------------------------------------------------------------------------
# numpy kernel — internal distances are squared-L2 / (1 - dot); squared-L2 is
# order-isomorphic to L2 so sqrt is applied only on emitted scores
# ---------------------------------------------------------------------------

def _sqnorms(vecs: np.ndarray) -> np.ndarray:
    return (vecs * vecs).sum(axis=1)


def _kdist(vecs: np.ndarray, idx, q: np.ndarray, metric: str,
           sq=None, qq=None) -> np.ndarray:
    """Distances from q to vecs[idx]. For l2, the norm-expansion form
    ||v||² - 2v·q + ||q||² (one GEMV instead of subtract+square+sum —
    ~2x on the beam hot path; clipped at 0 against float cancellation)
    when the precomputed row norms ``sq``/``qq`` are supplied."""
    v = vecs[idx]
    if metric == "l2":
        if sq is None:
            d = v - q
            return (d * d).sum(axis=1)
        return np.maximum(sq[idx] - 2.0 * (v @ q) + qq, 0.0)
    return 1.0 - v @ q


def _emit(d: np.ndarray, metric: str) -> np.ndarray:
    return np.sqrt(np.maximum(d, 0.0)) if metric == "l2" else d


def _select_heuristic(vecs, q, cand, cap, metric, sq=None):
    """Alg. 4 neighbor selection: walk candidates by distance, keep c only
    if it is closer to q than to every already-kept neighbor (diversity),
    then fill to ``cap`` from the pruned list (keepPrunedConnections) —
    the fill is what keeps level-0 graphs connected on clustered data."""
    sel: list[tuple[float, int]] = []
    skipped: list[tuple[float, int]] = []
    for d, c in cand:
        if len(sel) >= cap:
            break
        if sel:
            ds = _kdist(vecs, np.fromiter((s for _, s in sel), dtype=np.int64),
                        vecs[c], metric, sq,
                        sq[c] if sq is not None else None)
            ok = bool((d < ds).all())
        else:
            ok = True
        (sel if ok else skipped).append((d, c))
    for d, c in skipped:
        if len(sel) >= cap:
            break
        sel.append((d, c))
    return sel


def _search_layer(vecs, nbrs, lev, q, eps, ef, metric, sq=None, qq=None,
                  visited=None, stamp=1):
    """Beam search one layer. ``eps``: sorted [(dist, node)] seeds.
    Returns ascending [(dist, node)] of the ef best reached.
    ``visited``/``stamp``: a reusable bytearray(n) scratch with a
    generation stamp — membership == (value == stamp), so the caller
    resets it by bumping the stamp instead of an O(n) clear per call
    (the clear would add O(n) traffic per insert per layer — O(n^2)
    per segment build at the 1M-row segment dial)."""
    if visited is None:
        visited = bytearray(len(vecs))
    for _, n in eps:
        visited[n] = stamp
    cand = list(eps)
    heapq.heapify(cand)
    res = [(-d, n) for d, n in eps]
    heapq.heapify(res)
    while cand:
        d, c = heapq.heappop(cand)
        if len(res) >= ef and d > -res[0][0]:
            break
        neigh = [x for x in nbrs[c][lev] if visited[x] != stamp]
        if not neigh:
            continue
        for x in neigh:
            visited[x] = stamp
        ds = _kdist(vecs, np.asarray(neigh, dtype=np.int64), q, metric,
                    sq, qq)
        for dd, nn in zip(ds.tolist(), neigh):
            if len(res) < ef or dd < -res[0][0]:
                heapq.heappush(res, (-dd, nn))
                heapq.heappush(cand, (dd, nn))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted((-nd, nn) for nd, nn in res)


def _build_graph(vecs: np.ndarray, m: int, ef_c: int, seed: int,
                 metric: str):
    """Insert-at-a-time HNSW build (Malkov & Yashunin Alg. 1).
    Returns (levels int32[n], nbrs list[node][level] -> list[int],
    entry, top_level)."""
    n = len(vecs)
    rng = np.random.RandomState(seed)
    ml = 1.0 / math.log(max(m, 2))
    levels = np.minimum(
        (-np.log(1.0 - rng.random_sample(n)) * ml).astype(np.int64), 60
    ).astype(np.int32)
    m0 = 2 * m
    nbrs = [[[] for _ in range(int(levels[i]) + 1)] for i in range(n)]
    if n == 0:
        return levels, nbrs, -1, -1
    sq = _sqnorms(vecs) if metric == "l2" else None
    entry, top = 0, int(levels[0])
    visited = bytearray(n)                     # reused stamped scratch
    stamp = 0
    for i in range(1, n):
        q = vecs[i]
        qq = sq[i] if sq is not None else None
        l = int(levels[i])
        ep = entry
        epd = float(_kdist(vecs, np.array([ep]), q, metric, sq, qq)[0])
        for lev in range(top, l, -1):          # greedy descent above l
            improved = True
            while improved:
                improved = False
                cand = nbrs[ep][lev]
                if cand:
                    ds = _kdist(vecs, np.asarray(cand, dtype=np.int64), q,
                                metric, sq, qq)
                    j = int(np.argmin(ds))
                    if ds[j] < epd:
                        ep, epd, improved = cand[j], float(ds[j]), True
        eps = [(epd, ep)]
        for lev in range(min(l, top), -1, -1):
            stamp += 1
            if stamp == 256:                   # byte stamps wrap at 255
                visited[:] = bytes(n)
                stamp = 1
            w = _search_layer(vecs, nbrs, lev, q, eps, ef_c, metric,
                              sq, qq, visited, stamp)
            cap = m0 if lev == 0 else m
            for dj, j in _select_heuristic(vecs, q, w, m, metric, sq):
                nbrs[i][lev].append(j)
                nbrs[j][lev].append(i)
                if len(nbrs[j][lev]) > cap:    # prune j with the heuristic
                    cj = np.asarray(nbrs[j][lev], dtype=np.int64)
                    ds = _kdist(vecs, cj, vecs[j], metric, sq,
                                sq[j] if sq is not None else None)
                    wj = sorted(zip(ds.tolist(), cj.tolist()))
                    nbrs[j][lev] = [
                        nd for _, nd in
                        _select_heuristic(vecs, vecs[j], wj, cap, metric,
                                          sq)]
            eps = w
        if l > top:
            entry, top = i, l
    # Reachability repair: heuristic pruning can leave a node with OUT
    # edges but zero IN edges, making it unreachable from the entry and
    # silently breaking the full-explore==exact contract. Directed BFS
    # from the entry, then each unreachable node gets one in-edge from
    # its nearest reachable node (cap overflow allowed for repair
    # edges — hnswlib tolerates the same). Orphans are rare, so the
    # per-orphan O(n) distance scan is negligible.
    reach = bytearray(n)
    reach[entry] = 1
    stack = [entry]
    while stack:
        c = stack.pop()
        for j in nbrs[c][0]:
            if not reach[j]:
                reach[j] = 1
                stack.append(j)
    if not all(reach):
        reachable = np.flatnonzero(np.frombuffer(bytes(reach),
                                                 dtype=np.uint8))
        for i in range(n):
            if reach[i]:
                continue
            ds = _kdist(vecs, reachable, vecs[i], metric, sq,
                        sq[i] if sq is not None else None)
            j = int(reachable[int(np.argmin(ds))])
            nbrs[j][0].append(i)
            # newly linked subtree becomes reachable
            reach[i] = 1
            stack = [i]
            while stack:
                c = stack.pop()
                for t in nbrs[c][0]:
                    if not reach[t]:
                        reach[t] = 1
                        stack.append(t)
            reachable = np.flatnonzero(np.frombuffer(bytes(reach),
                                                     dtype=np.uint8))
    return levels, nbrs, entry, top


def _search_graph(vecs, levels, nbrs, entry, top, q, k, ef, metric,
                  allowed=None, sq=None):
    """Full query: greedy descent to layer 1, filtered beam at layer 0.

    ``allowed`` (bool[n] or None) is the reference's in-traversal
    filter: termination is governed by an UNFILTERED working heap of
    size ef (traversal is identical to the unfiltered search), while
    results collect only allowed nodes — so a sparse filter keeps
    exploring instead of starving (vector_hnsw.cc filtered search).
    Returns ascending [(internal_dist, node)] of <= k allowed nodes."""
    if entry < 0:
        return []
    # ONE full gemv per (query, segment), then every traversal distance
    # is a plain list lookup. BLAS computes each row's dot independently
    # of the batch it rides in, and the elementwise tail ops match
    # _kdist exactly, so these are the SAME float64 values the old
    # per-expansion _kdist batches produced — precomputing removes ~50
    # small numpy round-trips per query (measured 36% of the beam
    # kernel at the bench's 500-query batch) without touching results.
    if metric == "l2":
        if sq is not None:
            d_all = np.maximum(sq - 2.0 * (vecs @ q) + (q @ q), 0.0)
        else:
            diff = vecs - q
            d_all = (diff * diff).sum(axis=1)
    else:
        d_all = 1.0 - vecs @ q
    dl = d_all.tolist()                        # unboxed floats for the loop
    ep = entry
    epd = dl[ep]
    for lev in range(top, 0, -1):
        improved = True
        while improved:
            improved = False
            cand = nbrs[ep][lev] if lev < len(nbrs[ep]) else []
            # first-minimum over the WHOLE candidate list, then one
            # jump — exactly the old np.argmin(ds) + ds[j] < epd step
            best, bd = -1, epd
            for c in cand:
                if dl[c] < bd:
                    best, bd = c, dl[c]
            if best >= 0:
                ep, epd, improved = best, bd, True
    ef = max(ef, k)
    # the bounded result heap selects on the (norm-expansion) traversal
    # distances; float cancellation (~1e-8) could pick the wrong member
    # at an exact-k boundary between NEAR-tied distinct vectors, so keep
    # a small slack and re-cut on exact distances at emission
    kres = k + 8
    visited = bytearray(len(vecs))
    visited[ep] = 1
    cand = [(epd, ep)]
    wall = [(-epd, ep)]                        # unfiltered termination heap
    res: list[tuple[float, int]] = []          # allowed-only, cap k+slack
    if allowed is None or allowed[ep]:
        res.append((-epd, -ep))
    while cand:
        d, c = heapq.heappop(cand)
        if len(wall) >= ef and d > -wall[0][0]:
            break
        neigh = [x for x in nbrs[c][0] if not visited[x]]
        if not neigh:
            continue
        for x in neigh:
            visited[x] = 1
        for nn in neigh:
            dd = dl[nn]
            if len(wall) < ef or dd < -wall[0][0]:
                heapq.heappush(wall, (-dd, nn))
                heapq.heappush(cand, (dd, nn))
                if len(wall) > ef:
                    heapq.heappop(wall)
                if allowed is None or allowed[nn]:
                    # (-dist, -node): on distance ties at the k(+slack)
                    # boundary the heap must evict the LARGEST node id
                    # so the kept set matches the (distance asc, node
                    # asc) output contract and the brute-force oracle
                    heapq.heappush(res, (-dd, -nn))
                    if len(res) > kres:
                        heapq.heappop(res)
    out = sorted((-nd, -nn) for nd, nn in res)
    if out and (sq is not None or metric != "l2"):
        # re-emit the kept slack set with the CANONICAL per-row
        # distance so the final k-cut happens on batch-independent
        # values. Two reasons: (a) l2 traversal may use the
        # norm-expansion form (cancellation error ~1e-8 near zero);
        # (b) ip/cosine traversal computes 1 - v@q as a sub-matrix
        # GEMV whose per-row summation order depends on BATCH
        # COMPOSITION — the same node scored in two beam batches (or
        # vs a full-matrix oracle) can differ by 1 ulp, which flips
        # (distance, node) tie order between EXACT-DUPLICATE vectors.
        # The elementwise (v*q).sum(axis=1) form is pairwise-summed
        # per row, so identical rows always get identical distances
        # and ties resolve by node id deterministically.
        nodes = np.fromiter((nn for _, nn in out), dtype=np.int64)
        if metric == "l2":
            diff = vecs[nodes] - q
            exact = (diff * diff).sum(axis=1)
        else:
            exact = 1.0 - (vecs[nodes] * q).sum(axis=1)
        out = sorted(zip(exact.tolist(), nodes.tolist()))
    return out[:k]


def _graph_arrays(right: pd.DataFrame, vec_col: str):
    """Reassemble one segment's graph from its parquet rows (expects
    rows already sorted by __node — build-local dense node ids)."""
    vecs = np.stack(right[vec_col].to_numpy()).astype(np.float64)
    levels = right["__level"].to_numpy()
    # .tolist() yields PYTHON ints for the set/heap-heavy beam loop
    # (list(np_array) would yield boxed numpy scalars)
    nbrs = [[lv.tolist() if hasattr(lv, "tolist") else list(lv)
             for lv in node] for node in right["__nbrs"]]
    # entry = max level, tiebreak smallest node — derived, not stored
    entry = int(np.lexsort((np.arange(len(levels)), -levels))[0])
    top = int(levels[entry]) if len(levels) else -1
    return vecs, levels, nbrs, entry, top


def _prepare_vectors(df: DataFrame, vec_col: str, cols: list[str],
                     metric: str) -> DataFrame:
    """Shared build/append vector prep: null filter, FLOAT32 cast
    (vector_base.h data_type — also guards appends from writing a
    mixed-element-type parquet dataset, which breaks the vectorized
    reader), and cosine ingest-normalization (zero vectors dropped,
    vector_base.h:46)."""
    work = df.select(*cols).where(F.col(vec_col).isNotNull())
    work = work.withColumn(vec_col, F.col(vec_col).cast("array<float>"))
    if metric == "cosine":
        norm = F.sqrt(F.aggregate(
            F.col(vec_col), F.lit(0.0),
            lambda a, x: a + x.cast("double") * x))
        work = work.withColumn(
            vec_col,
            F.when(norm > 0, F.transform(
                F.col(vec_col), lambda x: (x / norm).cast("float"))))
        work = work.where(F.col(vec_col).isNotNull())
    return work


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

class HNSWIndex:
    """Persisted per-segment HNSW graphs over one vector column."""

    def __init__(self, spark: SparkSession, path: str, vec_col: str,
                 key_col: str, metric: str, m: int, ef_construction: int,
                 n_segments: int, seed: int,
                 payload_cols: tuple[str, ...] = (), gen: int = 0,
                 quantized: bool = False, partitioner: str = "hash",
                 centroids: np.ndarray | None = None,
                 seg_map: list[list[int]] | None = None,
                 pq=None, sample_fraction: float | None = None):
        self.spark = spark
        self.path = path
        self.vec_col = vec_col
        self.key_col = key_col
        self.metric = metric
        self.m = m
        self.ef_construction = ef_construction
        self.n_segments = n_segments      # total physical segments (incl. appends)
        self.seed = seed
        self.payload_cols = tuple(payload_cols)
        self.gen = gen
        self.quantized = quantized
        # partitioner="kmeans" makes segments spatially coherent
        # (cluster -> segment, like IVF lists) so per-query routing can
        # prune segments; "hash" segments all share the global mean, so
        # they are never routable and every query beams every segment
        self.partitioner = partitioner
        self.centroids = centroids        # (n_clusters, dim) or None
        self.seg_map = seg_map            # cluster -> [physical seg ids]
        self.pq = pq                      # PQCodebook or None (PQ tier)
        # build-time KMeans fit bound, kept so compact() re-clusters at
        # the same cost profile instead of an unbounded full-corpus fit
        self.sample_fraction = sample_fraction

    def routable_segments(self) -> set[int]:
        """Physical segment ids coverable by centroid routing. Segments
        added by ``append`` after the build (and every segment of a
        hash-partitioned index) are NOT routable — search always probes
        them; ``compact`` re-clusters and restores full routability."""
        if self.seg_map is None:
            return set()
        return {s for ids in self.seg_map for s in ids}

    # -- build ----------------------------------------------------------
    @classmethod
    def build(cls, df: DataFrame, path: str, vec_col: str = "embedding",
              key_col: str = "vec_id", metric: str = "l2", m: int = 16,
              ef_construction: int = 100,
              max_segment_rows: int = 1_000_000,
              n_segments: int | None = None, seed: int = 42,
              payload_cols: tuple[str, ...] = (),
              quantize: bool = False, partitioner: str = "hash",
              sample_fraction: float | None = None,
              pq_m: int | None = None, pq_opq_iters: int = 0,
              _pq_codebook=None) -> "HNSWIndex":
        """One partition pass + one graph build per segment.

        ``max_segment_rows`` is the scale dial: it caps the numpy graph
        one executor task holds (a 1M x d float64 matrix + adjacency),
        and segment count == build/search parallelism. ``payload_cols``
        are persisted next to the graph so inline filters can be
        evaluated in the segment scan without a join.

        ``partitioner``: "hash" (default) splits rows by key hash —
        segments are statistically identical, every query must beam
        every segment, and per-query cost grows linearly with segment
        count. "kmeans" clusters rows into spatially coherent segments
        (one MLlib KMeans job, fit bounded by ``sample_fraction``; hot
        clusters are hash-split under ``max_segment_rows`` exactly like
        IVF's ``max_list_rows``) and persists per-cluster centroids, so
        ``knn_join_hnsw(..., route_segments=r)`` can prune to the r
        nearest segments per query — the SPANN/DiskANN clustered-shard
        shape, and the piece that keeps ANN cost sublinear in corpus
        size at 10^5 segments (the reference sidesteps this with one
        giant in-memory graph per shard; a 100 TB Spark corpus cannot).
        Routing changes NOTHING unless asked for: route_segments=None
        still probes everything, so the full-explore exactness contract
        is untouched.

        ``quantize=True`` stores the vector column as symmetric
        per-vector int8 (functions/quantize struct) — ~4x fewer scan
        bytes, the graph tier's dominant I/O at scale. The GRAPH is
        still built on the full-precision floats (edge selection
        quality is unchanged); only storage and search-time distances
        see quantization error (recall pinned in tests, same contract
        as IVFIndex's int8 tier).

        ``pq_m=<m>`` goes further (the IVF parity tier): product-
        quantized storage, m CODE BYTES per vector (32x smaller at
        d=64/m=8 — the DiskANN-style codes-in-RAM/graph-in-RAM dial).
        Reads reconstruct approximate floats JVM-side
        (PQCodebook.attach_decode), so every search path works
        unchanged at PQ-reconstruction precision. NOTE this trades the
        full-explore EXACTNESS contract for storage: distances on a PQ
        index are approximate at any ef (recall pinned in tests; use
        the float or int8 tier when exactness matters). Mutually
        exclusive with ``quantize``; ``append`` encodes with the FROZEN
        build-time codebook (drift caveat as IVF), ``compact`` keeps
        it (re-encoding reconstructions with the same codebook is
        stable — codes are already nearest-centroid)."""
        path = require_local_path(path, "HNSWIndex artifacts")
        if partitioner not in ("hash", "kmeans"):
            raise ValueError(f"unknown partitioner {partitioner!r}")
        if quantize and (pq_m or _pq_codebook is not None):
            raise ValueError("quantize and pq_m are mutually exclusive")
        if pq_opq_iters and not pq_m:
            raise ValueError("pq_opq_iters requires pq_m (OPQ rotates "
                             "PQ codes — nothing to rotate without them)")
        spark = df.sparkSession
        work = _prepare_vectors(df, vec_col,
                                [key_col, vec_col, *payload_cols], metric)
        if pq_m and _pq_codebook is None:
            # dim validation BEFORE the KMeans job — failing after a
            # distributed clustering fit wastes it (the ann.py rule)
            probe = work.select(F.size(F.col(vec_col))).first()
            if probe is not None and probe[0] % pq_m:
                raise ValueError(
                    f"dim {probe[0]} not divisible by m={pq_m}")
        if n_segments is None:
            n = work.count()
            if n == 0:
                raise ValueError(
                    "no indexable vectors (all null/zero) — an empty "
                    "partitioned write would be unreadable later")
            n_segments = max(1, -(-n // max_segment_rows))
        elif work.isEmpty():
            raise ValueError(
                "no indexable vectors (all null/zero) — an empty "
                "partitioned write would be unreadable later")
        centroids, seg_map = None, None
        if partitioner == "kmeans" and n_segments > 1:
            work, centroids, seg_map, n_segments = cls._kmeans_assign(
                work, vec_col, n_segments, seed, max_segment_rows,
                sample_fraction)
        else:
            if partitioner == "kmeans":      # one segment: nothing to route
                partitioner = "hash"
            work = work.withColumn(
                "__seg", F.pmod(F.xxhash64(F.col(key_col)),
                                F.lit(n_segments)).cast("int"))
        codebook = _pq_codebook
        if codebook is None and pq_m:
            from ..functions.pq import PQCodebook

            if pq_opq_iters:
                # OPQ (Ge et al.): learned rotation, same code bytes,
                # better recall on correlated embeddings — IVF parity
                codebook = PQCodebook.train_opq(work, vec_col, m=pq_m,
                                                seed=seed,
                                                opq_iters=pq_opq_iters)
            else:
                codebook = PQCodebook.train(work, vec_col, m=pq_m,
                                            seed=seed)
        index = cls(spark, path, vec_col, key_col, metric, m,
                    ef_construction, n_segments, seed,
                    payload_cols=tuple(payload_cols), gen=0,
                    quantized=quantize, partitioner=partitioner,
                    centroids=centroids, seg_map=seg_map, pq=codebook,
                    sample_fraction=sample_fraction)
        graph = index._build_segments(work, gen=0)
        graph = index._quantize_storage(graph)
        graph.write.mode("overwrite").partitionBy("__seg").parquet(path)
        index._save_meta()
        return index

    def _quantize_storage(self, graph: DataFrame) -> DataFrame:
        """Apply the storage tier to a float graph frame: int8 struct
        or PQ code bytes, both kept under the vec column's NAME so the
        parquet layout is tier-agnostic."""
        if self.quantized:
            from ..functions.quantize import quantize_vector_expr

            return graph.withColumn(
                self.vec_col, quantize_vector_expr(F.col(self.vec_col)))
        if self.pq is not None:
            return graph.withColumn(
                self.vec_col, self.pq.encode_udf()(F.col(self.vec_col)))
        return graph

    @staticmethod
    def _kmeans_assign(work: DataFrame, vec_col: str, n_segments: int,
                       seed: int, max_segment_rows: int,
                       sample_fraction: float | None):
        """Cluster rows into spatially coherent segments (the IVF list
        recipe, ann.py): one KMeans fit (sample-bounded), assignment of
        every row, and a deterministic hash-split of clusters whose
        (summary-estimated) size exceeds ``max_segment_rows`` — targeting
        ~75% fill so hash fluctuation stays under the numpy-graph memory
        cap. Returns (assigned work, centroid matrix, cluster->physical
        seg ids, total physical segments)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = work.withColumn("__feat", array_to_vector(
            F.col(vec_col).cast("array<double>")))
        fit_on = feats.sample(sample_fraction, seed=seed) \
            if sample_fraction else feats
        model = KMeans(k=n_segments, seed=seed, maxIter=20,
                       featuresCol="__feat",
                       predictionCol="__seg").fit(fit_on)
        assigned = (model.transform(feats).drop("__feat")
                    .withColumn("__seg", F.col("__seg").cast("int")))
        seg_map = [[c] for c in range(n_segments)]
        sizes = [int(s) for s in model.summary.clusterSizes]
        if sample_fraction:
            sizes = [int(s / sample_fraction) for s in sizes]
        nxt = n_segments
        remap = F.col("__seg")
        for c, cnt in enumerate(sizes):
            if cnt <= max_segment_rows:
                continue
            s = max(2, -(-cnt // max(1, int(0.75 * max_segment_rows))))
            ids = [c] + list(range(nxt, nxt + s - 1))
            nxt += s - 1
            seg_map[c] = ids
            sub = F.pmod(F.xxhash64(F.col(vec_col)), F.lit(s))
            remap = F.when(
                F.col("__seg") == c,
                F.element_at(F.array(*[F.lit(i) for i in ids]),
                             sub.cast("int") + 1)).otherwise(remap)
        if nxt > n_segments:
            assigned = assigned.withColumn("__seg",
                                           remap.cast("int"))
        centroids = np.vstack([np.asarray(c)
                               for c in model.clusterCenters()])
        return assigned, centroids, seg_map, nxt

    def _graph_schema(self, work: DataFrame) -> T.StructType:
        fields = [T.StructField("__seg", T.IntegerType()),
                  T.StructField("__node", T.IntegerType()),
                  work.schema[self.key_col],
                  work.schema[self.vec_col]]
        for c in self.payload_cols:
            fields.append(work.schema[c])
        fields += [T.StructField("__level", T.IntegerType()),
                   T.StructField("__nbrs", T.ArrayType(
                       T.ArrayType(T.IntegerType()))),
                   T.StructField("__gen", T.IntegerType())]
        return T.StructType(fields)

    def _build_segments(self, work: DataFrame, gen: int) -> DataFrame:
        """groupBy(__seg).applyInPandas graph build; rows within a segment
        are sorted by key first so node ids (and thus tiebreaks and the
        graph itself) are deterministic under any input partitioning."""
        vec_col, key_col = self.vec_col, self.key_col
        payload = self.payload_cols
        m, ef_c, seed, metric = (self.m, self.ef_construction, self.seed,
                                 self.metric)
        schema = self._graph_schema(work)

        def build_seg(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(key_col).reset_index(drop=True)
            seg = int(pdf["__seg"].iloc[0])
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            levels, nbrs, _entry, _top = _build_graph(
                vecs, m, ef_c, seed + seg, metric)
            out = pd.DataFrame({
                "__seg": np.full(len(pdf), seg, dtype=np.int32),
                "__node": np.arange(len(pdf), dtype=np.int32),
                key_col: pdf[key_col],
                vec_col: pdf[vec_col],
            })
            for c in payload:
                out[c] = pdf[c]
            out["__level"] = levels
            out["__nbrs"] = [nbrs[i] for i in range(len(pdf))]
            out["__gen"] = np.int32(gen)
            return out

        return work.groupBy("__seg").applyInPandas(build_seg, schema)

    # -- persistence ------------------------------------------------------
    def _save_meta(self) -> None:
        # versioned like the reference's RDB chunks
        # (src/rdb_serialization.cc): load rejects a foreign tag with a
        # versioned error instead of deserializing garbage
        meta = {"format": "hnsw-index-v1",
                "vec_col": self.vec_col, "key_col": self.key_col,
                "metric": self.metric, "m": self.m,
                "ef_construction": self.ef_construction,
                "n_segments": self.n_segments, "seed": self.seed,
                "payload_cols": list(self.payload_cols), "gen": self.gen,
                "quantized": self.quantized,
                "partitioner": self.partitioner,
                # the centroid matrix lives in a BINARY sidecar: at the
                # 10^5-cluster design point a JSON inlining (the old
                # form, still readable below) would be ~GBs re-written
                # on every mutation and json.loads'd on every load
                "centroids": (_CENTROIDS
                              if self.centroids is not None else None),
                "seg_map": self.seg_map,
                "pq": self.pq.to_json() if self.pq is not None else None,
                "sample_fraction": self.sample_fraction}
        if self.centroids is not None:
            np.save(os.path.join(self.path, _CENTROIDS),
                    np.asarray(self.centroids, dtype=np.float64))
        with open(os.path.join(self.path, _META), "w") as fh:
            json.dump(meta, fh)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "HNSWIndex":
        path = require_local_path(path, "HNSWIndex artifacts")
        with open(os.path.join(path, _META)) as fh:
            meta = json.load(fh)
        # pre-r10 artifacts carry no tag but the identical v1 layout
        from ..artifact import check_format

        check_format(meta, "hnsw-index-v1", path)
        cents = meta.get("centroids")
        if cents == _CENTROIDS:                    # binary sidecar form
            cents = np.load(os.path.join(path, _CENTROIDS))
        pq = None
        if meta.get("pq"):
            from ..functions.pq import PQCodebook

            pq = PQCodebook.from_json(meta["pq"])
        return cls(spark, path, meta["vec_col"], meta["key_col"],
                   meta["metric"], meta["m"], meta["ef_construction"],
                   meta["n_segments"], meta["seed"],
                   payload_cols=tuple(meta.get("payload_cols", ())),
                   gen=meta.get("gen", 0),
                   quantized=meta.get("quantized", False),
                   partitioner=meta.get("partitioner", "hash"),
                   centroids=(np.asarray(cents, dtype=np.float64)
                              if cents is not None else None),
                   seg_map=meta.get("seg_map"), pq=pq,
                   sample_fraction=meta.get("sample_fraction"))

    # -- reads ------------------------------------------------------------
    def _read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def _tomb_path(self) -> str:
        return os.path.join(self.path, _TOMBS)

    def _tombstones(self) -> DataFrame | None:
        if not os.path.isdir(self._tomb_path()):
            return None
        return self.spark.read.parquet(self._tomb_path())

    def _with_alive(self, df: DataFrame) -> DataFrame:
        """Mark each row __alive: dead iff a tombstone for its key exists
        at gen >= the row's own gen (later appends re-insert). One
        broadcast join against the tiny tombstone table — the graph is
        never rewritten, exactly hnswlib's markDelete economics."""
        tombs = self._tombstones()
        if tombs is None:
            return df.withColumn("__alive", F.lit(True))
        t = (tombs.groupBy(F.col(self.key_col).alias("__tkey"))
                  .agg(F.max("__tgen").alias("__tgen")))
        return (df.join(F.broadcast(t),
                        df[self.key_col] == F.col("__tkey"), "left")
                  .withColumn("__alive", F.col("__tgen").isNull()
                              | (F.col("__tgen") < F.col("__gen")))
                  .drop("__tkey", "__tgen"))

    def _dequantized(self, df: DataFrame) -> DataFrame:
        if self.quantized:
            from ..functions.quantize import dequantize_vector_expr

            return df.withColumn(
                self.vec_col,
                dequantize_vector_expr(F.col(self.vec_col))
                .cast("array<float>"))
        if self.pq is not None:
            # JVM reconstruction from code bytes (broadcast codebook)
            df = df.withColumnRenamed(self.vec_col, "__pqcode")
            out = self.pq.attach_decode(df, self.vec_col,
                                        code_col="__pqcode")
            return out.withColumn(
                self.vec_col, F.col(self.vec_col).cast("array<float>"))
        return df

    def scan_raw(self) -> DataFrame:
        """Live rows with original columns (key, vector, payloads);
        quantized storage is dequantized on read (JVM expression)."""
        df = self._with_alive(self._read()).where(F.col("__alive"))
        return self._dequantized(df).select(
            self.key_col, self.vec_col, *self.payload_cols)

    # -- mutations ----------------------------------------------------------
    def append(self, df: DataFrame, n_new_segments: int = 1) -> None:
        """New rows -> NEW segments (graphs are immutable, the Lucene
        model); a re-appended key outlives any older tombstone for it
        (generation check). Size appended batches like build segments;
        frequent tiny appends -> many tiny graphs -> call compact().
        Appended segments are hash-assigned and therefore NOT routable
        (every routed search still probes them in full); compact()
        re-clusters them back under the centroids."""
        self.gen += 1
        work = _prepare_vectors(
            df, self.vec_col,
            [self.key_col, self.vec_col, *self.payload_cols], self.metric)
        base = self.n_segments
        work = work.withColumn(
            "__seg", (F.lit(base) + F.pmod(F.xxhash64(F.col(self.key_col)),
                                           F.lit(n_new_segments))).cast("int"))
        graph = self._build_segments(work, gen=self.gen)
        # same storage tier as the build (int8 expr or the FROZEN PQ
        # codebook — the IVF append contract)
        graph = self._quantize_storage(graph)
        graph.write.mode("append").partitionBy("__seg").parquet(self.path)
        self.n_segments = base + n_new_segments
        self._save_meta()

    def delete(self, keys) -> None:
        """Generation tombstones; the graphs keep the nodes (they still
        route traversal, like hnswlib's soft deletes) but search masks
        them out of results."""
        self.gen += 1
        if isinstance(keys, DataFrame):
            kdf = keys.select(F.col(keys.columns[0]).alias(self.key_col))
        else:
            kdf = self.spark.createDataFrame(
                [(k,) for k in keys], [self.key_col])
        (kdf.withColumn("__tgen", F.lit(self.gen))
            .write.mode("append").parquet(self._tomb_path()))
        self._save_meta()

    def upsert(self, df: DataFrame, n_new_segments: int = 1) -> None:
        """Replace-by-key: tombstone the incoming keys, then append the
        rows as new segments at a LATER generation (so the fresh rows
        outlive their own tombstones) — the reference's AddRecord
        replace path, and the contract DocumentStore's ann_indexes
        mirror drives (streaming/ingest.py)."""
        self.delete(df.select(self.key_col))
        self.append(df, n_new_segments=n_new_segments)

    def compact(self, max_segment_rows: int = 1_000_000) -> None:
        """Rebuild live rows into fresh right-sized segments and drop
        tombstones. The rebuild happens in a staging dir, so a crash
        BEFORE the swap leaves the live index untouched; the swap
        itself is two local renames with a narrow window where the old
        index sits at ``<path>.old`` (recover by moving it back —
        same recovery contract as merge_parquet/IVFIndex.compact).
        Cosine rows are already ingest-normalized (idempotent)."""
        live = self.scan_raw()
        staging = self.path.rstrip("/") + ".compact"
        # a kmeans index keeps its routing granularity (cluster count)
        # across compactions — deriving it from rows/cap alone could
        # collapse a small index to one unroutable segment
        n_seg = (len(self.seg_map)
                 if self.partitioner == "kmeans" and self.seg_map
                 else None)
        rebuilt = HNSWIndex.build(
            live, staging, vec_col=self.vec_col, key_col=self.key_col,
            metric=self.metric, m=self.m,
            ef_construction=self.ef_construction,
            max_segment_rows=max_segment_rows, n_segments=n_seg,
            seed=self.seed, payload_cols=self.payload_cols,
            quantize=self.quantized, partitioner=self.partitioner,
            _pq_codebook=self.pq,
            sample_fraction=self.sample_fraction)
        sibling_swap(self.path, staging)
        self.n_segments = rebuilt.n_segments
        # re-clustering folds appended (non-routable) segments back
        # under fresh centroids — routability is fully restored
        self.partitioner = rebuilt.partitioner
        self.centroids = rebuilt.centroids
        self.seg_map = rebuilt.seg_map
        self.gen = 0
        self._save_meta()

    # -- search -------------------------------------------------------------
    def search(self, qvec: list[float], k: int = 10, ef: int = 64,
               where=None, route_segments: int | None = None) -> DataFrame:
        """Single-query convenience over ``knn_join_hnsw``: returns
        (key_col, __score) — scores in the reference convention.
        ``where``: SQL string or Column over the payload columns."""
        q = self.spark.createDataFrame(
            [(0, [float(x) for x in qvec])],
            T.StructType([
                T.StructField("__qid", T.LongType()),
                T.StructField(self.vec_col, T.ArrayType(T.FloatType()))]))
        out = knn_join_hnsw(q, self, k=k, ef=ef, where=where,
                            query_key="__qid",
                            route_segments=route_segments)
        return out.select(self.key_col, F.col("distance").alias("__score"))


def _route_queries(qside: DataFrame, index: HNSWIndex,
                   r: int) -> DataFrame:
    """Assign each query its ``r`` nearest segment centroids (one Arrow
    matmul against the broadcast centroid matrix — the IVF probe_lists
    recipe) expanded to physical sub-segments, PLUS every non-routable
    segment (post-build appends), exploded to (query, __seg) rows."""
    cents = index.centroids
    seg_map = index.seg_map
    metric = index.metric
    non_routable = sorted(set(range(index.n_segments))
                          - index.routable_segments())

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_segs(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        q = np.stack(vs.to_numpy()).astype(np.float64)
        if metric == "cosine":
            n = np.linalg.norm(q, axis=1, keepdims=True)
            n[n == 0] = 1.0
            q = q / n
        # ALWAYS euclidean: segment membership was decided by euclidean
        # KMeans (on ingest-normalized vectors for cosine), so routing
        # must use the SAME rule — a dot-product ranking against the
        # non-unit centroids can send a corpus member's own vector away
        # from its own segment (centroid norms skew argmax dot)
        d = ((q * q).sum(1)[:, None] - 2.0 * (q @ cents.T)
             + (cents * cents).sum(1)[None, :])
        idx = np.argsort(d, axis=1)[:, :r]
        return pd.Series([
            np.array([p for c in row for p in seg_map[c]]
                     + non_routable, dtype="int32")
            for row in idx])

    return qside.withColumn("__seg", F.explode(probe_segs(F.col("__qvec"))))


def knn_join_hnsw(queries: DataFrame, index: HNSWIndex, k: int = 10,
                  ef: int = 64, where=None,
                  query_key: str = "qid",
                  query_vec_col: str | None = None,
                  route_segments: int | None = None) -> DataFrame:
    """Batch KNN join against the segment graphs.

    Plan shape: queries fan out to segment ids (a broadcast of at most
    ``n_segments`` ints — no corpus job), cogroup with the graph parquet
    on segment id, one beam search per (segment, query) inside the
    Arrow kernel, then a global (distance, key) window top-k. The graph
    side never shuffles more than its own parquet scan; parallelism ==
    segments (size segments to >= cluster cores, same dial as IVF
    lists). ``where`` is an arbitrary SQL predicate over the persisted
    payload columns, evaluated JVM-side in the scan and honored
    IN-traversal (reference inline filtering); deleted rows are masked
    through the same path. Output: query_key, key_col, distance, rank.
    Duplicate query keys keep per-row semantics — each input row gets
    its own top-k (the reduce windows on a per-row query index).

    ``route_segments``: None (default) probes EVERY segment — required
    for the full-explore exactness contract, and the only option on a
    hash-partitioned index. An int r on a ``partitioner="kmeans"``
    index prunes each query to its r nearest segment centroids (the IVF
    probe trick, one Arrow matmul against the tiny broadcast centroid
    matrix) plus every non-routable segment (post-build appends) — so
    per-query cost stays ~r·beam as the corpus (and segment count)
    grows, instead of linear in corpus size. The pruned graph scan is
    partition-pruned to the probed-segment union. r >= the cluster
    count degrades gracefully to the full probe. The routed probe
    frame is persisted so the partition-prune job and the cogroup see
    ONE evaluation of the query lineage — both a correctness guard
    (a nondeterministic query frame must not route differently per
    job) and the cost fix for expensive upstream lineages.

    Null handling: query rows with a null key OR null vector are
    DROPPED up front (a null vector has no distance to anything; a null
    key would make its results unattributable) — callers that need
    every input query represented should pre-filter and count, same
    convention as the documented corpus-side null handling in
    ``HNSWIndex.build``.
    """
    from pyspark.sql.window import Window

    qvec = query_vec_col or index.vec_col
    vec_col = index.vec_col
    key_col = index.key_col
    metric = index.metric
    kk, eff = int(k), max(int(ef), int(k))

    # per-ROW query index: duplicate query keys each keep their own
    # top-k (matching knn_join's broadcast semantics, r10 fix)
    qside = (queries.select(query_key, F.col(qvec).alias("__qvec"))
             .dropna()
             .withColumn("__qidx", F.monotonically_increasing_id()))
    n_clusters = len(index.seg_map) if index.seg_map is not None else 0
    if route_segments is not None and route_segments < 1:
        raise ValueError(
            f"route_segments must be >= 1 (got {route_segments}); "
            "pass None to probe every segment")
    routed = route_segments is not None and route_segments < n_clusters
    if routed:
        # persist pins ONE evaluation of the query lineage + routing
        # UDF: the driver-side probed-segment distinct below and the
        # cogroup must see the SAME assignments — a nondeterministic
        # query frame (sample(), rand()-derived) re-evaluated per job
        # could route a query to a segment the scan was pruned away
        # from, silently dropping its results. Spark's ContextCleaner
        # unpersists the block once the frame is unreferenced.
        probed = _route_queries(qside, index,
                                int(route_segments)).persist()
    else:
        if route_segments is not None and index.centroids is None:
            raise ValueError(
                "route_segments needs a kmeans-partitioned index "
                "(HNSWIndex.build(..., partitioner='kmeans')): hash "
                "segments all share the global mean, so centroid "
                "routing cannot prune them")
        seg_ids = index.spark.range(index.n_segments).select(
            F.col("id").cast("int").alias("__seg"))
        probed = qside.crossJoin(F.broadcast(seg_ids))

    from pyspark.sql import Column

    graph = index._dequantized(index._with_alive(index._read()))
    if routed:
        # partition-prune the graph scan to the probed-segment union —
        # a driver-side distinct of at most n_segments ints (the only
        # driver materialization on this path, same as IVF's)
        segs = [r[0] for r in probed.select("__seg").distinct().collect()]
        graph = graph.where(F.col("__seg").isin(segs))
    allowed = F.col("__alive")
    if where is not None:
        allowed = allowed & (where if isinstance(where, Column)
                             else F.expr(where))
    graph = graph.select(
        "__seg", "__node", key_col, vec_col, "__level", "__nbrs",
        allowed.alias("__ok"))

    qkey_field = queries.schema[query_key]
    ckey_type = graph.schema[key_col].dataType
    cand_schema = T.StructType([
        T.StructField("__qidx", T.LongType()),
        qkey_field, T.StructField(key_col, ckey_type),
        T.StructField("distance", T.DoubleType())])

    def search_seg(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = ["__qidx", query_key, key_col, "distance"]
        if left.empty or right.empty:
            return pd.DataFrame(columns=cols)
        right = right.sort_values("__node").reset_index(drop=True)
        vecs, levels, nbrs, entry, top = _graph_arrays(right, vec_col)
        sq = _sqnorms(vecs) if metric == "l2" else None
        keys = right[key_col].to_numpy()
        okv = right["__ok"].to_numpy()
        mask = None if bool(okv.all()) else okv.astype(bool)
        qixs, qids, rkeys, dists = [], [], [], []
        for qix, qid, qv in zip(left["__qidx"].to_numpy(),
                                left[query_key].to_numpy(),
                                left["__qvec"].to_numpy()):
            q = np.asarray(qv, dtype=np.float64)
            if metric == "cosine":
                n = np.linalg.norm(q)
                if n > 0:
                    q = q / n
            hits = _search_graph(vecs, levels, nbrs, entry, top, q,
                                 kk, eff, metric, allowed=mask, sq=sq)
            for d, node in hits:
                qixs.append(qix)
                qids.append(qid)
                rkeys.append(keys[node])
                dists.append(d)
        d = np.asarray(dists, dtype=np.float64)
        return pd.DataFrame({"__qidx": qixs, query_key: qids,
                             key_col: rkeys,
                             "distance": _emit(d, metric)}, columns=cols)

    cand = (probed.groupBy("__seg")
            .cogroup(graph.groupBy("__seg"))
            .applyInPandas(search_seg, cand_schema))
    # window on the per-ROW query index (not query_key): duplicate keys
    # each keep their own top-k, same r10 fix as the IVF/flipped paths
    w = Window.partitionBy("__qidx").orderBy(
        F.col("distance").asc(), F.col(key_col).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= kk)
                .select(query_key, key_col, "distance", "rank"))
