"""FT.SEARCH execution: filter -> (KNN) -> sort -> limit, as one
declarative DataFrame plan.

The reference's multi-stage lifecycle (parse on main thread, predicate
-> index-fetcher planning, reader-pool execution, content resolution —
SURVEY.md §3.1) collapses here to: parse -> build plan -> Catalyst. Its
planner heuristics (min-cardinality AND child, pre-filter-vs-inline KNN,
/root/reference/src/query/planner.cc:21-46) are mostly Catalyst's job;
the one surviving custom decision — pre-filter exact vs inline-filtered
ANN — lives in plans/planner.py and the chooser below.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog, FieldDef, IndexSchema, NumericField, TagField, TextField, num_col, vec_col, VectorField
from ..errors import QuerySyntaxError, UnknownFieldError
from ..functions.distance import distance_column
from ..parser.ast import (
    And, MatchAll, ParsedQuery, Proximity, TextPred, TERM,
    query_operation_flags,
)
from ..parser.filter_parser import parse_query
from ..plans.predicate_translator import PredicateTranslator, QueryLimits

# cap applied when an explicitly-unbounded reply call (limit n = None)
# still needs a physical limit for plan-shape reasons (see _finish).
# NOT Int.MaxValue or adjacent: near the topKSortFallbackThreshold the
# planner abandons TakeOrderedAndProject for a range-partitioned Sort
# (and EliminateLimits drops Limit(Int.MaxValue) outright), re-exposing
# the sort double-execution this cap exists to prevent — verified by the
# observed-count test; 2e9 keeps the TakeOrderedAndProject shape
_OBSERVED_LIMIT_CAP = 2_000_000_000


@dataclass
class ReturnField:
    """RETURN n f [AS a] (/root/reference/src/query/search.h:82-86)."""

    name: str
    alias: str | None = None


def _apply_predicate(df: DataFrame, translator: PredicateTranslator,
                     pred) -> DataFrame:
    """Apply a predicate as (JVM candidate filter) -> barrier -> (Python
    kernel filter) when it contains fuzzy/proximity leaves, so the Arrow
    transfer and the Python kernels see candidates, not the corpus. The
    rand() projection is a deterministic-optimization barrier: Catalyst
    neither combines the two Filters nor pushes the UDF filter below it."""
    jvm, udf = translator.translate_staged(pred)
    if udf is None:
        return df.filter(jvm)
    if jvm is not None:
        df = df.filter(jvm)
    return (df.withColumn("__barrier", F.rand(seed=0))
              .filter(udf).drop("__barrier"))


class SearchEngine:
    """The FT.* command surface over Spark DataFrames
    (command registry /root/reference/src/commands/commands.h:77)."""

    def __init__(self, spark: SparkSession, limits: QueryLimits | None = None):
        self.spark = spark
        self.catalog = Catalog()
        self.limits = limits or QueryLimits()
        # INFO SEARCH query/latency counters
        # (docs/topics/search-observables.md `query` + `latency` sections)
        from collections import Counter

        self._metrics: "Counter[str]" = Counter()
        # per-request parse state for the metrics classification —
        # THREAD-LOCAL: concurrent ft_search calls (multi-client
        # serving) must not classify each other's queries
        import threading

        self._req = threading.local()

    # -- DDL ---------------------------------------------------------------
    def ft_create(self, name: str, df: DataFrame, fields: list[FieldDef],
                  key_column: str | None = None, cache: bool = False,
                  prederived: bool = False,
                  on_json: str | None = None,
                  prefixes: list[str] | None = None) -> IndexSchema:
        """``on_json=<column>`` declares the ON-JSON document model
        (/root/reference/src/attribute_data_type.h:114-139): fields whose
        identifier starts with ``$`` are JSONPaths into that JSON-text
        column and require an AS alias, exactly like FT.CREATE ... ON JSON
        SCHEMA $.path AS name TYPE. Non-$ fields still bind to ordinary
        frame columns, so hybrid frames work."""
        lim = self.limits
        # FT.CREATE validations (ft_create_parser.cc:244,384,404,623,781)
        if len(fields) > lim.max_attributes:
            raise QuerySyntaxError(
                f"Index has {len(fields)} attributes, exceeds max-attributes "
                f"{lim.max_attributes}")
        if prefixes and len(prefixes) > lim.max_prefixes:
            raise QuerySyntaxError(
                f"The number of prefixes ({len(prefixes)}) exceeds the "
                f"maximum allowed ({lim.max_prefixes})")
        for f in fields:
            if isinstance(f, TagField) and len(f.name) > lim.max_tag_field_length:
                raise QuerySyntaxError(
                    f"A tag field can have a maximum length of "
                    f"{lim.max_tag_field_length}.")
            if (type(f) is NumericField
                    and len(f.name) > lim.max_numeric_field_length):
                raise QuerySyntaxError(
                    f"A numeric field can have a maximum length of "
                    f"{lim.max_numeric_field_length}.")
            if isinstance(f, TextField) and f.weight != 1.0:
                # compat-only knob, pinned like the reference
                # (ft_create_parser.cc:528-531)
                raise QuerySyntaxError(
                    "The `WEIGHT` clause with a value other than `1.0` is "
                    "not supported.")
            if isinstance(f, VectorField) and not (
                    1 <= f.dim <= lim.max_vector_dimensions):
                raise QuerySyntaxError(
                    f"The dimensions value must be a positive integer "
                    f"greater than 0 and less than or equal to "
                    f"{lim.max_vector_dimensions}.")
        if on_json is not None:
            for f in fields:
                if f.name.startswith("$"):
                    if not f.alias:
                        raise QuerySyntaxError(
                            f"JSONPath identifier `{f.name}` requires AS alias")
                    f.json_source = on_json
        return self.catalog.create(
            IndexSchema(name, df, fields, key_column, cache=cache,
                        prederived=prederived,
                        prefixes=tuple(prefixes) if prefixes else None))

    def ft_build_ann(self, index: str, attr: str, path: str,
                     n_lists: int = 64, sample_fraction: float | None = None,
                     seed: int = 42, algorithm: str = "ivf",
                     **build_kwargs):
        """Build the ANN artifact for a VECTOR field — the Spark-batch
        equivalent of the reference's HNSW graph build
        (/root/reference/src/indexes/vector_hnsw.cc).

        ``algorithm="ivf"`` (default): parquet partitioned by centroid
        list; ft_search probes it when ``ann_nprobe`` is given (or via
        the EF_RUNTIME mapping). ``algorithm="hnsw"``: segment-local
        navigable-small-world graphs (operators/hnsw.py) — the
        reference's actual index shape — honoring the field's
        M / EF_CONSTRUCTION declaration; ft_search beams through it
        when ``ann_ef`` or the query's EF_RUNTIME is given. Every
        indexed column is persisted alongside the graph so hybrid
        predicates evaluate inline, in-traversal, exactly like the
        reference's filtered HNSW search.

        The index key column rides along as the artifact's mutation key,
        so both artifact kinds support append/delete by document key
        (the reference's live AddRecord/RemoveRecord surface). Extra
        kwargs pass through to the builder (IVF: ``quantize``, ``pq_m``,
        ``max_list_rows``; HNSW: ``m``, ``ef_construction``,
        ``max_segment_rows``)."""
        schema = self.catalog.get(index)
        fdef = schema.field(attr)
        if not isinstance(fdef, VectorField):
            raise QuerySyntaxError(f"field `{attr}` is not VECTOR")
        reserved = {"vec_col", "metric", "key_col"} & set(build_kwargs)
        if reserved:
            raise QuerySyntaxError(
                f"ft_build_ann sets {sorted(reserved)} itself — the "
                "engine owns the vector column, metric and document key")
        df = schema.indexed_df()  # _v_<attr> is validated (+normalized if cosine)
        if algorithm == "hnsw":
            from .hnsw import HNSWIndex

            vcol = vec_col(fdef.attr)
            # payload = ONLY the predicate-visible derived index columns
            # (tag arrays, numeric doubles, token/stem structs, field
            # masks): inline filters compile against these, never raw
            # source columns or other fields' vectors — persisting the
            # whole frame would duplicate the corpus inside the artifact
            payload = tuple(
                c for c in df.columns
                if c.startswith(("_t_", "_n_", "_x_", "_s_", "_sp_",
                                 "__fm_")))
            build_kwargs.setdefault("m", fdef.m)
            build_kwargs.setdefault("ef_construction", fdef.ef_construction)
            art = HNSWIndex.build(df, path, vec_col=vcol,
                                  key_col="__key", metric=fdef.metric,
                                  seed=seed, payload_cols=payload,
                                  sample_fraction=sample_fraction,
                                  **build_kwargs)
        elif algorithm == "ivf":
            from .ann import IVFIndex

            art = IVFIndex.build(df, path, vec_col=vec_col(fdef.attr),
                                 metric=fdef.metric, n_lists=n_lists,
                                 sample_fraction=sample_fraction, seed=seed,
                                 key_col="__key", **build_kwargs)
        else:
            raise QuerySyntaxError(
                f"unknown ANN algorithm `{algorithm}` (ivf | hnsw)")
        if not hasattr(schema, "_ann"):
            schema._ann = {}
        schema._ann[fdef.attr] = art
        return art

    def ft_explain(self, index: str, query: str,
                   params: dict | None = None, **kwargs) -> dict:
        """Plan inspection for a query — the debugging surface a
        Spark-native engine can offer that the reference cannot:
        the parsed predicate, the KNN clause and the planner's
        pre-filter-vs-inline decision, the executed physical plan,
        the filters PUSHED into the parquet scan, and the count of
        Python (Arrow) stages and exchanges. Builds the same lazy plan
        as ``ft_search`` (same kwargs) without executing it; the only
        work is Catalyst analysis plus any planner selectivity probe
        the query itself would run."""
        import re as _re

        if kwargs.get("count_only") or kwargs.get("_observe_total"):
            raise ValueError(
                "ft_explain inspects a plan without executing; "
                "count_only/_observe_total would run the query")
        # _ft_search (not ft_search): an explain must not count as a
        # served request — and the explaining flag suppresses the two
        # strategy counters _ft_search itself bumps. The ANN-mode
        # record rides the THREAD-LOCAL request state, so concurrent
        # searches cannot misclassify this query (metric deltas would).
        self._req.explaining = True
        try:
            df = self._ft_search(index, query, params=params, **kwargs)
        finally:
            self._req.explaining = False
        parsed = self._req.parsed
        plan = df._jdf.queryExecution().executedPlan().toString()
        # plan toString truncates long scan lines: capture to the
        # closing bracket OR line end, and DROP a trailing fragment
        # that lost its bracket mid-token
        pushed = []
        for m in _re.finditer(r"PushedFilters: \[([^\]\n]*)(\]?)", plan):
            items = [f for f in m.group(1).split(", ") if f]
            if m.group(2) != "]" and items:
                items = items[:-1]          # truncated mid-item
            pushed.extend(f for f in items if f != "...")
        knn = None
        if parsed.knn is not None:
            knn = {"attr": parsed.knn.attr, "k": parsed.knn.k,
                   "mode": self._req.ann_mode}
        return {
            "predicate": repr(parsed.predicate),
            "operations": sorted(query_operation_flags(self._req.pred)),
            "knn": knn,
            "pushed_filters": pushed,
            "python_stages": len(_re.findall(
                r"ArrowEvalPython|BatchEvalPython|MapInPandas", plan)),
            # ReusedExchange is a re-read, not a second shuffle
            "exchanges": len(_re.findall(r"(?<!Reused)Exchange ", plan)),
            "physical_plan": plan,
        }

    def ft_dropindex(self, name: str) -> None:
        self.catalog.drop(name)

    def ft_list(self) -> list[str]:
        return self.catalog.list()

    def ft_info(self, name: str, compute_stats: bool = False) -> dict:
        return self.catalog.info(name, compute_stats=compute_stats)

    def _run_with_timeout(self, action, timeout_ms: int | None):
        """Run an eager Spark action under a TIMEOUT budget: the call's
        jobs run in a dedicated job group that a timer cancels at the
        deadline (ft.search.md TIMEOUT — the reference returns a timeout
        error; the fanout partial-result modes have no single-engine
        analogue). Lazy ft_search calls return plans, so the budget
        applies where execution happens: count_only and reply paths."""
        if not timeout_ms:
            return action()
        import threading
        import uuid

        from ..errors import SearchTimeoutError

        sc = self.spark.sparkContext
        group = f"vss-timeout-{uuid.uuid4().hex[:12]}"
        sc.setJobGroup(group, f"ft_search TIMEOUT {timeout_ms}ms",
                       interruptOnCancel=True)
        stop = threading.Event()
        fired = threading.Event()

        def canceller():
            # past the deadline, cancel REPEATEDLY until the action ends:
            # a single cancel is a no-op for jobs submitted after it fires
            # (driver-side planning can outlast a short budget)
            if not stop.wait(timeout_ms / 1000.0):
                fired.set()
                while not stop.is_set():
                    sc.cancelJobGroup(group)
                    stop.wait(0.05)

        t = threading.Thread(target=canceller, daemon=True)
        t.start()
        try:
            return action()
        except Exception as e:                    # noqa: BLE001
            # translate to a timeout ONLY when our canceller actually
            # fired AND the failure is the resulting job cancellation —
            # a genuine error that merely mentions "cancel" (or an error
            # racing the deadline) surfaces unchanged, with its cause
            if fired.is_set() and "cancel" in str(e).lower():
                raise SearchTimeoutError(
                    f"Search timed out after {timeout_ms} ms") from e
            raise
        finally:
            stop.set()
            try:
                sc._jsc.clearJobGroup()
            except Exception:
                sc.setLocalProperty("spark.jobGroup.id", None)

    def info_search(self, compute_stats: bool = False) -> dict:
        """INFO SEARCH analogue (docs/topics/search-observables.md): the
        sections that exist in a batch engine. `query` counters classify
        every ft_search call (nonvector / vector / hybrid, inline vs
        pre-filtering); `latency` accumulates wall-time for EXECUTING
        calls only (count_only — lazy DataFrame returns are plans, not
        searches; their execution happens outside the engine and is not
        attributed back). The `hnsw_*` latency counter covers searches
        served by the ANN artifact — our IVF index is the engine's HNSW
        substitute (SURVEY §2.6) — while `flat_*` covers exact scans.
        Coordinator/thread-pool/hnswlib sections have no
        analogue (shuffle service + Catalyst own those concerns) and are
        omitted rather than faked."""
        m = self._metrics
        out = {
            "query": {k: int(m[k]) for k in (
                "successful_requests_count", "failure_requests_count",
                "vector_requests_count", "nonvector_requests_count",
                "hybrid_requests_count", "inline_filtering_requests_count",
                "prefiltering_requests_count",
                "routed_requests_count")},
            "latency": {k: int(m[k]) for k in (
                "flat_vector_index_search_latency_usec",
                "hnsw_vector_index_search_latency_usec")},
            # per-operation counters (search.cc:907-935; DEV_INTEGER_
            # COUNTER(query_stats, ...) names), + text-requests total
            "query_stats": {k: int(m[k]) for k in (
                "query_text_requests_cnt",
                "query_numeric_count", "query_tag_count",
                "query_text_term_count", "query_text_prefix_count",
                "query_text_suffix_count", "query_text_fuzzy_count",
                "query_text_proximity_count")},
            "index_stats": {
                "number_of_indexes": len(self.catalog.list()),
                "number_of_attributes": sum(
                    len(self.catalog.get(n).fields)
                    for n in self.catalog.list()),
                "total_indexed_documents": None,
            },
            "indexing": {"background_indexing_status": "NO_ACTIVITY"},
        }
        if compute_stats:
            out["index_stats"]["total_indexed_documents"] = sum(
                self.catalog.info(n, compute_stats=True)["num_docs"]
                for n in self.catalog.list())
        return out

    # -- FT.SEARCH ---------------------------------------------------------
    def ft_search(
        self,
        index: str,
        query: str,
        params: dict | None = None,
        limit: tuple[int, int | None] = (0, 10),
        sortby: str | None = None,
        sortby_desc: bool = False,
        return_fields: list[ReturnField | str] | None = None,
        nocontent: bool = False,
        verbatim: bool = False,
        slop: int | None = None,
        inorder: bool = False,
        count_only: bool = False,
        ann_nprobe: int | None = None,
        ann_ef: int | None = None,
        ann_route: int | None = None,
        dialect: int = 2,
        timeout_ms: int | None = None,
        withsortkeys: bool = False,
        _observe_total=None,
    ):
        """Returns a DataFrame (or an int when ``count_only`` — the
        LIMIT 0 0 shape, /root/reference/src/query/search.h:77-80).

        ``limit=(offset, n)`` follows FT.SEARCH LIMIT; ``n=None`` means
        explicitly unbounded ("give me every match") — the physical
        limit is then omitted so the plan keeps its parallelism instead
        of funneling through a single-partition exchange.

        ``dialect`` is accepted for API parity (the engine always speaks
        dialect-2 syntax). ``timeout_ms`` is ENFORCED on executing calls
        (count_only here, and ft_search_reply): the call's job group is
        cancelled at the deadline and SearchTimeoutError raised
        (ft.search.md TIMEOUT). Lazy calls return a plan, so the budget
        applies where execution happens; the reference's
        partial-results-on-timeout fanout modes have no single-engine
        analogue."""
        try:
            out = self._ft_search(
                index, query, params=params, limit=limit, sortby=sortby,
                sortby_desc=sortby_desc, return_fields=return_fields,
                nocontent=nocontent, verbatim=verbatim, slop=slop,
                inorder=inorder, count_only=count_only,
                ann_nprobe=ann_nprobe, ann_ef=ann_ef,
                ann_route=ann_route, dialect=dialect,
                timeout_ms=timeout_ms, withsortkeys=withsortkeys,
                _observe_total=_observe_total)
        except Exception:
            self._metrics["failure_requests_count"] += 1
            raise
        # "successful" for a LAZY call means accepted + planned (execution
        # happens outside the engine, on the returned DataFrame, and is
        # not attributed back); count_only / reply calls execute here.
        self._metrics["successful_requests_count"] += 1
        # classify SUCCESSFUL requests (search-observables.md: nonvector =
        # exclusively non-vector; vector = any vector component; hybrid =
        # vector + filter, a subset of vector) from the query _ft_search
        # already parsed — no second parse; the predicate reflects
        # preprocessing, so a pure-stopword filter classifies as nonhybrid
        parsed = self._req.parsed
        if parsed.knn is None:
            self._metrics["nonvector_requests_count"] += 1
        else:
            self._metrics["vector_requests_count"] += 1
            if not isinstance(parsed.predicate, MatchAll):
                self._metrics["hybrid_requests_count"] += 1
        # per-operation query_stats counters (search.cc:907-935
        # IncrementQueryOperationMetrics) — classified from the final
        # predicate, after the SLOP/INORDER proximity upgrade
        ops = query_operation_flags(self._req.pred)
        if "text" in ops:
            self._metrics["query_text_requests_cnt"] += 1
        for op, counter in (("numeric", "query_numeric_count"),
                            ("tag", "query_tag_count"),
                            ("text_term", "query_text_term_count"),
                            ("text_prefix", "query_text_prefix_count"),
                            ("text_suffix", "query_text_suffix_count"),
                            ("text_fuzzy", "query_text_fuzzy_count"),
                            ("proximity", "query_text_proximity_count")):
            if op in ops:
                self._metrics[counter] += 1
        return out

    def _ft_search(
        self,
        index: str,
        query: str,
        params: dict | None = None,
        limit: tuple[int, int | None] = (0, 10),
        sortby: str | None = None,
        sortby_desc: bool = False,
        return_fields: list[ReturnField | str] | None = None,
        nocontent: bool = False,
        verbatim: bool = False,
        slop: int | None = None,
        inorder: bool = False,
        count_only: bool = False,
        ann_nprobe: int | None = None,
        ann_ef: int | None = None,
        ann_route: int | None = None,
        dialect: int = 2,
        timeout_ms: int | None = None,
        withsortkeys: bool = False,
        _observe_total=None,
    ):
        import time as _time

        _t0 = _time.perf_counter()
        if dialect not in (1, 2, 3, 4):
            raise QuerySyntaxError(f"invalid DIALECT {dialect}")
        # pre-parse guard (search.cc:1071): query length in bytes
        if len(query.encode("utf-8")) > self.limits.query_string_bytes:
            raise QuerySyntaxError(
                f"Query string exceeds maximum allowed size of "
                f"{self.limits.query_string_bytes} bytes (query-string-bytes)")
        schema = self.catalog.get(index)
        parsed = parse_query(query, params)
        self._req.parsed = parsed       # ft_search classifies from this
        # post-parse guards (filter_parser.cc:933 depth, :1046 node count;
        # ft_search_parser.cc:36 max-vector-knn)
        from ..plans.predicate_translator import predicate_depth_and_count

        depth, nodes = predicate_depth_and_count(parsed.predicate)
        if depth > self.limits.query_string_depth:
            raise QuerySyntaxError(
                f"Query nesting depth {depth} exceeds query-string-depth "
                f"{self.limits.query_string_depth}")
        if nodes > self.limits.query_string_terms_count:
            raise QuerySyntaxError(
                f"Query has {nodes} terms, exceeds query-string-terms-count "
                f"{self.limits.query_string_terms_count}")
        if parsed.knn is not None and parsed.knn.k > self.limits.max_vector_knn:
            raise QuerySyntaxError(
                f"KNN k {parsed.knn.k} exceeds max-vector-knn "
                f"{self.limits.max_vector_knn}")
        if parsed.knn is not None:
            # validated BEFORE any physical branch (the ANN-artifact
            # paths below bypass _knn); ft_aggregate gets the same
            # check through _knn itself
            self._validate_knn(schema, parsed.knn)
        translator = PredicateTranslator(schema, verbatim=verbatim,
                                         limits=self.limits)
        # stopword pass BEFORE the SLOP/INORDER upgrade: a dropped term must
        # not become a proximity slot (the reference drops it at parse, so
        # proximity spans only the surviving terms)
        parsed.predicate = translator.preprocess(parsed.predicate)
        pred = self._maybe_proximity(parsed, slop, inorder)
        self._req.pred = pred       # post-SLOP/INORDER, for op counters
        # thread-local ANN-strategy record for ft_explain (None = no
        # vector clause); set at each physical-choice branch below
        self._req.ann_mode = None
        explaining = getattr(self._req, "explaining", False)
        match_all = isinstance(pred, MatchAll)

        # the field's ANN artifact (ft_build_ann), if any: an IVFIndex or
        # a segment-graph HNSWIndex — the physical branches below differ
        artifact = None
        graph_art = False
        if parsed.knn is not None:
            artifact = getattr(schema, "_ann", {}).get(
                schema.field(parsed.knn.attr).attr)
            if artifact is not None:
                from .hnsw import HNSWIndex as _HNSWIndex

                graph_art = isinstance(artifact, _HNSWIndex)
            # a dial of the WRONG KIND for the built artifact must not
            # silently fall through to the exact full scan (a latency
            # cliff at scale); a dial with NO artifact still means
            # exact, like the reference before backfill completes
            if ann_nprobe is not None and graph_art:
                raise QuerySyntaxError(
                    "ann_nprobe applies to IVF artifacts; this field's "
                    "artifact is an HNSW graph — use ann_ef (or query "
                    "EF_RUNTIME)")
            if (ann_ef is not None and artifact is not None
                    and not graph_art):
                raise QuerySyntaxError(
                    "ann_ef applies to HNSW graph artifacts; this "
                    "field's artifact is IVF — use ann_nprobe (or "
                    "query EF_RUNTIME)")
            if ann_route is not None and (artifact is None
                                          or not graph_art):
                raise QuerySyntaxError(
                    "ann_route prunes segments of a kmeans-partitioned "
                    "HNSW artifact; this field has "
                    + ("no ANN artifact" if artifact is None
                       else "an IVF artifact — its probe dial is "
                            "ann_nprobe"))

        # ANN planner (the reference's pre-filter vs inline-filter choice,
        # planner.cc:21-46). Explicit dials (ann_nprobe / ann_ef /
        # EF_RUNTIME) win; otherwise, for a HYBRID query on an algo=hnsw
        # field with an artifact, estimate the filter's selectivity from a
        # bounded prefix probe — selective filters pre-filter exactly,
        # loose filters run the predicate INSIDE the index (probed IVF
        # lists, or in-traversal on the graph — the inline-filtering
        # branch, search.cc:102-133 InlineVectorFilter).
        if (parsed.knn is not None and artifact is not None
                and ann_nprobe is None and ann_ef is None
                and not parsed.knn.ef_runtime and not match_all):
            fdef_v = schema.field(parsed.knn.attr)
            if getattr(fdef_v, "algo", "flat") == "hnsw":
                from ..plans.planner import (
                    estimate_match_fraction, use_prefiltering,
                )

                frac = estimate_match_fraction(
                    schema.indexed_df(), translator.translate(pred))
                if not use_prefiltering(frac, "hnsw"):
                    if graph_art:
                        # default beam for the inline path (EF_RUNTIME
                        # overrides): wide enough that a loose filter
                        # keeps recall, 4x the reference's default dial
                        ann_ef = max(4 * parsed.knn.k, 40)
                    else:
                        # default probe budget for the inline path: an
                        # eighth of the lists (EF_RUNTIME overrides)
                        ann_nprobe = max(1, artifact.n_lists // 8)

        if (parsed.knn is not None and artifact is not None
                and parsed.knn.ef_runtime):
            if graph_art:
                # EF_RUNTIME is natively the graph beam width — no
                # mapping needed (vector_hnsw.cc ef_runtime)
                if ann_ef is None:
                    ann_ef = parsed.knn.ef_runtime
            elif ann_nprobe is None:
                # map the reference's recall dial onto IVF: EF_RUNTIME is
                # the HNSW candidate-queue size (~ef/k times more
                # candidates than results); probe proportionally many
                # lists (/root/reference/src/query/search.cc)
                import math as _math

                ann_nprobe = max(1, min(
                    artifact.n_lists,
                    _math.ceil(parsed.knn.ef_runtime / max(parsed.knn.k, 1))))

        if ann_route is not None:
            # ann_route is only meaningful inside the graph beam branch
            # below — anywhere else it would silently fall through to a
            # full scan (the exact anti-goal of the dial guards above),
            # and a hash-partitioned artifact has nothing to route over
            if parsed.knn is None:
                raise QuerySyntaxError(
                    "ann_route applies to KNN queries — this query has "
                    "no KNN clause")
            if graph_art and getattr(artifact, "centroids", None) is None:
                raise QuerySyntaxError(
                    "ann_route needs a kmeans-partitioned HNSW artifact "
                    "(ft_build_ann(..., partitioner='kmeans')); this "
                    "artifact is hash-partitioned — its segments cannot "
                    "be routed")
            if ann_ef is None:
                raise QuerySyntaxError(
                    "ann_route rides the graph beam — also pass ann_ef "
                    "(or query EF_RUNTIME) so the HNSW branch engages; "
                    "without it the query would silently fall back to "
                    "the exact full scan")

        if parsed.knn is not None and graph_art and ann_ef is not None:
            # segment-graph HNSW branch: beam each segment, merge top-k,
            # then fetch the winners' records with a broadcast join (the
            # reference's post-HNSW hash fetch, SURVEY §2.1 row 3)
            score = parsed.knn.score_alias()
            prefilter = None if match_all else translator.translate(pred)
            self._req.ann_mode = ("inline" if prefilter is not None
                                  else "ann")
            if prefilter is not None and not explaining:
                # predicate evaluated IN-traversal on the graph
                self._metrics["inline_filtering_requests_count"] += 1
            if ann_route is not None and not explaining:
                # segment routing engaged (extension metric — the
                # reference has no segment concept to route over)
                self._metrics["routed_requests_count"] += 1
            hits = artifact.search(parsed.knn.vector, k=parsed.knn.k,
                                   ef=ann_ef, where=prefilter,
                                   route_segments=ann_route)
            hits = hits.withColumnRenamed("__score", score)
            df = schema.indexed_df().join(F.broadcast(hits), "__key")
            if count_only:
                n = self._run_with_timeout(df.count, timeout_ms)
                self._metrics["hnsw_vector_index_search_latency_usec"] += \
                    int((_time.perf_counter() - _t0) * 1e6)
                return n
            if _observe_total is not None:
                # ANN replies report the (<=k) probed result count
                df = df.observe(_observe_total,
                                F.count(F.lit(1)).alias("n"))
            return self._finish(schema, df, parsed, sortby, sortby_desc,
                                limit, return_fields, nocontent,
                                observed=_observe_total is not None,
                                withsortkeys=withsortkeys)

        if parsed.knn is not None and ann_nprobe is not None:
            ann = artifact if not graph_art else None
            if ann is not None:
                score = parsed.knn.score_alias()
                prefilter = None if match_all else translator.translate(pred)
                self._req.ann_mode = ("inline" if prefilter is not None
                                      else "ann")
                if prefilter is not None and not explaining:
                    # predicate evaluated INSIDE the probed lists
                    self._metrics["inline_filtering_requests_count"] += 1
                df = ann.search(parsed.knn.vector, k=parsed.knn.k,
                                nprobe=ann_nprobe, prefilter=prefilter,
                                score_name=score, tiebreak_col="__key")
                if count_only:
                    n = self._run_with_timeout(df.count, timeout_ms)
                    self._metrics["hnsw_vector_index_search_latency_usec"] += \
                        int((_time.perf_counter() - _t0) * 1e6)
                    return n
                if _observe_total is not None:
                    # ANN replies report the (<=k) probed result count
                    df = df.observe(_observe_total,
                                    F.count(F.lit(1)).alias("n"))
                return self._finish(schema, df, parsed, sortby, sortby_desc,
                                    limit, return_fields, nocontent,
                                    observed=_observe_total is not None,
                                    withsortkeys=withsortkeys)

        df = schema.indexed_df()
        if not match_all:
            df = _apply_predicate(df, translator, pred)
        if parsed.knn is not None:
            self._req.ann_mode = "prefilter" if not match_all else "exact"
            if not match_all and not explaining:
                # exact hybrid: filter first, then distance — pre-filtering
                self._metrics["prefiltering_requests_count"] += 1
            df = self._knn(schema, df, parsed)
        if count_only:
            # count AFTER the top-k cut so the exact path agrees with the
            # ANN branch above (both report the <=k result-set size)
            n = self._run_with_timeout(df.count, timeout_ms)
            if parsed.knn is not None:
                self._metrics["flat_vector_index_search_latency_usec"] += \
                    int((_time.perf_counter() - _t0) * 1e6)
            return n
        if _observe_total is not None:
            # pre-LIMIT total in the SAME job (search.cc:779-842 computes
            # both in one pass): a CollectMetrics node below the sort+limit.
            # _finish forces an ordering so the plan is TakeOrderedAndProject
            # (per-partition top-k, no full shuffle) whose input — and hence
            # the metrics node — sees every matching row.
            df = df.observe(_observe_total, F.count(F.lit(1)).alias("n"))
        return self._finish(schema, df, parsed, sortby, sortby_desc, limit,
                            return_fields, nocontent,
                            force_order=_observe_total is not None,
                            observed=_observe_total is not None,
                            withsortkeys=withsortkeys)

    def _finish(self, schema, df, parsed, sortby, sortby_desc, limit,
                return_fields, nocontent, force_order=False,
                observed=False, withsortkeys=False):
        """Shared tail: SORTBY -> LIMIT -> RETURN projection.
        ``withsortkeys`` augments the output with the sort-key value as
        ``__sortkey`` (docs/commands/ft.search.md WITHSORTKEYS)."""
        sortkey_col = None
        if sortby is not None:
            fdef = schema.field(sortby)
            if isinstance(fdef, NumericField):
                col = F.col(num_col(fdef.attr))
            elif isinstance(fdef, TagField) and not fdef.casesensitive:
                # sort by the INDEXED (case-folded) tag value, not the raw
                # source string (the reference sorts indexed values)
                col = F.lower(fdef.source(df).cast("string"))
            else:
                # fdef.source resolves ON-JSON identifiers (JSONPath like
                # `$.title` is not a column name) the same way projection
                # does; for ON-HASH it is the plain column
                col = fdef.source(df).cast("string")
            if withsortkeys:
                df = df.withColumn("__sortkey", col)
                sortkey_col = "__sortkey"
                col = F.col("__sortkey")
            # missing values placed last (docs/commands/ft.search.md SORTBY)
            df = df.orderBy(col.desc_nulls_last() if sortby_desc else col.asc_nulls_last())
        elif parsed.knn is not None:
            df = df.orderBy(F.col(parsed.knn.score_alias()).asc(),
                            F.col("__key").asc())
        elif force_order:
            # deterministic reply order + guarantees the limit cannot
            # short-circuit the scan under a CollectMetrics observation
            df = df.orderBy(F.col("__key").asc())

        off, n = limit
        if off:
            df = df.offset(off)
        if n is None and observed:
            # an observed plan (ft_search_reply's pre-LIMIT total) needs a
            # physical limit even when the caller asked for everything: an
            # orderBy WITHOUT a limit becomes a range-partitioned Sort
            # whose boundary-sampling pass re-executes the child,
            # double-counting the CollectMetrics observation beneath.
            # Keyed off the observation itself, not force_order — the ANN
            # reply branch orders by the KNN score without force_order
            n = _OBSERVED_LIMIT_CAP
        if n is not None:
            df = df.limit(n)
        # n=None (explicit "no limit"): skipping the physical limit keeps
        # the result parallel — a numeric limit compiles to GlobalLimit
        # over an Exchange SinglePartition, a serialization point that is
        # pure overhead on a fetch-everything call
        return self._project(schema, df, return_fields, nocontent,
                             parsed.knn.score_alias() if parsed.knn else None,
                             sortkey_col=sortkey_col)

    def ft_search_reply(self, index: str, query: str, params: dict | None = None,
                        limit: tuple[int, int | None] = (0, 10), **kw) -> list:
        """RESP-shaped FT.SEARCH reply ``[total, key, [f, v, ...], ...]``
        where ``total`` is the PRE-limit match count, computed in the SAME
        Spark job as the rows via a CollectMetrics observation — the
        reference reports both from one pass (src/query/search.cc:779-842).
        ``LIMIT 0 0`` degenerates to the count-only shape ``[total]``."""
        from pyspark.sql import Observation

        nocontent = kw.get("nocontent", False)
        if limit[1] == 0:
            return [self.ft_search(index, query, params=params,
                                   count_only=True,
                                   **{k: v for k, v in kw.items()
                                      if k != "nocontent"})]
        obs = Observation()
        timeout_ms = kw.get("timeout_ms")
        df = self.ft_search(index, query, params=params, limit=limit,
                            _observe_total=obs, **kw)
        from .reply import search_reply

        return self._run_with_timeout(
            lambda: search_reply(df, observation=obs, nocontent=nocontent),
            timeout_ms)

    # -- FT.AGGREGATE ------------------------------------------------------
    def ft_aggregate(
        self,
        index: str,
        query: str,
        stages: str = "",
        params: dict | None = None,
        verbatim: bool = False,
        slop: int | None = None,
        inorder: bool = False,
        dialect: int = 2,
        timeout_ms: int | None = None,
    ) -> DataFrame:
        """FT.AGGREGATE: search phase identical to FT.SEARCH — including
        command-level SLOP/INORDER/VERBATIM/DIALECT (ft.aggregate.md) —
        then the stage pipeline folds the result frame
        (/root/reference/src/commands/ft_aggregate.cc:95-129, :348-364)."""
        from .aggregate import AggregateExecutor, parse_stages

        if dialect not in (1, 2, 3, 4):
            raise QuerySyntaxError(f"invalid DIALECT {dialect}")
        schema = self.catalog.get(index)
        # stage expressions may consume params too, so the parser's
        # unused-params validation is deferred (see filter_parser.parse)
        parsed = parse_query(query, params, check_unused_params=False)
        translator = PredicateTranslator(schema, verbatim=verbatim,
                                         limits=self.limits)
        parsed.predicate = translator.preprocess(parsed.predicate)
        pred = self._maybe_proximity(parsed, slop, inorder)
        df = schema.indexed_df()
        if not isinstance(pred, MatchAll):
            df = _apply_predicate(df, translator, pred)
        score_col = None
        if parsed.knn is not None:
            df = self._knn(schema, df, parsed)
            score_col = parsed.knn.score_alias()
        execu = AggregateExecutor(schema, df, score_column=score_col)
        return execu.run(parse_stages(stages, params))

    def _maybe_proximity(self, parsed: ParsedQuery, slop: int | None, inorder: bool):
        """SLOP/INORDER upgrade a multi-term AND within one text field into
        a positional constraint (/root/reference/src/query/search.cc:226-298).
        An OR group of terms becomes one SLOT of alternatives — the
        reference's orproximity iterator
        (src/indexes/text/orproximity.cc)."""
        pred = parsed.predicate
        if slop is None and not inorder:
            return pred

        def slot(c):
            """(words, attr) for a plain TERM or an OR-of-TERMs; else None."""
            from ..parser.ast import Or

            if isinstance(c, TextPred) and c.kind == TERM:
                return c.value, c.attr
            if isinstance(c, Or) and all(
                isinstance(g, TextPred) and g.kind == TERM for g in c.children
            ):
                attrs = {g.attr for g in c.children}
                if len(attrs) == 1:
                    return [g.value for g in c.children], attrs.pop()
            return None

        if isinstance(pred, And):
            slots = [slot(c) for c in pred.children]
            if all(s is not None for s in slots):
                attrs = {a for _, a in slots}
                if len(attrs) == 1:
                    return Proximity(
                        attr=attrs.pop(),
                        words=[ws for ws, _ in slots],
                        slop=slop,
                        inorder=inorder,
                    )
        return pred

    def _validate_knn(self, schema: IndexSchema, knn) -> VectorField:
        """Shared FT.SEARCH / FT.AGGREGATE KNN validation: the field
        must be VECTOR and the query vector must match its DIM — the
        reference rejects a query blob whose byte length isn't DIM*4
        (vector_base.cc record validation). Without this, a wrong-dim
        vector silently nulls every zip_with distance and returns an
        EMPTY result instead of an error."""
        vf = schema.field(knn.attr)
        if not isinstance(vf, VectorField):
            raise QuerySyntaxError(f"KNN field `{knn.attr}` is not VECTOR")
        if vf.dim and len(knn.vector) != vf.dim:
            raise QuerySyntaxError(
                f"query vector has {len(knn.vector)} dimensions; field "
                f"`{knn.attr}` is DIM {vf.dim} (FLOAT32 blob must be "
                f"{4 * vf.dim} bytes)")
        return vf

    def _knn(self, schema: IndexSchema, df: DataFrame,
             parsed: ParsedQuery) -> DataFrame:
        """Exact KNN over the (possibly pre-filtered) frame; the ANN path
        is chosen earlier in ft_search. Validation lives here too so
        ft_aggregate's direct call gets the same dim/type errors."""
        knn = parsed.knn
        fdef = self._validate_knn(schema, knn)
        score = knn.score_alias()
        dist = distance_column(F.col(vec_col(fdef.attr)), knn.vector, fdef.metric)
        df = df.withColumn(score, dist).where(F.col(score).isNotNull())
        # top-k: Catalyst compiles orderBy+limit to TakeOrderedAndProject —
        # per-partition heap + driver merge, the same shape as the reference's
        # per-shard top-k fan-in (/root/reference/src/query/fanout.cc:69).
        # __key tiebreak: ties at the k-th distance resolve deterministically
        # (a distributed scan has no stable iteration order to fall back on)
        return df.orderBy(F.col(score).asc(), F.col("__key").asc()).limit(knn.k)

    def _project(self, schema: IndexSchema, df: DataFrame,
                 return_fields, nocontent: bool, score_col: str | None,
                 sortkey_col: str | None = None) -> DataFrame:
        if nocontent:
            return df.select("__key")
        extra = [sortkey_col] if sortkey_col else []
        if return_fields is None:
            json_sources = [f.json_source for f in schema.fields
                            if f.json_source]
            if json_sources:
                # ON-JSON default reply: one pair named `$` holding the
                # whole JSON document (docs/commands/ft.search.md response)
                cols = [F.col("__key"),
                        F.col(json_sources[0]).cast("string").alias("$")]
                cols += [F.col(c) for c in extra]
                if score_col:
                    cols.append(F.col(score_col))
                return df.select(*cols)
            cols = ["__key"] + [c for c in schema.doc_df.columns] + extra
            if score_col:
                cols.append(score_col)
            return df.select(*cols)
        out = [F.col("__key")] + [F.col(c) for c in extra]
        for rf in return_fields:
            if isinstance(rf, str):
                rf = ReturnField(rf)
            if rf.name == score_col:
                out.append(F.col(rf.name).alias(rf.alias or rf.name))
                continue
            fdef = schema.field(rf.name) if rf.name in schema._by_attr else None
            # a RETURN identifier must name an indexed attribute or a
            # record (hash) field. The reference silently omits a field
            # absent from the hash (per-row reply maps can do that); a
            # fixed-schema frame cannot, so an unknown name is reported
            # as the field error it almost certainly is instead of
            # leaking Spark's AnalysisException
            if fdef is None and rf.name not in df.columns:
                raise UnknownFieldError(
                    f"RETURN field `{rf.name}` is neither an indexed "
                    "attribute nor a record field")
            # fdef.source handles ON-JSON attributes: the returned value is
            # the JSONPath extraction, not a frame column
            src = fdef.source(df) if fdef else F.col(rf.name)
            out.append(src.alias(rf.alias or rf.name))
        if score_col and all(
            (rf.name if isinstance(rf, ReturnField) else rf) != score_col for rf in return_fields
        ):
            out.append(F.col(score_col))
        return df.select(*out)
