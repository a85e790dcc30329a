"""Link-graph analytics — the domain-ranking signal of crawl curation.

RefinedWeb/C4-era pipelines rank hosts before they rank pages: a domain
whose inbound links come from reputable hosts is crawl-worthy; link
farms and orphan hosts are not. This module turns extracted pages into
a (src, dst) link graph and runs the standard centrality pass on it —
pure DataFrame ops, no GraphX/graphframes dependency (neither ships in
a stock PySpark container).

Scale shapes:

- ``extract_links``: one map-only scan (JVM href regex +
  ``urlops.resolve_href``) + one posexplode — no shuffle.
- ``domain_link_graph``: ONE aggregation on (src_domain, dst_domain);
  output bounded by distinct domain pairs, self-links dropped.
- ``pagerank``: classic power iteration as join + aggregate per round —
  edges shuffle on src (rank join) then dst (contribution sum) each
  iteration; dangling mass redistributed uniformly (the standard
  correction, so ranks keep summing to 1). Each round localCheckpoints
  the rank frame: the plan stays O(1) deep instead of O(iterations),
  the same lineage-cut posture as ``dedup.connected_components``. Rank
  state is one row per node — tiny next to the edge set.
- ``degree_stats``: two aggregations + one outer join, bounded by
  distinct nodes.

Reference analogue: none (beyond-reference operator per SURVEY.md
§2.10; the reference indexes already-curated records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def extract_links(pages: DataFrame, html_col: str = "html",
                  url_col: str = "url",
                  drop_same_page: bool = True,
                  stage: bool = True) -> DataFrame:
    """One row per (page url, resolved outgoing link). Non-navigational
    hrefs (javascript:/mailto:/fragment-only) drop; ``drop_same_page``
    also drops links resolving to the page's own URL (self references,
    e.g. ``?utm`` variants keep — they differ textually).

    ``stage`` (default) lazily localCheckpoints the link frame: every
    downstream expression over ``link`` (host/domain extraction, dedup
    filters) otherwise re-inlines the WHOLE resolve chain per
    reference — past the 64 KB codegen limit the stage silently falls
    back to interpreted eval (measured 3x on the domain-graph
    composition). The cut costs one local write of the two string
    columns; pass ``stage=False`` when the links feed exactly one
    cheap consumer."""
    from .html import html_hrefs_col
    from .urlops import resolve_href

    # Entity decode is the LIGHT url form (& escapes only): hrefs
    # legally need nothing else, and resolve_href references its input
    # ~9 times across branches — each reference re-inlines the whole
    # upstream chain into the generated code (and the isNotNull filter
    # pushes a full copy below the projection), so the 17-entity chain
    # blew the stage past the 64 KB codegen limit and the scan fell
    # back to interpreted mode (measured ~20x slower).
    def url_entities(c):
        c = F.regexp_replace(c, "&#0*38;|&#x0*26;", "&")
        return F.regexp_replace(c, "&amp;", "&")

    from .dedup import _parallelize, _pin

    # spread an under-partitioned input: the href-extraction regex is
    # the expensive pass here and a 1-split scan would run it on one
    # core (measured 2.1 s of graph_pagerank's 3.2 s serial; no-op on
    # well-partitioned production inputs).
    # _pin: the explode's inferred filter would otherwise re-run the
    # href extraction regex twice below this projection (dedup._pin)
    staged = _parallelize(pages).select(
        F.col(url_col).alias("url"),
        _pin(html_hrefs_col(F.col(html_col), decode=False))
        .alias("__hrefs"))
    out = (staged
           .select("url", F.explode("__hrefs").alias("__raw"))
           .select("url", url_entities(F.col("__raw")).alias("__href"))
           .select("url", resolve_href(F.col("url"), F.col("__href"))
                   .alias("link"))
           .where(F.col("link").isNotNull()))
    if drop_same_page:
        out = out.where(F.col("link") != F.col("url"))
    return out.localCheckpoint(eager=False) if stage else out


def domain_link_graph(links: DataFrame, src_col: str = "url",
                      dst_col: str = "link") -> DataFrame:
    """Collapse page-level links to the domain graph:
    (src_domain, dst_domain, n_links), intra-domain links dropped
    (they carry no reputation signal). One aggregation; output bounded
    by distinct domain pairs."""
    from .urlops import host_col, registered_domain

    e = links.select(
        registered_domain(host_col(F.col(src_col))).alias("src"),
        registered_domain(host_col(F.col(dst_col))).alias("dst"))
    return (e.where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                    & (F.col("src") != "") & (F.col("dst") != "")
                    & (F.col("src") != F.col("dst")))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n_links")))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, damping: float = 0.85,
             n_iter: int = 20,
             checkpoint_every: int = 1) -> DataFrame:
    """Power-iteration PageRank over a directed edge frame. Returns
    (node, rank) with ranks summing to 1. Parallel edges are additive;
    ``weight`` names an edge-weight column (e.g. ``n_links`` from
    ``domain_link_graph``) — contributions split proportionally to
    weight instead of uniformly. Dangling nodes (no out-edges)
    redistribute their mass uniformly each round, the standard
    correction that keeps the distribution stochastic.

    Deterministic: rank(i+1) = (1-d)/N + d * (in-contributions +
    dangling_mass/N) — exactly the scalar reference in the tests, so
    the oracle matches to float precision at any iteration count."""
    if not 0 < damping < 1:
        raise ValueError("damping must be in (0, 1)")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    w = (F.col(weight).cast("double") if weight
         else F.lit(1.0)).alias("w")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w)
    # pin the loop-invariant frames ONCE: every iteration joins the
    # edge set — without this the caller's whole upstream lineage
    # (extract/resolve/aggregate) re-executes per round (measured
    # ~10x on the bench capstone)
    e = e.localCheckpoint(eager=True)

    # one checkpointed loop-invariant frame instead of two: every node
    # with its total out-weight attached (null for danglers). The rank
    # state carries __outw through each round, so iterations never
    # re-join the out-weight table.
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    outw = e.groupBy(F.col("src").alias("node")) \
        .agg(F.sum("w").alias("__outw"))
    nodesw = nodes.join(outw, "node", "left").localCheckpoint(eager=True)
    n_nodes = nodesw.count()
    if n_nodes == 0:
        return nodesw.select("node").withColumn("rank", F.lit(0.0))

    ranks = nodesw.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for i in range(n_iter):
        # dangling mass stays IN the plan as a broadcast one-row frame —
        # no driver action per iteration beyond the lineage-cut
        # checkpoint itself
        dang = ranks.where(F.col("__outw").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        contribs = (e.join(ranks.where(F.col("__outw").isNotNull())
                           .select(F.col("node").alias("src"),
                                   "rank", "__outw"), "src")
                    .groupBy("dst")
                    .agg(F.sum(F.col("rank") * F.col("w")
                               / F.col("__outw")).alias("__in")))
        ranks = (nodesw.join(contribs,
                             nodesw["node"] == contribs["dst"], "left")
                 .crossJoin(F.broadcast(dang))
                 .select("node", "__outw",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("__in"), F.lit(0.0))
                             + F.col("__dang") / F.lit(float(n_nodes))))
                         .alias("rank")))
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            # cut the lineage: without this the plan nests one
            # join+agg per iteration and round 20 replans round 1.
            # eager=False — the lineage is truncated at call time
            # either way, but lazy materialization folds the per-round
            # checkpoint into the next consuming job instead of paying
            # one blocking driver round-trip per round (interleaved
            # A/B 2.08 -> 1.81 s on the bench row; values identical)
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def degree_stats(edges: DataFrame, src: str = "src",
                 dst: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree, out_neighbors, in_neighbors) —
    the cheap pre-rank triage (orphans, sinks, link farms)."""
    o = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.count_distinct(F.col(dst)).alias("out_neighbors"))
    i = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.count_distinct(F.col(src)).alias("in_neighbors"))
    return (o.join(i, "node", "full")
            .select("node",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
                    F.coalesce("out_neighbors", F.lit(0))
                    .alias("out_neighbors"),
                    F.coalesce("in_neighbors", F.lit(0))
                    .alias("in_neighbors")))
