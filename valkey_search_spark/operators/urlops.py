"""URL / domain curation — the provenance front of a web-corpus pipeline.

C4, RefinedWeb and Gopher all gate documents on their URL before any
content pass: canonicalize the URL, drop exact URL duplicates (the
cheapest dedup there is — one string key per document instead of the
whole text), and filter by domain block/allow lists. This module does
all of it as pure JVM expressions (whole-stage codegen, map-only until
the one dedup/stats aggregation), so at 100 TB the URL pass costs one
scan plus one bounded shuffle on an ~80-byte key.

Parsing is a shared regex grammar — NOT java.net.URL / Spark's
``parse_url`` — so the DuckDB test oracles replicate byte-identical
semantics (both engines run the same patterns; the patterns stay inside
the Java-regex ∩ RE2 common subset: no backreferences, no lookaround).

Canonicalization contract (each step pinned in tests):

1. surrounding whitespace trimmed, fragment (``#...``) dropped,
2. scheme and host lowercased; userinfo (``user:pw@``) dropped,
3. default ports stripped (``http:80``, ``https:443``); others kept,
4. tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``,
   ... — the C4-era click-id set, extensible via ``strip_params``),
   remaining parameters SORTED so param order never splits a dup group,
5. empty path becomes ``/``; a trailing slash on a non-root path is
   stripped,
6. a string with no ``scheme://`` prefix canonicalizes to NULL —
   callers decide whether unparseable provenance keeps or drops a row
   (``url_dedup`` keeps each such row as its own group).

``registered_domain`` is an eTLD+1 HEURISTIC: last two host labels,
or three when the 2-label tail is in a vendored set of common
multi-part public suffixes (``co.uk``, ``com.au``, ...). The full
Mozilla public-suffix list is a data file a deployment should mount;
the seam is this one column expression. IPv4 literals pass through
whole; bracketed IPv6 hosts are kept bracketed.

Reference analogue: none (beyond-reference operator per SURVEY.md
§2.10; the reference indexes already-curated records).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# shared regex grammar (Java regex ∩ RE2 — mirrored verbatim in oracles)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
# host inside the authority: drop userinfo@, keep [v6] brackets, drop :port
_HOST_RE = "^(?:[^@/]*@)?(\\[[^\\]]*\\]|[^:]*)"
_PORT_RE = ":([0-9]+)$"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?(.*)"          # applied AFTER the fragment is stripped
_FRAGMENT_RE = "#.*$"
_IPV4_RE = "^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"

# the click-/campaign-id parameter names every major pipeline strips;
# matched against the parameter NAME (the part left of '=')
DEFAULT_TRACKING_PARAMS = (
    "utm_[a-z_]*", "fbclid", "gclid", "gclsrc", "dclid", "msclkid",
    "mc_cid", "mc_eid", "igshid", "yclid", "wbraid", "gbraid",
    "_ga", "_gl", "spm", "ref_src", "ref_url", "cmpid", "s_kwcid",
)

# common multi-part public suffixes (vendored subset; see module doc)
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.nz", "net.nz", "org.nz",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.hk", "com.sg",
    "co.za", "co.kr", "co.id", "com.my", "com.ph", "com.vn",
    "com.pl", "com.ru", "co.th", "com.eg", "com.sa", "com.ua",
)


def _nofrag(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), _FRAGMENT_RE, "")


def scheme_col(url: Column) -> Column:
    """Lowercased scheme, '' when the string has no ``scheme://``."""
    return F.lower(F.regexp_extract(F.trim(url), _SCHEME_RE, 1))


def host_col(url: Column) -> Column:
    """Lowercased host (no userinfo, no port), '' when unparseable."""
    auth = F.regexp_extract(_nofrag(url), _AUTH_RE, 1)
    return F.lower(F.regexp_extract(auth, _HOST_RE, 1))


def path_col(url: Column) -> Column:
    """Raw path ('' when absent) — NOT canonicalized; see normalize_url."""
    return F.regexp_extract(_nofrag(url), _PATH_RE, 1)


def query_col(url: Column) -> Column:
    """Raw query string after '?' ('' when absent), fragment excluded."""
    return F.regexp_extract(_nofrag(url), _QUERY_RE, 1)


def registered_domain(host: Column) -> Column:
    """eTLD+1 heuristic over a HOST column (see module doc for the
    public-suffix-list seam). IPv4/bracketed-IPv6 literals and
    single-label hosts pass through whole."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    return (F.when(host.isNull(), F.lit(None).cast("string"))
             .when(host.rlike(_IPV4_RE) | host.startswith("["), host)
             .when(n <= 2, host)
             .when(last2.isin(*MULTIPART_SUFFIXES), last3)
             .otherwise(last2))


# ---------------------------------------------------------------------------
def _canonical_query(q: Column, strip_params, keep_params) -> Column:
    """Filter + sort the query parameters. ``strip_params`` are regexes
    matched against the whole parameter NAME; ``keep_params`` (when
    given) is an exact-name allowlist applied after."""
    parts = F.filter(F.split(q, "&"), lambda p: p != F.lit(""))
    if strip_params:
        name_re = "^(" + "|".join(strip_params) + ")(=.*)?$"
        parts = F.filter(parts, lambda p: ~p.rlike(name_re))
    if keep_params is not None:
        keep_re = "^(" + "|".join(keep_params) + ")(=.*)?$"
        parts = F.filter(parts, lambda p: p.rlike(keep_re))
    return F.array_join(F.array_sort(parts), "&")


def normalize_url(
    url: Column,
    *,
    strip_params=DEFAULT_TRACKING_PARAMS,
    keep_params=None,
    strip_www: bool = False,
) -> Column:
    """Canonical URL string per the module-doc contract; NULL when the
    input has no ``scheme://`` prefix. Pure JVM expressions — composes
    into any scan without a Python stage or a shuffle."""
    scheme = scheme_col(url)
    host = host_col(url)
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    port = F.regexp_extract(
        F.regexp_extract(_nofrag(url), _AUTH_RE, 1), _PORT_RE, 1)
    # default ports vanish; any other explicit port is kept
    port = F.when(
        (port == F.lit("")) |
        ((scheme == "http") & (port == "80")) |
        ((scheme == "https") & (port == "443")),
        F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = path_col(url)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when((path != "/") & path.endswith("/"),
                  F.substring(path, 1, F.length(path) - 1)).otherwise(path)
    q = _canonical_query(query_col(url), strip_params, keep_params)
    q = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port, path, q))


def parse_urls(df: DataFrame, url_col: str = "url",
               prefix: str = "url_") -> DataFrame:
    """Add ``{prefix}scheme/host/domain/path/query`` columns — one
    map-only scan, '' (not NULL) for absent parts so downstream
    group-bys never conflate absent with failed."""
    u = F.col(url_col)
    host = host_col(u)
    return (df
            .withColumn(f"{prefix}scheme", scheme_col(u))
            .withColumn(f"{prefix}host", host)
            .withColumn(f"{prefix}domain", registered_domain(host))
            .withColumn(f"{prefix}path", path_col(u))
            .withColumn(f"{prefix}query", query_col(u)))


# non-navigational href schemes a link graph must not follow
_NON_NAV_RE = "(?i)^(javascript|mailto|tel|data|about|blob):"


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve an ``<a href>`` against its page URL — the link-graph
    subset of RFC 3986, all JVM:

    - absolute (``scheme://...``) passes through,
    - protocol-relative (``//host/p``) takes the base scheme,
    - root-relative (``/p``) takes the base origin,
    - path-relative (``p`` / ``./p`` / ``?q`` ) joins the base
      directory WITHOUT dot-segment normalization (``../`` survives
      textually — documented deviation; host/domain analytics are
      unaffected since the host comes from the base),
    - fragment-only and non-navigational schemes (``javascript:``,
      ``mailto:``, ``tel:``, ``data:``...) resolve to NULL, as does an
      unparseable base.
    """
    h = F.trim(href)
    scheme = scheme_col(base)
    auth = F.regexp_extract(_nofrag(base), _AUTH_RE, 1)
    origin = F.concat(scheme, F.lit("://"), auth)
    bpath = path_col(base)
    bpath = F.when(bpath == "", F.lit("/")).otherwise(bpath)
    bdir = F.regexp_replace(bpath, "[^/]*$", "")
    return F.when(
        (h == "") | h.startswith("#") | h.rlike(_NON_NAV_RE)
        | (scheme == ""),
        F.lit(None).cast("string")
    ).when(h.rlike(_SCHEME_RE), h) \
     .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h)) \
     .when(h.startswith("/"), F.concat(origin, h)) \
     .when(h.startswith("?"), F.concat(origin, bpath, h)) \
     .otherwise(F.concat(
         origin, bdir,
         F.regexp_replace(h, "^\\./", "")))


# ---------------------------------------------------------------------------
def url_dedup(df: DataFrame, key: str, url_col: str = "url",
              **normalize_kwargs) -> DataFrame:
    """Keep one representative (min key) per canonical URL — the C4
    front-door dedup. One shuffle on the normalized-URL string; rows
    whose URL fails to parse each form their OWN group (keyed by the
    row key), so bad provenance never collapses distinct documents.

    Returns ``(norm_url, <key>, dup_count)``; join back on ``key`` to
    fetch surviving payloads (same contract as ``dedup.exact_dedup``).
    """
    norm = normalize_url(F.col(url_col), **normalize_kwargs)
    grp = F.coalesce(norm, F.concat(F.lit("__unparsed__:"),
                                    F.col(key).cast("string")))
    return (df.withColumn("norm_url", grp)
              .groupBy("norm_url")
              .agg(F.min(key).alias(key),
                   F.count(F.lit(1)).alias("dup_count")))


def domain_filter(df: DataFrame, url_col: str = "url", *,
                  blocklist=None, allowlist=None,
                  match_subdomains: bool = True) -> DataFrame:
    """Filter rows by domain list. Exactly one of ``blocklist`` /
    ``allowlist``; each is a Python list of domains (small — compiled
    into the scan as literals, no join) or a one-column DataFrame of
    domains (large — broadcast semi/anti join on the registered
    domain). ``match_subdomains`` makes ``evil.com`` also match
    ``cdn.evil.com`` (list form; the DataFrame form matches the
    registered domain, which already covers subdomains of eTLD+1s)."""
    if (blocklist is None) == (allowlist is None):
        raise ValueError("exactly one of blocklist/allowlist required")
    entries, keep_on_match = ((allowlist, True) if allowlist is not None
                              else (blocklist, False))
    host = host_col(F.col(url_col))
    if isinstance(entries, DataFrame):
        dcol = entries.columns[0]
        dom = entries.select(F.lower(F.col(dcol)).alias("__dom")).distinct()
        tagged = df.withColumn("__dom", registered_domain(host))
        how = "left_semi" if keep_on_match else "left_anti"
        return tagged.join(F.broadcast(dom), "__dom", how).drop("__dom")
    match = F.lit(False)
    for e in entries:
        e = e.lower()
        m = host == e
        if match_subdomains:
            m = m | host.endswith("." + e)
        match = match | m
    # a NULL url matches nothing: it survives a blocklist (nothing says
    # it is bad) and fails an allowlist — coalesce pins that either way
    match = F.coalesce(match, F.lit(False))
    return df.where(match if keep_on_match else ~match)


def domain_stats(df: DataFrame, url_col: str = "url",
                 text_col: str | None = "text") -> DataFrame:
    """Per-registered-domain corpus card: docs, hosts, chars, corpus
    share — the table a curation run ranks to decide which domains to
    keep, cap, or hand-review. One aggregation shuffle bounded by the
    distinct-domain count; the share window runs over the aggregated
    frame only (never the corpus)."""
    from pyspark.sql import Window

    host = host_col(F.col(url_col))
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(host).alias("n_hosts")]
    if text_col is not None:
        aggs.append(F.sum(F.length(F.col(text_col))).alias("n_chars"))
    out = (df.groupBy(registered_domain(host).alias("domain")).agg(*aggs))
    total = Window.partitionBy()
    return out.withColumn(
        "doc_share", F.col("n_docs") / F.sum("n_docs").over(total))
