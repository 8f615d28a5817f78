"""URL canonicalization and per-domain corpus aggregation -- the
CCNet-style grouping a crawl-scale training pipeline runs daily: fold
scheme/host case, strip default ports and fragments, drop tracking
query params and sort the survivors, peel mobile/www host prefixes, and
reduce hosts to their registered domain so per-domain statistics (doc
counts, dedup rates, quality-rule pass rates) aggregate the way crawl
curation expects.

Everything here is a pure column-expression pass (regexp_extract /
array ops -- whole-stage codegen, zero shuffle until the explicit
domain groupBy), with DuckDB twin SQL built from the same frozen
constants so the oracle is bit-identical by construction. No external
URL library: the subset of RFC 3986 implemented is exactly what the
canonicalizer needs, and dot-segment resolution ('/a/../b') is
deliberately NOT attempted (a crawl canonicalizer folds equivalent
*references*, not path algebra; documented here so nobody "fixes" it).

Reference scope note: the reference ETL (pandas+PL/pgSQL, see SURVEY.md)
has no URL handling; this module is part of the large-scale
training-data surface the engine adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params any crawl canonicalizer strips (frozen; both engines
# build their filter regex from this tuple)
TRACKING_PARAM_RE = "^(utm_[^=]*|ref|fbclid|gclid|mc_eid|mc_cid)="

# second-level public suffixes where the registered domain keeps THREE
# labels (host a.b.co.uk -> b.co.uk). Deliberately a small frozen list,
# not the full public-suffix dataset: enough to make the rule real and
# testable; swap in the full table the same way at deploy time.
SECOND_LEVEL_TLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.mx",
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def _parts(url: Column) -> dict[str, Column]:
    """Split a URL reference into (scheme, host, port, path, query)
    columns. Scheme-less references get scheme 'http' (the crawl-frontier
    convention). Fragments are discarded unconditionally."""
    scheme_raw = F.regexp_extract(url, _SCHEME_RE, 1)
    scheme = F.when(scheme_raw == "", F.lit("http")).otherwise(
        F.lower(scheme_raw)
    )
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, "^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, "^([^:]*)", 1))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    pathq = F.regexp_replace(rest, "^[^/?#]*", "")
    path = F.regexp_extract(pathq, "^([^?#]*)", 1)
    query = F.regexp_extract(pathq, r"\?([^#]*)", 1)
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
    }


def canonical_host(url: Column) -> Column:
    """Lowercased host with a single leading ``www.`` / ``m.`` /
    ``mobile.`` label peeled (the mirror prefixes that never change
    content identity)."""
    return F.regexp_replace(
        _parts(url)["host"], r"^(www|m|mobile)\.", ""
    )


def registered_domain(host: Column) -> Column:
    """Registered domain of an already-canonical host: last two labels,
    or last three when the final two form a second-level public suffix
    (``co.uk`` family, :data:`SECOND_LEVEL_TLDS`). Hosts with fewer than
    two labels (e.g. ``localhost``) pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_sld = last2.isin(*SECOND_LEVEL_TLDS)
    return (
        F.when(n <= 2, host)
        .when(is_sld & (n >= 3), last3)
        .otherwise(last2)
    )


def registered_domain_joined(
    df: DataFrame,
    host_col: str = "host",
    suffixes: DataFrame | None = None,
    out_col: str = "domain",
) -> DataFrame:
    """Table-driven variant of :func:`registered_domain` (VERDICT r12
    #4): the second-level-suffix set comes from a DataFrame with one
    ``suffix`` string column -- the full public-suffix list at deploy
    time -- via a BROADCAST equi-join on the host's last two labels
    instead of the frozen :data:`SECOND_LEVEL_TLDS` literal. Semantics
    are identical on any host whose last-2-label suffix membership
    agrees between the table and the frozen list (equivalence is
    test-pinned on the frozen subset); swapping in real PSL data is a
    data change, not a code change.

    The suffix table is dimension-sized (the real PSL is ~10k rows), so
    the join is a broadcast hash join: zero shuffle of the corpus side.
    ``suffixes=None`` falls back to the frozen-list column expression.
    """
    host = F.col(host_col)
    if suffixes is None:
        return df.withColumn(out_col, registered_domain(host))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: unlike the literal-list path (where element_at is
    # only ever evaluated under the n-guarded CASE branches), the join
    # KEY is computed unconditionally for every row, so a single-label
    # host must yield NULL pieces (concat_ws skips them) instead of an
    # ANSI out-of-bounds error
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    last3 = F.concat_ws(
        ".",
        F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    dim = F.broadcast(
        suffixes.select(F.col("suffix").alias("_sld_suffix"))
        .distinct()
        .withColumn("_is_sld", F.lit(True))
    )
    joined = df.withColumns(
        {"_sld_suffix": last2, "_n_labels": n, "_last3": last3}
    ).join(dim, "_sld_suffix", "left")
    domain = (
        F.when(F.col("_n_labels") <= 2, host)
        .when(
            F.coalesce(F.col("_is_sld"), F.lit(False))
            & (F.col("_n_labels") >= 3),
            F.col("_last3"),
        )
        .otherwise(F.col("_sld_suffix"))
    )
    return joined.withColumn(out_col, domain).drop(
        "_sld_suffix", "_n_labels", "_last3", "_is_sld"
    )


def canonical_url(url: Column) -> Column:
    """Full canonical form: lowercased scheme ('http' when absent) and
    host with mirror prefix peeled, default port dropped (80/http,
    443/https; other ports kept), path as-is ('/' when empty), fragment
    dropped, tracking params (:data:`TRACKING_PARAM_RE`) removed and the
    surviving query params SORTED so param order never splits a dedup
    key."""
    p = _parts(url)
    host = F.regexp_replace(p["host"], r"^(www|m|mobile)\.", "")
    keep_port = (
        (p["port"] != "")
        & ~((p["scheme"] == "http") & (p["port"] == "80"))
        & ~((p["scheme"] == "https") & (p["port"] == "443"))
    )
    params = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        p["scheme"],
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), p["port"])).otherwise(
            F.lit("")
        ),
        F.when(p["path"] == "", F.lit("/")).otherwise(p["path"]),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """(id, url) -> (id, canonical_url, host, domain). One codegen
    projection pass; no shuffle. Pass ``suffixes`` (a one-column
    ``suffix`` DataFrame, e.g. the full public-suffix list) to resolve
    second-level suffixes via :func:`registered_domain_joined`'s
    broadcast join instead of the frozen list -- same output schema,
    one extra broadcast hash join, still zero corpus shuffle."""
    u = F.col(url_col)
    host = canonical_host(u)
    base = df.select(
        F.col(id_col),
        canonical_url(u).alias("canonical_url"),
        host.alias("host"),
    )
    if suffixes is None:
        return base.withColumn("domain", registered_domain(F.col("host")))
    return registered_domain_joined(base, "host", suffixes)


# --------------------------------------------------------------------
# DuckDB twins: the same pipeline as SQL expression strings, built from
# the same frozen constants.
# --------------------------------------------------------------------


def _sql_parts(url_sql: str) -> dict[str, str]:
    scheme_raw = f"regexp_extract({url_sql}, '{_SCHEME_RE}', 1)"
    rest = f"regexp_replace({url_sql}, '{_SCHEME_RE}', '')"
    hostport = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    pathq = f"regexp_replace({rest}, '^[^/?#]*', '')"
    return {
        "scheme": f"(CASE WHEN {scheme_raw} = '' THEN 'http' "
        f"ELSE lower({scheme_raw}) END)",
        "host": f"lower(regexp_extract({hostport}, '^([^:]*)', 1))",
        "port": f"regexp_extract({hostport}, ':([0-9]+)$', 1)",
        "path": f"regexp_extract({pathq}, '^([^?#]*)', 1)",
        "query": f"regexp_extract({pathq}, '\\?([^#]*)', 1)",
    }


def canonical_host_sql(url_sql: str) -> str:
    """DuckDB twin of :func:`canonical_host`."""
    return (
        f"regexp_replace({_sql_parts(url_sql)['host']},"
        " '^(www|m|mobile)\\.', '')"
    )


def registered_domain_sql(host_sql: str) -> str:
    """DuckDB twin of :func:`registered_domain` (``host_sql`` must be a
    plain column/alias reference -- it is spliced several times)."""
    sld = ", ".join(f"'{s}'" for s in SECOND_LEVEL_TLDS)
    labels = f"string_split({host_sql}, '.')"
    last2 = f"({labels}[-2] || '.' || {labels}[-1])"
    last3 = f"({labels}[-3] || '.' || {last2})"
    return f"""(CASE
  WHEN len({labels}) <= 2 THEN {host_sql}
  WHEN {last2} IN ({sld}) AND len({labels}) >= 3 THEN {last3}
  ELSE {last2} END)"""


def canonical_url_sql(url_sql: str) -> str:
    """DuckDB twin of :func:`canonical_url`."""
    p = _sql_parts(url_sql)
    host = (
        f"regexp_replace({p['host']}, '^(www|m|mobile)\\.', '')"
    )
    params = (
        f"list_sort(list_filter(string_split({p['query']}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')))"
    )
    qs = f"array_to_string({params}, '&')"
    keep_port = (
        f"({p['port']} <> '' AND NOT ({p['scheme']} = 'http' AND "
        f"{p['port']} = '80') AND NOT ({p['scheme']} = 'https' AND "
        f"{p['port']} = '443'))"
    )
    return f"""({p['scheme']} || '://' || {host}
  || (CASE WHEN {keep_port} THEN ':' || {p['port']} ELSE '' END)
  || (CASE WHEN {p['path']} = '' THEN '/' ELSE {p['path']} END)
  || (CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END))"""


def domain_stats(
    docs: DataFrame,
    domain_col: str = "domain",
    host_col: str = "host",
    keep_col: str = "keep",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-registered-domain corpus rollup: docs, distinct hosts, total
    chars, and quality-rule survivors (``keep_col`` from
    :func:`..operators.text.gopher_quality`) -- the table crawl curation
    reads to decide which domains to up/down-sample. ONE map-side-
    combined aggregate keyed by domain (bounded by the domain universe,
    never by corpus size); exact integers only, the keep RATE is the
    caller's division to make."""
    return docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(host_col)).alias("n_hosts"),
        F.sum(F.col(chars_col)).cast("long").alias("total_chars"),
        F.sum(F.col(keep_col).cast("long")).cast("long").alias("n_keep"),
    )


def link_domain_rollup(
    links: DataFrame,
    src_url_col: str = "src_url",
    dst_url_col: str = "dst_url",
) -> DataFrame:
    """Registered-domain link-graph rollup over a page-level outlink
    table -- the cross-domain half of crawl curation that the z168
    within-domain rollup doesn't see: which domains cite which, how
    concentrated each domain's outlinks are, and whether a pair links
    reciprocally (the classic link-exchange / spam-ring tell; organic
    citation is mostly one-way).

    Per ordered (src_domain, dst_domain) pair with src != dst
    (intra-domain navigation is not citation):
    n_links, n_src_pages (DISTINCT canonical source urls -- sitewide
    boilerplate links collapse), reciprocal (the reversed pair exists),
    and outshare_micros = this pair's exact HALF_UP share of the source
    domain's external outlinks.

    Scale shape: one canonicalization projection (pure codegen), one
    pair-keyed aggregate with a distinct-count, then everything further
    operates on the DOMAIN-PAIR table (bounded by the domain universe
    squared, never by link volume): a src-keyed total join and one
    self-equi-join against its own reversal for the reciprocal flag.
    No window, no all-pairs over links.
    """
    src_host = canonical_host(F.col(src_url_col))
    dst_host = canonical_host(F.col(dst_url_col))
    proj = links.select(
        canonical_url(F.col(src_url_col)).alias("_src_page"),
        registered_domain(src_host).alias("src_domain"),
        registered_domain(dst_host).alias("dst_domain"),
    ).filter(F.col("src_domain") != F.col("dst_domain"))
    pairs = proj.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("_src_page").cast("long").alias("n_src_pages"),
    )
    totals = pairs.groupBy("src_domain").agg(
        F.sum("n_links").cast("long").alias("_out_total")
    )
    rev = pairs.select(
        F.col("dst_domain").alias("src_domain"),
        F.col("src_domain").alias("dst_domain"),
        F.lit(True).alias("reciprocal"),
    ).distinct()
    from ..functions.exactnum import ratio_micros_halfup

    return (
        pairs.join(totals, "src_domain")
        .join(rev, ["src_domain", "dst_domain"], "left")
        .select(
            "src_domain",
            "dst_domain",
            "n_links",
            "n_src_pages",
            F.coalesce(F.col("reciprocal"), F.lit(False)).alias(
                "reciprocal"
            ),
            ratio_micros_halfup(
                F.col("n_links"), F.col("_out_total")
            ).alias("outshare_micros"),
        )
    )


def link_domain_rollup_oracle_sql(
    links_sql: str,
    src_url_sql: str = "src_url",
    dst_url_sql: str = "dst_url",
) -> str:
    """DuckDB twin of :func:`link_domain_rollup` (same canonicalization
    twins, same cleared-integer share)."""
    sh = canonical_host_sql(src_url_sql)
    dh = canonical_host_sql(dst_url_sql)
    return f"""
WITH raw0 AS ({links_sql}),
hosts AS MATERIALIZED (
  SELECT {canonical_url_sql(src_url_sql)} AS src_page,
         {sh} AS src_host, {dh} AS dst_host
  FROM raw0),
proj AS MATERIALIZED (
  SELECT src_page,
         {registered_domain_sql('src_host')} AS src_domain,
         {registered_domain_sql('dst_host')} AS dst_domain
  FROM hosts),
pairs AS (
  SELECT src_domain, dst_domain,
         count(*)::BIGINT AS n_links,
         count(DISTINCT src_page)::BIGINT AS n_src_pages
  FROM proj WHERE src_domain <> dst_domain
  GROUP BY 1, 2),
totals AS (SELECT src_domain, sum(n_links)::BIGINT AS out_total
           FROM pairs GROUP BY 1)
SELECT p.src_domain, p.dst_domain, p.n_links, p.n_src_pages,
       (r.src_domain IS NOT NULL) AS reciprocal,
       ((2000000 * p.n_links + t.out_total) // (2 * t.out_total))::BIGINT
         AS outshare_micros
FROM pairs p
JOIN totals t ON t.src_domain = p.src_domain
LEFT JOIN (SELECT DISTINCT src_domain, dst_domain FROM pairs) r
  ON r.src_domain = p.dst_domain AND r.dst_domain = p.src_domain
"""
