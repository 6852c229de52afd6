"""Web-corpus ingestion queries: HTML extraction, URL normalization,
license/canary scanning (operators/web.py).

The documents fixture carries clean text, so each query deterministically
CONSTRUCTS the raw artifact (an HTML page, a messy URL) from fixture
columns — identically on the Spark and DuckDB sides — then runs the
operator on one side and the generated SQL twin on the other. Same
trick as the codec queries (plans/llmdata8.py): the construction is the
fixture, the extraction is what's under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.localrel import local_relation
from ..io import load_table
from ..operators.web import (
    extract_html_text,
    extract_links_sql,
    html_extract_sql,
    license_scan,
    license_scan_sql,
    normalize_urls,
    normalize_urls_sql,
    CANARY_TOKEN,
    LICENSE_MARKERS,
)
from .registry import register

# --------------------------------------------------------------------------
# Shared fixture constructions (Spark expression + SQL twin, one source
# of truth per construction rule)
# --------------------------------------------------------------------------

_HTML_SQL = (
    "'<html><head><title>' || source || '</title>'"
    " || '<style type=\"text/css\">p{margin:0} .x>y{}</style>'"
    " || '<script>if(a<b&&c>d){alert(\"x\")}</script></head>'"
    " || '<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'"
    " || '<!-- crawl ' || CAST(doc_id AS VARCHAR) || ' <meta> -->'"
    " || '<p>' || text || '</p>'"
    " || '<ul><li>lang &amp; ' || lang || '</li>'"
    " || '<li>&lt;raw&gt; &quot;q&#39;s&quot;&nbsp;end</li></ul>'"
    " || '</body></html>'"
)


def _html_col():
    return F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit("</title>"),
        F.lit('<style type="text/css">p{margin:0} .x>y{}</style>'),
        F.lit('<script>if(a<b&&c>d){alert("x")}</script></head>'),
        F.lit("<body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>"),
        F.lit("<!-- crawl "),
        F.col("doc_id").cast("string"),
        F.lit(" <meta> -->"),
        F.lit("<p>"),
        F.col("text"),
        F.lit("</p>"),
        F.lit("<ul><li>lang &amp; "),
        F.col("lang"),
        F.lit("</li>"),
        F.lit("<li>&lt;raw&gt; &quot;q&#39;s&quot;&nbsp;end</li></ul>"),
        F.lit("</body></html>"),
    )


# Messy-URL construction: uppercase scheme + www, mixed TLDs (one
# two-label public suffix), default AND non-default explicit ports,
# trailing slashes, tracking params interleaved with real ones, and a
# fragment — every normalization rule gets exercised by some residue
# class of doc_id.
_URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)"
    " || '://WWW.' || source"
    " || (CASE WHEN doc_id % 7 = 0 THEN '.co.uk' ELSE '.com' END)"
    " || (CASE WHEN doc_id % 5 = 0 THEN ':8080'"
    "          WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)"
    " || '/A/' || lang || '/' || CAST(doc_id AS VARCHAR)"
    " || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)"
    " || (CASE WHEN doc_id % 3 = 0 THEN"
    "        '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)"
    "          || '&utm_campaign=x&ref=tw'"
    "      WHEN doc_id % 3 = 1 THEN"
    "        '?id=' || CAST(doc_id AS VARCHAR) || '&utm_medium=m&q=spark'"
    "      ELSE '' END)"
    " || (CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END)"
)


def _url_col():
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://WWW."),
        F.col("source"),
        F.when(did % 7 == 0, F.lit(".co.uk")).otherwise(F.lit(".com")),
        F.when(did % 5 == 0, F.lit(":8080"))
        .when(did % 2 == 0, F.lit(":443"))
        .otherwise(F.lit(":80")),
        F.lit("/A/"),
        F.col("lang"),
        F.lit("/"),
        did.cast("string"),
        F.when(did % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&id="),
                did.cast("string"),
                F.lit("&utm_campaign=x&ref=tw"),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("?id="), did.cast("string"), F.lit("&utm_medium=m&q=spark")
            ),
        )
        .otherwise(F.lit("")),
        F.when(did % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


# License-marker injection: residues 0-3 of doc_id % 11 get one marker
# each (in LICENSE_MARKERS order), residue 4 gets the canary token,
# residue 5 gets TWO markers (priority order must break the tie),
# everything else stays unmarked.
_MARKER_TEXTS = (
    "This work is licensed under a Creative Commons Attribution 4.0 License.",
    "Released under the MIT License.",
    "Licensed under the Apache License, Version 2.0.",
    "GNU General Public License v3.",
    f"eval fixture {CANARY_TOKEN} do not train",
    "Dual: MIT License or Creative Commons Attribution.",
)

_MARKED_SQL = (
    "text || CASE doc_id % 11 "
    + " ".join(f"WHEN {i} THEN ' {t}'" for i, t in enumerate(_MARKER_TEXTS))
    + " ELSE '' END"
)


def _marked_col():
    suffix = F.lit("")
    for i, t in enumerate(_MARKER_TEXTS):
        suffix = F.when(F.col("doc_id") % 11 == i, F.lit(" " + t)).otherwise(suffix)
    return F.concat(F.col("text"), suffix)


# --------------------------------------------------------------------------
# Declared queries
# --------------------------------------------------------------------------


@register(
    "q_html_extract",
    sql=f"""
    WITH h AS (SELECT doc_id, {_HTML_SQL} AS html FROM documents)
    SELECT doc_id,
           {html_extract_sql('html')} AS clean_text,
           CAST(length({html_extract_sql('html')}) AS BIGINT) AS clean_len
    FROM h
    """,
    doc="HTML -> text extraction over constructed pages (script/style/"
    "comment removal, block structure, entity decode, ws collapse)",
    tags=("web", "curation"),
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select("doc_id", _html_col().alias("html"))
    out = extract_html_text(pages, html_col="html")
    return out.select(
        "doc_id",
        "clean_text",
        F.length("clean_text").cast("bigint").alias("clean_len"),
    )


@register(
    "q_url_normalize",
    sql=(
        lambda cols: f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    SELECT doc_id,
           {cols['url_norm']} AS url_norm,
           {cols['scheme']} AS scheme,
           {cols['host']} AS host,
           {cols['registered_domain']} AS registered_domain,
           {cols['path_norm']} AS path_norm,
           {cols['query_clean']} AS query_clean
    FROM u
    """
    )(normalize_urls_sql("url")),
    doc="URL canonicalization: scheme/host lowering, www + default-port "
    "+ fragment + tracking-param stripping, public-suffix registered "
    "domain",
    tags=("web", "curation"),
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", _url_col().alias("url"))
    out = normalize_urls(urls, url_col="url")
    return out.select(
        "doc_id",
        "url_norm",
        "scheme",
        "host",
        "registered_domain",
        "path_norm",
        "query_clean",
    )


@register(
    "q_license_filter",
    sql=(
        lambda cols: f"""
    WITH m AS (SELECT doc_id, {_MARKED_SQL} AS text FROM documents)
    SELECT doc_id,
           {cols['license']} AS license,
           {cols['canary_hit']} AS canary_hit
    FROM m
    """
    )(license_scan_sql("text")),
    doc="License-marker tagging (priority order on dual-licensed docs) "
    "+ contamination-canary flag",
    tags=("web", "curation"),
)
def q_license_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    marked = docs.select("doc_id", _marked_col().alias("text"))
    out = license_scan(marked, text_col="text")
    return out.select("doc_id", "license", "canary_hit")


# Self-check that the priority constant count matches the injection
# fixture (residue 5 exercises the tie-break; if someone extends
# LICENSE_MARKERS they must extend _MARKER_TEXTS too).
assert len(_MARKER_TEXTS) == len(LICENSE_MARKERS) + 2


# --------------------------------------------------------------------------
# Composed ingestion pipeline
# --------------------------------------------------------------------------

#: Domains excluded by the fixture blocklist — one .com and one
#: two-label-suffix domain so the blocklist exercises both
#: registered-domain shapes.
BLOCKED_DOMAINS = ("src1.com", "src0.co.uk")


@register(
    "q_web_ingest",
    sql=(
        lambda ucols, lcols: f"""
    WITH m AS (SELECT doc_id, lang, source, {_MARKED_SQL} AS text
               FROM documents),
    h AS (SELECT doc_id, {_HTML_SQL} AS html, {_URL_SQL} AS url FROM m),
    e AS (SELECT doc_id, url, {html_extract_sql('html')} AS clean_text
          FROM h),
    u AS (SELECT doc_id, clean_text,
                 {ucols['registered_domain']} AS registered_domain
          FROM e)
    SELECT doc_id, registered_domain,
           {lcols['license']} AS license,
           CAST(length(clean_text) AS BIGINT) AS clean_len
    FROM u
    WHERE registered_domain NOT IN {BLOCKED_DOMAINS!r}
      AND NOT {lcols['canary_hit']}
    """
    )(normalize_urls_sql("url"), license_scan_sql("clean_text")),
    doc="Composed web-ingestion pipeline: HTML extraction -> URL "
    "canonicalization -> broadcast blocklist anti-join -> license tag "
    "+ canary drop, hash-verified end-to-end via the same stitched "
    "fragments as the stage queries",
    tags=("web", "curation", "pipeline"),
)
def q_web_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.web import blocklist_filter

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "lang", "source", _marked_col().alias("text"))
    pages = base.select(
        "doc_id", _html_col().alias("html"), _url_col().alias("url")
    )
    ext = extract_html_text(pages, html_col="html")
    urls = normalize_urls(ext, url_col="url")
    blocklist = local_relation(
        spark, [(d,) for d in BLOCKED_DOMAINS], "domain string"
    )
    kept = blocklist_filter(urls, blocklist)
    scanned = license_scan(kept, text_col="clean_text")
    return (
        scanned.filter(~F.col("canary_hit"))
        .select(
            "doc_id",
            "registered_domain",
            "license",
            F.length("clean_text").cast("bigint").alias("clean_len"),
        )
    )


# --------------------------------------------------------------------------
# Public-suffix-list registered domains
# --------------------------------------------------------------------------

#: Fixture PSL. Deliberately contains OVERLAPPING suffixes ('uk' and
#: 'co.uk') so the query exercises longest-match preference.
PSL_SUFFIXES = ("uk", "co.uk", "com", "org", "ac.jp")

_HOST_SQL = (
    "CASE doc_id % 5"
    " WHEN 0 THEN 'news.' || source || '.co.uk'"
    " WHEN 1 THEN source || '.ac.jp'"
    " WHEN 2 THEN 'a.b.' || source || '.com'"
    " WHEN 3 THEN source || '.unknowntld'"
    " ELSE 'x.' || source || '.uk' END"
)


def _host_col():
    did = F.col("doc_id")
    src = F.col("source")
    return (
        F.when(did % 5 == 0, F.concat(F.lit("news."), src, F.lit(".co.uk")))
        .when(did % 5 == 1, F.concat(src, F.lit(".ac.jp")))
        .when(did % 5 == 2, F.concat(F.lit("a.b."), src, F.lit(".com")))
        .when(did % 5 == 3, F.concat(src, F.lit(".unknowntld")))
        .otherwise(F.concat(F.lit("x."), src, F.lit(".uk")))
    )


def _psl_case_sql() -> str:
    """Longest-match CASE generated from PSL_SUFFIXES (longest first) —
    the fixed-list oracle twin of the generic broadcast-join operator."""
    by_len = sorted(PSL_SUFFIXES, key=lambda s: (-s.count("."), -len(s)))
    backslash_dot = "\\."
    escaped = [(s, s.replace(".", backslash_dot)) for s in by_len]
    arms = " ".join(
        f"WHEN host LIKE '%.{s}' THEN "
        f"regexp_extract(host, '([^.]+{backslash_dot}{e})$', 1)"
        for s, e in escaped
    )
    return (
        f"CASE {arms} ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END"
    )


@register(
    "q_psl_domain",
    sql=f"""
    WITH h AS (SELECT doc_id, {_HOST_SQL} AS host FROM documents)
    SELECT doc_id, host, {_psl_case_sql()} AS registered_domain FROM h
    """,
    doc="Registered domain via a real public-suffix LIST (broadcast "
    "join, bounded suffix-candidate explode, longest-match groupBy) — "
    "the deployment mechanism behind normalize_urls' regex "
    "approximation. The fixture PSL contains overlapping 'uk' and "
    "'co.uk' so the oracle hash proves longest-match preference.",
    tags=("web", "curation"),
)
def q_psl_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.web import registered_domain_psl

    docs = load_table(spark, sf_dir, "documents")
    hosts = docs.select("doc_id", _host_col().alias("host"))
    psl = local_relation(spark, [(s,) for s in PSL_SUFFIXES], "suffix string")
    return registered_domain_psl(hosts, psl).select(
        "doc_id", "host", "registered_domain"
    )


@register(
    "q_url_normalize_psl",
    sql=(
        lambda cols, psl_case: f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
         n AS (SELECT doc_id,
                      {cols['url_norm']} AS url_norm,
                      {cols['host']} AS host
               FROM u)
    SELECT doc_id, url_norm, host,
           {psl_case} AS registered_domain
    FROM n
    """
    )(normalize_urls_sql("url"), _psl_case_sql()),
    doc="URL canonicalization with the REAL public-suffix list wired "
    "in as the registered-domain authority (normalize_urls(psl=...)): "
    "every column stays a scan-side expression except "
    "registered_domain, which swaps the two-label regex approximation "
    "for the longest-match broadcast-join over the PSL table — the "
    "deployment-grade default the regex path approximates. The "
    "fixture PSL's overlapping 'uk'/'co.uk' suffixes make the hash "
    "prove longest-match preference through the composed path.",
    tags=("web", "curation"),
)
def q_url_normalize_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", _url_col().alias("url"))
    psl = local_relation(spark, [(s,) for s in PSL_SUFFIXES], "suffix string")
    out = normalize_urls(urls, url_col="url", psl=psl)
    return out.select("doc_id", "url_norm", "host", "registered_domain")


# Link-bearing page construction: two anchors per doc — one messy
# (attrs around href, nested markup in the anchor) and one plain —
# plus a decoy <a> with no href, which must NOT match.
_LINKED_HTML_SQL = (
    "'<p>intro</p>"
    "<a class=\"x\" href=\"https://WWW.' || source || '.com/p/'"
    " || CAST(doc_id AS VARCHAR) || '?utm_s=1\" rel=\"nofollow\">'"
    " || 'Read <b>' || lang || '</b> more</a>"
    " mid <a name=\"no-href\">decoy</a> '"
    " || '<a href=\"/rel/' || CAST(doc_id AS VARCHAR) || '\">rel link</a>'"
)


def _linked_html_col():
    return F.concat(
        F.lit('<p>intro</p><a class="x" href="https://WWW.'),
        F.col("source"),
        F.lit(".com/p/"),
        F.col("doc_id").cast("string"),
        F.lit('?utm_s=1" rel="nofollow">Read <b>'),
        F.col("lang"),
        F.lit('</b> more</a> mid <a name="no-href">decoy</a> '),
        F.lit('<a href="/rel/'),
        F.col("doc_id").cast("string"),
        F.lit('">rel link</a>'),
    )


@register(
    "q_extract_links",
    sql=(
        lambda links_sql: f"""
    WITH pages AS (SELECT doc_id, {_LINKED_HTML_SQL} AS html
                   FROM documents)
    {links_sql}
    """
    )(extract_links_sql("html").replace("FROM documents)", "FROM pages)")),
    doc="Outlink + anchor-text extraction from constructed pages "
    "(messy attr order, nested anchor markup, a no-href decoy that "
    "must not match) — the edge list that feeds the link graph "
    "(PageRank/components) and anchor-text relevance corpora.",
    tags=("web", "graph"),
)
def q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.web import extract_links

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select("doc_id", _linked_html_col().alias("html"))
    return extract_links(pages)


# --------------------------------------------------------------------------
# Domain link graph -> PageRank (web -> graph capstone)
# --------------------------------------------------------------------------

def _domain_rank_sql(n_iter: int = 3, unit: int = 10**12) -> str:
    """Oracle for q_domain_link_rank: derives the SAME domain edges
    from the construction semantics (an INDEPENDENT derivation — the
    Spark side goes through real link extraction + URL normalization,
    the oracle through the fixture rules), then unrolls the
    integer-exact PageRank iterations like events._pagerank_sql.
    Edge weights aggregate at identical (src,dst) granularity on both
    sides: integer division is NOT distributive over parallel edges.
    """
    base = (15 * unit) // 100
    regdom = (
        "CASE WHEN regexp_matches(host, '\\.(co|com|org|net|ac|gov)\\.[a-z][a-z]$')"
        " THEN regexp_extract(host, '([^.]+\\.[a-z]+\\.[a-z][a-z])$', 1)"
        " ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END"
    )
    iters = []
    for i in range(1, n_iter + 1):
        iters.append(f"""
    r{i} AS (
        SELECT n.node,
               CAST({base} + (85 * COALESCE(s.in_mass, 0)) // 100
                    AS BIGINT) AS rank_units
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node,
                   sum((r.rank_units * e.w) // o.out_w) AS in_mass
            FROM edges e
            JOIN outw o ON o.src = e.src
            JOIN r{i - 1} r ON r.node = e.src
            GROUP BY 1) s ON s.node = n.node)""")
    return f"""
    WITH pd AS (SELECT doc_id, source, {regdom} AS pdom
                FROM (SELECT doc_id, source, {_HOST_SQL} AS host
                      FROM documents)),
    edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
        SELECT pdom AS src, lower(source) || '.com' AS dst FROM pd
        UNION ALL
        SELECT pdom, pdom FROM pd) GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w
             FROM edges GROUP BY 1),
    r0 AS (SELECT node, CAST({unit} AS BIGINT) AS rank_units FROM nodes),
    {",".join(iters)}
    SELECT node, rank_units,
           CAST(rank_units AS DOUBLE) / {unit} AS rank
    FROM r{n_iter}
    """


@register(
    "q_domain_link_rank",
    sql=_domain_rank_sql(3),
    doc="Web -> graph capstone: constructed pages go through REAL link "
    "extraction, relative-href resolution against the page host, URL "
    "normalization to registered domains, and integer-exact PageRank "
    "over the domain edge graph. The oracle derives the same edges "
    "independently from the fixture rules, so a hash match proves the "
    "whole extraction->normalization->graph composition.",
    tags=("web", "graph", "pipeline"),
)
def q_domain_link_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank
    from ..operators.web import extract_links

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", _host_col().alias("page_host"), _linked_html_col().alias("html")
    )
    links = extract_links(pages).join(
        pages.select("doc_id", "page_host"), "doc_id"
    )
    href_abs = F.when(
        F.col("href").startswith("/"),
        F.concat(F.lit("https://"), F.col("page_host"), F.col("href")),
    ).otherwise(F.col("href"))
    pairs = links.select(
        F.concat(F.lit("https://"), F.col("page_host")).alias("src_url"),
        href_abs.alias("dst_url"),
    )
    src = normalize_urls(pairs.withColumn("url", F.col("src_url")), "url").select(
        F.col("registered_domain").alias("src"), "dst_url"
    )
    both = normalize_urls(src.withColumn("url", F.col("dst_url")), "url").select(
        "src", F.col("registered_domain").alias("dst")
    )
    edges = both.groupBy("src", "dst").agg(F.count("*").alias("w"))
    return pagerank(edges, n_iter=3, weight_col="w")


# Re-crawl construction: the PAGE identity is doc_id % 50 (ten crawls
# of each of 50 pages), while the crawl-to-crawl noise — scheme/host
# case, www, a default port, tracking params, a fragment — varies by
# doc_id. All ten variants must normalize to ONE canonical url.
_RECRAWL_URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)"
    " || (CASE WHEN doc_id % 3 = 0 THEN '://www.' ELSE '://' END)"
    " || (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END)"
    " || '.com' || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)"
    " || '/page/' || CAST(doc_id % 50 AS VARCHAR)"
    " || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=recrawl' ELSE '' END)"
    " || (CASE WHEN doc_id % 6 = 0 THEN '#top' ELSE '' END)"
)


def _recrawl_url_col():
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS")),
        F.when(did % 3 == 0, F.lit("://www.")).otherwise(F.lit("://")),
        F.when(did % 5 == 0, F.upper(F.col("source"))).otherwise(F.col("source")),
        F.lit(".com"),
        F.when(did % 7 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/page/"),
        (did % 50).cast("string"),
        F.when(did % 4 == 0, F.lit("?utm_source=recrawl")).otherwise(F.lit("")),
        F.when(did % 6 == 0, F.lit("#top")).otherwise(F.lit("")),
    )


@register(
    "q_url_recrawl_dedup",
    sql=(
        lambda cols: f"""
    WITH u AS (SELECT doc_id, {_RECRAWL_URL_SQL} AS url FROM documents),
    n AS (SELECT doc_id, {cols['url_norm']} AS url_norm FROM u)
    SELECT url_norm, CAST(min(doc_id) AS BIGINT) AS keeper_doc,
           CAST(count(*) AS BIGINT) AS n_crawls
    FROM n GROUP BY url_norm
    """
    )(normalize_urls_sql("url")),
    doc="Re-crawl dedup keyed on the CANONICAL url: ten crawls of each "
    "page differ in scheme/host case, www, a default port, tracking "
    "params and fragments, but all collapse to one url_norm — "
    "keep-first per canonical key is why normalization must be a "
    "fixed point (test_web.py's idempotence grid). One groupBy on the "
    "canonical key; the hash proves every crawl variant collapsed.",
    tags=("web", "dedup", "curation"),
)
def q_url_recrawl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", _recrawl_url_col().alias("url"))
    n = normalize_urls(urls, url_col="url")
    return n.groupBy("url_norm").agg(
        F.min("doc_id").cast("bigint").alias("keeper_doc"),
        F.count("*").cast("bigint").alias("n_crawls"),
    )


@register(
    "q_anchor_text_profile",
    sql=(
        lambda links_sql: f"""
    WITH pages AS (SELECT doc_id, source,
                          {_LINKED_HTML_SQL} AS html FROM documents),
    links AS ({links_sql}),
    tgt AS (SELECT l.doc_id, l.anchor_text,
                   CASE WHEN l.href LIKE '/%' THEN 'self'
                        ELSE lower(p.source) || '.com' END AS target_domain
            FROM links l JOIN pages p ON p.doc_id = l.doc_id),
    toks AS (SELECT target_domain,
                    unnest(list_filter(
                      string_split_regex(lower(anchor_text), '[^a-z0-9]+'),
                      t -> t <> '')) AS term
             FROM tgt),
    counts AS (SELECT target_domain, term,
                      CAST(count(*) AS BIGINT) AS n
               FROM toks GROUP BY 1, 2),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY target_domain
                                            ORDER BY n DESC, term) AS rk
               FROM counts)
    SELECT target_domain, term, n FROM ranked WHERE rk <= 3
    """
    )(extract_links_sql("html").replace("FROM documents)", "FROM pages)")),
    doc="Anchor-text profile per link target: the terms OTHER pages "
    "use when linking to a domain (top-3 per target) — the classic "
    "link-graph relevance signal anchor corpora are built from. "
    "Relative hrefs profile under 'self'. Extraction -> token explode "
    "-> per-domain top-k window.",
    tags=("web", "graph", "mining"),
)
def q_anchor_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.mining import tokens_col
    from ..operators.web import extract_links

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", F.col("source"), _linked_html_col().alias("html")
    )
    links = extract_links(pages).join(
        pages.select("doc_id", "source"), "doc_id"
    )
    tgt = links.select(
        F.when(F.col("href").startswith("/"), F.lit("self"))
        .otherwise(F.concat(F.lower(F.col("source")), F.lit(".com")))
        .alias("target_domain"),
        "anchor_text",
    )
    toks = tgt.select(
        "target_domain", F.explode(tokens_col(F.col("anchor_text"))).alias("term")
    )
    counts = toks.groupBy("target_domain", "term").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.partitionBy("target_domain").orderBy(F.desc("n"), "term")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("target_domain", "term", "n")
    )
