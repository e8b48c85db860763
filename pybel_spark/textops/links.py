"""Hyperlink extraction and the host-level web link graph.

A Common-Crawl-scale curation pipeline needs the link structure of the
crawl: host-level PageRank and in-degree are standard quality priors
(harmonic/PageRank centrality is how CC itself ranks hosts), and the
link graph is the substrate for spam-farm and SEO-cluster detection.
This module turns the (url, html) page table into that graph with pure
column algebra — `regexp_extract_all` + `explode` for the anchors, a
`when`-cascade for RFC-3986-style reference resolution, and one
(src_host, dst_host) aggregation for the graph itself.

Plan shape: anchor extraction and href resolution fuse into the page
scan (map-side, no Python); the ONLY exchange is the final groupBy on
(src_host, dst_host), which partial-aggregates map-side first — hub
hosts with millions of in-links arrive at the reducer as one partial
row per map partition, so hot destinations do not skew the shuffle.

Reference scope note: the reference engine has no web tooling (it is a
knowledge-graph compiler); like textops/urls.py this layer belongs to
the training-data pipeline this engine adds on top.
"""
from pyspark.sql import Column, DataFrame, functions as F

from .urls import url_host, url_path, url_scheme

#: double-quoted href attributes — the dialect both the synthetic corpus
#: and the DuckDB oracle mirror share (a production crawler would feed
#: the same column through its HTML parser's anchor stream instead)
HREF_RE = 'href="([^"]*)"'


def page_hrefs(pages: DataFrame, url_col='url',
               html_col='html') -> DataFrame:
    """(url, href) — one row per href attribute in the page's html.

    ``html_col`` may be binary (cast decodes UTF-8) or string; NULL html
    yields no rows. Map-side explode fused into the scan — no shuffle.
    """
    html_str = F.col(html_col).cast('string')
    return (pages
            .select(F.col(url_col).alias('url'),
                    F.explode(F.regexp_extract_all(
                        html_str, F.lit(HREF_RE), 1)).alias('href')))


#: a whole anchor element with single-text-node content; nested markup
#: inside <a> yields no row (documented simplification shared with the
#: oracle dialect — a production parser feeds the same columns)
ANCHOR_ELEM_RE = '<a\\s[^>]*>[^<]*</a>'


def page_anchors(pages: DataFrame, url_col='url',
                 html_col='html') -> DataFrame:
    """(url, href, anchor_text) — one row per simple ``<a>`` element.
    Map-side explode fused into the scan, like :func:`page_hrefs`."""
    html_str = F.col(html_col).cast('string')
    elems = pages.select(
        F.col(url_col).alias('url'),
        F.explode(F.regexp_extract_all(
            html_str, F.lit(ANCHOR_ELEM_RE), 0)).alias('elem'))
    return (elems
            .select('url',
                    F.regexp_extract('elem', HREF_RE, 1).alias('href'),
                    F.regexp_extract('elem', '>([^<]*)</a>', 1)
                    .alias('anchor_text'))
            .where(F.col('href') != ''))


def anchor_text_index(pages: DataFrame, url_col='url',
                      html_col='html') -> DataFrame:
    """(target_url, anchor_text, n_refs) — what the web CALLS a page:
    the classic entity-linking / retrieval signal (anchor text is how
    search engines and KG entity linkers name targets they have never
    fetched). Non-web references are dropped; the only exchange is the
    (target_url, anchor_text) aggregation, partial map-side."""
    anchors = page_anchors(pages, url_col, html_col)
    resolved = (anchors
                .select(resolve_href('url', 'href').alias('target_url'),
                        'anchor_text')
                .where(F.col('target_url').isNotNull()))
    return (resolved.groupBy('target_url', 'anchor_text')
            .agg(F.count(F.lit(1)).alias('n_refs')))


def resolve_href(base, href) -> Column:
    """The absolute URL a href reference points to, resolved against the
    page URL ``base``:

    - absolute ``http(s)://`` references pass through;
    - other absolute schemes (``ftp://``, ``mailto:``, ``javascript:``)
      resolve to NULL — they are not crawlable web links;
    - protocol-relative ``//host/path`` takes the base scheme;
    - root-relative ``/path`` takes the base origin;
    - bare-fragment and empty references resolve to NULL;
    - anything else is path-relative, resolved against the base
      DIRECTORY. ``..``-segment normalization is deliberately not
      applied (documented simplification; hosts — all this module's
      consumers use — are unaffected by path dots).

    Fragments are stripped first, per RFC 3986 §5.2 reference
    resolution. Pure column algebra in the Java∩RE2 shared regex
    dialect, so the DuckDB oracle replays it bit-exact.
    """
    base = F.col(base) if isinstance(base, str) else base
    href = F.col(href) if isinstance(href, str) else href
    scheme = url_scheme(base)
    origin = F.concat(scheme, F.lit('://'), url_host(base))
    basedir = F.regexp_replace(url_path(base), '[^/]*$', '')
    basedir = F.when(basedir == '', F.lit('/')).otherwise(basedir)
    ref = F.regexp_replace(href, '#.*$', '')
    return (
        F.when(ref.rlike('^[Hh][Tt][Tt][Pp][Ss]?://'), ref)
        .when(ref.rlike('^[A-Za-z][A-Za-z0-9+.-]*:'), F.lit(None))
        .when(ref.startswith('//'), F.concat(scheme, F.lit(':'), ref))
        .when(ref.startswith('/'), F.concat(origin, ref))
        .when(ref == '', F.lit(None))
        .otherwise(F.concat(origin, basedir, ref)))


def page_links(pages: DataFrame, url_col='url',
               html_col='html') -> DataFrame:
    """(url, target_url) — resolved, crawlable out-links per page.
    Non-web and fragment-only references are dropped."""
    hrefs = page_hrefs(pages, url_col, html_col)
    return (hrefs
            .select('url', resolve_href('url', 'href').alias('target_url'))
            .where(F.col('target_url').isNotNull()))


def host_link_graph(pages: DataFrame, url_col='url', html_col='html',
                    drop_self=True) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level link graph.

    ``drop_self=True`` (default) removes intra-host edges, which
    dominate raw counts (nav bars) and carry no cross-site signal. One
    exchange: the (src_host, dst_host) hash aggregation, partial
    map-side."""
    links = page_links(pages, url_col, html_col)
    hosts = links.select(url_host(F.col('url')).alias('src_host'),
                         url_host(F.col('target_url')).alias('dst_host'))
    if drop_self:
        hosts = hosts.where(F.col('src_host') != F.col('dst_host'))
    return (hosts
            .where((F.col('src_host') != '') & (F.col('dst_host') != ''))
            .groupBy('src_host', 'dst_host')
            .agg(F.count(F.lit(1)).alias('n_links')))


def host_graph_kg(pages: DataFrame, url_col='url', html_col='html',
                  drop_self=True):
    """The host link graph as an :class:`~pybel_spark.ops.graph.KG`
    (node_id = host), so every graph-analytics operator (PageRank,
    k-core, components, communities) runs on hosts unchanged."""
    from ..ops.graph import KG

    edges = host_link_graph(pages, url_col, html_col, drop_self)
    nodes = (edges.select(F.col('src_host').alias('node_id'))
             .unionByName(edges.select(F.col('dst_host').alias('node_id')))
             .distinct())
    return KG(nodes=nodes,
              edges=edges.select(F.col('src_host').alias('source_id'),
                                 F.col('dst_host').alias('target_id'),
                                 'n_links'))
