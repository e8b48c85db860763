"""Hyperlink extraction and the host link graph (textops/links.py)."""
import duckdb
import pytest

from pyspark.sql import functions as F

from pybel_spark.textops import links

HTML = ('<html><body>'
        '<a href="https://other.example.com/x/y.html">abs</a>'
        '<a href="//proto.example.net/z">proto-rel</a>'
        '<a href="/root/page.html">root-rel</a>'
        '<a href="sibling.html">path-rel</a>'
        '<a href="mailto:team@example.com">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="ftp://files.example.org/f.bin">ftp</a>'
        '<a href="#top">frag</a>'
        '<a href="https://other.example.com/p?x=1#sec">abs-frag</a>'
        '</body></html>')

BASE = 'https://www.example.com/a/b/page.html'


@pytest.fixture(scope='module')
def pages(spark):
    # html as BINARY — the input_hint column type; cast-decode is part of
    # what these tests pin
    return spark.createDataFrame(
        [(BASE, HTML.encode()), ('https://www.example.com/solo', None)],
        'url string, html binary')


def test_resolution_rules(spark, pages):
    got = {r['href']: r['target']
           for r in links.page_hrefs(pages)
           .select('href',
                   links.resolve_href('url', 'href').alias('target'))
           .collect()}
    assert got['https://other.example.com/x/y.html'] == \
        'https://other.example.com/x/y.html'
    assert got['//proto.example.net/z'] == 'https://proto.example.net/z'
    assert got['/root/page.html'] == 'https://www.example.com/root/page.html'
    # path-relative resolves against the base DIRECTORY
    assert got['sibling.html'] == 'https://www.example.com/a/b/sibling.html'
    assert got['mailto:team@example.com'] is None
    assert got['javascript:void(0)'] is None
    assert got['ftp://files.example.org/f.bin'] is None
    assert got['#top'] is None
    # fragment stripped BEFORE resolution
    assert got['https://other.example.com/p?x=1#sec'] == \
        'https://other.example.com/p?x=1'


def test_null_html_and_link_filter(spark, pages):
    out = links.page_links(pages).collect()
    # the NULL-html page contributes nothing; non-web refs are gone
    assert all(r['url'] == BASE for r in out)
    assert len(out) == 5  # abs, proto-rel, root-rel, path-rel, abs-frag


def test_host_graph_self_edges_and_counts(spark, pages):
    g = {(r['src_host'], r['dst_host']): r['n_links']
         for r in links.host_link_graph(pages).collect()}
    # two links to other.example.com aggregate into one edge
    assert g[('www.example.com', 'other.example.com')] == 2
    assert g[('www.example.com', 'proto.example.net')] == 1
    # intra-host (root-rel, path-rel) edges dropped by default
    assert ('www.example.com', 'www.example.com') not in g
    with_self = {(r['src_host'], r['dst_host']): r['n_links']
                 for r in links.host_link_graph(
                     pages, drop_self=False).collect()}
    assert with_self[('www.example.com', 'www.example.com')] == 2


def test_host_graph_kg_runs_analytics(spark, pages):
    from pybel_spark.ops import analytics

    kg = links.host_graph_kg(pages)
    ranks = {r['node_id']: r['rank']
             for r in analytics.pagerank(kg, n_iterations=3).collect()}
    assert set(ranks) == {'www.example.com', 'other.example.com',
                          'proto.example.net'}
    # link targets outrank the page that only links out
    assert ranks['other.example.com'] > ranks['www.example.com']
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_duckdb_dialect_agreement(spark, pages):
    """The oracle replays extraction + resolution with the identical
    pattern strings under RE2 — pin every case across engines."""
    con = duckdb.connect()
    con.execute('CREATE TABLE pages(url VARCHAR, html VARCHAR)')
    con.execute('INSERT INTO pages VALUES (?, ?), (?, NULL)',
                [BASE, HTML, 'https://www.example.com/solo'])
    sql = """
    WITH hrefs AS (
      SELECT url, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1))
        AS href FROM pages),
    parsed AS (
      SELECT url, href,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS scheme,
        lower(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS host,
        regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
        regexp_replace(href, '#.*$', '') AS ref
      FROM hrefs),
    resolved AS (
      SELECT url, href,
        CASE
          WHEN regexp_matches(ref, '^[Hh][Tt][Tt][Pp][Ss]?://') THEN ref
          WHEN regexp_matches(ref, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
          WHEN ref LIKE '//%' THEN scheme || ':' || ref
          WHEN ref LIKE '/%' THEN scheme || '://' || host || ref
          WHEN ref = '' THEN NULL
          ELSE scheme || '://' || host ||
            (CASE WHEN regexp_replace(path, '[^/]*$', '') = '' THEN '/'
                  ELSE regexp_replace(path, '[^/]*$', '') END) || ref
        END AS target
      FROM parsed)
    SELECT href, target FROM resolved ORDER BY href
    """
    duck = dict(con.execute(sql).fetchall())
    got = {r['href']: r['target']
           for r in links.page_hrefs(pages)
           .select('href',
                   links.resolve_href('url', 'href').alias('target'))
           .collect()}
    assert got == duck


def test_extraction_is_map_side(spark, pages):
    """page_links must not shuffle: no Exchange below the collect."""
    plan = links.page_links(pages)._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'Exchange' not in plan


def test_page_anchors_and_index(spark, pages):
    a = {r['href']: r['anchor_text']
         for r in links.page_anchors(pages).collect()}
    assert a['https://other.example.com/x/y.html'] == 'abs'
    assert a['#top'] == 'frag'
    idx = {(r['target_url'], r['anchor_text']): r['n_refs']
           for r in links.anchor_text_index(pages).collect()}
    # fragment-only and non-web anchors are gone; both other.example.com
    # links survive with their distinct texts
    assert idx[('https://other.example.com/x/y.html', 'abs')] == 1
    assert idx[('https://other.example.com/p?x=1', 'abs-frag')] == 1
    assert not any('mailto' in t for t, _ in idx)


def test_anchor_index_duckdb_agreement(spark, pages):
    con = duckdb.connect()
    con.execute('CREATE TABLE pages(url VARCHAR, html VARCHAR)')
    con.execute('INSERT INTO pages VALUES (?, ?)', [BASE, HTML])
    duck = dict(con.execute(r"""
      WITH elems AS (
        SELECT url, unnest(regexp_extract_all(html,
          '<a\s[^>]*>[^<]*</a>', 0)) AS elem FROM pages)
      SELECT regexp_extract(elem, 'href="([^"]*)"', 1) AS href,
             regexp_extract(elem, '>([^<]*)</a>', 1) AS anchor_text
      FROM elems WHERE regexp_extract(elem, 'href="([^"]*)"', 1) != ''
    """).fetchall())
    got = {r['href']: r['anchor_text']
           for r in links.page_anchors(pages).collect()}
    assert got == duck
