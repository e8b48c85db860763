"""robots.txt parsing + crawl-permission filtering (textops/robots.py)."""
import duckdb
import pytest

from pybel_spark.textops import robots

ROBOTS_STAR = ('# comment\n'
               'User-agent: googlebot\n'
               'Disallow: /google-only\n'
               'User-agent: *\n'
               'Disallow: /private\n'
               'Disallow:\n'
               'Disallow: /tmp\n'
               'User-agent: badbot\n'
               'Disallow: /\n')

ROBOTS_NO_STAR = ('User-agent: googlebot\n'
                  'Disallow: /a\n')


@pytest.fixture(scope='module')
def rules(spark):
    return spark.createDataFrame(
        [('a.example.com', ROBOTS_STAR),
         ('b.example.com', ROBOTS_NO_STAR),
         ('c.example.com', None)],
        'host string, robots_txt string')


def test_star_group_extraction(spark, rules):
    got = {r['host']: r['disallow']
           for r in robots.parse_robots(rules).collect()}
    # only the * group's non-empty prefixes, in file order; the googlebot
    # and badbot groups are ignored, the empty Disallow: is dropped
    assert got['a.example.com'] == ['/private', '/tmp']
    assert got['b.example.com'] == []
    assert got['c.example.com'] == []


def test_filter_disallowed(spark, rules):
    pages = spark.createDataFrame(
        [(0, 'https://a.example.com/public/x.html'),
         (1, 'https://a.example.com/private/y.html'),
         (2, 'https://a.example.com/tmp'),
         (3, 'https://a.example.com/google-only/z.html'),  # * not blocked
         (4, 'https://b.example.com/a/anything.html'),     # no * group
         (5, 'https://no-robots.example.com/q.html')],     # no robots row
        'doc_id long, url string')
    kept = sorted(r['doc_id'] for r in
                  robots.filter_disallowed(pages, rules).collect())
    assert kept == [0, 3, 4, 5]


def test_filter_preserves_caller_columns(spark, rules):
    """A pages table that already carries 'host' / 'disallow' columns must
    keep them through the filter (drop-by-name removes every column with
    that name — r5 ADVICE)."""
    pages = spark.createDataFrame(
        [(0, 'https://a.example.com/public/x.html', 'keep-me', ['d0']),
         (1, 'https://a.example.com/private/y.html', 'gone', ['d1'])],
        'doc_id long, url string, host string, disallow array<string>')
    out = robots.filter_disallowed(pages, rules)
    assert set(out.columns) == {'doc_id', 'url', 'host', 'disallow'}
    rows = out.collect()
    assert [(r['doc_id'], r['host'], r['disallow']) for r in rows] \
        == [(0, 'keep-me', ['d0'])]


def test_duckdb_dialect_agreement(spark, rules):
    """The oracle replays the governing-group logic with a
    most-recent-User-agent window instead of the fold — pin equality."""
    rows = [(r['host'], r['robots_txt']) for r in rules.collect()]
    con = duckdb.connect()
    con.execute('CREATE TABLE robots(host VARCHAR, robots_txt VARCHAR)')
    con.executemany('INSERT INTO robots VALUES (?, ?)', rows)
    duck = dict(con.execute(r"""
      WITH lines AS (
        SELECT host, u.s.line AS line, u.s.ord AS ord
        FROM robots, unnest(list_transform(
          regexp_split_to_array(coalesce(robots_txt, ''), '\r?\n'),
          (x, i) -> struct_pack(line := x, ord := i))) AS u(s)),
      ua AS (
        SELECT host, ord,
          regexp_extract(line, '(?i)^\s*user-agent\s*:\s*(\S+)', 1) AS agent
        FROM lines WHERE regexp_matches(line, '(?i)^\s*user-agent\s*:')),
      dis AS (
        SELECT host, ord,
          regexp_extract(line, '(?i)^\s*disallow\s*:\s*(\S*)', 1) AS pfx
        FROM lines WHERE regexp_matches(line, '(?i)^\s*disallow\s*:')),
      gov AS (
        SELECT d.host, d.ord, d.pfx,
          (SELECT agent FROM ua u WHERE u.host = d.host AND u.ord < d.ord
           ORDER BY u.ord DESC LIMIT 1) AS agent
        FROM dis d)
      SELECT r.host, coalesce(
        (SELECT list(g.pfx ORDER BY g.ord) FROM gov g
         WHERE g.host = r.host AND g.agent = '*' AND g.pfx != ''), [])
      FROM robots r
    """).fetchall())
    got = {r['host']: r['disallow']
           for r in robots.parse_robots(rules).collect()}
    assert got == duck


def test_parse_is_map_side(spark, rules):
    plan = robots.parse_robots(rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'Exchange' not in plan
    assert 'Python' not in plan
