"""robots.txt parsing and crawl-permission filtering.

Common-Crawl-style corpora must honor robots exclusions: a page whose
host's ``robots.txt`` disallows its path for ``User-agent: *`` should
not enter the training corpus at all. This module parses the
wildcard-agent rule group with ONE higher-order aggregate over the line
array (no Python, no explode-shuffle) and applies it with a host
equi-join whose right side is vocabulary-sized (one row per host) —
broadcast under AQE at any corpus scale.

Grammar subset (documented, mirrored bit-exact by the DuckDB oracle):
the governing group of a ``Disallow`` line is the MOST RECENT
``User-agent`` line above it; only groups governed by ``*`` contribute;
empty ``Disallow:`` values (allow-all markers) are dropped; prefix
matching is literal (no ``*``/``$`` wildcards — the original 1994
grammar, which is also what the big crawlers fall back to for unknown
syntax).
"""
from pyspark.sql import Column, DataFrame, functions as F

from .urls import url_host, url_path

#: case-insensitive field extractors in the Java∩RE2 shared dialect
UA_RE = r'(?i)^\s*user-agent\s*:\s*(\S+)'
DISALLOW_RE = r'(?i)^\s*disallow\s*:\s*(\S*)'


def disallow_prefixes(robots_col) -> Column:
    """``array<string>`` of the ``User-agent: *`` Disallow prefixes of a
    robots.txt text column, in file order. One fold over the line
    array — the accumulator is (currently-in-star-group, prefixes)."""
    col = F.col(robots_col) if isinstance(robots_col, str) else robots_col
    lines = F.split(F.coalesce(col, F.lit('')), '\r?\n')
    zero = F.struct(
        F.lit(False).alias('star'),
        F.array_except(F.array(F.lit('')), F.array(F.lit('')))
        .alias('pfx'))

    def step(acc, x):
        ua = F.regexp_extract(x, UA_RE, 1)
        dis = F.regexp_extract(x, DISALLOW_RE, 1)
        is_ua = ua != ''
        is_dis = x.rlike(r'(?i)^\s*disallow\s*:')
        star = F.when(is_ua, ua == '*').otherwise(acc.star)
        pfx = F.when(is_dis & acc.star & (dis != ''),
                     F.concat(acc.pfx, F.array(dis))).otherwise(acc.pfx)
        return F.struct(star.alias('star'), pfx.alias('pfx'))

    return F.aggregate(lines, zero, step, lambda acc: acc.pfx)


def parse_robots(robots: DataFrame, host_col='host',
                 robots_col='robots_txt') -> DataFrame:
    """(host, disallow: array<string>) — the wildcard-agent rules per
    host. Map-side only."""
    return robots.select(
        F.col(host_col).alias('host'),
        disallow_prefixes(robots_col).alias('disallow'))


def filter_disallowed(pages: DataFrame, robots: DataFrame, url_col='url',
                      host_col='host', robots_col='robots_txt'
                      ) -> DataFrame:
    """Pages whose path is NOT caught by their host's wildcard-agent
    Disallow prefixes. Hosts with no robots row pass (crawl-by-default,
    as on the real web).

    Join shape: host equi-join against the parsed rule table — one row
    per host, so Spark broadcasts it at any corpus scale; the prefix
    test itself is a map-side ``exists`` over the (short) rule array.
    """
    # rule columns are renamed to reserved temporaries BEFORE the join:
    # drop-by-name removes EVERY column with that name, so a pages table
    # that already carries 'host'/'disallow' must not collide (r5 ADVICE)
    rules = parse_robots(robots, host_col, robots_col).select(
        F.col('host').alias('__rules_host'),
        F.col('disallow').alias('__rules_disallow'))
    p = pages.withColumn('__host', url_host(F.col(url_col)))
    joined = p.join(rules, p['__host'] == rules['__rules_host'], 'left')
    path = url_path(F.col(url_col))
    blocked = F.exists('__rules_disallow', lambda d: path.startswith(d))
    return (joined
            .where(~F.coalesce(blocked, F.lit(False)))
            .drop('__host', '__rules_host', '__rules_disallow'))
