"""URL canonicalization and domain analytics for web-corpus curation.

Web-scale training pipelines filter and weight by URL: tracking-parameter
noise makes the same page look distinct, mirrors differ only by host
case/port, and blocklists / per-domain caps operate on the registered
domain. Everything here is pure column algebra over portable regex /
array primitives, so the DuckDB oracles replay it bit-exact, and the
plan shape is a map-side projection fused into the scan — no shuffle
until an explicit per-domain aggregation.

Reference scope note: the reference engine has no URL tooling (it is a
knowledge-graph compiler); these ops belong to the training-data
pipeline layer this engine adds on top.
"""
from pyspark.sql import Column, DataFrame, functions as F

#: query parameters that carry tracking state, not content identity
TRACKING_PARAM_RE = '^(utm_[A-Za-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)='

#: two-level public suffixes where the registered domain needs THREE labels
#: (small practical subset; a full public-suffix list drops in the same way)
TWO_LEVEL_SUFFIXES = ('co.uk', 'ac.uk', 'gov.uk', 'com.au', 'net.au',
                      'co.jp', 'or.jp', 'com.br', 'co.in', 'co.kr',
                      'com.cn', 'com.mx')


def url_scheme(col) -> Column:
    return F.lower(F.regexp_extract(col, r'^([A-Za-z][A-Za-z0-9+.-]*)://', 1))


def url_host(col) -> Column:
    """Lowercased host, port stripped."""
    return F.lower(F.regexp_extract(
        col, r'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1))


def url_port(col) -> Column:
    """Explicit port string ('' when absent)."""
    return F.regexp_extract(
        col, r'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:(\d+)', 1)


#: scheme → default port, dropped during canonicalization
DEFAULT_PORTS = {'http': '80', 'https': '443'}


def url_path(col) -> Column:
    return F.regexp_extract(
        col, r'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1)


def url_query(col) -> Column:
    return F.regexp_extract(col, r'\?([^#]*)', 1)


def clean_query(col) -> Column:
    """Query string with tracking parameters removed, order preserved."""
    q = url_query(col)
    kept = F.filter(F.split(q, '&'),
                    lambda p: ~p.rlike(TRACKING_PARAM_RE) & (p != ''))
    return F.array_join(kept, '&')


def registered_domain(col) -> Column:
    """Last-two-labels domain, or last-three when the host ends in a
    known two-level public suffix (co.uk etc.)."""
    host = url_host(col)
    two = F.regexp_extract(host, r'([^.]+\.[^.]+)$', 1)
    three = F.regexp_extract(host, r'([^.]+\.[^.]+\.[^.]+)$', 1)
    is_two_level = F.lit(False)
    for suffix in TWO_LEVEL_SUFFIXES:
        is_two_level = is_two_level | host.endswith('.' + suffix)
    return F.when(is_two_level & (three != ''), three).otherwise(two)


def canonical_url(col) -> Column:
    """Stable page identity: lowercase scheme/host, DEFAULT ports and
    fragments dropped, tracking params stripped, trailing slash trimmed
    (except the bare root path). Non-default ports are KEPT — host:8080
    and host are distinct origins serving potentially distinct content
    (code-review r4 finding)."""
    scheme = url_scheme(col)
    port = url_port(col)
    is_default = F.lit(False)
    for s, p in DEFAULT_PORTS.items():
        is_default = is_default | ((scheme == s) & (port == p))
    port_part = F.when((port == '') | is_default, F.lit('')) \
        .otherwise(F.concat(F.lit(':'), port))
    path = url_path(col)
    path = F.when(path == '', F.lit('/')).otherwise(
        F.regexp_replace(path, r'(.)/$', r'$1'))
    cq = clean_query(col)
    return F.concat(
        scheme, F.lit('://'), url_host(col), port_part, path,
        F.when(cq != '', F.concat(F.lit('?'), cq)).otherwise(F.lit('')))


def parse_urls(docs: DataFrame, id_col='doc_id', url_col='url') -> DataFrame:
    """Per-document URL decomposition + canonical form. Map-side only."""
    u = F.col(url_col)
    return docs.select(
        F.col(id_col).alias('doc_id'),
        url_scheme(u).alias('scheme'),
        url_host(u).alias('host'),
        registered_domain(u).alias('domain'),
        url_path(u).alias('path'),
        clean_query(u).alias('clean_query'),
        canonical_url(u).alias('canonical_url'),
    )


def url_duplicates(docs: DataFrame, id_col='doc_id',
                   url_col='url') -> DataFrame:
    """Documents whose CANONICAL url collides (mirror/tracking-param
    dups): one bounded row per duplicated canonical url, like
    dedup.exact_duplicates."""
    return (
        parse_urls(docs, id_col, url_col)
        .groupBy('canonical_url')
        .agg(F.count(F.lit(1)).alias('n_docs'),
             F.min('doc_id').alias('keep_doc_id'))
        .where(F.col('n_docs') > 1)
    )


def domain_stats(docs: DataFrame, id_col='doc_id', url_col='url',
                 text_col='text') -> DataFrame:
    """Per-registered-domain corpus stats: docs, token mass, distinct
    hosts — the per-domain capping/weighting input. One shuffle on the
    (uniformly distributed) domain key."""
    from .tokenize import whitespace_tokens

    u = F.col(url_col)
    return (
        docs.select(
            registered_domain(u).alias('domain'),
            url_host(u).alias('host'),
            F.size(whitespace_tokens(text_col)).alias('n_tokens'))
        .groupBy('domain')
        .agg(F.count(F.lit(1)).alias('n_docs'),
             F.sum('n_tokens').alias('n_tokens'),
             F.countDistinct('host').alias('n_hosts'))
    )


def filter_blocked_domains(docs: DataFrame, blocked,
                           url_col='url') -> DataFrame:
    """Drop documents whose registered domain is blocklisted. ``blocked``
    may be a Python collection (becomes a literal isin — fused into the
    scan) or a one-column DataFrame (broadcast anti-join, for blocklists
    too large to inline in the plan)."""
    domain = registered_domain(F.col(url_col))
    if isinstance(blocked, DataFrame):
        blocked = blocked.select(
            F.col(blocked.columns[0]).alias('_blocked_domain'))
        return (docs.withColumn('_domain', domain)
                .join(F.broadcast(blocked),
                      F.col('_domain') == F.col('_blocked_domain'),
                      'left_anti')
                .drop('_domain'))
    return docs.where(~domain.isin(list(blocked)))


def cap_per_domain(docs: DataFrame, max_docs: int, id_col='doc_id',
                   url_col='url', seed: int = 0,
                   exact: bool = False) -> DataFrame:
    """Cap each registered domain's contribution to ~``max_docs``
    documents — the anti-mega-domain step of crawl curation.

    Scale path (default): two passes, no per-domain sort. Pass 1
    aggregates per-domain counts (map-side partial aggregation keeps the
    shuffle at one row per domain per partition, so a 10⁹-doc domain
    costs what a 10-doc domain costs); domains over the cap get keep
    fraction cap/count, broadcast back; pass 2 is the same deterministic
    md5-threshold filter as mixture.stratified_sample — map-side, rerun-
    stable. The kept count is binomial around the cap (±√cap); exact=True
    switches to a per-domain rank window (row_number over md5 order,
    deterministic and exact, but one task must sort each domain — only
    for corpora whose largest domain fits a task).
    """
    from .mixture import _HEX_DIGITS, fraction_to_hex_threshold, \
        sampling_hash

    domain = registered_domain(F.col(url_col))
    tagged = docs.withColumn('_domain', domain)
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy('_domain').orderBy(
            sampling_hash(id_col, seed), F.col(id_col))
        return (tagged.withColumn('_rk', F.row_number().over(w))
                .where(F.col('_rk') <= max_docs)
                .drop('_domain', '_rk'))

    counts = tagged.groupBy('_domain').agg(F.count(F.lit(1)).alias('_n'))
    # NB: hex() emits uppercase in both Spark and DuckDB; md5 output is
    # lowercase, so the threshold must be lowercased for the string
    # comparison to equal numeric comparison
    thresholds = counts.select(
        '_domain',
        F.when(F.col('_n') <= max_docs, F.lit('g'))  # keep-all sentinel
        .otherwise(F.lower(F.lpad(F.hex(
            F.floor(F.lit(float(max_docs)) / F.col('_n')
                    * (16 ** _HEX_DIGITS))), _HEX_DIGITS, '0')))
        .alias('_thr'))
    assert fraction_to_hex_threshold(1.0) == 'g'  # sentinel stays in sync
    return (
        tagged.join(F.broadcast(thresholds), on='_domain')
        .where(sampling_hash(id_col, seed) < F.col('_thr'))
        .drop('_domain', '_thr')
    )
