"""Citation enrichment: resolve PubMed metadata (authors) onto edges.

Reference: ``manager/citation_utils.py:137-244`` (enrich_pubmed_citations —
batched EUtils lookups cached in SQLite, then written onto every edge's
citation dict) and ``struct/graph.py:316-325`` (number_of_authors /
count_authors).

Spark-first shape: the service call is per DISTINCT pmid, not per edge —
a corpus with 10⁹ edges typically has ~10⁷ distinct citations. The distinct
pmids flow through ONE Arrow-batched ``mapInPandas`` stage whose batches
become the resolver's request batches (the real-world HTTP batching
boundary), and the resulting small (pmid → authors) table is broadcast-
joined back onto the edges — the edge table itself is never shuffled.

The network fetch itself is out of scope in this environment (no HTTP), so
the default resolver is a deterministic fake with the exact signature a real
EUtils client would have: ``resolver(pmids: list[str]) -> dict[str,
list[str]]``.
"""
import hashlib

from pyspark.sql import DataFrame, functions as F

from .ops.graph import KG


def fake_pubmed_resolver(pmids):
    """Deterministic stand-in for an EUtils author lookup: each pmid gets
    1-4 md5-derived authors, reproducible in any engine."""
    out = {}
    for pmid in pmids:
        digest = hashlib.md5(str(pmid).encode('utf8')).hexdigest()
        n = int(digest[:2], 16) % 4 + 1
        out[str(pmid)] = [
            'Author {} {}'.format(digest[2 + 2 * i:4 + 2 * i], i)
            for i in range(n)
        ]
    return out


# --------------------------------------------------------------------- #
# Real NCBI eUtils esummary protocol (citation_utils.py:26,85-98), with the
# socket injectable: ``transport(method, url) -> bytes``. The URL format,
# request batching, response envelope (result.uids / result[pmid]) and
# extracted fields are the published eSummary v2 JSON interface, so a
# recorded response fixture exercises the exact production parse path.

EUTILS_ESUMMARY_URL = ('https://eutils.ncbi.nlm.nih.gov/entrez/eutils/'
                       'esummary.fcgi?db=pubmed&retmode=json&id={}')

_SEASON_MONTH = {'Spring': 3, 'Summer': 6, 'Fall': 9, 'Winter': 12}


def sanitize_pubdate(raw):
    """PubMed ``pubdate`` → ISO-8601 date string, or None if unparseable.

    Handles the zoo of formats the service actually emits
    (citation_utils.py:40-69): 'YYYY Mon DD', 'YYYY Mon', 'YYYY',
    'YYYY Mon-Mon', 'YYYY Season', 'YYYY Mon DD-DD' and
    'YYYY Mon DD-Mon DD' (ranges resolve to their start)."""
    import re
    from datetime import datetime

    parts = (raw or '').strip().split()
    if not parts or not re.match(r'^[12]\d{3}$', parts[0]) or len(parts) > 4:
        return None
    year = int(parts[0])
    if len(parts) == 1:
        return '{:04d}-01-01'.format(year)
    month_tok = parts[1].split('-')[0]
    if month_tok in _SEASON_MONTH:
        if len(parts) > 2:
            return None
        return '{:04d}-{:02d}-01'.format(year, _SEASON_MONTH[month_tok])
    try:
        month = datetime.strptime(month_tok, '%b').month
    except ValueError:
        return None
    if len(parts) == 2:
        return '{:04d}-{:02d}-01'.format(year, month)
    day_tok = parts[2].split('-')[0]
    if not day_tok.isdigit():
        return None
    try:
        return datetime(year, month, int(day_tok)).strftime('%Y-%m-%d')
    except ValueError:
        return None


def parse_esummary_response(payload) -> dict:
    """eSummary JSON → {pmid: citation record}.

    Records carry the same fields the reference writes onto its Citation
    model (citation_utils.py:100-132): authors (name list), first/last
    author, title, journal, volume, issue, pages, ISO date. Records the
    service flags with ``error`` are dropped (the caller sees them as
    unresolved, exactly like the reference's error set).
    """
    import json

    if isinstance(payload, (bytes, bytearray)):
        payload = json.loads(payload.decode('utf8'))
    result = payload.get('result', {})
    out = {}
    for pmid in result.get('uids', []):
        rec = result.get(pmid)
        if rec is None or 'error' in rec:
            continue
        out[str(pmid)] = {
            'authors': [a['name'] for a in rec.get('authors', [])
                        if a.get('authtype', 'Author') != 'CollectiveName'],
            'first': rec.get('sortfirstauthor'),
            'last': rec.get('lastauthor'),
            'title': rec.get('title'),
            'journal': rec.get('fulljournalname'),
            'volume': rec.get('volume'),
            'issue': rec.get('issue'),
            'pages': rec.get('pages'),
            'date': sanitize_pubdate(rec.get('pubdate')),
        }
    return out


def eutils_resolver(transport, group_size: int = 200):
    """Build a resolver backed by the real eUtils esummary endpoint.

    ``transport('GET', url) -> bytes`` is the only side-effecting piece —
    inject a recorded-fixture transport in tests, a requests/urllib3
    session in production. Requests are batched ``group_size`` pmids per
    URL (the reference's grouper default, citation_utils.py:152).

    Returns full citation records; pass through ``authors_only`` for the
    ``resolve_citation_authors`` interface.
    """
    def resolve(pmids):
        ids = sorted({str(p).strip() for p in pmids if str(p).strip()})
        out = {}
        for start in range(0, len(ids), group_size):
            url = EUTILS_ESUMMARY_URL.format(
                ','.join(ids[start:start + group_size]))
            out.update(parse_esummary_response(transport('GET', url)))
        return out

    return resolve


def authors_only(resolver):
    """Adapt a full-record resolver to the {pmid: [authors]} interface."""
    def resolve(pmids):
        return {pmid: rec['authors'] if isinstance(rec, dict) else rec
                for pmid, rec in resolver(pmids).items()}

    return resolve


CITATION_METADATA_SCHEMA = (
    'citation_id string, authors array<string>, first_author string, '
    'last_author string, title string, journal string, volume string, '
    'issue string, pages string, date string'
)


def resolve_citation_metadata(edges: DataFrame, resolver) -> DataFrame:
    """Full (citation_id → metadata) table for every distinct PubMed
    citation — the distributed equivalent of the reference's Citation
    model enrichment. Same per-distinct-pmid Arrow batching as
    :func:`resolve_citation_authors`."""
    import pandas as pd

    pmids = (
        edges.where(F.col('citation_db') == 'PubMed')
        .select(F.col('citation_id')).distinct()
    )

    def lookup(batches):
        for pdf in batches:
            batch = list(pdf['citation_id'])
            resolved = resolver(batch)
            rows = []
            for p in batch:
                rec = resolved.get(str(p)) or {}
                rows.append({
                    'citation_id': p,
                    'authors': rec.get('authors'),
                    'first_author': rec.get('first'),
                    'last_author': rec.get('last'),
                    'title': rec.get('title'),
                    'journal': rec.get('journal'),
                    'volume': rec.get('volume'),
                    'issue': rec.get('issue'),
                    'pages': rec.get('pages'),
                    'date': rec.get('date'),
                })
            yield pd.DataFrame(rows)

    return pmids.mapInPandas(lookup, schema=CITATION_METADATA_SCHEMA)


def resolve_citation_authors(edges: DataFrame, resolver=None) -> DataFrame:
    """(citation_id → authors) table for every distinct PubMed citation.

    One resolver call per Arrow batch of DISTINCT pmids — the batch size
    (spark.sql.execution.arrow.maxRecordsPerBatch) is the service-request
    batch size.
    """
    import pandas as pd

    if resolver is None:
        resolver = fake_pubmed_resolver

    pmids = (
        edges.where(F.col('citation_db') == 'PubMed')
        .select(F.col('citation_id')).distinct()
    )

    def lookup(batches):
        for pdf in batches:
            batch = list(pdf['citation_id'])
            resolved = resolver(batch)
            yield pd.DataFrame({
                'citation_id': batch,
                'authors': [resolved.get(str(p)) for p in batch],
            })

    return pmids.mapInPandas(
        lookup, schema='citation_id string, authors array<string>')


def enrich_pubmed_citations(edges: DataFrame, resolver=None) -> DataFrame:
    """Fill ``citation_authors`` on every PubMed edge
    (citation_utils.py:137-244). Broadcast join: the distinct-citation table
    is tiny next to the edge table, so the edges never shuffle."""
    authors = resolve_citation_authors(edges, resolver) \
        .withColumnRenamed('authors', '_resolved_authors')
    out_cols = edges.columns
    return (
        edges.join(F.broadcast(authors), on='citation_id', how='left')
        .withColumn(
            'citation_authors',
            F.when(F.col('citation_db') == 'PubMed',
                   F.coalesce('_resolved_authors', 'citation_authors'))
            .otherwise(F.col('citation_authors')))
        .select(*out_cols)
    )


def count_authors(edges: DataFrame) -> DataFrame:
    """Edge count per author (graph.py:count_authors Counter)."""
    return (
        edges.where(F.col('citation_authors').isNotNull())
        .select(F.explode('citation_authors').alias('author'))
        .groupBy('author').agg(F.count(F.lit(1)).alias('n_edges'))
        .orderBy('author')
    )


def number_of_authors(graph_or_edges) -> int:
    """Distinct author count (graph.py:316-325)."""
    edges = graph_or_edges.edges \
        if isinstance(graph_or_edges, KG) else graph_or_edges
    return (
        edges.where(F.col('citation_authors').isNotNull())
        .select(F.explode('citation_authors').alias('author'))
        .distinct().count()
    )
