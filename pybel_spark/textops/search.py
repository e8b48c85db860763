"""BM25 full-text search: inverted-index build + top-k scoring.

The retrieval stack a web-corpus engine needs next to dedup/curation:
build a term-partitioned inverted index over the corpus once, then answer
keyword queries with the Okapi BM25 ranking function

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d)   = Σ_{t∈q} idf(t) * tf(t,d) * (k1 + 1)
                    / (tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl))

(the Robertson/Sparck-Jones idf with the +1 floor — Lucene's formulation,
always positive).

Scale notes (100 TB shape):
- The postings build is ONE explode + groupBy exchange keyed by
  (term, doc); df/avgdl are partial-aggregated rollups of the same data.
- Query scoring joins the (small) query-term list against postings on the
  term key: Spark broadcasts the query side, so the corpus-sized postings
  table is never shuffled; the only exchange is the per-(query, doc)
  partial-aggregated score sum.
- ``bm25_index_write`` persists the postings PARTITIONED BY a term-hash
  bucket; ``bm25_index_topk`` prunes the scan to the buckets the query
  terms hash into — at 4096 buckets a 3-term query touches ≤3/4096 of the
  index files (partition pruning, asserted in tests).
- Scores are rounded before ranking so near-tie ordering is stable across
  engines; ties break on doc_id.
"""
import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .tokenize import whitespace_tokens

__all__ = [
    'doc_terms', 'build_postings', 'bm25_topk',
    'bm25_index_write', 'bm25_index_topk', 'N_INDEX_BUCKETS',
]

N_INDEX_BUCKETS = 64


def doc_terms(docs: DataFrame, doc_col: str = 'doc_id',
              text_col: str = 'text') -> DataFrame:
    """(doc, term) token stream — whitespace tokens, empties dropped."""
    toks = docs.select(
        F.col(doc_col).alias('doc'),
        whitespace_tokens(text_col).alias('_toks'))
    return (
        toks.select('doc', F.explode('_toks').alias('term'))
        .where(F.col('term') != '')
    )


def build_postings(docs: DataFrame, doc_col: str = 'doc_id',
                   text_col: str = 'text') -> DataFrame:
    """Inverted-index postings: (term, doc, tf, dl) — one groupBy exchange;
    dl (doc length) rides along from a map-side token count so scoring
    needs no second join against a doc-stats table."""
    terms = doc_terms(docs, doc_col, text_col)
    dl = (
        docs.select(
            F.col(doc_col).alias('doc'),
            F.size(whitespace_tokens(text_col)).alias('dl'))
    )
    tf = terms.groupBy('term', 'doc').agg(F.count(F.lit(1)).alias('tf'))
    return tf.join(dl, on='doc').select('term', 'doc', 'tf', 'dl')


def _score_col(k1: float, b: float):
    # idf uses the +1-floored Robertson idf; every arithmetic step is kept
    # in the exact association order the DuckDB oracle mirrors
    idf = F.log(F.lit(1.0) + (F.col('n_docs') - F.col('df') + F.lit(0.5))
                / (F.col('df') + F.lit(0.5)))
    sat = (F.col('tf') * F.lit(k1 + 1.0)) \
        / (F.col('tf') + F.lit(k1) * (F.lit(1.0 - b)
                                      + F.lit(b) * F.col('dl')
                                      / F.col('avgdl')))
    return idf * sat


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Round scores, then rank per query (score desc, doc asc)."""
    per_pair = (
        scored.groupBy('query_id', 'doc')
        .agg(F.round(F.sum('term_score'), 6).alias('score_r'))
    )
    w = Window.partitionBy('query_id').orderBy(
        F.col('score_r').desc(), F.col('doc'))
    return (
        per_pair.withColumn('rank', F.row_number().over(w))
        .where(F.col('rank') <= k)
        .select('query_id', 'rank', F.col('doc').alias('doc_id'), 'score_r')
    )


def _corpus_stats(postings: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl) — broadcast into the scoring join."""
    per_doc = postings.select('doc', 'dl').distinct()
    return per_doc.agg(
        F.count(F.lit(1)).cast('double').alias('n_docs'),
        F.avg('dl').alias('avgdl'))


def _query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, term) — DISTINCT terms per query (BM25 over the term
    SET; repeated query words do not double-count)."""
    return (
        queries.select(
            'query_id',
            F.explode(whitespace_tokens('query_text')).alias('term'))
        .where(F.col('term') != '')
        .distinct()
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              doc_col: str = 'doc_id', text_col: str = 'text') -> DataFrame:
    """Top-k BM25 hits per query, end-to-end from the raw corpus.

    ``queries`` is a (query_id, query_text) DataFrame. Returns
    (query_id, rank, doc_id, score_r).
    """
    postings = build_postings(docs, doc_col, text_col)
    return _score_postings(postings, queries, k, k1, b)


def _score_postings(postings: DataFrame, queries: DataFrame, k: int,
                    k1: float, b: float, stats: DataFrame = None,
                    collapse_replays: bool = False) -> DataFrame:
    """Score query-term postings only: the corpus-sized table is filtered by
    a broadcast semi-join on the query terms FIRST, so the df rollup and the
    scoring join both run over the hit set, never the whole index.

    ``collapse_replays``: the materialized index is at-least-once on append
    (a crash between postings-append and the batch marker leaves orphan
    rows that a retry re-appends), so index serving dedupes the HIT SET on
    (term, doc) before the df rollup — df stays 'row count per term' and tf
    is never double-counted. Hit-set-sized, runs after the pruned read and
    the term semi-join, so the whole index is never shuffled."""
    qterms = _query_terms(queries)
    hits = postings.join(
        F.broadcast(qterms.select('term').distinct()), on='term')
    if collapse_replays:
        hits = hits.dropDuplicates(['term', 'doc'])
    # postings are unique on (term, doc), so df = row count per term
    df_tbl = hits.groupBy('term').agg(F.count(F.lit(1)).alias('df'))
    if stats is None:
        stats = _corpus_stats(postings)
    scored = (
        hits
        .join(F.broadcast(qterms), on='term')
        .join(F.broadcast(df_tbl), on='term')
        .crossJoin(F.broadcast(stats))
        .select('query_id', 'doc', _score_col(k1, b).alias('term_score'))
    )
    return _rank_topk(scored, k)


def tfidf_keywords(docs: DataFrame, k: int = 5, doc_col: str = 'doc_id',
                   text_col: str = 'text') -> DataFrame:
    """Top-k characteristic terms per document by tf·idf
    (idf = ln(N/df)) — the keyword/topic-tagging primitive of a corpus
    pipeline. Returns (doc_id, rank, term, tfidf_r), scores rounded before
    ranking (engine-stable near-ties), ties broken by term.

    Scale: postings build (one exchange) + a df rollup joined back on the
    term key (AQE-broadcast when small), then a per-document window —
    partitioned by doc, no global sort."""
    postings = build_postings(docs, doc_col, text_col)
    df_tbl = postings.groupBy('term').agg(F.count(F.lit(1)).alias('df'))
    stats = _corpus_stats(postings)
    scored = (
        postings.join(df_tbl, on='term')
        .crossJoin(F.broadcast(stats))
        .select('doc', 'term',
                F.round(F.col('tf') * F.log(F.col('n_docs') / F.col('df')),
                        6).alias('tfidf_r'))
    )
    w = Window.partitionBy('doc').orderBy(
        F.col('tfidf_r').desc(), F.col('term'))
    return (
        scored.withColumn('rank', F.row_number().over(w))
        .where(F.col('rank') <= k)
        .select(F.col('doc').alias('doc_id'), 'rank', 'term', 'tfidf_r')
    )


def _batch_stats(postings: DataFrame) -> tuple:
    """(n_docs, sum_dl) of one batch, computed on the driver — two scalars
    per batch, the only driver-side state the index keeps."""
    row = (postings.select('doc', 'dl').distinct()
           .agg(F.count(F.lit(1)).alias('n'),
                F.sum('dl').alias('s')).collect()[0])
    return int(row['n'] or 0), int(row['s'] or 0)


def _derive_batch_id(docs: DataFrame, doc_col: str) -> str:
    """Deterministic, order-insensitive batch fingerprint (bit_xor of
    per-doc xxhash64 — overflow-free under ANSI mode — plus count) so an
    uncoordinated retry of the same batch maps to the same applied-marker
    name. Doc ids are unique within a batch (caller contract), so xor
    cancellation of duplicates cannot occur."""
    row = docs.agg(
        F.bit_xor(F.xxhash64(F.col(doc_col).cast('string'))).alias('h'),
        F.count(F.lit(1)).alias('n')).collect()[0]
    return 'b{:016x}-{}'.format((int(row['h'] or 0)) & 0xFFFFFFFFFFFFFFFF,
                                int(row['n'] or 0))


def bm25_index_write(docs: DataFrame, path: str,
                     n_buckets: int = N_INDEX_BUCKETS,
                     doc_col: str = 'doc_id', text_col: str = 'text') -> None:
    """Materialize the inverted index: postings partitioned by
    ``bucket = pmod(xxhash64(term), n_buckets)`` (so a query's scan prunes
    to its terms' buckets). Corpus stats live in per-batch applied-marker
    sidecars under ``applied/`` — one tiny JSON per folded batch carrying
    (n_docs, sum_dl) — so (n_docs, avgdl) at serve time is an exact sum
    over markers and never drifts from what appends actually committed."""
    from .sidecar import delete_sidecar_dir, write_json_sidecar

    spark = docs.sparkSession
    postings = build_postings(docs, doc_col, text_col)
    # delete the old applied/ markers BEFORE overwriting postings: a
    # crash between the two steps then leaves new postings with NO stats
    # markers (bootstrap rerun required — same benign window the append
    # path documents) instead of new postings served under the previous
    # index's n_docs/avgdl (r6 ADVICE)
    delete_sidecar_dir(spark, os.path.join(path, 'applied'))
    (postings
     .withColumn('bucket', F.pmod(F.xxhash64('term'), F.lit(n_buckets))
                 .cast('int'))
     .write.mode('overwrite').partitionBy('bucket')
     .parquet(os.path.join(path, 'postings')))
    # df needs no sidecar: a term's postings live entirely in its bucket,
    # so the pruned read reconstructs exact df.
    n, s = _batch_stats(postings)
    write_json_sidecar(spark, os.path.join(path, 'applied', 'bootstrap.json'),
                       {'batch_id': 'bootstrap', 'n_docs': n, 'sum_dl': s})


def bm25_index_append(docs: DataFrame, path: str,
                      n_buckets: int = N_INDEX_BUCKETS,
                      doc_col: str = 'doc_id',
                      text_col: str = 'text',
                      batch_id: str = None) -> bool:
    """Fold a NEW batch of documents into an existing index (the
    incremental crawl shape — same contract as the dedup band and parse
    indexes: at-least-once postings + marker idempotence + read-side
    collapse). Returns True if the batch was applied, False if its marker
    already existed (replay no-op).

    Crash/replay contract (r5 ADVICE):
    - An ``applied/<batch_id>.json`` marker is written AFTER the postings
      append; the marker carries the batch's (n_docs, sum_dl), and serving
      computes (n_docs, avgdl) as the exact sum over markers — so a crash
      between append and marker leaves the batch entirely invisible to
      stats (never stale/half-applied), and the orphan posting rows are
      collapsed at read time by ``bm25_index_topk``'s (term, doc) dedupe.
    - A retried append with the same ``batch_id`` (default: derived
      deterministically from the batch's doc ids) either no-ops on the
      existing marker or re-appends rows the read side collapses.

    Caller contract: batches carry disjoint doc ids (re-crawled urls go
    through snapshot consolidation first); single writer per index path
    (CONCURRENCY.md)."""
    from .sidecar import sidecar_exists, write_json_sidecar

    spark = docs.sparkSession
    if batch_id is None:
        batch_id = _derive_batch_id(docs, doc_col)
    marker = os.path.join(path, 'applied', '{}.json'.format(batch_id))
    if sidecar_exists(spark, marker):
        return False
    postings = build_postings(docs, doc_col, text_col)
    (postings
     .withColumn('bucket', F.pmod(F.xxhash64('term'), F.lit(n_buckets))
                 .cast('int'))
     .write.mode('append').partitionBy('bucket')
     .parquet(os.path.join(path, 'postings')))
    n, s = _batch_stats(postings)
    write_json_sidecar(spark, marker,
                       {'batch_id': batch_id, 'n_docs': n, 'sum_dl': s})
    return True


def _stats_from_markers(spark, path: str) -> DataFrame:
    """1-row (n_docs, avgdl) summed over the applied-batch markers."""
    from .sidecar import list_sidecars, read_json_sidecar

    applied_dir = os.path.join(path, 'applied')
    n_docs, sum_dl = 0, 0
    for name in list_sidecars(spark, applied_dir):
        m = read_json_sidecar(spark, os.path.join(applied_dir, name))
        n_docs += int(m['n_docs'])
        sum_dl += int(m['sum_dl'])
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    return spark.createDataFrame(
        [(float(n_docs), float(avgdl))], 'n_docs double, avgdl double')


def bm25_index_topk(spark, path: str, queries: DataFrame, k: int = 10,
                    k1: float = 1.2, b: float = 0.75,
                    n_buckets: int = N_INDEX_BUCKETS) -> DataFrame:
    """Serve top-k from a materialized index with bucket-pruned reads.

    The bucket predicate is an ``isin`` over the distinct buckets of the
    query terms — a partition filter, so parquet files of every other
    bucket are never opened.
    """
    qterms = _query_terms(queries).persist()
    buckets = [r['bucket'] for r in qterms.select(
        F.pmod(F.xxhash64('term'), F.lit(n_buckets)).cast('int')
        .alias('bucket')).distinct().collect()]
    postings = (
        spark.read.parquet(os.path.join(path, 'postings'))
        .where(F.col('bucket').isin(buckets))
        .select('term', 'doc', 'tf', 'dl')
    )
    stats = _stats_from_markers(spark, path)
    out = _score_postings(postings, queries, k, k1, b, stats=stats,
                          collapse_replays=True)
    qterms.unpersist()
    return out


def tfidf_cosine_pairs(docs: DataFrame, threshold: float = 0.8,
                       max_df_frac: float = 0.5,
                       doc_col: str = 'doc_id',
                       text_col: str = 'text') -> DataFrame:
    """Sparse document-similarity pairs over tf·idf term vectors —
    the inverted-index alternative to the dense embedding near-dup path:
    cosine(d1, d2) ≥ ``threshold`` via a postings self-join on the term
    key, no embeddings required.

    ``max_df_frac`` drops stop-like terms present in more than that
    fraction of documents BEFORE the self-join (cosine is then defined
    over the surviving term space, standard stop-term removal). This is
    the hot-key guard: the join fan-out per term is bounded by df ≤
    max_df_frac·N, the same role the hot-shingle df cap plays in the
    Jaccard dedup path — without it one stopword would generate N²/2
    candidate pairs.

    Returns (doc_a, doc_b, cosine_r) with doc_a < doc_b, rounded before
    the threshold filter so the kept set is engine-stable.
    """
    postings = build_postings(docs, doc_col, text_col)
    stats = _corpus_stats(postings)
    df_tbl = postings.groupBy('term').agg(F.count(F.lit(1)).alias('df'))
    w = (
        postings.join(df_tbl, on='term')
        .crossJoin(F.broadcast(stats))
        .where(F.col('df') <= F.lit(max_df_frac) * F.col('n_docs'))
        .select('term', 'doc',
                (F.col('tf') * F.log(F.col('n_docs') / F.col('df')))
                .alias('w'))
    )
    norms = w.groupBy('doc').agg(
        F.sqrt(F.sum(F.col('w') * F.col('w'))).alias('norm'))
    a = w.select(F.col('term').alias('term'), F.col('doc').alias('doc_a'),
                 F.col('w').alias('wa'))
    b = w.select(F.col('term').alias('term'), F.col('doc').alias('doc_b'),
                 F.col('w').alias('wb'))
    dots = (
        a.join(b, on='term')
        .where(F.col('doc_a') < F.col('doc_b'))
        .groupBy('doc_a', 'doc_b')
        .agg(F.sum(F.col('wa') * F.col('wb')).alias('dot'))
    )
    return (
        dots
        .join(norms.select(F.col('doc').alias('doc_a'),
                           F.col('norm').alias('na')), on='doc_a')
        .join(norms.select(F.col('doc').alias('doc_b'),
                           F.col('norm').alias('nb')), on='doc_b')
        .select('doc_a', 'doc_b',
                F.round(F.col('dot') / (F.col('na') * F.col('nb')), 6)
                .alias('cosine_r'))
        .where(F.col('cosine_r') >= threshold)
    )
