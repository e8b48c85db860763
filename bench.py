"""Benchmark: end-to-end KG construction throughput.

Materializes the synthetic Common-Crawl-style corpus to parquet once
(sized from the sf documents table × SPARK_GRAFT_BENCH_MULT), then times the
real job shape — parquet scan → one vectorized parse stage → dedup/aggregate —
and prints ONE JSON line:

  {"metric": "...", "value": <total wall sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., ...throughput extras...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_MULT (default 20).
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _ship_package(spark):
    """Make pybel_spark importable on executors from any working directory."""
    try:
        sys.path.insert(0, os.path.join(REPO, 'scripts'))
        import make_pyfiles
        make_pyfiles.main()
        spark.sparkContext.addPyFile(
            os.path.join(REPO, 'dist', 'pybel_spark.zip'))
    except Exception:
        pass  # repo-cwd local mode works via sys.path


def main():
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cores = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    mult = int(os.environ.get('SPARK_GRAFT_BENCH_MULT', '20'))

    from pyspark.sql import functions as F

    from pybel_spark.corpus import generate_documents
    from pybel_spark.pipeline import build_graph, extract_triples
    from pybel_spark.session import get_spark

    spark = get_spark(app_name='pybel-spark-bench', cores=cores)
    spark.sparkContext.setLogLevel('ERROR')
    _ship_package(spark)

    base_rows = spark.read.parquet(f'{sf_dir}/documents.parquet').count()
    n_docs = base_rows * mult

    corpus_dir = os.path.join(tempfile.gettempdir(), 'pybel_spark_bench_corpus')
    shutil.rmtree(corpus_dir, ignore_errors=True)

    queries = {}

    # corpus materialization (input prep, reported separately)
    t0 = time.time()
    generate_documents(spark, n_docs, partitions=4 * cores) \
        .write.mode('overwrite').parquet(corpus_dir)
    queries['corpus_gen'] = round(time.time() - t0, 3)

    docs = spark.read.parquet(corpus_dir)

    # warm-up (discarded): JVM + Arrow + executor-side module import
    extract_triples(docs.limit(2000)).count()

    t_total0 = time.time()

    # q1: full pipeline → distinct triples (the north-star output, fast path:
    # the UDF ships only the 3 triple columns — the single-answer job shape)
    t0 = time.time()
    n_triples_distinct = extract_triples(docs).count()
    queries['kg_triples'] = round(time.time() - t0, 3)
    t_parse = queries['kg_triples']

    # q1b: same output via statement-level pre-parse dedup (parse cost
    # scales with UNIQUE content — the boilerplate-heavy web-corpus shape)
    from pybel_spark.pipeline import extract_triples_deduped
    t0 = time.time()
    extract_triples_deduped(docs).count()
    queries['kg_triples_dedup_parse'] = round(time.time() - t0, 3)

    # multi-query job shape: parse ONCE into a persisted DF, then run the
    # analytics against the cache (measured: at 100k docs, persist+3 queries
    # ≈ 5 s vs ≈ 10 s re-parsing per query)
    t0 = time.time()
    result = build_graph(docs, persist=True)
    parsed = result.parsed
    parsed.count()
    queries['kg_parse_materialize'] = round(time.time() - t0, 3)

    # q2: per-doc stats + emitted (pre-dedup) triple count, one pass
    t0 = time.time()
    stats = parsed.agg(
        F.count(F.lit(1)).alias('docs'),
        F.sum('n_statements').alias('stmts'),
        F.sum(F.size('edges')).alias('edges'),
        F.sum(F.size(F.filter(
            'edges', lambda e: e['triple_subject'].isNotNull()))).alias('emitted'),
        F.sum(F.size('warnings')).alias('warnings'),
    ).collect()[0]
    emitted = stats['emitted']
    queries['kg_stats'] = round(time.time() - t0, 3)

    # q3: relation histogram (explode + groupBy shuffle)
    t0 = time.time()
    rel_counts = (
        parsed.select(F.explode('edges').alias('e'))
        .groupBy('e.relation').count().count()
    )
    queries['kg_relation_counts'] = round(time.time() - t0, 3)

    # q4: node dedup (canonical md5 ids)
    t0 = time.time()
    n_nodes = result.nodes.count()
    queries['kg_nodes_dedup'] = round(time.time() - t0, 3)

    # q5: text ops over the driver documents table
    t0 = time.time()
    ddocs = spark.read.parquet(f'{sf_dir}/documents.parquet')
    ddocs.select(
        'doc_id', F.size(F.split(F.trim('text'), r'\s+')).alias('n_tokens')
    ).agg(F.sum('n_tokens')).collect()
    queries['text_token_counts'] = round(time.time() - t0, 3)

    # the headline `value` stays the kg-pipeline e2e wall (comparable
    # across rounds); the textops family below is timed separately
    total = round(time.time() - t_total0, 3)

    # ---- textops family (VERDICT r2 #4): dedup / ANN / quality walls ----
    from pybel_spark.textops import dedup, multimodal, quality, similarity

    ddocs = ddocs.select('doc_id', 'text').persist()
    ddocs.count()

    t0 = time.time()
    dedup.minhash_dedup_pairs(ddocs).count()
    queries['dedup_minhash_pairs'] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.simhash_near_duplicates(ddocs).count()
    queries['dedup_simhash_pairs'] = round(time.time() - t0, 3)

    t0 = time.time()
    quality.quality_features(ddocs).agg(
        F.sum('n_tokens')).collect()
    queries['text_quality_features'] = round(time.time() - t0, 3)

    # benchmark decontamination: 20% of docs stand in for the benchmark
    # suite (broadcast 8-gram index), rest is the corpus side
    from pybel_spark.textops.decontaminate import benchmark_contamination
    bench_side = (ddocs.where(F.col('doc_id') % 5 == 0)
                  .select(F.col('doc_id').alias('bench_id'), 'text'))
    train_side = ddocs.where(F.col('doc_id') % 5 != 0)
    t0 = time.time()
    benchmark_contamination(train_side, bench_side, n=8).count()
    queries['corpus_decontaminate'] = round(time.time() - t0, 3)

    # adversarial skew: one shingle in 50% of docs — the df cap must hold
    # the WALL TIME, not just the candidate count. The cap is an absolute
    # df knob (production: ~10k against 10^9+ docs); scale it to the bench
    # corpus (1% of docs) so the hot shingle actually crosses it here.
    hot = 'zzhot ' * 12
    skewed = ddocs.withColumn(
        'text',
        F.when(F.col('doc_id') % 2 == 0,
               F.concat(F.lit(hot), F.col('text'))).otherwise(F.col('text')))
    t0 = time.time()
    dedup.ngram_jaccard_pairs(
        skewed, max_shingle_df=max(base_rows // 100, 50)).count()
    queries['dedup_jaccard_skewed'] = round(time.time() - t0, 3)
    ddocs.unpersist()

    vectors = spark.read.parquet(f'{sf_dir}/embeddings.parquet').persist()
    n_vectors = vectors.count()
    t0 = time.time()
    similarity.lsh_topk(vectors, k=5, query_ids=list(range(50))).count()
    queries['embedding_knn_lsh'] = round(time.time() - t0, 3)

    t0 = time.time()
    similarity.ivf_topk(vectors, k=5, n_lists=16, n_probe=4,
                        query_ids=list(range(50))).count()
    queries['embedding_knn_ivf'] = round(time.time() - t0, 3)
    vectors.unpersist()

    # whole-graph analytics at scale: hub-skewed synthetic web graph
    # (500k nodes, ~4M directed edges, in-degree(0) ~ d*ln n) — the corpus
    # KG is deliberately tiny (distinct knowledge), so the scale walls for
    # PageRank / triangle counting come from this generator instead
    from pybel_spark.ops import KG as _KG, analytics as _an
    g_nodes, g_edges = _an.synthetic_skewed_graph(spark, 500_000, 8)
    graph = _KG(g_nodes, g_edges)
    t0 = time.time()
    _an.pagerank(graph, n_iterations=3).agg(F.sum('rank')).collect()
    queries['graph_pagerank_4m_edges_3it'] = round(time.time() - t0, 3)
    t0 = time.time()
    n_tri = _an.triangles(graph).count()
    queries['graph_triangles_4m_edges'] = round(time.time() - t0, 3)

    # media decode throughput (numpy decoders): synthesize once, decode all
    n_media = 3000
    media = multimodal.synthetic_media(
        spark, n_rows=n_media, partitions=cores).persist()
    media_bytes = media.agg(
        F.sum(F.length('payload')).alias('b')).collect()[0]['b']
    t0 = time.time()
    n_decoded = multimodal.extract_features(media) \
        .where(F.col('feature').isNotNull()).count()
    t_decode = time.time() - t0
    queries['media_decode'] = round(t_decode, 3)
    media.unpersist()

    parsed.unpersist()
    shutil.rmtree(corpus_dir, ignore_errors=True)

    out = {
        'metric': 'kg_pipeline_e2e',
        'value': total,
        'unit': 'sec',
        'queries': queries,
        'sf': sf_dir.rstrip('/').rsplit('sf', 1)[-1],
        'cores': cores,
        'corpus_docs': int(stats['docs']),
        'statements': int(stats['stmts']),
        'edges_emitted': int(stats['edges']),
        'triples_emitted': int(emitted),
        'triples_distinct': int(n_triples_distinct),
        'nodes_distinct': int(n_nodes),
        'relations_distinct': int(rel_counts),
        'warnings': int(stats['warnings']),
        'docs_per_sec': round(stats['docs'] / t_parse, 1),
        'statements_per_sec': round(stats['stmts'] / t_parse, 1),
        'triples_per_sec': round(emitted / t_parse, 1),
        'embedding_vectors': int(n_vectors),
        'media_rows': int(n_media),
        'media_decoded_ok': int(n_decoded),
        'media_mb_per_sec': round(media_bytes / t_decode / 1e6, 1),
        'graph_triangles_found': int(n_tri),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == '__main__':
    main()
