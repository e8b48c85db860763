"""Per-operator isolation bench (guide §1.4): times individual operators
with the noop sink so the computation is measured, not the sink, and
labels every job (§1.5). NOT the driver-facing bench — bench.py stays
frozen; numbers from here are cited in OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py graph [op ...]     # graph-suite ops (default all)
  python bench_extra.py vectors [op ...]   # embedding/semdedup ops
  python bench_extra.py corpus [op ...]    # corpus-scan ops

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS (default 2),
     SPARK_GRAFT_GRAPH_NODES (default 500000).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

RUNS = max(1, int(os.environ.get('SPARK_GRAFT_BENCH_RUNS', '2')))


def noop(df):
    df.write.format('noop').mode('overwrite').save()


def timed(spark, results, name, fn, runs=RUNS):
    walls = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    results[name] = walls
    print(json.dumps({name: walls}), flush=True)


def graph_ops(spark, only):
    from pyspark.sql import functions as F

    from pybel_spark.ops import KG, analytics as an
    n_nodes = int(os.environ.get('SPARK_GRAFT_GRAPH_NODES', '500000'))
    g_nodes, g_edges = an.synthetic_skewed_graph(spark, n_nodes, 8)
    graph = KG(g_nodes, g_edges)
    results = {}
    ops = {
        'pagerank_3it': lambda: an.pagerank(graph, n_iterations=3)
        .agg(F.sum('rank')).collect(),
        'triangles': lambda: noop(an.triangles(graph)),
        'hits_3it': lambda: an.hits(graph, n_iterations=3)
        .agg(F.sum('auth'), F.sum('hub')).collect(),
        'walks_5steps': lambda: noop(an.random_walks(
            graph, walk_length=5, walks_per_node=1)),
        'node2vec_5steps': lambda: noop(an.node2vec_walks(
            graph, walk_length=5, walks_per_node=1, p=2.0, q=0.5)),
        'scc': lambda: noop(an.strongly_connected_components(graph)),
        'betweenness_1x': lambda: noop(an.betweenness_centrality(
            graph, max_hops=8, source_fraction=0.00006)),
        'betweenness_2x': lambda: noop(an.betweenness_centrality(
            graph, max_hops=8, source_fraction=0.00012, origin_batches=2)),
        'distance_distribution': lambda: noop(an.distance_distribution(
            graph, max_hops=8, source_fraction=0.00006)),
        'hyperball_3it': lambda: an.hyperball_harmonic(graph, p=32, t_max=3)
        .agg(F.sum('harmonic_est')).collect(),
    }
    for name, fn in ops.items():
        if only and name not in only:
            continue
        timed(spark, results, name, fn)
    return results


def vector_ops(spark, only):
    from pyspark.sql import functions as F

    from pybel_spark.textops import semdedup as sd, similarity as sim
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    vectors = spark.read.parquet(f'{sf_dir}/embeddings.parquet').persist()
    n_vectors = vectors.count()

    def _u(expr):
        return (F.pmod(F.xxhash64(expr), F.lit(20001)).cast('double')
                / 10000.0 - 1.0)

    wide = spark.range(2000).select(
        F.col('id').alias('vec_id'),
        F.transform(
            F.sequence(F.lit(0), F.lit(767)),
            lambda i: _u((F.col('id') % 1000) * 768 + i)
            + F.when(F.col('id') >= 1000,
                     _u(F.col('id') * 768 + i + 10000000) * 0.01)
            .otherwise(F.lit(0.0))
        ).alias('embedding')).persist()
    wide.count()

    def _pq768():
        cb = sim.pq_train(wide, m=16, k=32, seed=7, refine_iterations=1)
        codes = sim.pq_encode(wide, cb)
        qs = [(r['vec_id'], r['embedding'])
              for r in wide.where(F.col('vec_id') < 25).collect()]
        return sim.pq_topk(codes, cb, qs, k=5, rerank_vectors=wide,
                           rerank_factor=4).count()

    results = {}
    ops = {
        'knn_lsh': lambda: sim.lsh_topk(
            vectors, k=5, query_ids=list(range(50))).count(),
        'knn_ivf': lambda: sim.ivf_topk(
            vectors, k=5, n_lists=16, n_probe=4,
            query_ids=list(range(50))).count(),
        'neardup_allpairs': lambda: sim.embedding_near_duplicates(
            vectors, threshold=0.9).count(),
        'semdedup': lambda: sd.semdedup(
            vectors, threshold=0.9,
            n_clusters=max(16, n_vectors // 250)).where('keep').count(),
        'neardup_allpairs_768d': lambda: sim.embedding_near_duplicates(
            wide, threshold=0.9, n_planes=8).count(),
        'semdedup_768d': lambda: sd.semdedup(
            wide, threshold=0.9, n_clusters=16).where('keep').count(),
        'pq_topk_768d': _pq768,
    }
    for name, fn in ops.items():
        if only and name not in only:
            continue
        timed(spark, results, name, fn)
    return results


def corpus_ops(spark, only):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pybel_spark.corpus import generate_documents
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    cores = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    base_rows = spark.read.parquet(f'{sf_dir}/documents.parquet').count()
    n_docs = base_rows * 20
    corpus_dir = os.path.join(tempfile.gettempdir(), 'pybel_extra_corpus')
    results = {}

    def gen():
        shutil.rmtree(corpus_dir, ignore_errors=True)
        generate_documents(spark, n_docs, partitions=4 * cores) \
            .write.mode('overwrite').parquet(corpus_dir)

    if not only or 'corpus_gen' in only:
        timed(spark, results, 'corpus_gen', gen)
    if not os.path.exists(corpus_dir):
        gen()
    docs = spark.read.parquet(corpus_dir)
    ddocs = spark.read.parquet(f'{sf_dir}/documents.parquet')

    from pybel_spark import parse_index as PI
    from pybel_spark.ops import cooccurrence as cooc
    from pybel_spark.pipeline import build_graph, extract_triples

    def _index_build():
        pidx = tempfile.mkdtemp(prefix='extra_parse_index_')
        shutil.rmtree(pidx, ignore_errors=True)
        PI.parse_index_write(docs, pidx)
        shutil.rmtree(pidx, ignore_errors=True)

    ops = {
        'kg_triples': lambda: extract_triples(docs).count(),
        'kg_parse_index_build': _index_build,
        'kg_cooccurrence_ppmi': lambda: (
            cooc.entity_cooccurrence_ppmi(
                cooc.doc_entity_sets(build_graph(docs).parsed),
                max_per_doc=64).count()),
        'corpus_bm25_topk': None,  # filled below
        'corpus_tfidf_similarity': None,
        'corpus_curation_e2e': None,
    }
    from pybel_spark.textops import search
    import __spark_entry__ as entry
    bm25_q = spark.createDataFrame(
        entry._BM25_QUERIES, 'query_id string, query_text string')
    ops['corpus_bm25_topk'] = lambda: search.bm25_topk(
        ddocs, bm25_q, k=10).count()
    ops['corpus_tfidf_similarity'] = lambda: search.tfidf_cosine_pairs(
        ddocs, threshold=0.9).count()
    ops['corpus_curation_e2e'] = lambda: entry._q_corpus_curation_e2e(
        spark, sf_dir).count()

    for name, fn in ops.items():
        if only and name not in only:
            continue
        if name == 'corpus_gen':
            continue
        timed(spark, results, name, fn)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    return results


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else 'graph'
    only = set(sys.argv[2:])
    cores = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))

    from pybel_spark.session import get_spark
    load1 = os.getloadavg()[0]
    spark = get_spark(app_name='pybel-bench-extra', cores=cores)
    spark.sparkContext.setLogLevel('ERROR')
    t0 = time.time()
    if family == 'graph':
        results = graph_ops(spark, only)
    elif family == 'vectors':
        results = vector_ops(spark, only)
    elif family == 'corpus':
        results = corpus_ops(spark, only)
    else:
        raise SystemExit('unknown family: ' + family)
    out = {'family': family, 'results': results,
           'wall_s': round(time.time() - t0, 1),
           'load1_start': round(load1, 2),
           'load1_end': round(os.getloadavg()[0], 2)}
    print(json.dumps(out))
    spark.stop()


if __name__ == '__main__':
    main()
