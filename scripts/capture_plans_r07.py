"""Capture .explain('formatted') for the r07-touched operators into
plans/r07/<name>_<suffix>.txt (judge-checkable plan evidence).

Usage: python scripts/capture_plans_r07.py before|after [name ...]

Iterative operators execute their rounds eagerly (localCheckpoint), so the
captured plan is the FINAL-round shape — the per-round plan the loop repeats
— on a small instance of the same code path (plan shape, not scale, is the
evidence here; walls live in bench_extra.py / BENCH numbers).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main():
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    out_dir = os.path.join(REPO, 'plans', 'r07')
    os.makedirs(out_dir, exist_ok=True)

    from pybel_spark.session import get_spark
    spark = get_spark(app_name='capture-plans-r07', cores=8,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel('ERROR')

    from pybel_spark.ops import KG, analytics as an
    g_nodes, g_edges = an.synthetic_skewed_graph(spark, 20000, 8)
    graph = KG(g_nodes, g_edges)

    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.01')

    def vectors():
        return spark.read.parquet(f'{sf_dir}/embeddings.parquet')

    def builders():
        from pybel_spark.textops import semdedup as sd, similarity as sim
        yield 'graph_pagerank', lambda: an.pagerank(graph, n_iterations=2)
        yield 'graph_hits', lambda: an.hits(graph, n_iterations=2)
        yield 'graph_walks', lambda: an.random_walks(
            graph, walk_length=2, walks_per_node=1)
        yield 'graph_walks_node2vec', lambda: an.node2vec_walks(
            graph, walk_length=3, walks_per_node=1, p=2.0, q=0.5)
        yield 'graph_scc', lambda: an.strongly_connected_components(graph)
        yield 'graph_betweenness_sampled', lambda: an.betweenness_centrality(
            graph, max_hops=4, source_fraction=0.0005)
        yield 'graph_distance_distribution', lambda: an.distance_distribution(
            graph, max_hops=4, source_fraction=0.0005)
        yield 'graph_hyperball', lambda: an.hyperball_harmonic(
            graph, p=32, t_max=2)
        yield 'graph_triangles', lambda: an.triangles(graph)
        yield 'dedup_semantic', lambda: sd.semdedup(
            vectors(), threshold=0.9, n_clusters=16)
        yield 'embedding_neardup_allpairs', lambda: (
            sim.embedding_near_duplicates(vectors(), threshold=0.9))
        yield 'events_sessions', lambda: __import__(
            'pybel_spark.events', fromlist=['session_stats']).session_stats(
            spark.read.parquet(f'{sf_dir}/events.parquet'), gap_minutes=30)

    for name, build in builders():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, '{}_{}.txt'.format(name, suffix))
        try:
            df = build()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), 'formatted')
        except Exception as e:  # pragma: no cover - capture tool only
            plan = 'ERROR: {}\n'.format(e)
        with open(path, 'w') as f:
            f.write(plan)
        print('wrote', path)
    spark.stop()


if __name__ == '__main__':
    main()
