"""Two-cluster-size scaling for the GRAPH-ANALYTICS section (companion
to scripts/bench_scaling.py, which evidences the parse pipeline).

Same methodology: each configuration is taskset-pinned to its simulated
cluster's core budget; N (local[2]) and 4N (local[8]) runs are PAIRED
back-to-back per round so this shared VM's bursty steal cancels in the
per-round ratio; the reported efficiency is speedup/4 on best-of-N
walls (a run can only be slowed by interference, so min wall is the
closest observation of machine capability).

Job under test: 3-iteration PageRank + sampled-source Brandes
betweenness over the deterministic 4M-edge hub-skewed synthetic web
graph — the adjacency-array iteration shape of PLANS.md §31-32.

Usage: python scripts/bench_scaling_graph.py [n_nodes] [rounds]
Appends a section to BENCH/BASELINE.md.
"""
import json
import os
import statistics
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import functions as F
from pybel_spark.session import get_spark
from pybel_spark.ops import KG, analytics as an

cores = int(sys.argv[1])
n_nodes = int(sys.argv[2])
spark = get_spark(app_name='graph-scaling-%d' % cores, cores=cores)
spark.sparkContext.setLogLevel('ERROR')
nodes, edges = an.synthetic_skewed_graph(spark, n_nodes, 8)
g = KG(nodes, edges)
edges.count()
an.pagerank(g, n_iterations=1).agg(F.sum('rank')).collect()  # warm-up
walls = {}
for name, fn in [
    ('pagerank', lambda: an.pagerank(g, n_iterations=3)
        .agg(F.sum('rank')).collect()),
    ('betweenness', lambda: an.betweenness_centrality(
        g, max_hops=8, source_fraction=0.00006).count()),
]:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    walls[name] = best
print(json.dumps({'cores': cores, 'walls': walls}))
spark.stop()
'''


def run_pinned(worker, cores, n_nodes):
    cmd = ['taskset', '-c', '0-{}'.format(cores - 1),
           sys.executable, '-c', worker, str(cores), str(n_nodes)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    worker = WORKER.replace('@REPO@', REPO)

    per_op = {'pagerank': [], 'betweenness': []}
    for i in range(rounds):
        r2 = run_pinned(worker, 2, n_nodes)
        r8 = run_pinned(worker, 8, n_nodes)
        for op in per_op:
            w2, w8 = r2['walls'][op], r8['walls'][op]
            per_op[op].append({'round': i, 'wall2': w2, 'wall8': w8,
                               'speedup': w2 / w8})
            print('round {} {}: local[2] {:.1f}s local[8] {:.1f}s '
                  'speedup {:.2f}'.format(i, op, w2, w8, w2 / w8),
                  flush=True)

    report = {'n_nodes': n_nodes, 'rounds': rounds, 'ops': {}}
    for op, rows in per_op.items():
        best2 = min(r['wall2'] for r in rows)
        best8 = min(r['wall8'] for r in rows)
        report['ops'][op] = {
            'best_wall_2': best2, 'best_wall_8': best8,
            'median_speedup': statistics.median(
                r['speedup'] for r in rows),
            'efficiency_best': min((best2 / best8) / 4.0, 1.0),
            'pairs': rows,
        }
    print(json.dumps(report))

    stamp = datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')
    with open(os.path.join(REPO, 'BENCH', 'BASELINE.md'), 'a') as fh:
        fh.write('\n## Graph-section N→4N scaling ({}, {} nodes / ~{}M '
                 'edges, paired taskset local[2] vs local[8], best of {} '
                 'rounds x2 in-process repeats)\n\n'.format(
                     stamp, n_nodes, round(n_nodes * 8 / 1e6), rounds))
        for op, r in report['ops'].items():
            fh.write('- **{}**: local[2] {:.1f} s → local[8] {:.1f} s = '
                     'speedup {:.2f}, **efficiency {:.2f}** '
                     '(median per-pair speedup {:.2f})\n'.format(
                         op, r['best_wall_2'], r['best_wall_8'],
                         r['best_wall_2'] / r['best_wall_8'],
                         r['efficiency_best'], r['median_speedup']))


if __name__ == '__main__':
    main()
