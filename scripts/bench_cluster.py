"""True multi-executor scaling: a Spark STANDALONE cluster on this box.

Starts a master + 4 workers, each worker `taskset`-pinned to its own 2 cores
(→ each executor is a separate JVM with a private heap, exactly like a real
cluster node), then runs the flagship job with spark.cores.max=2
(N = 1 executor) and spark.cores.max=8 (4N = 4 executors) against the same
parquet corpus shipped via --py-files.

Usage: python scripts/bench_cluster.py [n_docs] [rounds]
Cleans up all daemons on exit.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get('SPARK_HOME', '/opt/spark')
CORPUS_DIR = '/tmp/pybel_spark_cluster_corpus'
MASTER = 'spark://127.0.0.1:7077'

JOB = r'''
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession
from pybel_spark.pipeline import extract_triples

cores_max = int(sys.argv[1])
spark = (SparkSession.builder
    .master("@MASTER@")
    .appName('cluster-bench-%d' % cores_max)
    .config('spark.executor.cores', '2')
    .config('spark.executor.memory', '4g')
    .config('spark.cores.max', str(cores_max))
    .config('spark.sql.shuffle.partitions', str(max(2 * cores_max, 16)))
    .config('spark.sql.adaptive.enabled', 'true')
    .config('spark.sql.files.maxPartitionBytes', '524288')
    .config('spark.sql.files.openCostInBytes', '65536')
    .config('spark.sql.execution.arrow.maxRecordsPerBatch', '2048')
    .config('spark.ui.enabled', 'false')
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
spark.sparkContext.addPyFile("@REPO@/dist/pybel_spark.zip")
docs = spark.read.parquet("@CORPUS@")
extract_triples(docs).count()  # full warm-up pass: touches every executor's Python workers
walls = []
for _ in range(2):
    t0 = time.time()
    extract_triples(docs).count()
    walls.append(time.time() - t0)
print(json.dumps({'cores_max': cores_max, 'wall': min(walls), 'walls': walls}))
spark.stop()
'''


def sh(cmd, env=None):
    e = dict(os.environ)
    e.update(env or {})
    subprocess.run(cmd, check=True, env=e, capture_output=True, text=True)


def start_cluster():
    sh([os.path.join(SPARK_HOME, 'sbin', 'start-master.sh'),
        '--host', '127.0.0.1', '--port', '7077', '--webui-port', '8081'])
    time.sleep(4)
    for i in range(4):
        env = {
            'SPARK_WORKER_CORES': '2',
            'SPARK_WORKER_MEMORY': '6g',
            'SPARK_WORKER_PORT': str(40000 + i),
            'SPARK_WORKER_WEBUI_PORT': str(8090 + i),
            'SPARK_IDENT_STRING': 'w{}'.format(i),
        }
        sh(['taskset', '-c', '{}-{}'.format(2 * i, 2 * i + 1),
            os.path.join(SPARK_HOME, 'sbin', 'start-worker.sh'), MASTER],
           env=env)
    time.sleep(6)


def stop_cluster():
    for i in range(4):
        subprocess.run([os.path.join(SPARK_HOME, 'sbin', 'stop-worker.sh')],
                       env=dict(os.environ, SPARK_IDENT_STRING='w{}'.format(i)),
                       capture_output=True)
    subprocess.run([os.path.join(SPARK_HOME, 'sbin', 'stop-master.sh')],
                   capture_output=True)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    subprocess.run([sys.executable, 'scripts/make_pyfiles.py'],
                   check=True, cwd=REPO, capture_output=True)
    gen = (
        'import sys; sys.path.insert(0, {repo!r});'
        'from pybel_spark.session import get_spark;'
        'from pybel_spark.corpus import generate_documents;'
        "spark = get_spark(app_name='gen', cores=32);"
        "spark.sparkContext.setLogLevel('ERROR');"
        'generate_documents(spark, {n}, partitions=128)'
        ".write.mode('overwrite').parquet({corpus!r}); spark.stop()"
    ).format(repo=REPO, n=n_docs, corpus=CORPUS_DIR)
    subprocess.run([sys.executable, '-c', gen], check=True, cwd=REPO,
                   capture_output=True, text=True)

    job = JOB.replace('@REPO@', REPO).replace('@MASTER@', MASTER) \
        .replace('@CORPUS@', CORPUS_DIR)

    start_cluster()
    try:
        best = {2: float('inf'), 8: float('inf')}
        for i in range(rounds):
            for cores_max in (2, 8):
                out = subprocess.run([sys.executable, '-c', job, str(cores_max)],
                                     capture_output=True, text=True, check=True,
                                     cwd=REPO)
                r = json.loads(out.stdout.strip().splitlines()[-1])
                best[cores_max] = min(best[cores_max], r['wall'])
                print('round {} cores_max={}: wall={:.1f}s'.format(
                    i, cores_max, r['wall']), flush=True)
        efficiency = (best[2] / best[8]) / 4.0
        print(json.dumps({
            'n_docs': n_docs,
            'best_wall_1_executor': best[2],
            'best_wall_4_executors': best[8],
            'scaling_efficiency_executors_N_to_4N': round(efficiency, 3),
        }))
    finally:
        stop_cluster()


if __name__ == '__main__':
    main()
