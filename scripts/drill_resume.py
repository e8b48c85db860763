"""Checkpoint-resume drill: hard-kill a run mid-flight, re-submit, verify
completeness and zero duplicates.

1. Launch run_pipeline on a synthetic corpus in a subprocess.
2. SIGKILL it partway through.
3. Re-run with the same --output.
4. Verify: all buckets done, edge_ids unique, triples == expected.

Usage: python scripts/drill_resume.py [n_docs] [kill_after_sec]
"""
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = '/tmp/pybel_spark_drill_out'


def launch(n_docs):
    return subprocess.Popen(
        [sys.executable, 'scripts/run_pipeline.py', '--synthetic', str(n_docs),
         '--output', OUT, '--buckets', '32'],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, preexec_fn=os.setsid)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    kill_after = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0

    shutil.rmtree(OUT, ignore_errors=True)

    print('launching run 1 (will be killed after {:.0f}s)...'.format(kill_after))
    proc = launch(n_docs)
    time.sleep(kill_after)
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait()
    print('killed run 1')
    time.sleep(3)

    mpath = os.path.join(OUT, 'MANIFEST.json')
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        committed = [c['commit_id'] for c in manifest['commits']]
        edges_dir = os.path.join(OUT, 'edges')
        on_disk = os.listdir(edges_dir) if os.path.isdir(edges_dir) else []
        orphans = sorted(set(on_disk) - set(committed))
        print('state after kill: {} committed commits, {} orphan data dirs '
              '{}'.format(len(committed), len(orphans), orphans))
    else:
        print('state after kill: no manifest yet')

    print('launching run 2 (resume)...')
    proc = launch(n_docs)
    out, _ = proc.communicate()
    assert proc.returncode == 0, 'resume run failed'
    summary = json.loads(out.strip().splitlines()[-1])
    print('resume summary:', json.dumps(summary))

    # verify with a fresh session
    verify = r'''
import json, sys
sys.path.insert(0, {repo!r})
from pybel_spark.session import get_spark
from pybel_spark.pipeline import read_graph
from pybel_spark.corpus import CorpusSpec
spark = get_spark(app_name='drill-verify', cores=8)
spark.sparkContext.setLogLevel('ERROR')
g = read_graph(spark, {out!r})
n_edges = g['edges'].count()
n_ids = g['edges'].select('edge_id').distinct().count()
triples = {{tuple(r) for r in g['triples'].collect()}}
spec = CorpusSpec()
expected = set()
for i in range({n}):
    for idx in spec.unit_indices(i):
        expected.update(tuple(t) for t in spec.units[idx]['golden']['triples'])
print(json.dumps({{'edges': n_edges, 'unique_edge_ids': n_ids,
                   'triples_ok': triples == expected,
                   'n_triples': len(triples)}}))
spark.stop()
'''.format(repo=REPO, out=OUT, n=n_docs)
    res = subprocess.run([sys.executable, '-c', verify], cwd=REPO,
                         capture_output=True, text=True, check=True)
    verdict = json.loads(res.stdout.strip().splitlines()[-1])
    print('verification:', json.dumps(verdict))
    assert verdict['edges'] == verdict['unique_edge_ids'], 'duplicate edges!'
    assert verdict['triples_ok'], 'triples mismatch!'
    print('RESUME DRILL PASSED: no duplicates, complete output after kill+resume')
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == '__main__':
    main()
