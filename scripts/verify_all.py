"""One-command round verification: pytest + oracle gate + P/R report.

Usage: python scripts/verify_all.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label, cmd):
    print('==>', label, flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        print('FAILED:', label)
        sys.exit(proc.returncode)


def main():
    rnd = os.environ.get('SPARK_GRAFT_ROUND', '')
    artifact = 'VERIFY_r{:02d}.json'.format(int(rnd)) if rnd else 'VERIFY_last.json'
    run('pytest', [sys.executable, '-m', 'pytest', 'tests/', '-x', '-q'])
    run('oracle gate', [sys.executable, 'scripts/check_correctness.py',
                        '--json', artifact])
    run('P/R report', [sys.executable, 'scripts/compute_pr.py'])
    print('ALL VERIFICATIONS PASSED (full-sweep artifact: {})'.format(artifact))


if __name__ == '__main__':
    main()
