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
    run('pytest', [sys.executable, '-m', 'pytest', 'tests/', '-x', '-q'])
    run('oracle gate', [sys.executable, 'scripts/check_correctness.py'])
    run('P/R report', [sys.executable, 'scripts/compute_pr.py'])
    print('ALL VERIFICATIONS PASSED')


if __name__ == '__main__':
    main()
