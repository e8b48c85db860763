"""EXACT-value oracle comparison (bit-level on floats, not the 6-sig-fig
normalization of check_correctness.py) for the float-carrying queries whose
driver hash is sensitive below 6 significant figures — the guard used in
r07 to prove plan/partitioning changes did not move any rounded value.

Usage: python scripts/check_exact.py [sf_dir] query [query ...]
"""
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from check_correctness import TABLES  # noqa: E402  (same table list)


def key(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append('nan' if math.isnan(v) else repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    argv = list(sys.argv[1:])
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) \
        else '/root/testdata/sf0.01'
    names = argv[1:] if argv and os.path.isdir(argv[0]) else argv

    sys.path.insert(0, os.path.join(REPO, 'scripts'))
    import __spark_entry__ as mod
    from pybel_spark.session import get_spark

    spark = get_spark(app_name='check-exact', cores=8,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel('ERROR')
    con = duckdb.connect()
    for t in TABLES:
        path = '{}/{}.parquet'.format(sf_dir, t)
        if os.path.exists(path):
            con.execute(
                "CREATE VIEW {} AS SELECT * FROM '{}'".format(t, path))

    qs, oracles = mod.queries(), mod.oracle_sql()
    n_fail = 0
    for name in names:
        sdf = qs[name](spark, sf_dir)
        scols = sorted(sdf.columns)
        sidx = [sdf.columns.index(c) for c in scols]
        srows = [tuple(r[i] for i in sidx) for r in sdf.collect()]
        orel = con.execute(oracles[name])
        ocols_full = [d[0] for d in orel.description]
        ocols = sorted(ocols_full)
        oidx = [ocols_full.index(c) for c in ocols]
        orows = [tuple(r[i] for i in oidx) for r in orel.fetchall()]
        sk, ok = key(srows), key(orows)
        match = sk == ok
        print('{:32s} {} rows={}/{}'.format(
            name, 'EXACT' if match else 'DIFF', len(srows), len(orows)))
        if not match:
            n_fail += 1
            for a, b in zip(sk, ok):
                if a != b:
                    print('   spark :', a)
                    print('   oracle:', b)
                    break
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == '__main__':
    main()
