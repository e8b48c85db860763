"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() in DuckDB over the same sf dir; compare row
count, schema width, and order-insensitive values.

Usage: python scripts/check_correctness.py [--json OUT.json] [sf_dir] [query_name ...]
(no query names = all queries; --json writes a driver-shaped per-query
status artifact so the repo carries machine-checkable evidence for queries
outside the driver's prefix window)
"""
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def normalize(rows, n_cols):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append('nan')
                else:
                    vals.append('{:.6g}'.format(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if '--json' in argv:
        i = argv.index('--json')
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else '/root/testdata/sf0.01'

    import __spark_entry__ as mod
    from pybel_spark.session import get_spark

    spark = get_spark(app_name='correctness-check', cores=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        path = '{}/{}.parquet'.format(sf_dir, t)
        if os.path.exists(path):
            con.execute("CREATE VIEW {} AS SELECT * FROM '{}'".format(t, path))

    qs = mod.queries()
    oracles = mod.oracle_sql()
    only = set(argv[1:])
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit('unknown queries: {}'.format(sorted(unknown)))
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    results = {}
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sorted(sdf.columns)
        # re-project columns sorted by name like the driver
        sidx = [sdf.columns.index(c) for c in scols]
        srows = [tuple(r[i] for i in sidx) for r in srows]

        if name not in oracles:
            print('{:28s} rows={} (no oracle — rows-only)'.format(name, len(srows)))
            results[name] = {'rows_match': True, 'schema_match': None,
                             'hash_match': None, 'spark_rows': len(srows),
                             'oracle_rows': None, 'err': None,
                             'sec': round(time.time() - t0, 3)}
            continue
        orel = con.execute(oracles[name])
        ocols_full = [d[0] for d in orel.description]
        orows_raw = orel.fetchall()
        ocols = sorted(ocols_full)
        oidx = [ocols_full.index(c) for c in ocols]
        orows = [tuple(r[i] for i in oidx) for r in orows_raw]

        ok_schema = scols == ocols
        ok_count = len(srows) == len(orows)
        ok_values = normalize(srows, len(scols)) == normalize(orows, len(ocols))
        status = 'OK' if (ok_schema and ok_count and ok_values) else 'FAIL'
        results[name] = {'rows_match': ok_count, 'schema_match': ok_schema,
                         'hash_match': ok_values, 'spark_rows': len(srows),
                         'oracle_rows': len(orows), 'err': None,
                         'sec': round(time.time() - t0, 3)}
        print('{:28s} {}  rows={}/{} schema={} values={}'.format(
            name, status, len(srows), len(orows), ok_schema, ok_values))
        if status == 'FAIL':
            failures.append(name)
            if not ok_schema:
                print('   spark cols:', scols)
                print('   oracle cols:', ocols)
            sn, on = normalize(srows, len(scols)), normalize(orows, len(ocols))
            for x in (set(on) - set(sn)):
                print('   missing:', x)
                break
            for x in (set(sn) - set(on)):
                print('   extra:  ', x)
                break

    spark.stop()
    if json_out:
        with open(json_out, 'w') as fh:
            json.dump({'sf_dir': sf_dir, 'ts': int(time.time()),
                       'n_queries': len(results),
                       'n_fail': len(failures),
                       'queries': results}, fh, indent=1, sort_keys=True)
        print('wrote', json_out)
    if failures:
        print('FAILURES:', failures)
        sys.exit(1)
    print('all queries match')


if __name__ == '__main__':
    main()
