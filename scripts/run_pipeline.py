"""spark-submit entry point for the KG-construction pipeline.

Cluster usage:
    python scripts/make_pyfiles.py                       # → dist/pybel_spark.zip
    spark-submit --py-files dist/pybel_spark.zip \
        scripts/run_pipeline.py \
        --input  /path/to/documents_parquet_or_iceberg \
        --output /path/to/out \
        --buckets 4096

Local smoke:
    python scripts/run_pipeline.py --synthetic 10000 --output /tmp/kg_out

The job is checkpoint-resumable: re-submitting with the same --output skips
buckets whose lineage row is 'done'.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', help='documents table path (parquet)')
    ap.add_argument('--synthetic', type=int, default=0,
                    help='generate N synthetic documents instead of --input')
    ap.add_argument('--output', required=True)
    ap.add_argument('--buckets', type=int, default=64)
    ap.add_argument('--cores', type=int,
                    default=int(os.environ.get('SPARK_GRAFT_CPUS', '32')))
    ap.add_argument('--allow-naked-names', action='store_true')
    args = ap.parse_args()

    from pybel_spark.corpus import generate_documents
    from pybel_spark.pipeline import read_graph, run_checkpointed
    from pybel_spark.session import get_spark

    spark = get_spark(app_name='pybel-spark-pipeline', cores=args.cores)
    spark.sparkContext.setLogLevel('WARN')
    # make pybel_spark importable on executors from any working directory
    try:
        import make_pyfiles
        make_pyfiles.main()
        spark.sparkContext.addPyFile(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            'dist', 'pybel_spark.zip'))
    except Exception:
        pass

    if args.synthetic:
        documents = generate_documents(spark, args.synthetic)
    elif args.input:
        documents = spark.read.parquet(args.input)
    else:
        ap.error('need --input or --synthetic')

    options = {}
    if args.allow_naked_names:
        options['allow_naked_names'] = True

    t0 = time.time()
    stats = run_checkpointed(spark, documents, args.output,
                             n_buckets=args.buckets, compiler_options=options)
    graph = read_graph(spark, args.output)
    summary = {
        'wall_sec': round(time.time() - t0, 2),
        'buckets': stats,
        'nodes': graph['nodes'].count(),
        'edges': graph['edges'].count(),
        'warnings': graph['warnings'].count(),
        'triples': graph['triples'].count(),
        'output': args.output,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == '__main__':
    main()
