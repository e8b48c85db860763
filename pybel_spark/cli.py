"""Command-line interface (reference ``cli.py``, re-expressed over the
Spark engine; stdlib argparse — no click dependency on executors).

Commands mirror the reference's verbs on its compiled-graph artifact:

  compile    BEL script → graph directory (nodes/edges/warnings parquet)
  summarize  graph directory → summary counts
  warnings   graph directory → parser warnings listing
  serialize  graph directory → tsv / edgelist / sif / gsea / graphml /
             nodelink / bel
  post       graph directory → BEL-Commons-style receiver (to_web)
  neo        graph directory → neo4j-admin bulk-import CSV directory
  pipeline   documents parquet → checkpointed KG run (run_checkpointed)
  warc       WARC archives → documents parquet (Common-Crawl ingestion)

The compiled-graph directory is the parquet tables the engine already
materializes — the distributed analogue of the reference's pickle.
"""
import argparse
import json
import os
import sys


def _get_spark(args):
    from .session import get_spark

    return get_spark(app_name='pybel-spark-cli',
                     cores=int(os.environ.get('SPARK_GRAFT_CPUS', '8')))


def _compiler_options(args) -> dict:
    opts = {}
    if args.allow_naked_names:
        opts['allow_naked_names'] = True
    if args.disallow_nested:
        opts['disallow_nested'] = True
    if args.disallow_unqualified_translocations:
        opts['disallow_unqualified_translocations'] = True
    if args.no_citation_clearing:
        opts['citation_clearing'] = False
    if args.no_identifier_validation:
        opts['skip_validation'] = True
    if args.required_annotations:
        opts['required_annotations'] = list(args.required_annotations)
    return opts


def _write_graph_dir(result, out_dir, metadata=None):
    result.nodes.write.mode('overwrite') \
        .parquet(os.path.join(out_dir, 'nodes'))
    result.edges.write.mode('overwrite') \
        .parquet(os.path.join(out_dir, 'edges'))
    result.warnings.write.mode('overwrite') \
        .parquet(os.path.join(out_dir, 'warnings'))
    with open(os.path.join(out_dir, 'metadata.json'), 'w') as f:
        json.dump(metadata or {}, f, indent=1, sort_keys=True)


def _read_graph_dir(spark, graph_dir):
    nodes = spark.read.parquet(os.path.join(graph_dir, 'nodes'))
    edges = spark.read.parquet(os.path.join(graph_dir, 'edges'))
    meta_path = os.path.join(graph_dir, 'metadata.json')
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return nodes, edges, metadata


def cmd_compile(args):
    from .io_script import from_bel_script

    spark = _get_spark(args)
    result = from_bel_script(spark, args.script,
                             compiler_options=_compiler_options(args))
    result.parsed = result.parsed.persist()
    _write_graph_dir(result, args.output)
    n_warn = result.warnings.count()
    print(json.dumps({
        'output': args.output,
        'nodes': result.nodes.count(),
        'edges': result.edges.count(),
        'warnings': n_warn,
    }))
    return 1 if (args.strict and n_warn) else 0


def cmd_summarize(args):
    from .ops import KG
    from .ops.summary import graph_summary

    spark = _get_spark(args)
    nodes, edges, metadata = _read_graph_dir(spark, args.graph)
    warnings = spark.read.parquet(os.path.join(args.graph, 'warnings'))
    summary = graph_summary(KG(nodes, edges), warnings=warnings)
    summary['name'] = metadata.get('name')
    summary['version'] = metadata.get('version')
    print(json.dumps(summary, indent=1, sort_keys=True))
    return 0


def cmd_warnings(args):
    spark = _get_spark(args)
    warnings = spark.read.parquet(os.path.join(args.graph, 'warnings'))
    for row in warnings.orderBy('line_number').collect():
        print('{}\t{}\t{}'.format(row['line_number'], row['error_class'],
                                  row['line']))
    return 0


def cmd_serialize(args):
    from . import io_formats

    spark = _get_spark(args)
    nodes, edges, metadata = _read_graph_dir(spark, args.graph)

    def write_lines(df, path):
        with open(path, 'w', encoding='utf8') as f:
            for row in df.toLocalIterator():
                f.write(row['value'] + '\n')

    triples = (edges.where(edges['triple_subject'].isNotNull())
               .select(edges['triple_subject'].alias('subject'),
                       edges['triple_predicate'].alias('predicate'),
                       edges['triple_object'].alias('object')))
    if args.tsv:
        write_lines(io_formats.triples_to_tsv(triples), args.tsv)
    if args.edgelist:
        write_lines(io_formats.triples_to_edgelist(triples), args.edgelist)
    if args.sif:
        write_lines(io_formats.to_sif(edges), args.sif)
    if args.csv:
        write_lines(io_formats.to_csv(edges), args.csv)
    if args.gsea:
        write_lines(io_formats.to_gsea(nodes), args.gsea)
    if args.graphml:
        io_formats.to_graphml(nodes, edges, args.graphml)
    if args.nodelink:
        with open(args.nodelink, 'w', encoding='utf8') as f:
            json.dump(io_formats.to_nodelink(nodes, edges, metadata), f)
    if args.bel:
        lines = io_formats.to_bel_script_lines(nodes, edges,
                                               metadata=metadata)
        with open(args.bel, 'w', encoding='utf8') as f:
            f.write('\n'.join(lines) + '\n')
    return 0


def cmd_post(args):
    from . import io_web

    spark = _get_spark(args)
    nodes, edges, metadata = _read_graph_dir(spark, args.graph)
    resp = io_web.to_web(nodes, edges, metadata=metadata, host=args.host,
                         user=args.user, password=args.password,
                         public=args.public)
    print(json.dumps(resp))
    return 0


def cmd_neo(args):
    from .io_formats import to_neo4j_admin_csv

    spark = _get_spark(args)
    nodes, edges, _ = _read_graph_dir(spark, args.graph)
    stats = to_neo4j_admin_csv(nodes, edges, args.output)
    print(json.dumps(stats))
    return 0


def cmd_pipeline(args):
    from .pipeline import run_checkpointed

    spark = _get_spark(args)
    docs = spark.read.parquet(args.documents)
    stats = run_checkpointed(spark, docs, args.output,
                             n_buckets=args.buckets)
    print(json.dumps(stats))
    return 0


def cmd_warc(args):
    from .io_warc import from_warc

    spark = _get_spark(args)
    docs = from_warc(spark, args.archives, extract=args.extract)
    docs.write.mode('overwrite').parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({'output': args.output, 'documents': n}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog='pybel-spark',
                                description=__doc__.split('\n')[0])
    sub = p.add_subparsers(dest='command', required=True)

    c = sub.add_parser('compile', help='compile a BEL script to a graph dir')
    c.add_argument('script')
    c.add_argument('-o', '--output', required=True)
    c.add_argument('--allow-naked-names', action='store_true')
    c.add_argument('--disallow-nested', action='store_true')
    c.add_argument('--disallow-unqualified-translocations',
                   action='store_true')
    c.add_argument('--no-identifier-validation', action='store_true')
    c.add_argument('--no-citation-clearing', action='store_true')
    c.add_argument('-r', '--required-annotations', action='append')
    c.add_argument('--strict', action='store_true',
                   help='exit non-zero if any warnings were produced')
    c.set_defaults(func=cmd_compile)

    s = sub.add_parser('summarize', help='summary counts of a graph dir')
    s.add_argument('graph')
    s.set_defaults(func=cmd_summarize)

    w = sub.add_parser('warnings', help='list parser warnings')
    w.add_argument('graph')
    w.set_defaults(func=cmd_warnings)

    z = sub.add_parser('serialize', help='export a graph dir')
    z.add_argument('graph')
    for flag in ('tsv', 'edgelist', 'sif', 'csv', 'gsea', 'graphml',
                 'nodelink', 'bel'):
        z.add_argument('--' + flag)
    z.set_defaults(func=cmd_serialize)

    po = sub.add_parser('post', help='send a graph dir to a receiver service')
    po.add_argument('graph')
    po.add_argument('--host')
    po.add_argument('--user')
    po.add_argument('--password')
    po.add_argument('--public', action='store_true')
    po.set_defaults(func=cmd_post)

    n = sub.add_parser('neo', help='neo4j-admin bulk CSV export')
    n.add_argument('graph')
    n.add_argument('-o', '--output', required=True)
    n.set_defaults(func=cmd_neo)

    pl = sub.add_parser('pipeline', help='checkpointed KG run over documents')
    pl.add_argument('documents')
    pl.add_argument('-o', '--output', required=True)
    pl.add_argument('--buckets', type=int, default=64)
    pl.set_defaults(func=cmd_pipeline)

    wa = sub.add_parser('warc', help='ingest WARC archives to parquet docs')
    wa.add_argument('archives')
    wa.add_argument('-o', '--output', required=True)
    wa.add_argument('--extract', action='store_true')
    wa.set_defaults(func=cmd_warc)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == '__main__':
    sys.exit(main())
