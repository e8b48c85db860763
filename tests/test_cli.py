"""CLI tests (reference cli.py verbs re-expressed): compile → summarize /
warnings / serialize / neo, in-process via cli.main (the CLI reuses the
active session)."""
import json
import os
import shutil
import tempfile

import pytest

from pybel_spark import cli
from pybel_spark.corpus import CorpusSpec


@pytest.fixture(scope='module')
def graph_dir(spark):
    base = tempfile.mkdtemp(prefix='pybel_spark_cli_')
    script = os.path.join(base, 'doc.bel')
    with open(script, 'w', encoding='utf8') as f:
        f.write(CorpusSpec().doc_text(0))
    out = os.path.join(base, 'graph')
    rc = cli.main(['compile', script, '-o', out])
    assert rc == 0
    yield out
    shutil.rmtree(base, ignore_errors=True)


def test_compile_output(spark, graph_dir, capsys):
    nodes = spark.read.parquet(os.path.join(graph_dir, 'nodes'))
    edges = spark.read.parquet(os.path.join(graph_dir, 'edges'))
    assert nodes.count() > 0
    assert edges.count() > 0
    assert os.path.exists(os.path.join(graph_dir, 'metadata.json'))


def test_summarize(graph_dir, capsys):
    rc = cli.main(['summarize', graph_dir])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary['nodes'] > 0 and summary['edges'] > 0
    assert 'components' in summary


def test_warnings_listing(graph_dir, capsys):
    rc = cli.main(['warnings', graph_dir])
    assert rc == 0  # listing may be empty for a clean doc; command runs


def test_serialize_formats(spark, graph_dir):
    base = tempfile.mkdtemp(prefix='pybel_spark_cli_ser_')
    try:
        paths = {k: os.path.join(base, k) for k in
                 ('t.tsv', 'e.tsv', 's.sif', 'g.grp', 'n.json', 'b.bel',
                  'x.graphml')}
        rc = cli.main(['serialize', graph_dir,
                       '--tsv', paths['t.tsv'],
                       '--edgelist', paths['e.tsv'],
                       '--sif', paths['s.sif'],
                       '--gsea', paths['g.grp'],
                       '--nodelink', paths['n.json'],
                       '--bel', paths['b.bel'],
                       '--graphml', paths['x.graphml']])
        assert rc == 0
        for p in paths.values():
            assert os.path.getsize(p) > 0, p
        nodelink = json.load(open(paths['n.json']))
        assert nodelink['directed'] and nodelink['nodes']
        # serialized BEL recompiles to the same edge set
        out2 = os.path.join(base, 'graph2')
        rc = cli.main(['compile', paths['b.bel'], '-o', out2])
        assert rc == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_neo_export(spark, graph_dir):
    base = tempfile.mkdtemp(prefix='pybel_spark_cli_neo_')
    try:
        rc = cli.main(['neo', graph_dir, '-o', os.path.join(base, 'csv')])
        assert rc == 0
        assert os.path.isdir(os.path.join(base, 'csv'))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_strict_compile_fails_on_warnings(spark):
    base = tempfile.mkdtemp(prefix='pybel_spark_cli_strict_')
    try:
        script = os.path.join(base, 'bad.bel')
        text = CorpusSpec().doc_text(0) + '\np(HGNC:NOPE_NOT_A_NAME) -> bp(GO:x)\n'
        with open(script, 'w', encoding='utf8') as f:
            f.write(text)
        rc = cli.main(['compile', script, '-o', os.path.join(base, 'g'),
                       '--strict'])
        assert rc == 1
    finally:
        shutil.rmtree(base, ignore_errors=True)
