"""Entity co-occurrence PPMI (ops/cooccurrence.py).

Hand-computed PMI on a tiny corpus, the hot-document cap, and the
doc_entity_sets extraction from parsed edge arrays.
"""
import math

import pytest
from pyspark.sql import functions as F

from pybel_spark.ops import cooccurrence


def _ents(spark, rows):
    return spark.createDataFrame(rows, 'doc string, entity string')


def test_ppmi_hand_computed(spark):
    # d1: {A, B}, d2: {A, B}, d3: {A, C}, d4: {C}
    # N=4, df(A)=3, df(B)=2, df(C)=2, pair(A,B)=2, pair(A,C)=1
    ents = _ents(spark, [
        ('d1', 'A'), ('d1', 'B'),
        ('d2', 'A'), ('d2', 'B'),
        ('d3', 'A'), ('d3', 'C'),
        ('d4', 'C'),
    ])
    out = {(r['entity_a'], r['entity_b']): r
           for r in cooccurrence.entity_cooccurrence_ppmi(ents).collect()}
    assert set(out) == {('A', 'B'), ('A', 'C')}
    ab = out[('A', 'B')]
    assert ab['n_pair'] == 2 and ab['df_a'] == 3 and ab['df_b'] == 2
    assert ab['pmi'] == pytest.approx(math.log(2 * 4 / (3 * 2)))
    assert ab['ppmi'] == pytest.approx(math.log(8 / 6))
    ac = out[('A', 'C')]
    # pmi = ln(1*4 / (3*2)) < 0 → ppmi clamps to 0
    assert ac['pmi'] == pytest.approx(math.log(4 / 6))
    assert ac['ppmi'] == 0.0


def test_duplicate_rows_collapse(spark):
    # repeated (doc, entity) observations must not inflate df/pair counts
    ents = _ents(spark, [
        ('d1', 'A'), ('d1', 'A'), ('d1', 'B'),
        ('d2', 'A'), ('d2', 'B'), ('d2', 'B'),
    ])
    row = cooccurrence.entity_cooccurrence_ppmi(ents).collect()
    assert len(row) == 1
    assert row[0]['n_pair'] == 2 and row[0]['df_a'] == 2


def test_hot_document_cap(spark):
    # d_hot has 5 entities, d1/d2 have 2: cap=4 drops d_hot entirely,
    # including its contribution to df and N
    rows = [('d_hot', 'E{}'.format(i)) for i in range(5)]
    rows += [('d1', 'A'), ('d1', 'B'), ('d2', 'A'), ('d2', 'B')]
    ents = _ents(spark, rows)
    out = cooccurrence.entity_cooccurrence_ppmi(ents, max_per_doc=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r['entity_a'], r['entity_b']) == ('A', 'B')
    # N=2 after the drop: pmi = ln(2*2/(2*2)) = 0
    assert r['pmi'] == pytest.approx(0.0)
    # uncapped: C(5,2)=10 hot pairs + (A,B)
    assert len(cooccurrence.entity_cooccurrence_ppmi(ents).collect()) == 11


def test_min_pair_docs_threshold(spark):
    ents = _ents(spark, [
        ('d1', 'A'), ('d1', 'B'),
        ('d2', 'A'), ('d2', 'B'),
        ('d3', 'A'), ('d3', 'C'),
    ])
    out = cooccurrence.entity_cooccurrence_ppmi(ents, min_pair_docs=2)
    assert [(r['entity_a'], r['entity_b']) for r in out.collect()] \
        == [('A', 'B')]


def test_doc_entity_sets_from_parsed(spark):
    """Extraction uses the per-document arrays (both endpoints, distinct,
    null-free), not the globally deduped edge table."""
    from pybel_spark.corpus import documents_from_driver_table
    from pybel_spark.pipeline import build_graph

    docs = documents_from_driver_table(spark, '/root/testdata/sf0.001')
    result = build_graph(docs)
    ents = cooccurrence.doc_entity_sets(result.parsed)
    assert ents.columns == ['doc', 'entity']
    assert ents.where(F.col('entity').isNull()).count() == 0
    # distinct: no (doc, entity) appears twice
    n = ents.count()
    assert n == ents.distinct().count()
    # the same edge content in two docs must contribute BOTH docs (the
    # deduped edges table would keep only one)
    edges = result.edges
    one_url_rows = edges.count()
    per_doc_rows = (
        result.parsed.select('url', F.explode('edges').alias('e'))
        .select('url', 'e.edge_id').distinct().count())
    assert per_doc_rows > one_url_rows  # boilerplate-heavy corpus shape


def test_citation_entity_sets(spark):
    """Citation context: key = coalesce(db,'')+':'+id; unqualified edges
    (no citation) contribute nothing; both endpoints; distinct."""
    from pybel_spark.corpus import documents_from_driver_table
    from pybel_spark.pipeline import build_graph

    docs = documents_from_driver_table(spark, '/root/testdata/sf0.001')
    result = build_graph(docs)
    ents = cooccurrence.citation_entity_sets(result.parsed)
    rows = ents.collect()
    assert rows and all(':' in r['doc'] for r in rows)
    assert len(rows) == ents.distinct().count()
    # cross-check one citation's entity set against a direct edge scan
    some = rows[0]['doc']
    edges = (result.parsed.select(F.explode('edges').alias('e'))
             .where(F.col('e.citation_id').isNotNull())
             .select(F.concat(F.coalesce('e.citation_db', F.lit('')),
                              F.lit(':'), 'e.citation_id').alias('c'),
                     'e.source_bel', 'e.target_bel')
             .where(F.col('c') == some))
    direct = set()
    for r in edges.collect():
        direct.add(r['source_bel'])
        direct.add(r['target_bel'])
    got = {r['entity'] for r in rows if r['doc'] == some}
    assert got == direct
