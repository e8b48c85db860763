"""INDRA statement-JSON importer: public-schema statements → BEL →
the engine's canonical KG (reference io/indra.py:46-103, re-expressed as
grammar-driven translation instead of the external assembler)."""
import json

from pybel_spark.io_indra import (
    agent_to_bel, from_indra_statements_json, from_indra_statements_jsonl,
    statement_to_bel, statements_to_document,
)


def _agent(name, ns='HGNC', ref='1', mods=None):
    a = {'name': name, 'db_refs': {ns: ref}}
    if mods:
        a['mods'] = mods
    return a


EV = [{'pmid': '12345', 'text': 'some sentence'}]

STMTS = [
    {'type': 'Activation', 'subj': _agent('AKT1'), 'obj': _agent('GSK3B'),
     'obj_activity': 'kinase', 'evidence': EV},
    {'type': 'Inhibition', 'subj': _agent('TP53'), 'obj': _agent('MDM2'),
     'evidence': EV},
    {'type': 'Phosphorylation', 'enz': _agent('MAP2K1'),
     'sub': _agent('MAPK1'), 'residue': 'T', 'position': '185',
     'evidence': EV},
    {'type': 'Dephosphorylation', 'enz': _agent('DUSP1'),
     'sub': _agent('MAPK1'), 'residue': 'T', 'position': '185',
     'evidence': EV},
    {'type': 'IncreaseAmount', 'subj': _agent('TP53'),
     'obj': _agent('CDKN1A'), 'evidence': EV},
    {'type': 'Complex',
     'members': [_agent('EGFR'), _agent('GRB2')]},
    # water: CHEBI grounding → abundance
    {'type': 'DecreaseAmount', 'subj': _agent('AQP1'),
     'obj': _agent('water', ns='CHEBI', ref='CHEBI:15377'),
     'evidence': EV},
    # no usable evidence → no qualified edge
    {'type': 'Activation', 'subj': _agent('A1'), 'obj': _agent('B1'),
     'evidence': [{'text': 'no pmid'}]},
    # unknown type → skipped
    {'type': 'Translocation', 'agent': _agent('RELA')},
    # ungroundable agent → skipped
    {'type': 'Activation', 'subj': {'name': 'mystery', 'db_refs': {}},
     'obj': _agent('B2'), 'evidence': EV},
]


def test_statement_translation_units():
    bel, q = statement_to_bel(STMTS[0])
    assert bel == 'p(HGNC:"AKT1") directlyIncreases ' \
        'act(p(HGNC:"GSK3B"), ma(kin))' and q
    bel, q = statement_to_bel(STMTS[2])
    assert bel == 'p(HGNC:"MAP2K1") directlyIncreases ' \
        'p(HGNC:"MAPK1", pmod(Ph, Thr, 185))' and q
    bel, q = statement_to_bel(STMTS[3])
    assert bel.startswith('p(HGNC:"DUSP1") directlyDecreases ')
    bel, q = statement_to_bel(STMTS[5])
    assert bel == 'complex(p(HGNC:"EGFR"), p(HGNC:"GRB2"))' and not q
    assert statement_to_bel(STMTS[8])[0] is None
    assert statement_to_bel(STMTS[9])[0] is None
    assert agent_to_bel(_agent('x', ns='GO', ref='GO:1')).startswith('bp(')


def test_from_indra_statements_json(spark):
    result = from_indra_statements_json(spark, STMTS)
    edges = result.edges.collect()
    qualified = [e for e in edges if e['citation_id'] is not None]
    # 6 evidence-bearing statements → 6 qualified edges, all PubMed 12345
    assert len(qualified) == 6
    assert {e['citation_id'] for e in qualified} == {'12345'}
    # Activation → directlyIncreases + Activity object modifier (the
    # assembler mapping; the reference triple cascade drops directly*
    # activity edges, so they appear in edges, not triples)
    act = [e for e in qualified
           if e['source_bel'] == 'p(HGNC:AKT1)'
           and e['relation'] == 'directlyIncreases']
    assert act and act[0]['object_modifier_kind'] == 'Activity'
    triples = {tuple(r) for r in result.triples.collect()}
    assert ('HGNC:TP53', 'increasesAmountOf', 'HGNC:CDKN1A') in triples
    assert ('HGNC:MAPK1', 'hasVariant',
            'p(HGNC:MAPK1, pmod(Ph, Thr, 185))') in triples
    assert ('HGNC:AQP1', 'decreasesAmountOf', 'CHEBI:water') in triples
    # complex members got structural partOf edges without citations
    assert any(t[1] == 'partOf' and 'EGFR' in t[0] for t in triples)
    # the no-pmid statement emitted nothing
    assert not any('A1' in (t[0] or '') for t in triples)


def test_from_indra_statements_jsonl_distributed(spark):
    rows = [(json.dumps(s),) for s in STMTS] + [('not json at all',)]
    df = spark.createDataFrame(rows, 'statement_json string')
    result = from_indra_statements_jsonl(df.repartition(3))
    triples = {tuple(r) for r in result.triples.collect()}
    expected = {tuple(r) for r in
                from_indra_statements_json(spark, STMTS).triples.collect()}
    assert triples == expected


def test_document_translation_is_compilable_text():
    text = statements_to_document(STMTS)
    assert text.count('SET Citation') == 6
    assert 'DEFINE NAMESPACE HGNC AS PATTERN' in text


def test_to_indra_round_trip(spark):
    """INDRA JSON → KG → INDRA JSON recovers every supported statement
    (reference io/indra.py:129-138 inverse direction)."""
    from pybel_spark.io_indra import to_indra_statements_json

    result = from_indra_statements_json(spark, STMTS)
    out = [json.loads(r['statement_json']) for r in
           to_indra_statements_json(result.nodes, result.edges).collect()]

    def key(s):
        def agent(a):
            if a is None:
                return None
            mods = tuple(sorted(
                (m.get('mod_type'), m.get('residue'), m.get('position'))
                for m in a.get('mods') or ()))
            return (a['name'], mods)
        if s['type'] == 'Complex':
            return ('Complex', tuple(sorted(agent(m)
                                            for m in s['members'])))
        return (s['type'], agent(s.get('subj') or s.get('enz')),
                agent(s.get('obj') or s.get('sub')),
                s.get('residue'), s.get('position'),
                s.get('obj_activity'),
                tuple(e['pmid'] for e in s.get('evidence') or ()))

    got = {key(s) for s in out}
    # the importable subset of STMTS: indexes 0-6 minus any with no pmid
    expected_src = [s for s in STMTS[:7]]
    expected = {key(s) for s in expected_src}
    assert got == expected


def test_to_indra_statement_mod_chosen_by_specificity(spark):
    """The exporter must pick the statement-level pmod by specificity, not
    list position (the compiler sorts variants canonically) — a substrate
    carrying an extra bare agent-level mod round-trips unchanged."""
    from pybel_spark.io_indra import to_indra_statements_json

    stmt = {'type': 'Phosphorylation', 'enz': _agent('MAP2K1'),
            'sub': _agent('MAPK1',
                          mods=[{'mod_type': 'ubiquitination',
                                 'is_modified': True}]),
            'residue': 'T', 'position': '185', 'evidence': EV}
    result = from_indra_statements_json(spark, [stmt])
    out = [json.loads(r['statement_json']) for r in
           to_indra_statements_json(result.nodes, result.edges).collect()]
    phos = [s for s in out if s['type'] == 'Phosphorylation']
    assert len(phos) == 1
    s = phos[0]
    assert s['residue'] == 'T' and s['position'] == '185'
    assert [m['mod_type'] for m in s['sub']['mods']] == ['ubiquitination']


def test_jsonl_hostile_rows_do_not_crash(spark):
    """Structurally hostile JSON (scalars, null agents, wrong-typed
    evidence) must skip, never fail the task."""
    rows = [('5',), ('"just a string"',), ('[1,2]',),
            ('{"type":"Activation","subj":null,"obj":null}',),
            ('{"type":"Phosphorylation","enz":{"name":"X","db_refs":'
             '{"HGNC":"1"}},"sub":{"name":"Y","db_refs":{"HGNC":"2"}},'
             '"evidence":"not-a-list"}',),
            (json.dumps(STMTS[0]),)]
    df = spark.createDataFrame(rows, 'statement_json string')
    result = from_indra_statements_jsonl(df)
    edges = result.edges.where('citation_id is not null').collect()
    assert len(edges) == 1  # only the one healthy statement survives
