"""BioPAX L3 importer (io_biopax): extraction subset → INDRA statements →
the engine's INDRA pipeline. Differential check: the BioPAX path and a
hand-written INDRA-statement import produce the identical graph."""
import pytest
from pyspark.sql import functions as F

from pybel_spark import io_biopax
from pybel_spark.io_indra import from_indra_statements_json

_OWL = '''<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF
  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  xmlns:bp="http://www.biopax.org/release/biopax-level3.owl#">
 <bp:UnificationXref rdf:ID="X_MEK"><bp:db>HGNC Symbol</bp:db><bp:id>MAP2K1</bp:id></bp:UnificationXref>
 <bp:UnificationXref rdf:ID="X_ERK"><bp:db>HGNC Symbol</bp:db><bp:id>MAPK1</bp:id></bp:UnificationXref>
 <bp:UnificationXref rdf:ID="X_RAF"><bp:db>HGNC Symbol</bp:db><bp:id>RAF1</bp:id></bp:UnificationXref>
 <bp:UnificationXref rdf:ID="X_EGFR"><bp:db>HGNC Symbol</bp:db><bp:id>EGFR</bp:id></bp:UnificationXref>
 <bp:UnificationXref rdf:ID="X_GRB2"><bp:db>HGNC Symbol</bp:db><bp:id>GRB2</bp:id></bp:UnificationXref>
 <bp:UnificationXref rdf:ID="X_UP_ERK"><bp:db>UniProt</bp:db><bp:id>P28482</bp:id></bp:UnificationXref>
 <bp:PublicationXref rdf:ID="PUB1"><bp:db>pubmed</bp:db><bp:id>12345</bp:id></bp:PublicationXref>
 <bp:PublicationXref rdf:ID="PUB2"><bp:db>pubmed</bp:db><bp:id>23456</bp:id></bp:PublicationXref>
 <bp:ProteinReference rdf:ID="PR_MEK"><bp:xref rdf:resource="#X_MEK"/></bp:ProteinReference>
 <bp:ProteinReference rdf:ID="PR_ERK">
   <bp:xref rdf:resource="#X_ERK"/><bp:xref rdf:resource="#X_UP_ERK"/>
 </bp:ProteinReference>
 <bp:ProteinReference rdf:ID="PR_RAF"><bp:xref rdf:resource="#X_RAF"/></bp:ProteinReference>
 <bp:ProteinReference rdf:ID="PR_EGFR"><bp:xref rdf:resource="#X_EGFR"/></bp:ProteinReference>
 <bp:ProteinReference rdf:ID="PR_GRB2"><bp:xref rdf:resource="#X_GRB2"/></bp:ProteinReference>
 <bp:SequenceModificationVocabulary rdf:ID="SMV_PT">
   <bp:term>O-phospho-L-threonine</bp:term>
 </bp:SequenceModificationVocabulary>
 <bp:SequenceSite rdf:ID="SITE185"><bp:sequencePosition>185</bp:sequencePosition></bp:SequenceSite>
 <bp:ModificationFeature rdf:ID="MF_PT185">
   <bp:modificationType rdf:resource="#SMV_PT"/>
   <bp:featureLocation rdf:resource="#SITE185"/>
 </bp:ModificationFeature>
 <bp:Protein rdf:ID="MEK"><bp:displayName>MEK1</bp:displayName><bp:entityReference rdf:resource="#PR_MEK"/></bp:Protein>
 <bp:Protein rdf:ID="RAF"><bp:displayName>RAF</bp:displayName><bp:entityReference rdf:resource="#PR_RAF"/></bp:Protein>
 <bp:Protein rdf:ID="ERK_U"><bp:displayName>ERK</bp:displayName><bp:entityReference rdf:resource="#PR_ERK"/></bp:Protein>
 <bp:Protein rdf:ID="ERK_P"><bp:displayName>ERK-P</bp:displayName>
   <bp:entityReference rdf:resource="#PR_ERK"/>
   <bp:feature rdf:resource="#MF_PT185"/>
 </bp:Protein>
 <bp:Protein rdf:ID="EGFRP"><bp:entityReference rdf:resource="#PR_EGFR"/></bp:Protein>
 <bp:Protein rdf:ID="GRB2P"><bp:entityReference rdf:resource="#PR_GRB2"/></bp:Protein>
 <bp:Protein rdf:ID="ORPHAN"><bp:displayName>no-xref</bp:displayName></bp:Protein>
 <bp:BiochemicalReaction rdf:ID="RXN">
   <bp:left rdf:resource="#ERK_U"/><bp:right rdf:resource="#ERK_P"/>
 </bp:BiochemicalReaction>
 <bp:Catalysis rdf:ID="CAT">
   <bp:controller rdf:resource="#MEK"/>
   <bp:controlled rdf:resource="#RXN"/>
   <bp:controlType>ACTIVATION</bp:controlType>
   <bp:xref rdf:resource="#PUB1"/>
 </bp:Catalysis>
 <bp:Control rdf:ID="CTRL">
   <bp:controller rdf:resource="#RAF"/>
   <bp:controlled rdf:resource="#CAT"/>
   <bp:controlType>ACTIVATION</bp:controlType>
   <bp:xref rdf:resource="#PUB2"/>
 </bp:Control>
 <bp:Complex rdf:ID="CPLX">
   <bp:component rdf:resource="#EGFRP"/>
   <bp:component rdf:resource="#GRB2P"/>
 </bp:Complex>
 <bp:ComplexAssembly rdf:ID="CA">
   <bp:right rdf:resource="#CPLX"/>
 </bp:ComplexAssembly>
</rdf:RDF>
'''


def test_biopax_statement_extraction():
    stmts = io_biopax.biopax_to_statements(_OWL)
    by_type = {}
    for s in stmts:
        by_type.setdefault(s['type'], []).append(s)
    assert set(by_type) == {'Phosphorylation', 'Activation', 'Complex'}
    (ph,) = by_type['Phosphorylation']
    assert ph['enz']['db_refs'] == {'HGNC': 'MAP2K1'}
    assert ph['sub']['db_refs'] == {'HGNC': 'MAPK1', 'UP': 'P28482'}
    assert ph['residue'] == 'T' and ph['position'] == '185'
    assert ph['evidence'] == [{'pmid': '12345'}]
    (act,) = by_type['Activation']
    assert act['subj']['name'] == 'RAF1'
    assert act['obj']['name'] == 'MAP2K1'
    assert act['obj_activity'] == 'catalytic'
    assert act['evidence'] == [{'pmid': '23456'}]
    (cx,) = by_type['Complex']
    assert sorted(m['name'] for m in cx['members']) == ['EGFR', 'GRB2']


def test_biopax_hostile_inputs():
    assert io_biopax.biopax_to_statements('not xml <<<') == []
    assert io_biopax.biopax_to_statements(
        '<?xml version="1.0"?><root/>') == []


def test_biopax_dephosphorylation_direction():
    """Swap left/right: the lost feature yields the De… statement."""
    owl = _OWL.replace(
        '<bp:left rdf:resource="#ERK_U"/><bp:right rdf:resource="#ERK_P"/>',
        '<bp:left rdf:resource="#ERK_P"/><bp:right rdf:resource="#ERK_U"/>')
    stmts = io_biopax.biopax_to_statements(owl)
    types = {s['type'] for s in stmts}
    assert 'Dephosphorylation' in types
    assert 'Phosphorylation' not in types


def test_from_biopax_differential_vs_indra(spark, tmp_path):
    """The BioPAX file compiles to the IDENTICAL graph as importing its
    extracted statements through the INDRA JSON path — the reference's
    own composition (from_biopax = process_owl ∘ from_indra_statements),
    checked end to end."""
    p = tmp_path / 'pathway.owl'
    p.write_text(_OWL)
    via_biopax = io_biopax.from_biopax(spark, str(p))
    via_indra = from_indra_statements_json(
        spark, io_biopax.biopax_to_statements(_OWL))
    cols = ['source_bel', 'relation', 'target_bel',
            'citation_db', 'citation_id']
    e_a = sorted(map(tuple, via_biopax.edges.select(*cols).collect()))
    e_b = sorted(map(tuple, via_indra.edges.select(*cols).collect()))
    assert e_a == e_b and len(e_a) > 0
    qualified = {(s, r, t) for s, r, t, db, cid in e_a if db}
    # the phospho edge lands with residue+position from the OWL
    assert ('p(HGNC:MAP2K1)', 'directlyIncreases',
            'p(HGNC:MAPK1, pmod(Ph, Thr, 185))') in qualified
    # act(..., ma(cat)) lands as the edge's OBJECT MODIFIER (BEL
    # semantics), so the target node is the bare protein
    assert ('p(HGNC:RAF1)', 'directlyIncreases',
            'p(HGNC:MAP2K1)') in qualified
    # complex members land as structural partOf edges
    structural = {(s, r, t) for s, r, t, db, _ in e_a if not db}
    assert ('p(HGNC:EGFR)', 'partOf',
            'complex(p(HGNC:EGFR), p(HGNC:GRB2))') in structural


def test_from_biopax_table_distributed_parity(spark, tmp_path):
    files = spark.createDataFrame([(_OWL,), (_OWL,)], 'owl_xml string')
    distributed = io_biopax.from_biopax_table(files)
    p = tmp_path / 'pathway.owl'
    p.write_text(_OWL)
    driver_side = io_biopax.from_biopax(spark, str(p))
    # same distinct node/edge content (two copies dedup to one set)
    cols = ['source_bel', 'relation', 'target_bel']
    assert sorted(map(tuple,
                      distributed.edges.select(*cols).distinct()
                      .collect())) == \
        sorted(map(tuple, driver_side.edges.select(*cols).distinct()
                   .collect()))
    assert sorted(r['node_bel'] for r in
                  distributed.nodes.select('node_bel').collect()) == \
        sorted(r['node_bel'] for r in
               driver_side.nodes.select('node_bel').collect())
