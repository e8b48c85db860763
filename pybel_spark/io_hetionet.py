"""Hetionet JSON importer.

Reference: ``io/hetionet/hetionet.py:59-205`` + ``io/hetionet/constants.py``
— converts Himmelstein's heterogeneous-network JSON (nodes typed by kind,
edges typed by metaedge) into BEL edges via a fixed metaedge→relation
mapping table.

Spark-first shape: the mapping tables turn each hetionet edge into BEL
STATEMENT TEXT (driver-side string rendering, trivially cheap), the
statements are packed into synthetic documents, and the heavy work —
parsing, node canonicalization, md5 identity, content-hash dedup — runs
through the standard distributed ``build_graph`` pipeline. Unqualified
partOf/isA edges (the reference's ``add_part_of``/``add_is_a``) are added
as content-hash edge rows post-compile so they stay citation-free, exactly
like the reference.
"""
import json

from pyspark.sql import functions as F

from .ops.graph import KG
from .ops.inference import _unqualified_edge_rows
from .resources import DictCatalog

#: io/hetionet/constants.py:9
HETIONET_PUBMED = '28936969'

#: hetionet kind → namespace (constants.py:25-35)
DSL_MAP = {
    'Anatomy': 'uberon',
    'Gene': 'ncbigene',
    'Pathway': 'reactome',
    'Biological Process': 'go',
    'Compound': 'drugbank',
    'Side Effect': 'umls',
    'Disease': 'doid',
    'Pharmacologic Class': 'drugcentral',
    'Symptom': 'mesh',
}

#: BEL term function keyword per reference DSL class
_POP, _RNA, _ABUNDANCE, _PROTEIN, _PATHOLOGY, _BP = \
    'pop', 'r', 'a', 'p', 'path', 'bp'

#: (source_kind, source_func, kind, target_kind, target_func, relation,
#:  object_wrap) — constants.py:38-57 QUALIFIED_MAPPING; relations that the
#: reference adds two-way double automatically in our compiler
QUALIFIED_MAPPING = [
    ('Anatomy', _POP, 'upregulates', 'Gene', _RNA, 'positiveCorrelation', None),
    ('Anatomy', _POP, 'downregulates', 'Gene', _RNA, 'negativeCorrelation', None),
    ('Anatomy', _POP, 'expresses', 'Gene', _RNA, 'correlation', None),
    ('Compound', _ABUNDANCE, 'resembles', 'Compound', _ABUNDANCE, 'association', None),
    ('Compound', _ABUNDANCE, 'upregulates', 'Gene', _PROTEIN, 'increases', None),
    ('Compound', _ABUNDANCE, 'downregulates', 'Gene', _PROTEIN, 'decreases', None),
    ('Compound', _ABUNDANCE, 'treats', 'Disease', _PATHOLOGY, 'decreases', None),
    ('Compound', _ABUNDANCE, 'palliates', 'Disease', _PATHOLOGY, 'decreases', None),
    ('Compound', _ABUNDANCE, 'causes', 'Side Effect', _PATHOLOGY, 'increases', None),
    ('Gene', _PROTEIN, 'interacts', 'Gene', _PROTEIN, 'binds', None),  # noqa: E501 — expanded to u => complex(u, v) at render time (add_binds is one-way; the statement-level `binds` keyword doubles)
    ('Gene', _PROTEIN, 'regulates', 'Gene', _PROTEIN, 'regulates', None),
    ('Gene', _RNA, 'covaries', 'Gene', _RNA, 'correlation', None),
    ('Disease', _PATHOLOGY, 'localizes', 'Anatomy', _POP, 'association', None),
    ('Disease', _PATHOLOGY, 'associates', 'Gene', _PROTEIN, 'association', None),
    ('Disease', _PATHOLOGY, 'upregulates', 'Gene', _RNA, 'positiveCorrelation', None),
    ('Disease', _PATHOLOGY, 'downregulates', 'Gene', _RNA, 'negativeCorrelation', None),
    ('Disease', _PATHOLOGY, 'presents', 'Symptom', _PATHOLOGY, 'association', None),
    ('Disease', _PATHOLOGY, 'resembles', 'Disease', _PATHOLOGY, 'association', None),
]
_QUALIFIED_INDEX = {
    (h, k, t): (hf, tf, rel, wrap)
    for h, hf, k, t, tf, rel, wrap in QUALIFIED_MAPPING
}

#: constants.py:58-61 — unqualified (citation-free) edges
UNQUALIFIED_MAPPING = {
    ('Gene', 'participates', 'Pathway'): (_PROTEIN, _BP, 'partOf'),
    ('Gene', 'participates', 'Biological Process'): (_PROTEIN, _BP, 'partOf'),
}

#: sentinel citation marking rendered statements whose edges must become
#: UNQUALIFIED (citation-free) after compile — add_part_of/add_is_a parity
_UNQ_SENTINEL_DB, _UNQ_SENTINEL_ID = 'URL', 'hetionet://unqualified'

#: drug action → relation for Compound-binds-Gene (constants.py:67-88)
ACTIVATES_ACTIONS = {
    'agonist', 'potentiator', 'inducer', 'positive modulator',
    'partial agonist', 'positive allosteric modulator', 'activator',
    'stimulator',
}
INHIBITS_ACTIONS = {
    'inhibitor', 'antagonist', 'blocker', 'partial antagonist',
    'inhibitor, competitive', 'negative modulator',
    'negative allosteric modulator', 'allosteric antagonist', 'suppressor',
    'inhibitory allosteric modulator', 'conversion inhibitor',
}
REGULATES_ACTIONS = {'modulator', 'allosteric modulator'}


def _bel_quote(value):
    return '"{}"'.format(str(value).replace('\\', '\\\\').replace('"', '\\"'))


def _term(func, namespace, identifier, name):
    return '{}({}:{}!{})'.format(
        func, namespace, _bel_quote(identifier), _bel_quote(name))


def _annotation_lines(annotations):
    sets, unsets = [], []
    for key in sorted(annotations):
        values = sorted(annotations[key])
        if len(values) == 1:
            sets.append('SET {} = {}'.format(key, _bel_quote(values[0])))
        else:
            sets.append('SET {} = {{{}}}'.format(
                key, ', '.join(_bel_quote(v) for v in values)))
        unsets.append('UNSET {}'.format(key))
    return sets, list(reversed(unsets))


def _edge_annotations(data):
    """hetionet edge data → {key: [values]} (hetionet.py:116-145)."""
    data = dict(data)
    data.pop('unbiased', None)
    annotations = {}
    if 'source' in data:
        annotations['source'] = [str(data.pop('source'))]
    elif 'sources' in data:
        annotations['source'] = [str(s) for s in data.pop('sources')]
    for key, value in data.items():
        if key in ('actions', 'urls', 'subtypes', 'pubmed_ids'):
            continue
        if isinstance(value, (str, int, bool, float)):
            annotations[key] = [str(value)]
    return annotations


def render_hetionet_statements(hetionet_dict):
    """hetionet dict → (statement_lines, unqualified_pairs, annotation_keys).

    Pure string rendering (the cheap part); compile happens distributed.
    ``unqualified_pairs`` are (source_bel, relation, target_bel) for the
    citation-free partOf/isA edges.
    """
    names = {(n['kind'], n['identifier']): n['name']
             for n in hetionet_dict['nodes']}

    lines = []
    unqualified = []
    annotation_keys = set()

    def emit(statement, citations, annotations):
        annotation_keys.update(annotations)
        sets, unsets = _annotation_lines(annotations)
        for pmid in citations:
            lines.append('SET Citation = {{"PubMed", "{}"}}'.format(pmid))
            lines.append('SET SupportingText = "-"')
            lines.extend(sets)
            lines.append(statement)
            lines.extend(unsets)
            lines.append('UNSET SupportingText')
            lines.append('UNSET Citation')

    for edge in hetionet_dict['edges']:
        s_kind, s_id = edge['source_id']
        t_kind, t_id = edge['target_id']
        if s_kind not in DSL_MAP or t_kind not in DSL_MAP:
            continue
        kind = edge['kind']
        data = dict(edge.get('data') or {})
        annotations = _edge_annotations(data)
        citations = [str(p) for p in data.get('pubmed_ids', [])] \
            or [HETIONET_PUBMED]

        def term(func, node_kind, node_id):
            return _term(func, DSL_MAP[node_kind], node_id,
                         names[node_kind, node_id])

        q = _QUALIFIED_INDEX.get((s_kind, kind, t_kind))
        if q is not None:
            hf, tf, relation, wrap = q
            source = term(hf, s_kind, s_id)
            target = term(tf, t_kind, t_id)
            if wrap:
                target = '{}({})'.format(wrap, target)
            if relation == 'binds':
                # add_binds is ONE directed edge u => complex(u, v)
                # (graph.py:487-507); the statement-level `binds` keyword
                # would double it, so render the expansion directly
                stmt = '{} directlyIncreases complex({}, {})'.format(
                    source, source, target)
            else:
                stmt = '{} {} {}'.format(source, relation, target)
            emit(stmt, citations, annotations)
            continue

        u = UNQUALIFIED_MAPPING.get((s_kind, kind, t_kind))
        if u is not None:
            hf, tf, relation = u
            src, dst = term(hf, s_kind, s_id), term(tf, t_kind, t_id)
            unqualified.append((src, relation, dst))
            continue

        if s_kind == 'Compound' and kind == 'binds' and t_kind == 'Gene':
            drug = term(_ABUNDANCE, s_kind, s_id)
            protein = term(_PROTEIN, t_kind, t_id)
            for action in data.get('actions', []):
                action = action.lower()
                if action in ACTIVATES_ACTIONS:
                    stmt = '{} directlyIncreases act({})'.format(drug, protein)
                elif action in INHIBITS_ACTIONS:
                    stmt = '{} directlyDecreases act({})'.format(drug, protein)
                elif action in REGULATES_ACTIONS:
                    stmt = '{} regulates {}'.format(drug, protein)
                else:  # binds + unknown actions (hetionet.py:188-196)
                    stmt = '{} directlyIncreases complex({}, {})'.format(
                        drug, drug, protein)
                emit(stmt, [HETIONET_PUBMED], annotations)
            continue

        if s_kind == 'Pharmacologic Class' and kind == 'includes' \
                and t_kind == 'Compound':
            src = term(_ABUNDANCE, t_kind, t_id)       # compound isA class
            dst = term(_ABUNDANCE, s_kind, s_id)
            unqualified.append((src, 'isA', dst))
            continue
        # unmapped metaedge — reference logs and skips (hetionet.py:205)

    if unqualified:
        # rendered under the sentinel citation so the compiler parses +
        # canonicalizes them; from_hetionet_json strips the citation after
        lines.append('SET Citation = {{"{}", "{}"}}'.format(
            _UNQ_SENTINEL_DB, _UNQ_SENTINEL_ID))
        lines.append('SET SupportingText = "-"')
        lines.extend(sorted('{} {} {}'.format(s, r, t)
                            for s, r, t in unqualified))
        lines.append('UNSET SupportingText')
        lines.append('UNSET Citation')
    return lines, unqualified, sorted(annotation_keys)


def hetionet_header(annotation_keys):
    """Header: pattern namespaces for every hetionet vocabulary + pattern
    annotations for the edge-data keys."""
    lines = [
        'SET DOCUMENT Name = "Hetionet"',
        'SET DOCUMENT Version = "1.0.0"',
        'SET DOCUMENT Description = "Hetionet import"',
        'SET DOCUMENT Authors = "Daniel Himmelstein"',
        'SET DOCUMENT ContactInfo = "import"',
    ]
    for ns in sorted(set(DSL_MAP.values())):
        lines.append('DEFINE NAMESPACE {} AS PATTERN ".*"'.format(ns))
    for key in annotation_keys:
        lines.append('DEFINE ANNOTATION {} AS PATTERN ".*"'.format(key))
    return lines


def from_hetionet_json(spark, hetionet_dict, statements_per_doc=500) -> KG:
    """Convert a hetionet dict to a KG: render → pack into synthetic
    documents → distributed compile → append unqualified edges."""
    lines, unqualified, annotation_keys = \
        render_hetionet_statements(hetionet_dict)
    header = hetionet_header(annotation_keys)

    # pack statement blocks into documents on UNSET Citation boundaries so
    # a SET block never straddles two documents
    docs, current, count = [], [], 0
    for line in lines:
        current.append(line)
        if line == 'UNSET Citation':
            count += 1
            if count >= statements_per_doc:
                docs.append(current)
                current, count = [], 0
    if current:
        docs.append(current)

    rows = [('hetionet://doc-{}'.format(i), None, None,
             '\n'.join(header + [''] + doc), 'en')
            for i, doc in enumerate(docs)] \
        or [('hetionet://doc-0', None, None, '\n'.join(header), 'en')]

    from .pipeline import build_graph
    from .schemas import DOCUMENTS_SCHEMA

    documents = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    result = build_graph(documents, catalog=DictCatalog(), persist=True)
    nodes, edges = result.nodes, result.edges

    if unqualified:
        # sentinel-cited statements → citation-free content-hash edge rows
        # (reference add_part_of/add_is_a are unqualified, graph.py)
        # eqNullSafe: citation-free structural edges have NULL citation_db,
        # and ~(NULL == x) is NULL — a plain filter would silently drop them
        sentinel = F.col('citation_db').eqNullSafe(_UNQ_SENTINEL_DB) \
            & F.col('citation_id').eqNullSafe(_UNQ_SENTINEL_ID)
        marked = edges.where(sentinel)
        edges = edges.where(~sentinel)
        for relation in {r for _, r, _ in unqualified}:
            pairs = marked.where(F.col('relation') == relation) \
                .select('source_id', 'source_bel', 'target_id', 'target_bel') \
                .distinct()
            edges = edges.unionByName(
                _unqualified_edge_rows(pairs, relation, edges))
        edges = edges.dropDuplicates(['edge_id'])
    return KG(nodes, edges)
