"""Exporters: triples TSV / edgelist, SIF/CSV, GSEA, node-link JSON, and the
canonical BEL script round-trip.

Reference sinks: io/tsv/api.py:36-59 (to_tsv/to_edgelist), io/extras.py:21-85
(to_csv/to_sif/to_gsea), io/nodelink.py:32-137, canonicalize.py:41-344
(to_bel_script). Exports are DataFrame-first: statement rendering runs in a
vectorized pandas UDF, ordering/grouping is a Spark sort, and the result is
either a text-line DataFrame (writable with df.write.text at any scale) or a
driver-side string for small subgraphs.
"""
import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from .bel.constants import (
    GENE, MIRNA, PROTEIN, RNA, UNQUALIFIED_EDGES,
)
from .bel.decanonicalize import edge_to_bel

#: citation + evidence used for the auto-generated footer block
#: (reference constants: PYBEL_PUBMED / PYBEL_AUTOEVIDENCE)
AUTO_PMID = '29048466'
AUTO_EVIDENCE = 'Automatically added by PyBEL'


def triples_to_tsv(triples: DataFrame) -> DataFrame:
    """(subject, predicate, object) → sorted tab-separated lines
    (io/tsv/api.py:36-45)."""
    return (
        triples.distinct()
        .orderBy('subject', 'predicate', 'object')
        .select(F.concat_ws('\t', 'subject', 'predicate', 'object')
                .alias('value'))
    )


def triples_to_edgelist(triples: DataFrame) -> DataFrame:
    """(h, t, {"relation": r}) lines (io/tsv/api.py:48-58)."""
    return (
        triples.distinct()
        .orderBy('subject', 'predicate', 'object')
        .select(F.concat_ws(
            '\t', 'subject', 'object',
            F.to_json(F.struct(F.col('predicate').alias('relation'))),
        ).alias('value'))
    )


def _nt_escape(col):
    """N-Triples string-literal escaping: backslash first, then quote —
    order is load-bearing and mirrored by the DuckDB oracle."""
    return F.regexp_replace(
        F.regexp_replace(col, r'\\', r'\\\\'), '"', r'\\"')


def triples_to_ntriples(triples: DataFrame) -> DataFrame:
    """(subject, predicate, object) → RDF N-Triples lines.

    BEL terms are not IRIs, so each distinct term becomes a blank node
    ``_:b<md5(term)>`` carrying its text as a label triple
    ``_:b... <urn:bel:label> "term" .`` and each BEL triple becomes
    ``_:bS <urn:bel:relation/pred> _:bO .`` — a lossless, line-oriented
    RDF projection any triple store bulk-loads. Relation keywords are
    IRI-safe by construction (BEL spec idents).

    Scale: label lines derive from the DISTINCT term set (one exchange);
    relation lines are a pure map over the triples — no joins.
    """
    t = triples.select('subject', 'predicate', 'object').distinct()
    terms = (
        t.select(F.col('subject').alias('term'))
        .unionByName(t.select(F.col('object').alias('term')))
        .distinct()
    )
    label_lines = terms.select(
        F.concat(F.lit('_:b'), F.md5('term'),
                 F.lit(' <urn:bel:label> "'), _nt_escape(F.col('term')),
                 F.lit('" .')).alias('value'))
    rel_lines = t.select(
        F.concat(F.lit('_:b'), F.md5('subject'),
                 F.lit(' <urn:bel:relation/'), F.col('predicate'),
                 F.lit('> _:b'), F.md5('object'), F.lit(' .'))
        .alias('value'))
    return label_lines.unionByName(rel_lines)


def to_ntriples(triples: DataFrame, path: str) -> None:
    """Write the N-Triples projection as distributed text part-files."""
    triples_to_ntriples(triples).write.mode('overwrite').text(path)


def _statement_column(edges: DataFrame, sep=' ') -> DataFrame:
    """Add a 'statement' column rendering each edge back to BEL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def render(source_bel: pd.Series, target_bel: pd.Series,
               relation: pd.Series, subj_mod: pd.Series,
               obj_mod: pd.Series) -> pd.Series:
        out = []
        for s, t, r, sm, om in zip(source_bel, target_bel, relation,
                                   subj_mod, obj_mod):
            out.append(edge_to_bel(
                s, t, r,
                json.loads(sm) if sm else None,
                json.loads(om) if om else None,
                sep=sep))
        return pd.Series(out)

    return edges.withColumn('statement', render(
        'source_bel', 'target_bel', 'relation',
        'subject_modifier', 'object_modifier'))


def to_sif(edges: DataFrame, sep='\t') -> DataFrame:
    """source <sep> relation <sep> target statement lines (io/extras.py:46-64)."""
    return _statement_column(edges, sep=sep).select(
        F.col('statement').alias('value'))


def to_csv(edges: DataFrame, sep='\t') -> DataFrame:
    """SIF lines plus the JSON edge payload (io/extras.py:21-43)."""
    payload = F.to_json(F.struct(
        'relation', 'citation_db', 'citation_id', 'evidence', 'annotations',
        'subject_modifier', 'object_modifier'))
    return _statement_column(edges, sep=sep).select(
        F.concat_ws(sep, 'statement', payload).alias('value'))


def to_gsea(nodes: DataFrame, name='pybel-spark graph') -> DataFrame:
    """HGNC gene symbols as a GRP gene-set file (io/extras.py:67-85)."""
    symbols = (
        nodes
        .where(F.col('function').isin([GENE, RNA, MIRNA, PROTEIN])
               & (F.lower('namespace') == 'hgnc')
               & F.col('name').isNotNull())
        .select('name').distinct().orderBy('name')
        .select(F.col('name').alias('value'))
    )
    header = symbols.sparkSession.createDataFrame(
        [('# {}'.format(name),)], ['value'])
    return header.unionByName(symbols)


def to_nodelink(nodes: DataFrame, edges: DataFrame, metadata=None) -> dict:
    """Node-link JSON dict (io/nodelink.py:32-137): nodes sorted by BEL
    string, links reference node indices. Driver-side — node-link is a
    small-subgraph interchange format."""
    node_rows = nodes.orderBy('node_bel').collect()
    index = {row['node_id']: i for i, row in enumerate(node_rows)}
    links = []
    for row in edges.collect():
        links.append({
            'source': index[row['source_id']],
            'target': index[row['target_id']],
            'relation': row['relation'],
            'citation': (
                dict(
                    {'db': row['citation_db'], 'db_id': row['citation_id']},
                    **({'authors': list(row['citation_authors'])}
                       if 'citation_authors' in row.__fields__
                       and row['citation_authors'] else {}))
                if row['citation_db'] else None),
            'evidence': row['evidence'],
            'annotations': dict(row['annotations']) if row['annotations'] else None,
            'key': row['edge_id'],
        })
    return {
        'directed': True,
        'multigraph': True,
        'graph': metadata or {},
        'nodes': [json.loads(row['node_json']) for row in node_rows],
        'links': links,
    }


def from_nodelink(spark, payload: dict):
    """Inverse of to_nodelink: node-link JSON dict → (nodes, edges) DataFrames
    with the engine's canonical ids (io/nodelink.py:70-96)."""
    from .bel import model
    from .schemas import EDGE_STRUCT, NODE_STRUCT

    node_rows = []
    bels = []
    for node in payload['nodes']:
        bel = model.node_as_bel(node)
        bels.append(bel)
        concept = node.get('concept') or {}
        variants = node.get('variants') or []
        node_rows.append((
            model.node_md5(node), bel, node['function'],
            concept.get('namespace'), concept.get('name'),
            concept.get('identifier'),
            sorted({v['kind'] for v in variants}) or None,
            len(node['members']) if node.get('members') is not None else None,
            len(node['reactants']) if node.get('reactants') else None,
            len(node['products']) if node.get('products') else None,
            bool(node.get('fusion')),
            json.dumps(node, sort_keys=True, separators=(',', ':')),
        ))

    edge_rows = []
    for link in payload['links']:
        src, dst = link['source'], link['target']
        citation = link.get('citation') or {}
        edge_rows.append((
            link.get('key'),
            node_rows[src][0], bels[src], node_rows[dst][0], bels[dst],
            link['relation'], citation.get('db'), citation.get('db_id'),
            link.get('evidence'),
            {k: list(v) for k, v in (link.get('annotations') or {}).items()}
            or None,
            None, None, None, None, None, None, None, None,
            citation.get('authors'),
        ))
    nodes = spark.createDataFrame(node_rows, NODE_STRUCT)
    edges = spark.createDataFrame(edge_rows, EDGE_STRUCT)
    return nodes, edges


def to_jgif(nodes: DataFrame, edges: DataFrame, metadata=None) -> dict:
    """JGIF (JSON Graph Interchange Format) export, reference
    io/jgif.py:317-397 shape: nodes keyed by md5 with BEL labels, edges
    grouped by (source, target, relation) carrying their evidences."""
    node_rows = nodes.orderBy('node_bel').collect()
    nodes_entry = [
        {'id': row['node_id'], 'label': row['node_bel'],
         'bel_function_type': row['function']}
        for row in node_rows
    ]
    grouped = {}
    rendered = _statement_column(edges).collect()
    for row in rendered:
        key = (row['source_id'], row['target_id'], row['relation'])
        entry = grouped.setdefault(key, {
            'source': row['source_bel'],
            'target': row['target_bel'],
            'relation': row['relation'],
            'label': row['statement'],
            'metadata': {'evidences': []},
        })
        if row['citation_db'] is not None:
            entry['metadata']['evidences'].append({
                'citation': {'db': row['citation_db'],
                             'db_id': row['citation_id']},
                'summary_text': row['evidence'],
                'annotations': dict(row['annotations'])
                if row['annotations'] else {},
            })
    return {
        'graph': {
            'metadata': metadata or {},
            'nodes': nodes_entry,
            'edges': list(grouped.values()),
        },
    }


def to_cx(nodes: DataFrame, edges: DataFrame, name='pybel-spark graph') -> list:
    """CX aspect list for NDEx interchange (reference io/cx.py:95-352 shape):
    nodes / nodeAttributes / edges / edgeAttributes / networkAttributes
    aspects with integer ids."""
    node_rows = nodes.orderBy('node_bel').collect()
    index = {row['node_id']: i for i, row in enumerate(node_rows)}
    nodes_aspect = []
    node_attributes = []
    for i, row in enumerate(node_rows):
        entry = {'@id': i, 'n': row['node_bel']}
        if row['namespace'] is not None:
            value = row['identifier'] or row['name']
            entry['r'] = '{}:{}'.format(row['namespace'], value)
        nodes_aspect.append(entry)
        node_attributes.append(
            {'po': i, 'n': 'function', 'v': row['function']})

    edges_aspect = []
    edge_attributes = []
    for j, row in enumerate(edges.collect()):
        edges_aspect.append({
            '@id': j,
            's': index[row['source_id']],
            't': index[row['target_id']],
            'i': row['relation'],
        })
        if row['citation_db'] is not None:
            edge_attributes.append({'po': j, 'n': 'citation',
                                    'v': '{}:{}'.format(row['citation_db'],
                                                        row['citation_id'])})
        if row['evidence'] is not None:
            edge_attributes.append({'po': j, 'n': 'evidence',
                                    'v': row['evidence']})
        for side in ('subject_modifier', 'object_modifier'):
            if row[side] is not None:
                edge_attributes.append({'po': j, 'n': side, 'v': row[side],
                                        'd': 'json'})
        for key, values in sorted((row['annotations'] or {}).items()):
            edge_attributes.append({'po': j, 'n': key, 'v': list(values),
                                    'd': 'list_of_string'})

    return [
        {'numberVerification': [{'longNumber': 281474976710655}]},
        {'metaData': [
            {'name': 'nodes', 'elementCount': len(nodes_aspect)},
            {'name': 'edges', 'elementCount': len(edges_aspect)},
            {'name': 'nodeAttributes', 'elementCount': len(node_attributes)},
            {'name': 'edgeAttributes', 'elementCount': len(edge_attributes)},
        ]},
        {'networkAttributes': [{'n': 'name', 'v': name}]},
        {'nodes': nodes_aspect},
        {'nodeAttributes': node_attributes},
        {'edges': edges_aspect},
        {'edgeAttributes': edge_attributes},
        {'status': [{'error': '', 'success': True}]},
    ]


def to_umbrella_nodelink(nodes: DataFrame, edges: DataFrame,
                         metadata=None) -> dict:
    """Node-link JSON where edge modifiers are folded into the node labels
    ("umbrella" nodes, reference io/umbrella_nodelink.py:41-98): the node
    list is the set of *decorated* statement terms, e.g. act(p(HGNC:X))."""
    rendered = _statement_column(edges, sep='\t').select(
        'statement', 'relation', 'citation_db', 'citation_id', 'evidence',
        'annotations', 'edge_id').collect()
    labels = []
    index = {}
    links = []
    for row in rendered:
        subject_label, _, object_label = row['statement'].split('\t')
        for label in (subject_label, object_label):
            if label not in index:
                index[label] = len(labels)
                labels.append(label)
        links.append({
            'source': index[subject_label],
            'target': index[object_label],
            'relation': row['relation'],
            'citation': ({'db': row['citation_db'], 'db_id': row['citation_id']}
                         if row['citation_db'] else None),
            'evidence': row['evidence'],
            'annotations': dict(row['annotations']) if row['annotations'] else None,
            'key': row['edge_id'],
        })
    return {
        'directed': True,
        'multigraph': True,
        'graph': metadata or {},
        'nodes': [{'bel': label} for label in labels],
        'links': links,
    }


def to_graphml(nodes: DataFrame, edges: DataFrame, path: str,
               umbrella: bool = False) -> None:
    """GraphML export (reference io/graphml.py:18-80) — driver-side via
    networkx; GraphML is a small-subgraph interchange format."""
    import networkx as nx

    graph = nx.MultiDiGraph()
    if umbrella:
        payload = to_umbrella_nodelink(nodes, edges)
        for node in payload['nodes']:
            graph.add_node(node['bel'])
        for link in payload['links']:
            graph.add_edge(
                payload['nodes'][link['source']]['bel'],
                payload['nodes'][link['target']]['bel'],
                interaction=link['relation'])
    else:
        for row in nodes.collect():
            graph.add_node(row['node_bel'], function=row['function'])
        for row in edges.collect():
            graph.add_edge(row['source_bel'], row['target_bel'],
                           key=row['edge_id'], interaction=row['relation'])
    nx.write_graphml(graph, path)


def strip_annotations(edges: DataFrame) -> DataFrame:
    """Remove all annotations from edges (reference mutation/metadata.py:21)."""
    return edges.withColumn(
        'annotations', F.lit(None).cast('map<string,array<string>>'))


def add_annotation_value(edges: DataFrame, key: str, value: str) -> DataFrame:
    """Set an annotation value on every edge (mutation/metadata.py:add)."""
    return edges.withColumn(
        'annotations',
        F.map_concat(
            F.coalesce(F.col('annotations'),
                       F.create_map().cast('map<string,array<string>>')),
            F.create_map(F.lit(key), F.array(F.lit(value)))))


def remove_annotation_value(edges: DataFrame, key: str) -> DataFrame:
    """Drop one annotation key from every edge (mutation/metadata.py:remove)."""
    return edges.withColumn(
        'annotations',
        F.map_filter('annotations', lambda k, _v: k != key))


def to_bel_script_lines(nodes: DataFrame, edges: DataFrame,
                        metadata=None, namespaces=None,
                        annotations=None, namespace_patterns=None,
                        annotation_patterns=None, annotation_lists=None) -> list:
    """Canonical BEL script serialization (canonicalize.py:41-344).

    Qualified edges sorted by (citation_db, citation_id, evidence) and
    emitted in SET/UNSET blocks; unqualified structural edges and isolated
    nodes go in an auto-evidence footer. The heavy ordering runs in Spark;
    line assembly streams on the driver.
    """
    lines = []
    metadata = metadata or {}
    lines.append('SET DOCUMENT Name = "{}"'.format(metadata.get('name', 'export')))
    lines.append('SET DOCUMENT Version = "{}"'.format(metadata.get('version', '1.0.0')))
    for keyword, url in sorted((namespaces or {}).items()):
        lines.append('DEFINE NAMESPACE {} AS URL "{}"'.format(keyword, url))
    for keyword, pattern in sorted((namespace_patterns or {}).items()):
        lines.append('DEFINE NAMESPACE {} AS PATTERN "{}"'.format(keyword, pattern))
    for keyword, url in sorted((annotations or {}).items()):
        lines.append('DEFINE ANNOTATION {} AS URL "{}"'.format(keyword, url))
    for keyword, pattern in sorted((annotation_patterns or {}).items()):
        lines.append('DEFINE ANNOTATION {} AS PATTERN "{}"'.format(keyword, pattern))
    for keyword, values in sorted((annotation_lists or {}).items()):
        lines.append('DEFINE ANNOTATION {} AS LIST {{{}}}'.format(
            keyword, ', '.join('"{}"'.format(v) for v in sorted(values))))
    lines.append('')

    qualified = (
        edges
        .where(F.col('citation_db').isNotNull() & F.col('evidence').isNotNull())
        .orderBy('citation_db', 'citation_id', 'evidence', 'source_bel',
                 'relation', 'target_bel')
    )
    rendered = _statement_column(qualified).select(
        'citation_db', 'citation_id', 'evidence', 'annotations', 'statement')

    current_citation = None
    current_evidence = None
    for row in rendered.toLocalIterator():
        citation = (row['citation_db'], row['citation_id'])
        if citation != current_citation:
            if current_evidence is not None:
                lines.append('UNSET SupportingText')
            if current_citation is not None:
                lines.append('UNSET Citation')
                lines.append('#' * 80)
            lines.append('SET Citation = {{"{}", "{}"}}'.format(*citation))
            current_citation = citation
            current_evidence = None
        if row['evidence'] != current_evidence:
            if current_evidence is not None:
                lines.append('UNSET SupportingText')
            lines.append('SET SupportingText = "{}"'.format(row['evidence']))
            current_evidence = row['evidence']
        keys = sorted(row['annotations']) if row['annotations'] else []
        for key in keys:
            values = sorted(row['annotations'][key])
            if len(values) == 1:
                lines.append('SET {} = "{}"'.format(key, values[0]))
            else:
                lines.append('SET {} = {{{}}}'.format(
                    key, ', '.join('"{}"'.format(v) for v in values)))
        lines.append(row['statement'])
        if keys:
            if len(keys) == 1:
                lines.append('UNSET {}'.format(keys[0]))
            else:
                lines.append('UNSET {{{}}}'.format(', '.join(keys)))
    if current_evidence is not None:
        lines.append('UNSET SupportingText')
    if current_citation is not None:
        lines.append('UNSET Citation')

    # footer: unqualified structural edges + isolated nodes
    unqualified = (
        edges
        .where(F.col('relation').isin(sorted(UNQUALIFIED_EDGES))
               & F.col('evidence').isNull())
        .orderBy('source_bel', 'relation', 'target_bel')
        .select('source_bel', 'relation', 'target_bel')
    )
    endpoint_ids = (
        edges.select(F.col('source_id').alias('node_id'))
        .unionByName(edges.select(F.col('target_id').alias('node_id')))
        .distinct()
    )
    isolated = (
        nodes.join(endpoint_ids, on='node_id', how='leftanti')
        .orderBy('node_bel').select('node_bel')
    )
    unq_rows = unqualified.collect()
    iso_rows = isolated.collect()
    if unq_rows or iso_rows:
        lines.append('#' * 47)
        lines.append('SET Citation = {{"PubMed", "{}"}}'.format(AUTO_PMID))
        lines.append('SET SupportingText = "{}"'.format(AUTO_EVIDENCE))
        for row in unq_rows:
            lines.append('{} {} {}'.format(
                row['source_bel'], row['relation'], row['target_bel']))
        for row in iso_rows:
            lines.append(row['node_bel'])
        lines.append('UNSET SupportingText')
        lines.append('UNSET Citation')
    return lines


# ------------------------------ importers ------------------------------ #

def compile_interchange(spark, statement_lines, header_lines,
                        catalog=None, compiler_options=None):
    """Compile reconstructed BEL lines → (nodes, edges) DataFrames.

    Shared backend of :func:`from_cx` / :func:`from_jgif`: both formats are
    re-parsed through the full BEL compiler — the same strategy as the
    reference, whose ``from_jgif`` feeds node labels and statements back
    through its parser (io/jgif.py:205-296). Driver-side compile: these are
    small-subgraph interchange formats (mirror of the collect()-based
    exports); the scale path for graphs is parquet/nodelink-lines.
    """
    from .bel.compiler import DocumentCompiler
    from .corpus import load_corpus_catalog
    from .schemas import EDGE_STRUCT, NODE_STRUCT

    if catalog is None:
        catalog = load_corpus_catalog()
    compiler = DocumentCompiler(resources=catalog, **(compiler_options or {}))
    result = compiler.compile(list(header_lines) + [''] + list(statement_lines))
    nodes = spark.createDataFrame(result['nodes'], NODE_STRUCT)
    edges = spark.createDataFrame(result['edges'], EDGE_STRUCT)
    return nodes, edges


def _set_block(citation_db, citation_id, evidence, annotations):
    """SET lines for one qualified statement context + matching UNSETs."""
    lines = ['SET Citation = {{"{}", "{}"}}'.format(citation_db, citation_id)]
    if evidence is not None:
        lines.append('SET SupportingText = "{}"'.format(evidence))
    keys = sorted(annotations or {})
    for key in keys:
        values = sorted(annotations[key])
        if len(values) == 1:
            lines.append('SET {} = "{}"'.format(key, values[0]))
        else:
            lines.append('SET {} = {{{}}}'.format(
                key, ', '.join('"{}"'.format(v) for v in values)))
    unset = ['UNSET {}'.format(k) for k in reversed(keys)]
    if evidence is not None:
        unset.append('UNSET SupportingText')
    unset.append('UNSET Citation')
    return lines, unset


def from_cx(spark, cx: list, header_lines, catalog=None,
            compiler_options=None):
    """Inverse of :func:`to_cx` (reference io/cx.py:365-560): rebuild the
    graph by re-rendering each CX edge (+ its citation/evidence/annotation/
    modifier attributes) as a BEL statement and compiling.

    ``header_lines`` supplies the DEFINE NAMESPACE/ANNOTATION block (CX does
    not carry resource definitions, same as the reference, which resolves
    them out-of-band)."""
    aspects = {}
    for item in cx:
        for key, value in item.items():
            aspects.setdefault(key, []).extend(value)

    labels = {n['@id']: n['n'] for n in aspects.get('nodes', [])}
    edge_attrs = {}
    for attr in aspects.get('edgeAttributes', []):
        edge_attrs.setdefault(attr['po'], {})[attr['n']] = attr['v']

    lines = []
    used_nodes = set()
    unqualified = []
    for edge in aspects.get('edges', []):
        attrs = edge_attrs.get(edge['@id'], {})
        citation = attrs.get('citation')
        used_nodes.add(edge['s'])
        used_nodes.add(edge['t'])
        if citation is None:
            # unqualified edge: container edges (hasComponent/partOf)
            # regenerate from the member terms, but explicit ones (isA,
            # hasMembers distribution) must be restated in the footer —
            # same treatment as to_bel_script_lines
            unqualified.append('{} {} {}'.format(
                labels[edge['s']], edge['i'], labels[edge['t']]))
            continue
        db, _, db_id = citation.partition(':')
        annotations = {
            k: v for k, v in attrs.items()
            if k not in ('citation', 'evidence',
                         'subject_modifier', 'object_modifier')}
        sets, unsets = _set_block(db, db_id, attrs.get('evidence'),
                                  annotations)
        sm = attrs.get('subject_modifier')
        om = attrs.get('object_modifier')
        statement = edge_to_bel(
            labels[edge['s']], labels[edge['t']], edge['i'],
            json.loads(sm) if sm else None,
            json.loads(om) if om else None)
        lines.extend(sets)
        lines.append(statement)
        lines.extend(unsets)

    isolated = [bel for nid, bel in sorted(labels.items())
                if nid not in used_nodes]
    if isolated or unqualified:
        lines.append('SET Citation = {{"PubMed", "{}"}}'.format(AUTO_PMID))
        lines.append('SET SupportingText = "{}"'.format(AUTO_EVIDENCE))
        lines.extend(sorted(unqualified))
        lines.extend(isolated)
        lines.append('UNSET SupportingText')
        lines.append('UNSET Citation')

    return compile_interchange(spark, lines, header_lines, catalog,
                               compiler_options)


def from_jgif(spark, payload: dict, header_lines, catalog=None,
              compiler_options=None):
    """Inverse of :func:`to_jgif` (reference io/jgif.py:205-296): node
    labels are parsed as bare terms; each qualified edge's label statement
    is compiled once per evidence under that evidence's citation/annotation
    context. Unqualified relations and evidence-less edges are skipped
    exactly like the reference (they regenerate from the member terms)."""
    root = payload['graph']
    lines = []
    for edge in root.get('edges', []):
        relation = edge.get('relation')
        statement = edge.get('label')
        if relation is None or statement is None:
            continue
        evidences = (edge.get('metadata') or {}).get('evidences') or []
        if relation in UNQUALIFIED_EDGES and not evidences:
            # structural container edge — regenerates from the member terms
            # (reference leaves ALL unqualified relations behind with a
            # `pass  # FIXME`; we keep the ones that carry evidence, since
            # isA/transcribedTo/equivalentTo also occur as qualified
            # statements)
            continue
        for evidence in evidences:
            citation = evidence.get('citation') or {}
            db = citation.get('db') or citation.get('type')
            db_id = citation.get('db_id') or citation.get('id')
            if not db or not db_id:
                continue
            summary = (evidence.get('summary_text') or '').strip()
            if not summary:
                continue
            sets, unsets = _set_block(
                db.strip(), str(db_id).strip(), summary,
                evidence.get('annotations')
                or evidence.get('experiment_context') or {})
            lines.extend(sets)
            lines.append(statement)
            lines.extend(unsets)

    node_labels = sorted(
        n['label'] for n in root.get('nodes', []) if n.get('label'))
    if node_labels:
        lines.append('SET Citation = {{"PubMed", "{}"}}'.format(AUTO_PMID))
        lines.append('SET SupportingText = "{}"'.format(AUTO_EVIDENCE))
        lines.extend(node_labels)
        lines.append('UNSET SupportingText')
        lines.append('UNSET Citation')

    return compile_interchange(spark, lines, header_lines, catalog,
                               compiler_options)


# ----------------------- GraphDati / Neo4j sinks ----------------------- #

GRAPHDATI_SCHEMA_URI = \
    'https://github.com/belbio/schemas/blob/master/schemas/nanopub_bel-1.0.0.yaml'


def to_graphdati_lines(edges: DataFrame, creator=None,
                       version='1.0.0') -> DataFrame:
    """GraphDati nanopub JSONL (reference io/graphdati.py:60-135) as a
    DISTRIBUTED text-line DataFrame — one nanopub per edge, written with
    ``df.write.text`` at any scale (the reference's jsonl variant is the
    same shape, rendered driver-side).

    Spark omits null struct fields in to_json (ignoreNullFields default),
    which reproduces the reference's conditional citation shape.
    """
    rendered = _statement_column(edges, sep='\t')
    parts = F.split('statement', '\t')
    citation = F.struct(
        F.when(F.col('citation_db').isNull(),
               F.lit('Not Available')).alias('reference'),
        F.when(F.col('citation_db').isNotNull(), F.struct(
            F.col('citation_db').alias('name'),
            F.col('citation_id').alias('id'),
        )).alias('database'),
    )
    nanopub = F.struct(
        F.lit(GRAPHDATI_SCHEMA_URI).alias('schema_uri'),
        F.struct(F.lit('BEL').alias('name'),
                 F.lit('2.1.0').alias('version')).alias('type'),
        F.array().cast('array<string>').alias('annotations'),
        citation.alias('citation'),
        F.array(F.struct(
            parts.getItem(0).alias('subject'),
            parts.getItem(1).alias('relation'),
            parts.getItem(2).alias('object'),
        )).alias('assertions'),
        F.coalesce('evidence', F.lit('Not Available')).alias('evidence'),
        F.struct(F.lit(creator).alias('gd_creator'),
                 F.lit(version).alias('version')).alias('metadata'),
        F.concat(F.lit('pybel_'), F.col('edge_id')).alias('id'),
    )
    return rendered.select(
        F.to_json(F.struct(nanopub.alias('nanopub'))).alias('value'))


def to_graphdati(edges: DataFrame, creator=None, version='1.0.0') -> list:
    """Driver-side GraphDati nanopub list (io/graphdati.py:75-101)."""
    return [json.loads(r['value'])
            for r in to_graphdati_lines(edges, creator, version).collect()]


def to_neo4j_admin_csv(nodes: DataFrame, edges: DataFrame,
                       out_dir: str) -> dict:
    """Neo4j bulk-load export: ``neo4j-admin database import``-shaped CSV
    directories (nodes/ with ``:ID``/``:LABEL``, relationships/ with
    ``:START_ID``/``:END_ID``/``:TYPE``).

    This re-expresses the reference's ``to_neo4j`` (io/neo4j.py — a py2neo
    per-node/per-edge upload) as the bulk path a real deployment uses at
    scale: distributed CSV write, no driver round-trips.
    """
    import os

    node_out = (
        nodes.select(
            F.col('node_id').alias('node_id:ID'),
            'node_bel', 'namespace', 'name',
            F.col('function').alias(':LABEL'),
        )
    )
    edge_out = (
        edges.select(
            F.col('source_id').alias(':START_ID'),
            F.col('target_id').alias(':END_ID'),
            F.col('relation').alias(':TYPE'),
            'citation_db', 'citation_id', 'evidence',
        )
    )
    node_path = os.path.join(out_dir, 'nodes')
    edge_path = os.path.join(out_dir, 'relationships')
    node_out.write.mode('overwrite').option('header', True).csv(node_path)
    edge_out.write.mode('overwrite').option('header', True).csv(edge_path)
    return {'nodes': node_path, 'relationships': edge_path,
            'import_command':
                'neo4j-admin database import full'
                ' --nodes={}/part-*.csv --relationships={}/part-*.csv'
                .format(node_path, edge_path)}
