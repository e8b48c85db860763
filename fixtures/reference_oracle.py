"""Run the reference PyBEL compiler (read-only at /root/reference) as a
golden-output oracle at fixture-build time.

This module is tooling only — the shipped Spark engine never imports it.
It wires the shims in ``fixtures/shims`` so the reference package can be
imported without its heavyweight dependencies, and replaces the SQLAlchemy
``Manager`` with a filesystem-backed resource resolver that maps the
reference's resource URLs to its own local test fixtures exactly like
``pybel.testing.mocks`` does (reference: src/pybel/testing/mocks.py:19-24,
src/pybel/testing/utils.py:19-26).
"""
import json
import os
import sys
from urllib.parse import urlparse

_HERE = os.path.dirname(os.path.abspath(__file__))
_SHIMS = os.path.join(_HERE, 'shims')
_REF_SRC = '/root/reference/src'

for _p in (_SHIMS, _REF_SRC):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import bel_resources  # the functional shim  # noqa: E402
from pybel import BELGraph  # noqa: E402
from pybel.io.line_utils import parse_lines  # noqa: E402
from pybel.io.tsv.api import get_triples  # noqa: E402

RESOURCE_DIR = '/root/reference/src/pybel/testing/resources'
BELNS_DIR = os.path.join(RESOURCE_DIR, 'belns')
BELANNO_DIR = os.path.join(RESOURCE_DIR, 'belanno')
BEL_DIR = os.path.join(RESOURCE_DIR, 'bel')

# special URL-basename → local-file mapping (reference testing/mocks.py:19-24)
_SPECIAL = {
    'go.belns': os.path.join(BELNS_DIR, 'go-names.belns'),
    'hgnc-human-genes-20170725.belns': os.path.join(BELNS_DIR, 'hgnc-names.belns'),
    'chebi-20170725.belns': os.path.join(BELNS_DIR, 'chebi-names.belns'),
    'species-taxonomy-id-20170511.belanno': os.path.join(BELANNO_DIR, 'species-taxonomy-id.belanno'),
    'confidence-1.0.0.belanno': os.path.join(BELANNO_DIR, 'confidence-1.0.0.belanno'),
}


def url_to_path(url: str) -> str:
    """Resolve a resource URL to a local fixture path (testing/utils.py:19-26)."""
    if url.startswith('file://'):
        stripped = url[len('file://'):]
        if os.path.exists(stripped):
            return stripped
        url = stripped  # fall through to basename lookup in fixture dirs
    parsed = urlparse(url)
    if parsed.query and 'path=' in parsed.query:
        name = parsed.query.split('=')[-1]
    else:
        name = parsed.path.split('/')[-1]
    if name in _SPECIAL:
        return _SPECIAL[name]
    for d in (BELNS_DIR, BELANNO_DIR, BEL_DIR):
        candidate = os.path.join(d, name)
        if os.path.exists(candidate):
            return candidate
    raise FileNotFoundError(url)


class _FixtureNamespace:
    def __init__(self, term_to_encoding):
        self._t2e = term_to_encoding

    def get_term_to_encodings(self):
        return self._t2e


class FixtureManager:
    """Duck-typed stand-in for pybel.manager.Manager backed by local files."""

    def get_or_create_namespace(self, url):
        resource = bel_resources.get_bel_resource(url_to_path(url))
        # (identifier, name) -> encoding; plain name-only namespaces have no ids
        return _FixtureNamespace({
            (None, name): encoding
            for name, encoding in resource['Values'].items()
        })

    def get_annotation_entry_names(self, url):
        resource = bel_resources.get_bel_resource(url_to_path(url))
        return set(resource['Values'])


def compile_bel_lines(lines, **kwargs):
    """Compile BEL script lines with the reference compiler; return BELGraph."""
    graph = BELGraph()
    parse_lines(graph, lines, manager=FixtureManager(), **kwargs)
    return graph


def compile_bel_path(path, **kwargs):
    with open(path, encoding='utf-8') as f:
        return compile_bel_lines(list(f), **kwargs)


def node_record(node):
    concept = node.get('concept') or {}
    variants = node.get('variants') or []
    return {
        'bel': node.as_bel(),
        'md5': node.md5,
        'function': node.function,
        'namespace': concept.get('namespace'),
        'name': concept.get('name'),
        'variant_kinds': sorted({v['kind'] for v in variants}),
    }


def graph_to_golden(graph):
    """Serialize a compiled BELGraph into a JSON-able golden record."""
    from pybel.utils import canonicalize_edge

    nodes = sorted((node_record(n) for n in graph.nodes()), key=lambda r: r['bel'])
    edges = []
    for u, v, k, d in graph.edges(keys=True, data=True):
        citation = d.get('citation')
        citation_db = citation.get('db') if citation else None
        citation_id = citation.get('db_id') if citation else None
        # deterministic cross-language edge signature over the same five
        # keying components the reference hashes (utils.py:143-175)
        sig_payload = json.dumps(
            [u.as_bel(), v.as_bel(),
             '{}:{}'.format(citation_db, citation_id) if citation_db else None,
             d.get('evidence'), canonicalize_edge(d)],
            sort_keys=True, separators=(',', ':'))
        import hashlib
        edges.append({
            'source': u.as_bel(),
            'target': v.as_bel(),
            'relation': d['relation'],
            'citation_db': citation_db,
            'citation_id': citation_id,
            'evidence': d.get('evidence'),
            'annotations': {
                key: sorted(values)
                for key, values in sorted((d.get('annotations') or {}).items())
            },
            'line': d.get('line'),
            'edge_sig': hashlib.md5(sig_payload.encode('utf8')).hexdigest(),
        })
    edges.sort(key=lambda r: json.dumps(r, sort_keys=True))
    triples = sorted(set(get_triples(graph)))
    warnings = [
        {
            'line_number': exc.line_number,
            'line': exc.line,
            'error_class': exc.__class__.__name__,
        }
        for _, exc, _ in graph.warnings
    ]
    return {
        'nodes': nodes,
        'edges': edges,
        'triples': [list(t) for t in triples],
        'warnings': warnings,
        'n_nodes': len(nodes),
        'n_edges': len(edges),
    }
