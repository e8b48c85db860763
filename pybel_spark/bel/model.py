"""BEL node data model and canonical rendering.

Nodes are plain JSON-able dicts (no classes) so they cross the Arrow boundary
cheaply inside Spark UDF batches. Canonicalization rules (quoting, member /
variant sort order, CURIE vs OBO style) replicate the reference compiler's
node-identity semantics (reference: src/pybel/dsl/node_classes.py:71-1001,
src/pybel/utils.py:94-96, src/pybel/language.py:17-82) so md5 node ids match.
"""
import hashlib

from .constants import (
    BEL_DEFAULT_NAMESPACE, COMPLEX, COMPOSITE, FRAGMENT, GENE, GMOD, HGVS,
    MIRNA, PMOD, PROTEIN, REACTION, REV_ABUNDANCE_LABELS, RNA,
)

CENTRAL_DOGMA = {GENE, RNA, MIRNA, PROTEIN}
LIST_FUNCTIONS = {COMPLEX, COMPOSITE}


def ensure_quotes(s) -> str:
    """Quote any token that isn't purely alphanumeric (utils.py:94-96)."""
    s = str(s)
    return '"{}"'.format(s) if not s.isalnum() else s


def concept_curie(concept) -> str:
    """Render a concept as CURIE; bare name for the BEL default namespace."""
    if concept['namespace'] == BEL_DEFAULT_NAMESPACE:
        return concept['name']
    value = concept.get('identifier') or concept.get('name')
    return '{}:{}'.format(concept['namespace'], ensure_quotes(value))


def concept_obo(concept) -> str:
    """Render a concept OBO-style: ``NS:id ! name``."""
    return '{}:{} ! {}'.format(
        concept['namespace'],
        ensure_quotes(concept['identifier']),
        ensure_quotes(concept['name']),
    )


def concept_label(concept, use_identifiers: bool = True) -> str:
    """OBO style when both identifier and name are available, else CURIE."""
    if use_identifiers and concept.get('identifier') and concept.get('name'):
        return concept_obo(concept)
    return concept_curie(concept)


def variant_as_bel(variant, use_identifiers: bool = True) -> str:
    """Render a variant dict as BEL (node_classes.py:398-569)."""
    kind = variant['kind']
    if kind == HGVS:
        return 'var("{}")'.format(variant['hgvs'])
    if kind == PMOD:
        parts = [concept_label(variant['concept'], use_identifiers)]
        if variant.get('code'):
            parts.append(str(variant['code']))
        if variant.get('position'):
            parts.append(str(variant['position']))
        return 'pmod({})'.format(', '.join(parts))
    if kind == GMOD:
        return 'gmod({})'.format(concept_label(variant['concept'], use_identifiers))
    if kind == FRAGMENT:
        if variant.get('missing'):
            rng = '?'
        else:
            rng = '{}_{}'.format(variant['start'], variant['stop'])
        res = '"{}"'.format(rng)
        if variant.get('description'):
            res += ', "{}"'.format(variant['description'])
        return 'frag({})'.format(res)
    raise ValueError('invalid variant kind: {}'.format(kind))


def fusion_range_as_bel(rng) -> str:
    if rng is None or rng.get('missing'):
        return '?'
    return '{}.{}_{}'.format(rng['reference'], rng['start'], rng['stop'])


def node_as_bel(node, use_identifiers: bool = True) -> str:
    """Render a node dict as its canonical BEL string (= its identity)."""
    func = node['function']
    tag = REV_ABUNDANCE_LABELS.get(func)

    if func == REACTION:
        return 'rxn(reactants({}), products({}))'.format(
            ', '.join(node_as_bel(m, use_identifiers) for m in node['reactants']),
            ', '.join(node_as_bel(m, use_identifiers) for m in node['products']),
        )

    if node.get('fusion'):
        fusion = node['fusion']
        return '{}(fus({}, "{}", {}, "{}"))'.format(
            tag,
            concept_label(fusion['partner_5p']['concept'], use_identifiers),
            fusion_range_as_bel(fusion.get('range_5p')),
            concept_label(fusion['partner_3p']['concept'], use_identifiers),
            fusion_range_as_bel(fusion.get('range_3p')),
        )

    if node.get('members') is not None:
        # list abundances render members only, even when named (node_classes.py:760-765)
        return '{}({})'.format(
            tag,
            ', '.join(node_as_bel(m, use_identifiers) for m in node['members']),
        )

    base = concept_label(node['concept'], use_identifiers)
    variants = node.get('variants')
    if variants:
        variants_canon = sorted(variant_as_bel(v, use_identifiers) for v in variants)
        return '{}({}, {})'.format(tag, base, ', '.join(variants_canon))
    return '{}({})'.format(tag, base)


def node_md5(node) -> str:
    """Deterministic content-addressed node id (node_classes.py:93-97)."""
    return hashlib.md5(node_as_bel(node).encode('utf8')).hexdigest()  # noqa: S324


def sort_entities(nodes):
    """Sort a node list by canonical BEL string (construction-time ordering
    of list-abundance members and reaction participants, node_classes.py:750,700-705)."""
    return sorted(nodes, key=node_as_bel)


def make_simple(function, namespace, name=None, identifier=None):
    node = {'function': function, 'concept': _concept(namespace, name, identifier)}
    return node


def _concept(namespace, name=None, identifier=None):
    concept = {'namespace': namespace}
    if name is not None:
        concept['name'] = name
    if identifier is not None:
        concept['identifier'] = identifier
    return concept


def make_central_dogma(function, namespace, name=None, identifier=None, variants=None):
    node = make_simple(function, namespace, name, identifier)
    if variants:
        node['variants'] = sorted(variants, key=variant_as_bel)
    return node


def make_list(function, members, namespace=None, name=None, identifier=None):
    node = {'function': function, 'members': sort_entities(members)}
    if namespace:
        node['concept'] = _concept(namespace, name, identifier)
    return node


def make_reaction(reactants, products):
    return {
        'function': REACTION,
        'reactants': sort_entities(reactants),
        'products': sort_entities(products),
    }


def make_fusion(function, partner_5p, partner_3p, range_5p=None, range_3p=None):
    return {
        'function': function,
        'fusion': {
            'partner_5p': partner_5p,
            'partner_3p': partner_3p,
            'range_5p': range_5p or {'missing': '?'},
            'range_3p': range_3p or {'missing': '?'},
        },
    }


def node_curie(node):
    """CURIE of a node's concept, or None for structured nodes."""
    concept = node.get('concept')
    if concept is None:
        return None
    return concept_curie(concept)


def safe_label(node, use_identifiers: bool = True) -> str:
    """Triple-export label: CURIE for simple concepts, full BEL for structured
    nodes (reference io/tsv/converters.py:20-29)."""
    if node.get('variants') or node.get('members') is not None \
            or node.get('fusion') or node['function'] == REACTION:
        return node_as_bel(node, use_identifiers)
    concept = node.get('concept')
    if concept is None:
        return node_as_bel(node, use_identifiers)
    return concept_curie(concept)  # always plain CURIE (converters.py:24-29)


def get_parent(node):
    """Reference node of a variant-carrying central-dogma node."""
    return {'function': node['function'], 'concept': dict(node['concept'])}
