"""Edge → BEL statement string reconstruction (pure functions).

Reference: canonicalize.py:75-195 (_decanonicalize_edge_node /
edge_to_bel / postpend_location). Used by the script/CSV/SIF exporters to
render each edge back to its statement form including subject/object
modifiers.
"""
from .constants import (
    ACTIVITY, BEL_DEFAULT_NAMESPACE, CELL_SURFACE, DEGRADATION, EXTRACELLULAR,
    INTRACELLULAR, TRANSLOCATION,
)
from .model import ensure_quotes


def _postpend_location(bel_string, location):
    """Insert ", loc(NS:name)" before the closing paren (canonicalize.py:71-88)."""
    return '{}, loc({}:{}))'.format(
        bel_string[:-1], location['namespace'], ensure_quotes(location['name']))


def decorate_node(bel_string, modifier):
    """Apply an edge subject/object modifier dict to a node BEL string
    (canonicalize.py:93-151)."""
    if not modifier:
        return bel_string

    node_str = bel_string
    location = modifier.get('location')
    if location:
        node_str = _postpend_location(node_str, location)

    kind = modifier.get('modifier')
    if kind is None:
        return node_str

    if kind == DEGRADATION:
        return 'deg({})'.format(node_str)

    effect = modifier.get('effect')

    if kind == ACTIVITY:
        if effect is None:
            return 'act({})'.format(node_str)
        if effect['namespace'] == BEL_DEFAULT_NAMESPACE:
            return 'act({}, ma({}))'.format(node_str, effect['name'])
        return 'act({}, ma({}:{}))'.format(
            node_str, effect['namespace'], ensure_quotes(effect['name']))

    if kind == TRANSLOCATION:
        if effect is None:
            return 'tloc({})'.format(node_str)
        from_loc = effect['from_loc']
        to_loc = effect['to_loc']
        if from_loc['namespace'] == BEL_DEFAULT_NAMESPACE \
                and from_loc['name'] == INTRACELLULAR:
            if to_loc['namespace'] == BEL_DEFAULT_NAMESPACE \
                    and to_loc['name'] == EXTRACELLULAR:
                return 'sec({})'.format(node_str)
            if to_loc['namespace'] == BEL_DEFAULT_NAMESPACE \
                    and to_loc['name'] == CELL_SURFACE:
                return 'surf({})'.format(node_str)
        return 'tloc({}, fromLoc({}:{}), toLoc({}:{}))'.format(
            node_str,
            from_loc['namespace'], ensure_quotes(from_loc['name']),
            to_loc['namespace'], ensure_quotes(to_loc['name']))

    raise ValueError('invalid modifier: {}'.format(kind))


def edge_to_bel(source_bel, target_bel, relation,
                subject_modifier=None, object_modifier=None, sep=' '):
    """Render a full BEL statement for an edge (canonicalize.py:181-195)."""
    return sep.join([
        decorate_node(source_bel, subject_modifier),
        relation,
        decorate_node(target_bel, object_modifier),
    ])
