"""Edge → (subject, predicate, object) triple conversion.

A from-scratch port of the reference's priority-ordered converter chain
(reference: src/pybel/io/tsv/api.py:96-126 order, converters.py:32-394
predicates). Operates on plain edge records + node dicts, so it can run inside
the same Arrow batch that parsed the statement — no extra join or shuffle.

Returns None for edges the reference drops (unhandled conversions).
"""
from .constants import (
    ABUNDANCE, ACTIVITY, ASSOCIATION, BIOPROCESS, CAUSES_NO_CHANGE,
    COMPLEX, CORRELATIVE_RELATIONS, DECREASES, DEGRADATION,
    DIRECTLY_DECREASES, EQUIVALENT_TO, GENE,
    HAS_PRODUCT, HAS_REACTANT, HAS_VARIANT, INCREASES, IS_A, MIRNA,
    PART_OF, PATHOLOGY, PROTEIN, REACTION, REGULATES, RNA,
)
from .model import node_as_bel, node_curie, safe_label

CENTRAL_DOGMA = {GENE, RNA, MIRNA, PROTEIN}


def _is_base_abundance(node):
    """Named concept node (reference dsl BaseAbundance): has a concept, is not
    a list/fusion/reaction."""
    return (
        node.get('concept') is not None
        and node.get('members') is None
        and not node.get('fusion')
        and node['function'] != REACTION
    )


def _is_central_dogma(node):
    return node['function'] in CENTRAL_DOGMA and _is_base_abundance(node)


def _is_list_complex(node):
    return node['function'] == COMPLEX and node.get('members') is not None


def _is_named_complex(node):
    return node['function'] == COMPLEX and node.get('members') is None \
        and node.get('concept') is not None


def _is_protein(node):
    return node['function'] == PROTEIN and _is_base_abundance(node)


def _is_reaction(node):
    return node['function'] == REACTION


def _catalyst_bels(node):
    """BEL strings of entities in both reactants and products
    (node_classes.py:725-727)."""
    reactants = {node_as_bel(m) for m in node.get('reactants') or ()}
    return reactants.intersection(
        node_as_bel(m) for m in node.get('products') or ())


def edge_to_triple(source, target, relation, object_modifier=None):
    """Convert one edge to a triple (or None if the reference drops it).

    :param source: subject node dict
    :param target: object node dict
    :param relation: canonical relation string
    :param object_modifier: edge object-modifier dict (or None)
    """
    obj_mod = (object_modifier or {}).get('modifier')

    # 1. member partOf list-complex → (member.curie, partOf, complex.bel)
    if relation == PART_OF and _is_base_abundance(source) and _is_list_complex(target):
        return node_curie(source), 'partOf', node_as_bel(target)

    # 2-4. partOf named-complex / bp partOf bp / protein partOf bp
    if relation == PART_OF:
        if _is_protein(source) and _is_named_complex(target):
            return safe_label(source), 'partOf', safe_label(target)
        if source['function'] == BIOPROCESS and target['function'] == BIOPROCESS:
            return safe_label(source), 'partOf', safe_label(target)
        if _is_protein(source) and target['function'] == BIOPROCESS:
            return safe_label(source), 'partOf', safe_label(target)

    # 5. regulates + activity object modifier
    if relation == REGULATES and obj_mod == ACTIVITY:
        return (safe_label(source), 'activityDirectlyRegulatesActivityOf',
                safe_label(target))

    # 6-7. miRNA (directly)decreases RNA → repressesExpressionOf
    if relation in (DECREASES, DIRECTLY_DECREASES) \
            and source['function'] == MIRNA and _is_base_abundance(source) \
            and target['function'] == RNA and _is_base_abundance(target):
        return safe_label(source), 'repressesExpressionOf', safe_label(target)

    # 8-9. isA / equivalentTo keep their relation
    if relation == IS_A or relation == EQUIVALENT_TO:
        return safe_label(source), relation, safe_label(target)

    # 10-11. correlations and association keep their relation
    if relation in CORRELATIVE_RELATIONS or relation == ASSOCIATION:
        return safe_label(source), relation, safe_label(target)

    # 12-13. drug indication / side effect: a(X) -|/-> path(Y), relation kept
    if relation in (DECREASES, INCREASES) \
            and source['function'] == ABUNDANCE \
            and target['function'] == PATHOLOGY:
        return safe_label(source), relation, safe_label(target)

    # 14-17. amount regulation (no object modifier)
    if not obj_mod:
        amount = {
            REGULATES: 'regulatesAmountOf',
            INCREASES: 'increasesAmountOf',
            DECREASES: 'decreasesAmountOf',
            CAUSES_NO_CHANGE: 'notRegulatesAmountOf',
        }.get(relation)
        if amount is not None:
            return safe_label(source), amount, safe_label(target)

    # 18-20. activity regulation
    if obj_mod == ACTIVITY:
        act = {
            INCREASES: 'activityDirectlyPositivelyRegulatesActivityOf',
            DECREASES: 'activityDirectlyNegativelyRegulatesActivityOf',
            CAUSES_NO_CHANGE: 'notActivityDirectlyRegulatesActivityOf',
        }.get(relation)
        if act is not None:
            return safe_label(source), act, safe_label(target)

    # 21-23. reaction membership (catalysts fall through — the reference's
    # catalyst converter is unreachable, converters.py:162-175)
    if relation in (HAS_PRODUCT, HAS_REACTANT) and _is_reaction(source) \
            and _is_base_abundance(target):
        if node_as_bel(target) not in _catalyst_bels(source):
            return node_as_bel(source), relation, node_curie(target)
        return None

    # 24. hasVariant between central-dogma nodes keeps its relation
    if relation == HAS_VARIANT and _is_central_dogma(source) \
            and (target['function'] in CENTRAL_DOGMA
                 and target.get('members') is None and not target.get('fusion')):
        return safe_label(source), relation, safe_label(target)

    # 25-28. degradation regulation (note inverted polarity)
    if obj_mod == DEGRADATION:
        deg = {
            INCREASES: 'decreasesAmountOf',
            DECREASES: 'increasesAmountOf',
            REGULATES: 'regulatesAmountOf',
            CAUSES_NO_CHANGE: 'notRegulatesAmountOf',
        }.get(relation)
        if deg is not None:
            return safe_label(source), deg, safe_label(target)

    return None
