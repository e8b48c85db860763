"""Graph operations over (nodes, edges) DataFrames.

The reference's graph-transformation library (struct/mutation, struct/filters,
struct/summary, struct/operations — see SURVEY.md §2.4-2.5) re-expressed as
pure DataFrame algebra: filters are Column predicates, subgraph induction is
a double semi-join, collapse is a mapping-join rewrite, union is
unionByName + content-hash dedup. Every operation is registered in the
JSON-serializable Pipeline registry (registry.py).
"""
from .graph import KG, induce_by_nodes, left_full_join, node_intersection, union  # noqa: F401
from .components import (  # noqa: F401
    connected_components, count_components, get_largest_component,
    left_outer_join,
)
from . import (  # noqa: F401
    analytics, components, cooccurrence, filters, induction, collapse,
    inference, deletion, sample, summary,
)
from .registry import Pipeline, register, get_transform  # noqa: F401
