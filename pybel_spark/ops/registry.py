"""Named-transform registry + JSON-serializable Pipeline.

Reference: struct/pipeline/pipeline.py:30-331 and decorators.py:27-117 —
a registry of graph→graph functions addressable by name, with pipelines that
(de)serialize to JSON so workflows are reproducible. Universe-aware
transforms receive the full graph as their first argument.
"""
import json

_REGISTRY = {}
_UNIVERSE_TRANSFORMS = set()


def register(name=None, universe=False):
    """Decorator: register a KG transform under a stable name."""
    def deco(fn):
        key = name or fn.__name__
        _REGISTRY[key] = fn
        if universe:
            _UNIVERSE_TRANSFORMS.add(key)
        return fn
    return deco


def get_transform(name):
    return _REGISTRY[name]


def transforms():
    return dict(_REGISTRY)


class Pipeline:
    """An ordered list of (name, args, kwargs) applied to a KG."""

    def __init__(self, protocol=None):
        self.protocol = list(protocol or [])

    def append(self, name, *args, **kwargs):
        if name not in _REGISTRY:
            raise KeyError('unregistered transform: {}'.format(name))
        self.protocol.append({'function': name, 'args': list(args),
                              'kwargs': kwargs})
        return self

    def run(self, graph, universe=None):
        result = graph
        for step in self.protocol:
            fn = _REGISTRY[step['function']]
            args = step.get('args', [])
            kwargs = step.get('kwargs', {})
            if step['function'] in _UNIVERSE_TRANSFORMS:
                result = fn(universe if universe is not None else graph,
                            result, *args, **kwargs)
            else:
                result = fn(result, *args, **kwargs)
        return result

    def to_json(self):
        return json.dumps(self.protocol)

    @classmethod
    def from_json(cls, payload):
        return cls(json.loads(payload))


def _register_builtins():
    from . import collapse, components, deletion, induction, inference

    from . import sample

    register('get_largest_component')(components.get_largest_component)
    register('expand_by_touching_components', universe=True)(
        components.expand_by_touching_components)
    register('get_random_subgraph')(sample.get_random_subgraph)
    register('get_graph_with_random_edges')(sample.get_graph_with_random_edges)

    register('collapse_all_variants')(collapse.collapse_all_variants)
    register('collapse_to_genes')(collapse.collapse_to_genes)
    register('remove_associations')(deletion.remove_associations)
    register('remove_non_causal_edges')(deletion.remove_non_causal_edges)
    register('remove_pathologies')(deletion.remove_pathologies)
    register('remove_biological_processes')(deletion.remove_biological_processes)
    register('remove_isolated_nodes')(deletion.remove_isolated_nodes)
    register('remove_isolated_list_abundances')(deletion.remove_isolated_list_abundances)
    register('prune_protein_rna_origins')(deletion.prune_protein_rna_origins)
    register('enrich_proteins_with_rnas')(inference.enrich_proteins_with_rnas)
    register('enrich_rnas_with_genes')(inference.enrich_rnas_with_genes)
    register('enrich_protein_and_rna_origins')(inference.enrich_protein_and_rna_origins)
    register('transfer_causal_edges')(inference.transfer_causal_edges)
    register('get_subgraph_by_induction')(induction.get_subgraph_by_induction)
    register('get_subgraph_by_annotation_value')(induction.get_subgraph_by_annotation_value)
    register('get_subgraph_by_pubmed')(induction.get_subgraph_by_pubmed)
    register('get_subgraph_by_neighborhood')(induction.get_subgraph_by_neighborhood)
    register('expand_all_node_neighborhoods', universe=True)(
        induction.expand_all_node_neighborhoods)
    register('expand_upstream_causal', universe=True)(induction.expand_upstream_causal)
    register('expand_downstream_causal', universe=True)(induction.expand_downstream_causal)


_register_builtins()
