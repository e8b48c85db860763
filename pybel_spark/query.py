"""Query system: load → union → seed → transform, JSON-serializable.

Reference: struct/query/query.py:21-204, seeding.py:25-163,
selection.py:26. A query names its input tables, a list of seeds (each a
§2.4 induction over the universe), and a Pipeline protocol; seed results are
unioned and the pipeline runs with the universe available for expansions.
"""
import json

from pyspark.sql import functions as F

from .ops import KG, Pipeline, induction, union
from .ops.graph import induce_by_edges

SEED_TYPES = ('induction', 'neighbors', 'annotation', 'annotation_value',
              'pubmed', 'upstream', 'downstream', 'sample')


class Seeding:
    """An ordered list of seed specs; results are unioned (seeding.py:93-121)."""

    def __init__(self, seeds=None):
        self.seeds = list(seeds or [])

    def append(self, seed_type, data=None):
        if seed_type not in SEED_TYPES:
            raise ValueError('unknown seed type: {}'.format(seed_type))
        self.seeds.append({'type': seed_type, 'data': data})
        return self

    def run(self, universe: KG) -> KG:
        if not self.seeds:
            return universe
        subgraphs = [self._run_one(universe, seed) for seed in self.seeds]
        return union(subgraphs)

    @staticmethod
    def _run_one(universe: KG, seed) -> KG:
        seed_type, data = seed['type'], seed.get('data')
        if seed_type == 'induction':
            return induction.get_subgraph_by_induction(universe, data)
        if seed_type == 'neighbors':
            return induction.get_subgraph_by_neighborhood(universe, data)
        if seed_type == 'annotation':
            return induction.get_subgraph_by_annotations(universe, data)
        if seed_type == 'annotation_value':
            return induction.get_subgraph_by_annotation_value(
                universe, data['key'], *data['values'])
        if seed_type == 'pubmed':
            return induction.get_subgraph_by_pubmed(universe, *data)
        if seed_type == 'upstream':
            return induction.get_upstream_causal_subgraph(universe, data)
        if seed_type == 'downstream':
            return induction.get_downstream_causal_subgraph(universe, data)
        if seed_type == 'sample':
            from .ops.sample import get_random_subgraph

            if data and 'fraction' in data:
                # plain seeded edge sample (distributed)
                edges = universe.edges.sample(
                    fraction=data['fraction'], seed=data.get('seed', 42))
                return induce_by_edges(universe, edges)
            # reference semantics: inverse-degree weighted random walk
            # (induction/random_subgraph.py:150-200)
            data = data or {}
            return get_random_subgraph(
                universe,
                number_edges=data.get('number_edges'),
                number_seed_edges=data.get('number_seed_edges'),
                seed=data.get('seed'),
                invert_degrees=data.get('invert_degrees', True))
        raise ValueError(seed_type)

    def to_json(self):
        return json.dumps(self.seeds)

    @classmethod
    def from_json(cls, payload):
        return cls(json.loads(payload))


def register_views(graph: KG, spark=None, prefix='kg_'):
    """Register the graph as SQL temp views (reference QueryManager,
    manager/query_manager.py:33-268 — arbitrary filtered retrieval becomes
    plain Spark SQL over these views)."""
    graph.nodes.createOrReplaceTempView(prefix + 'nodes')
    graph.edges.createOrReplaceTempView(prefix + 'edges')
    return [prefix + 'nodes', prefix + 'edges']


def query_edges(graph: KG, source_bel=None, relation=None, target_bel=None,
                evidence_contains=None):
    """QueryManager.query_edges: filtered edge retrieval."""
    edges = graph.edges
    if source_bel is not None:
        edges = edges.where(F.col('source_bel') == source_bel)
    if relation is not None:
        edges = edges.where(F.col('relation') == relation)
    if target_bel is not None:
        edges = edges.where(F.col('target_bel') == target_bel)
    if evidence_contains is not None:
        edges = edges.where(F.col('evidence').contains(evidence_contains))
    return edges


def query_nodes(graph: KG, function=None, namespace=None, name_contains=None,
                bel_contains=None):
    """QueryManager.query_nodes: filtered node retrieval."""
    nodes = graph.nodes
    if function is not None:
        nodes = nodes.where(F.col('function') == function)
    if namespace is not None:
        nodes = nodes.where(F.col('namespace') == namespace)
    if name_contains is not None:
        nodes = nodes.where(F.lower('name').contains(name_contains.lower()))
    if bel_contains is not None:
        nodes = nodes.where(F.col('node_bel').contains(bel_contains))
    return nodes


class Query:
    """Seeding + pipeline over a universe graph (query.py:21-204)."""

    def __init__(self, seeding=None, pipeline=None, tables=None):
        self.seeding = seeding or Seeding()
        self.pipeline = pipeline or Pipeline()
        self.tables = tables  # optional {'nodes': path, 'edges': path}

    def load_universe(self, spark) -> KG:
        if not self.tables:
            raise ValueError('query has no tables to load')
        return KG(
            spark.read.parquet(self.tables['nodes']).dropDuplicates(['node_id']),
            spark.read.parquet(self.tables['edges']).dropDuplicates(['edge_id']),
        )

    def run(self, universe: KG = None, spark=None) -> KG:
        if universe is None:
            universe = self.load_universe(spark)
        seeded = self.seeding.run(universe)
        return self.pipeline.run(seeded, universe=universe)

    def to_json(self):
        return json.dumps({
            'tables': self.tables,
            'seeding': self.seeding.seeds,
            'pipeline': self.pipeline.protocol,
        })

    @classmethod
    def from_json(cls, payload):
        raw = json.loads(payload)
        return cls(
            seeding=Seeding(raw.get('seeding')),
            pipeline=Pipeline(raw.get('pipeline')),
            tables=raw.get('tables'),
        )
