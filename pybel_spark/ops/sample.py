"""Random subgraph sampling by inverse-degree weighted random walk.

Reference: ``struct/mutation/induction/random_subgraph.py:25-200`` —
seed with a few random edges, then repeatedly pick a result node with
probability ∝ 1/degree (favoring the frontier over hubs) and step to an
unvisited out-neighbor, until ``number_edges`` edges are collected.

The walk is inherently sequential (each step's distribution depends on the
previous step), so it runs on the driver over the graph's *edge structure*
(3 id columns per edge — the display-scale use case this op serves in the
reference). The full edge/node payloads never leave the cluster: the chosen
edge ids come back as a broadcast semi-join. For graphs whose structure
exceeds ``max_collect_edges`` the structure is first down-sampled
distributedly (seeded) — a documented approximation to keep the driver
bounded at any input scale.
"""
import random

from pyspark.sql import functions as F

from .graph import KG, induce_by_edges

#: reference SAMPLE_RANDOM_EDGE_COUNT / SAMPLE_RANDOM_EDGE_SEED_COUNT
SAMPLE_RANDOM_EDGE_COUNT = 250
SAMPLE_RANDOM_EDGE_SEED_COUNT = 5


class _WeightedRandomGenerator:
    """Cumulative-weight sampler (random_subgraph.py:61-91)."""

    def __init__(self, values, weights, rng):
        self.values = values
        self.totals = []
        total = 0.0
        for w in weights:
            total += w
            self.totals.append(total)
        self.rng = rng

    def next(self):
        import bisect
        target = self.rng.random() * self.totals[-1]
        return self.values[bisect.bisect_right(self.totals, target)]


def _pick_node(degrees, blacklist, invert_degrees, rng):
    """Weighted node choice over the result graph (random_subgraph.py:94-124).
    Ties broken by node id for engine-independent determinism."""
    items = sorted(
        ((node, deg) for node, deg in degrees.items()
         if node not in blacklist),
        key=lambda kv: (kv[1], kv[0]))
    if not items:
        return None
    values = [node for node, _ in items]
    weights = [1.0 / deg if invert_degrees else float(deg)
               for _, deg in items]
    return _WeightedRandomGenerator(values, weights, rng).next()


def get_random_subgraph(graph: KG, number_edges=None, number_seed_edges=None,
                        seed=None, invert_degrees=True,
                        max_collect_edges=1_000_000) -> KG:
    """Weighted-random-walk subgraph (random_subgraph.py:150-200)."""
    if number_edges is None:
        number_edges = SAMPLE_RANDOM_EDGE_COUNT
    if number_seed_edges is None:
        number_seed_edges = SAMPLE_RANDOM_EDGE_SEED_COUNT

    total = graph.edges.count()
    if total <= number_edges:
        return graph

    structure = graph.edges.select('edge_id', 'source_id', 'target_id')
    if total > max_collect_edges:
        structure = structure.sample(
            fraction=max_collect_edges / total, seed=seed or 0)
    rows = sorted(
        ((r['edge_id'], r['source_id'], r['target_id'])
         for r in structure.collect()))

    rng = random.Random(seed)

    # out-adjacency with multi-edge keys: u -> {v -> [edge_ids]}
    out_adj = {}
    for edge_id, u, v in rows:
        out_adj.setdefault(u, {}).setdefault(v, []).append(edge_id)

    chosen = set()
    result_out = {}
    degrees = {}

    def add_edge(u, v, edge_id):
        chosen.add(edge_id)
        result_out.setdefault(u, set()).add(v)
        result_out.setdefault(v, set())
        degrees[u] = degrees.get(u, 0) + 1
        degrees[v] = degrees.get(v, 0) + 1

    for edge_id, u, v in rng.sample(rows, number_seed_edges):
        add_edge(u, v, edge_id)

    blacklist = set()
    remaining = number_edges - number_seed_edges
    for _ in range(remaining):
        source, possible = None, None
        attempts = 0
        while not possible:
            source = _pick_node(degrees, blacklist, invert_degrees, rng)
            attempts += 1
            if source is None or attempts >= len(degrees) + 1:
                source = None
                break
            possible = sorted(
                set(out_adj.get(source, ())) - result_out.get(source, set()))
            if not possible:
                blacklist.add(source)
        if source is None:
            break  # exhausted the reachable components (reference warns)
        step = rng.choice(possible)
        edge_id = rng.choice(sorted(out_adj[source][step]))
        add_edge(source, step, edge_id)

    spark = graph.edges.sparkSession
    ids = spark.createDataFrame([(e,) for e in sorted(chosen)], ['edge_id'])
    edges = graph.edges.join(F.broadcast(ids), on='edge_id', how='leftsemi')
    return induce_by_edges(graph, edges)


def get_graph_with_random_edges(graph: KG, n_edges: int, seed=None) -> KG:
    """Uniform random edge seeding (random_subgraph.py:25-52) — fully
    distributed: seeded Bernoulli sample + exact top-up is unnecessary for
    the reference semantics (a display sample), so this uses Spark's seeded
    sample directly."""
    total = graph.edges.count()
    if total <= n_edges:
        return graph
    fraction = min(1.0, n_edges / total)
    edges = graph.edges.sample(fraction=fraction, seed=seed or 0)
    return induce_by_edges(graph, edges)
