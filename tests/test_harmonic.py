"""Harmonic centrality: exact baseline + HyperBall approximation
(ops/analytics.py)."""
import math

import pytest

from pyspark.sql import functions as F

from pybel_spark.ops import analytics
from pybel_spark.ops.graph import KG


def _kg(spark, edges):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    return KG(
        nodes=spark.createDataFrame([(n,) for n in nodes],
                                    'node_id string'),
        edges=spark.createDataFrame(edges,
                                    'source_id string, target_id string'))


def _exact_py(edges):
    """Driver-side exact harmonic centrality by BFS, for verification."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out = {}
    for v in nodes:
        h = 0.0
        for u in nodes:
            if u == v:
                continue
            # BFS from u, distance to v
            seen, frontier, d = {u}, {u}, 0
            dist = None
            while frontier:
                d += 1
                nxt = set()
                for x in frontier:
                    for y in adj.get(x, ()):
                        if y not in seen:
                            seen.add(y)
                            nxt.add(y)
                if v in nxt:
                    dist = d
                    break
                frontier = nxt
            if dist:
                h += 1.0 / dist
        out[v] = h
    return out


def test_exact_matches_bruteforce(spark):
    edges = [('a', 'b'), ('b', 'c'), ('c', 'a'), ('a', 'c'), ('d', 'c')]
    got = {r['node_id']: r['harmonic']
           for r in analytics.harmonic_centrality(_kg(spark, edges))
           .collect()}
    want = _exact_py(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])
    # d has no in-links at all
    assert got['d'] == 0.0


def test_hyperball_accuracy_and_determinism(spark):
    # deterministic pseudo-random graph: 120 nodes, out-degree 4
    n = 120
    edges = [('n%03d' % i, 'n%03d' % ((i * 7 + k * 31 + 3) % n))
             for i in range(n) for k in range(4)
             if (i * 7 + k * 31 + 3) % n != i]
    kg = _kg(spark, edges)
    exact = {r['node_id']: r['harmonic']
             for r in analytics.harmonic_centrality(kg, max_hops=12)
             .collect()}
    est = {r['node_id']: r['harmonic_est']
           for r in analytics.hyperball_harmonic(kg, p=64, t_max=6)
           .collect()}
    assert set(est) == set(exact)
    rel = [abs(est[k] - exact[k]) / exact[k]
           for k in exact if exact[k] > 0]
    assert sum(rel) / len(rel) < 0.2, sum(rel) / len(rel)
    # deterministic: a second run is bit-identical
    est2 = {r['node_id']: r['harmonic_est']
            for r in analytics.hyperball_harmonic(kg, p=64, t_max=6)
            .collect()}
    assert est == est2


def test_hyperball_isolated_and_chain(spark):
    # path a→b→c: H(c) = 1/2 + 1 = 1.5 exactly; tiny balls are in the
    # linear-counting regime where HLL is exact for distinct ids that
    # land in distinct registers — allow small slack instead of exact
    kg = _kg(spark, [('a', 'b'), ('b', 'c')])
    est = {r['node_id']: r['harmonic_est']
           for r in analytics.hyperball_harmonic(kg, p=64, t_max=4)
           .collect()}
    assert est['a'] == 0.0
    assert est['c'] == pytest.approx(1.5, rel=0.15)
    assert est['b'] == pytest.approx(1.0, rel=0.15)


def test_closeness_parity_networkx(spark):
    import networkx as nx

    from pybel_spark.ops import KG, analytics
    edges = [('a', 'b'), ('b', 'c'), ('c', 'a'), ('c', 'd'),
             ('d', 'e'), ('x', 'a')]
    nodes = sorted({u for e in edges for u in e} | {'iso'})
    g = KG(spark.createDataFrame([(n,) for n in nodes], 'node_id string'),
           spark.createDataFrame(edges,
                                 'source_id string, target_id string'))
    nxg = nx.DiGraph(edges)
    nxg.add_nodes_from(nodes)
    expected = nx.closeness_centrality(nxg)  # wf_improved=True default
    got = {r['node_id']: r['closeness']
           for r in analytics.closeness_centrality(g).collect()}
    assert set(got) == set(expected)
    for v in expected:
        assert got[v] == pytest.approx(expected[v], abs=1e-12)
    assert got['iso'] == 0.0
