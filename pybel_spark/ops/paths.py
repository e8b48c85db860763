"""Path-based induction: bounded BFS distances and all-shortest-paths
subgraphs.

Reference: struct/mutation/induction/paths.py:57-118
(get_subgraph_by_all_shortest_paths). Distances are computed by iterative
frontier joins (label propagation) — diameter-bounded, so a handful of
narrow-shuffle rounds; the shortest-path membership test is the classic
d(a,w) + d(w,b) = d(a,b) criterion evaluated as a join, never a driver loop
over paths.
"""
from pyspark.sql import DataFrame, functions as F

from .graph import KG, adjacency_table, dump_plan, induce_by_nodes


def bfs_distances(graph: KG, sources, max_hops=6, directed=True) -> DataFrame:
    """(source_id, node_id, distance) for nodes within max_hops of each
    source. Iterative frontier expansion with min-distance dedup.

    The edge set is materialized ONCE as a per-node adjacency array (the
    analytics.py _power_iteration rewrite): each hop then sort-merge-joins
    the O(frontier) state against the O(nodes-with-out-edges) adjacency
    table and explodes, instead of joining the O(edges) pair table — 4×
    fewer sorted rows per hop on the 4M-edge bench graph for identical
    reached sets (integer semantics, no float drift possible)."""
    edges = graph.edges.select('source_id', 'target_id')
    if not directed:
        edges = edges.unionByName(
            graph.edges.select(
                F.col('target_id').alias('source_id'),
                F.col('source_id').alias('target_id')))
    adj = adjacency_table(edges).persist()

    if isinstance(sources, DataFrame):
        seeds = sources.select(F.col(sources.columns[0]).alias('origin'))
    else:
        spark = graph.nodes.sparkSession
        seeds = spark.createDataFrame([(s,) for s in sources], ['origin'])

    # per-hop LAYER list: layers are disjoint by construction, so the
    # visited set for the anti-join (and the returned distance table) is
    # their lazy union — the previous per-hop re-checkpoint of the whole
    # growing distance table re-materialized O(reached × hops) rows
    layers = [seeds.select(
        'origin', F.col('origin').alias('node_id'),
        F.lit(0).alias('distance')).localCheckpoint()]
    for hop in range(1, max_hops + 1):
        # join strategy left to AQE: frontier/visited sizes swing orders
        # of magnitude across hops, and AQE's runtime sizes pick
        # broadcast for the small hops and sort-merge for the big ones —
        # interleaved same-session A/B at 4M edges / 31 origins: unpinned
        # 13.3-14.3 s vs merge-pinned 15.4-16.9 s
        neighbors = (
            layers[-1]
            .join(adj, on='node_id')
            .select('origin', F.explode('nbrs').alias('node_id'),
                    F.lit(hop).alias('distance'))
            .distinct()
        )
        visited = layers[0].select('origin', 'node_id')
        for lvl in layers[1:]:
            visited = visited.unionByName(lvl.select('origin', 'node_id'))
        # localCheckpoint truncates the iterative lineage — without it every
        # round re-evaluates the whole union chain from the source scan
        new = neighbors \
            .join(visited, on=['origin', 'node_id'], how='leftanti')
        dump_plan(new, 'round_bfs')
        new = new.localCheckpoint()
        if new.isEmpty():
            break
        layers.append(new)
    adj.unpersist()
    distances = layers[0]
    for lvl in layers[1:]:
        distances = distances.unionByName(lvl)
    return distances


def get_subgraph_by_all_shortest_paths(graph: KG, node_ids, max_hops=6,
                                       directed=False) -> KG:
    """Induced subgraph over every node lying on a shortest path between any
    pair of seed nodes (induction/paths.py:57-118).

    w is on a shortest a→b path  ⇔  d(a,w) + d(w,b) = d(a,b); with the
    undirected default, d(w,b) = d(b,w), so one BFS table from the seed set
    suffices."""
    if not directed:
        dist = bfs_distances(graph, node_ids, max_hops, directed=False).persist()
        pair_dist = (
            dist.alias('da').join(dist.alias('db'), on='node_id')
            .where(F.col('da.origin') < F.col('db.origin'))
            .groupBy(F.col('da.origin').alias('a'),
                     F.col('db.origin').alias('b'))
            .agg(F.min(F.col('da.distance') + F.col('db.distance'))
                 .alias('d_ab'))
        )
        on_path = (
            dist.alias('da')
            .join(dist.alias('db'), on='node_id')
            .join(pair_dist,
                  on=(F.col('da.origin') == F.col('a'))
                  & (F.col('db.origin') == F.col('b')))
            .where(F.col('da.distance') + F.col('db.distance') == F.col('d_ab'))
            .select('node_id').distinct()
        )
        result = induce_by_nodes(graph, on_path)
        dist.unpersist()
        return result

    forward = bfs_distances(graph, node_ids, max_hops, directed=True)
    # reverse distances: BFS over flipped edges
    flipped = KG(graph.nodes, graph.edges.select(
        F.col('target_id').alias('source_id'),
        F.col('source_id').alias('target_id')))
    backward = bfs_distances(flipped, node_ids, max_hops, directed=True)
    pair_dist = (
        forward.alias('fa').join(backward.alias('bb'), on='node_id')
        .where(F.col('fa.origin') != F.col('bb.origin'))
        .groupBy(F.col('fa.origin').alias('a'), F.col('bb.origin').alias('b'))
        .agg(F.min(F.col('fa.distance') + F.col('bb.distance')).alias('d_ab'))
    )
    on_path = (
        forward.alias('fa')
        .join(backward.alias('bb'), on='node_id')
        .join(pair_dist,
              on=(F.col('fa.origin') == F.col('a'))
              & (F.col('bb.origin') == F.col('b')))
        .where(F.col('fa.distance') + F.col('bb.distance') == F.col('d_ab'))
        .select('node_id').distinct()
    )
    return induce_by_nodes(graph, on_path)
