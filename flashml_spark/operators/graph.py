"""Iterative graph algorithms as DataFrame loops (no GraphX/GraphFrames
dependency — plain co-keyed joins + aggs, the same machinery as
``dedup.connected_components``).

PageRank over a similarity / co-occurrence graph is a curation primitive:
rank documents by authority inside a near-dup cluster graph (keep the
most-linked representative), or event types / sources by centrality.

Scale shape per iteration: ONE join of the rank frame against the edge
list on the source key (both sides hash-partitioned on it — the edge
frame is checkpointed pre-partitioned so every iteration reuses the
layout), then a hash agg on the destination.  The rank frame is
|nodes|-sized; the join is |edges|-sized; nothing is ever collected to
the driver.  Each round localCheckpoints the new rank frame and frees
the previous round's blocks (lineage stays flat, storage stays O(2×)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    out_col: str = "rank",
) -> DataFrame:
    """Power-iteration PageRank on a directed edge list.

    Nodes = every id appearing as src or dst.  Per iteration::

        rank[v] = (1 - d)/N + d * Σ_{(u,v) ∈ E} rank[u] / out_degree[u]

    Dangling-node mass (nodes with no out-edges) is dropped, not
    redistributed — fine for symmetric graphs (every node has out-edges)
    and documented for directed use.  Fixed iteration count keeps the
    result deterministic and oracle-checkable (unrolled-CTE SQL twin).

    Returns ``(node, <out_col>)``.
    """
    sc = edges.sparkSession.sparkContext

    def _persistent_ids() -> set[int]:
        m = sc._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    def _free(ids: set[int]) -> None:
        m = sc._jsc.getPersistentRDDs()
        for rid in ids:
            r = m.get(rid)
            if r is not None:
                r.unpersist(False)

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # edge list with out-degree attached, partitioned on src once — every
    # iteration's join reuses this layout without reshuffling the edges
    before = _persistent_ids()
    ed = (
        e.join(deg, "src")
        .repartition("src")
        .localCheckpoint()
    )
    ed_ids = _persistent_ids() - before

    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    prev_ids: set[int] = set()
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("__deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("__in"))
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce("__in", F.lit(0.0))).alias("r"),
            )
        )
        before = _persistent_ids()
        ranks = new_ranks.localCheckpoint()
        new_ids = _persistent_ids() - before
        _free(prev_ids)
        prev_ids = new_ids
    out = ranks.select("node", F.col("r").alias(out_col))
    _free(ed_ids)
    return out


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    node_col: str = "node",
) -> DataFrame:
    """Breadth-first hop labels from a seed set over an UNDIRECTED edge
    frame ``(src, dst)``: every node reachable within ``max_hops`` gets
    its minimum hop distance — the reachability / blast-radius primitive
    (account linking, contamination spread, recommendation radius).

    DataFrame loop, one round per hop: frontier ⋈ edges (keyed) minus
    already-visited (keyed anti-join), both sides localCheckpointed per
    round so lineage stays flat and each abandoned round's blocks are
    freed (same loop hygiene as :func:`pagerank`).  Driver state: the
    loop counter only.  Output: ``node_col, hop`` (seeds at hop 0).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = sources.select(
        F.col(node_col).alias("n"), F.lit(0).alias("hop")
    ).distinct().localCheckpoint(eager=False)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["n"] == sym["a"])
            .select(F.col("b").alias("n"))
            .distinct()
            .join(visited.select("n"), "n", "left_anti")
            .select("n", F.lit(hop).alias("hop"))
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select(F.col("n").alias(node_col), F.col("hop").cast("bigint").alias("hop"))
