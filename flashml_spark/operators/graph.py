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
    # the node frame is consumed by EVERY iteration's rebase join (plus
    # the count and the initial ranks): pin it once, or the upstream
    # edge-construction subtree re-executes per round (r12; the lazy
    # checkpoint materializes on the count below — no extra action).
    before = _persistent_ids()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # edge list with out-degree attached, partitioned on src once — every
    # iteration's join reuses this layout without reshuffling the edges
    ed = (
        e.join(deg, "src")
        .repartition("src")
        .localCheckpoint()
    )
    pinned_ids = _persistent_ids() - before

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
    if iterations > 0:
        # the final ranks checkpoint no longer depends on the edge/node
        # pins; with NO iterations `out` still reads the node pin, so
        # keep it (the bench frees leftovers between queries anyway)
        _free(pinned_ids)
    return out


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    node_col: str = "node",
    driver_edge_budget: int = 5_000_000,
) -> DataFrame:
    """Breadth-first hop labels from a seed set over an UNDIRECTED edge
    frame ``(src, dst)``: every node reachable within ``max_hops`` gets
    its minimum hop distance — the reachability / blast-radius primitive
    (account linking, contamination spread, recommendation radius).

    Edge sets under ``driver_edge_budget`` rows (~80 MB of bigint pairs
    at the 5M default) run as a vectorized exact BFS on the driver —
    the :func:`kcore` bounded-budget pattern; ``max_hops`` synchronous
    rounds of per-round scheduler overhead dominate the distributed
    loop at that size.  Past the budget: a DataFrame loop, one round
    per hop — frontier ⋈ edges (keyed) minus already-visited (keyed
    anti-join), localCheckpointed per round so lineage stays flat (same
    loop hygiene as :func:`pagerank`); the symmetric edge frame is
    built with ONE ``explode(array(...))`` pass so the upstream edge
    subtree is evaluated once, not once per union branch.  Output:
    ``node_col, hop`` (seeds at hop 0).
    """
    e0c = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).localCheckpoint()
    n_edges = e0c.count()
    if n_edges <= driver_edge_budget:
        try:
            return _bfs_driver(e0c, sources, max_hops, node_col)
        finally:
            e0c.unpersist()
    sym = (
        e0c.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("n"), F.col("b").alias("m")),
                    F.struct(F.col("b").alias("n"), F.col("a").alias("m")),
                )
            ).alias("__e")
        )
        .select(F.col("__e.n").alias("a"), F.col("__e.m").alias("b"))
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


def _bfs_driver(
    e0c: DataFrame, sources: DataFrame, max_hops: int, node_col: str
) -> DataFrame:
    """Bounded DRIVER-side BFS for edge sets under the caller's budget
    (the :func:`_kcore_driver` pattern).  Level-synchronous frontier
    expansion over a CSR adjacency — integer arithmetic only, so the
    result is exactly the distributed loop's: every reachable node's
    minimum hop, seeds at 0 (present even when isolated)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = e0c.sparkSession
    pdf = e0c.toPandas()
    seed_rows = [
        r[0] for r in sources.select(node_col).distinct().collect()
    ]
    au, av = pdf["a"].to_numpy(), pdf["b"].to_numpy()
    seeds = np.asarray(seed_rows)
    if len(au) == 0:
        nodes, si = np.unique(seeds, return_inverse=True)
        ui = vi = np.empty(0, dtype=np.int64)
    else:
        nodes, inv = np.unique(
            np.concatenate([au, av, seeds.astype(au.dtype)]),
            return_inverse=True,
        )
        ui, vi = inv[: len(au)], inv[len(au): 2 * len(au)]
        si = inv[2 * len(au):]
    n_v = len(nodes)
    # CSR over the symmetrized edge list
    heads = np.concatenate([ui, vi])
    tails = np.concatenate([vi, ui])
    order = np.argsort(heads, kind="stable")
    tails = tails[order]
    starts = np.concatenate(
        ([0], np.cumsum(np.bincount(heads, minlength=n_v)))
    ).astype(np.int64)
    hop = np.full(n_v, -1, dtype=np.int64)
    hop[si] = 0
    frontier = np.unique(si)
    for h in range(1, max_hops + 1):
        if frontier.size == 0:
            break
        # vectorized gather of every frontier node's adjacency range
        cnt = starts[frontier + 1] - starts[frontier]
        total = int(cnt.sum())
        if total == 0:
            break
        pos = (
            np.repeat(starts[frontier], cnt)
            + np.arange(total)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        neigh = np.unique(tails[pos])
        fresh = neigh[hop[neigh] < 0]
        hop[fresh] = h
        frontier = fresh
    reached = hop >= 0
    out_pdf = pd.DataFrame(
        {
            node_col: pd.Series(nodes[reached]),
            "hop": hop[reached].astype("int64"),
        }
    )
    schema = T.StructType(
        [
            T.StructField(node_col, e0c.schema["a"].dataType),
            T.StructField("hop", T.LongType()),
        ]
    )
    return spark.createDataFrame(out_pdf, schema=schema)


def co_occurrence_pairs(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Canonical within-group item pairs (``src < dst``) — the co-order /
    co-occurrence edge builder shared by the graph audits (x164 / x168 /
    x276 build the part co-order graph from lineitem with it).

    One ``groupBy(group)`` exchange + basket-size-bounded per-row pair
    generation (sorted distinct item array → upper-triangle HOF
    explode) instead of a keyed SELF-JOIN: the join shape needs a
    distinct over (group, item), a second exchange of both join sides
    and an SMJ whose output re-materializes every pair, where this
    builds each group's pairs inside the aggregation stage that already
    holds the basket.  Duplicate (group, item) rows collapse via
    ``array_distinct`` (same SIMPLE-graph semantics as the
    distinct-before-join the join variant used).  The explicit
    repartition pins the fan-out parallelism — AQE would coalesce the
    small post-agg frame to 1-2 tasks and serialize the pair explode
    (the x132 prefix-join lesson).  Cross-group duplicate pairs remain
    (callers distinct or degree-normalize downstream, as before).
    Output: ``src, dst`` with ``src < dst``.
    """
    spark = df.sparkSession
    spread = max(spark.sparkContext.defaultParallelism, 16)
    items = F.col("__items")
    pair_gen = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + 2, F.size(items)),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return (
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__i"))
        .repartition(spread, "__g")
        .groupBy("__g")
        .agg(F.sort_array(F.array_distinct(F.collect_list("__i"))).alias("__items"))
        .select(F.explode(pair_gen).alias("__e"))
        .select("__e.src", "__e.dst")
    )


def _degree_keyed_edges(
    edges: DataFrame, src: str, dst: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared edge-normalization front-end for the undirected graph
    audits: canonicalize (drop self-loops, least/greatest, distinct,
    lazily localCheckpointed — multiple consumers), degree agg, and the
    edge frame with both endpoint degrees attached.  Returns
    ``(und, deg, keyed)`` with columns ``(a, b)``, ``(node, deg)``,
    ``(a, b, da, db)``.  One normalization to keep
    :func:`triangle_stats` and :func:`degree_assortativity` from
    silently diverging."""
    a, b = F.col(src), F.col(dst)
    spread = max(edges.sparkSession.sparkContext.defaultParallelism, 16)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        # explicit-count repartition on the distinct key: AQE coalesces
        # the canonicalized frame's shuffle to 1-2 tasks (it is narrow),
        # serializing the distinct agg AND every downstream consumer of
        # the pinned blocks
        .repartition(spread, "a", "b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    keyed = und.join(da, "a").join(db, "b")
    return und, deg, keyed


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    UNDIRECTED simple graph given as an edge list (self-loops and
    duplicate/reversed edges are normalized away here).

    Algorithm: degree-ordered orientation ("node-iterator++" /
    Schank-Wagner).  Every undirected edge is directed from its
    lower-(degree, id) endpoint to the higher one; each triangle
    {u, v, w} then materializes as EXACTLY ONE wedge (u->v, u->w) with
    v < w in the total order whose closing edge (v->w) exists in the
    oriented set.  The orientation bounds every node's out-degree by
    O(sqrt(|E|)) on any graph (arboricity bound), so the wedge join is
    Σ outdeg² — survives hub nodes that would make the naive
    wedge-on-raw-degree join quadratic.  This is the standard
    distributed triangle strategy (same shape as Cohen's MapReduce
    triangle counting); no driver-side state at all.

    Plan shape: one distinct (canonicalize), one degree agg + two keyed
    joins to attach endpoint degrees, one self-join on the wedge apex,
    one semi-ish join probing the closing edge, an explode-to-3 and a
    keyed count.  All hash exchanges on node ids; AQE handles residual
    skew.  The normalized edge frame and the oriented frame are
    localCheckpointed: ``und`` feeds two consumers and ``oriented``
    three (both wedge sides + the closing probe) — without the pin the
    whole canonicalize+degree+orientation chain re-executes per
    consumer (measured 2x wall on the sf0.1 co-order graph).

    Returns ``(node, degree, triangles, clustering)`` for every node of
    the graph, ``clustering = 2T / (deg * (deg - 1))`` (0.0 when
    deg < 2).
    """
    und, deg, keyed = _degree_keyed_edges(edges, src, dst)
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lower_first, F.col("da")).otherwise(F.col("db")).alias("dlo"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dhi"),
    ).localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"),
        F.col("dhi").alias("dv"),
    )
    e2 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"),
        F.col("dhi").alias("dw"),
    )
    # wedge (u->v, u->w) with v strictly before w in the (deg, id) order
    wedges = e1.join(e2, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    # The closing probe is |E| rows of two ids against the Σ outdeg²
    # wedge frame — the LARGEST frame this operator builds.  Broadcasting
    # the edge set keeps the wedges from ever crossing an exchange
    # (measured: the (v,w)-keyed semi join shuffled 41M wedge rows at
    # sf0.1, ~4 s of the operator's cost).  Bounded: past the budget the
    # keyed semi join below is what runs (a 100 TB edge set cannot be
    # broadcast; its wedge shuffle is the documented intrinsic cost).
    #
    # When node ids are integral, non-negative and < 2^31, the (v, w)
    # pair packs INJECTIVELY into one bigint (v*2^32 + w, no overflow:
    # v*2^32 <= 2^63 - 2^32) — Spark then builds a LongHashedRelation
    # (dense long-keyed map) instead of a composite-key
    # UnsafeHashedRelation for the broadcast probe, measured 2-3x
    # faster over the 41M-row wedge frame (the probe is the operator's
    # hottest loop).  The id bounds ride the SAME action that sizes the
    # broadcast (one agg replaces the former count()).
    BROADCAST_E = 10_000_000
    ostats = oriented.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.least("lo", "hi")).alias("mn"),
        F.max(F.greatest("lo", "hi")).alias("mx"),
    ).first()
    from pyspark.sql import types as _T

    packable = (
        isinstance(
            oriented.schema["lo"].dataType,
            (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType),
        )
        and ostats["n"] > 0
        and ostats["mn"] is not None
        and int(ostats["mn"]) >= 0
        and int(ostats["mx"]) < (1 << 31)
    )
    if ostats["n"] <= BROADCAST_E and packable:
        shift = F.lit(1 << 32).cast("bigint")
        packed_edges = F.broadcast(
            oriented.select(
                (
                    F.col("lo").cast("bigint") * shift
                    + F.col("hi").cast("bigint")
                ).alias("__vw")
            )
        )
        tri = (
            wedges.select(
                "u",
                "v",
                "w",
                (
                    F.col("v").cast("bigint") * shift
                    + F.col("w").cast("bigint")
                ).alias("__vw"),
            )
            .join(packed_edges, "__vw", "left_semi")
            .select("u", "v", "w")
        )
    else:
        if ostats["n"] <= BROADCAST_E:
            closing = F.broadcast(closing)
        tri = (
            wedges.select("u", "v", "w")
            .join(closing, ["v", "w"], "left_semi")
        )
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("deg").cast("bigint").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees across all edges of an UNDIRECTED
    simple graph (each edge contributes both orientations, the standard
    convention).  Positive = hubs link to hubs (social-style), negative
    = hubs link to leaves (dependency/star-style) — the one-number
    structure audit run next to :func:`triangle_stats`.

    Scale shape: canonicalize + distinct (localCheckpointed — three
    consumers), one degree agg, two keyed joins to attach endpoint
    degrees, then ONE moment-agg row.  The symmetrized (dx, dy) /
    (dy, dx) frame is never materialized: over the doubled edge set the
    two marginals are identical, so Pearson r reduces to moments of a
    SINGLE pass over the edges — ``r = (sp/c - (s/2c)^2) / (ss/2c -
    (s/2c)^2)`` with ``s = Σ(da+db)``, ``ss = Σ(da²+db²)``,
    ``sp = Σ(da·db)``, ``c = |E|``.  try_divide (not F.corr) so a
    regular graph's zero variance yields NULL like SQL ``corr`` instead
    of ANSI DIVIDE_BY_ZERO.  Output: one row
    ``(n_nodes, n_edges, assortativity)``.
    """
    _und, deg, keyed = _degree_keyed_edges(edges, src, dst)
    xa = F.col("da").cast("double")
    xb = F.col("db").cast("double")
    m = keyed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(xa + xb).alias("s"),
        F.sum(xa * xa + xb * xb).alias("ss"),
        F.sum(xa * xb).alias("sp"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    c = F.col("n_edges").cast("double")
    # try_divide throughout: a zero-edge input (everything self-loops)
    # must report NULL, not abort under ANSI mode
    mean = F.try_divide(F.col("s"), 2.0 * c)
    cov = F.try_divide(F.col("sp"), c) - mean * mean
    var = F.try_divide(F.col("ss"), 2.0 * c) - mean * mean
    return n_nodes.crossJoin(m).select(
        "n_nodes",
        "n_edges",
        F.round(F.try_divide(cov, var), 6).alias("assortativity"),
    )


def _kcore_driver(
    e0c: DataFrame, k: int, max_iterations: int | None
) -> DataFrame:
    """Bounded DRIVER-side peel for edge sets under the caller's budget
    (same pattern as ``similarity.fit_ivf_centroids``: a vectorized
    exact solve on the driver when the problem provably fits a fixed
    memory budget, with the distributed loop as the fallback past it).
    Semantics mirror the distributed delta peel round for round —
    synchronous removal of every sub-``k`` vertex per round, the same
    ``max_iterations`` raise and the same doubling progress warning —
    so the budget only changes WHERE the peel runs, never its result
    or its convergence contract."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = e0c.sparkSession
    pdf = e0c.toPandas()
    au, av = pdf["a"].to_numpy(), pdf["b"].to_numpy()
    nodes, inv = np.unique(np.concatenate([au, av]), return_inverse=True)
    ui, vi = inv[: len(au)], inv[len(au):]
    alive_node = np.ones(len(nodes), dtype=bool)
    alive_edge = np.ones(len(ui), dtype=bool)
    n_v = len(nodes)
    deg = np.zeros(n_v, dtype=np.int64)
    rounds, warn_at, converged = 0, 40, False
    while max_iterations is None or rounds < max_iterations:
        rounds += 1
        if max_iterations is None and rounds > warn_at:
            import logging

            logging.getLogger(__name__).warning(
                "kcore(k=%d, max_iterations=None) past %d peeling "
                "rounds — deep peel chain (a path-like graph?); still "
                "converging", k, warn_at,
            )
            warn_at *= 2
        deg = np.bincount(
            ui[alive_edge], minlength=n_v
        ) + np.bincount(vi[alive_edge], minlength=n_v)
        newly = alive_node & (deg < k)
        if not newly.any():
            converged = True
            break
        alive_node &= ~newly
        alive_edge &= alive_node[ui] & alive_node[vi]
    if not converged:
        raise RuntimeError(
            f"kcore(k={k}) did not converge within {max_iterations} "
            "peeling rounds; raise max_iterations (or pass "
            "max_iterations=None to peel to fixpoint with logged "
            "progress)"
        )
    out_pdf = pd.DataFrame(
        {
            "node": pd.Series(nodes[alive_node]),
            "core_degree": deg[alive_node].astype("int64"),
        }
    )
    schema = T.StructType(
        [
            T.StructField("node", e0c.schema["a"].dataType),
            T.StructField("core_degree", T.LongType()),
        ]
    )
    return spark.createDataFrame(out_pdf, schema=schema)


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int | None = 40,
    driver_edge_budget: int = 5_000_000,
) -> DataFrame:
    """k-core of an undirected graph: the maximal subgraph in which
    every vertex keeps degree >= ``k`` — the graph-density screen a
    curation pipeline runs on co-occurrence / citation / link graphs
    (a vertex's coreness upper-bounds its clique and community
    participation; cf. the triangle (x164) and assortativity (x168)
    views, which measure local structure the core global one).

    Standard synchronous peeling: each round removes EVERY vertex whose
    current degree is below ``k``, together with its edges, until a
    fixpoint.  Round count is data-dependent (near-regular graphs
    collapse in a handful of rounds; a path at k=2 peels from the ends
    in O(n) rounds), so like :func:`~flashml_spark.operators.dedup.
    connected_components` the loop localCheckpoints each round (plans
    stay flat), frees the previous round's blocks, early-exits on
    fixpoint, and RAISES if ``max_iterations`` is hit — exiting the cap
    silently would return a superset of the true core.
    ``max_iterations=None`` (r10 VERDICT item 8) opts into unbounded
    peeling for legitimately deep graphs (a degenerate chain at k=2
    needs ~n/2 rounds): the loop runs to fixpoint, logging a warning
    each time the round count doubles past 40 so a pathological run is
    visible rather than silent — the default stays the loud raise.

    Bounded driver solve (r11): when the (self-loop-free) edge list
    holds at most ``driver_edge_budget`` rows (default 5M ≈ 80 MB of
    bigint pairs), the peel runs as a vectorized exact solve on the
    driver — the ``fit_ivf_centroids`` bounded-budget pattern — because
    ~10 synchronous barrier rounds of per-job scheduler overhead
    dominate the distributed loop at that size.  Identical rounds,
    raise and warning semantics; past the budget the distributed delta
    peel below runs unchanged.

    DELTA peeling (r11): degrees are aggregated from the edge set ONCE;
    each round then only SUBTRACTS the decrements caused by that round's
    newly-removed vertices — one filter scan of the static symmetrized
    edge frame (no shuffle of it) plus a small keyed join against the
    |V|-row degree frame, instead of re-aggregating and rewriting the
    full edge set every round.  Work per round is O(E) scan +
    O(Σ deg(removed)) shuffle; the edge frame is compacted to the
    surviving vertices every 8 rounds so a deep peel (path-like graph)
    does not scan dead edges forever.  Self-loops are dropped up front
    (a self-loop would count 2 toward its own degree and never peel).
    The input is taken as a SIMPLE graph: parallel edge rows each count
    toward degree, so callers wanting multiplicity-free semantics pass
    a distinct edge list (x276 does).

    Output: ``node, core_degree`` — the surviving vertices with their
    degree INSIDE the core (>= k by construction; empty when the core
    is empty).
    """
    if k < 1:
        raise ValueError(f"kcore requires k >= 1, got {k}")
    sc = edges.sparkSession.sparkContext

    def _persistent_ids() -> set[int]:
        m = sc._jsc.getPersistentRDDs()
        return {int(i) for i in m.keySet().toArray()}

    def _free(ids: set[int]) -> None:
        m = sc._jsc.getPersistentRDDs()
        for rid in ids:
            r = m.get(rid)
            if r is not None:
                r.unpersist(False)

    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    )
    ids0 = _persistent_ids()
    e0c = e0.localCheckpoint()
    e0_ids = _persistent_ids() - ids0
    n_edges = e0c.count()
    if n_edges <= driver_edge_budget:
        # ≤ budget rows of two bigints ≈ 80 MB at the 5M default — a
        # driver-affordable exact solve; ~10 synchronous barrier rounds
        # of tiny per-job scheduler cost dominate the distributed loop
        # at this size.  Past the budget the delta peel below runs.
        try:
            return _kcore_driver(e0c, k, max_iterations)
        finally:
            _free(e0_ids)
    # Symmetrize ONCE (one row per direction) and keep the frame STATIC:
    # delta peeling reads it with a semi-join filter each round but only
    # rewrites it at the periodic compaction points below.
    ids0 = _persistent_ids()
    sym = (
        e0c.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .localCheckpoint()
    )
    sym_ids = _persistent_ids() - ids0
    # ONE full degree aggregation, ever; every later round only applies
    # decrements.  |V|-row frame, checkpointed so the convergence check,
    # the removal filter and the join-update reuse the same blocks.
    ids0 = _persistent_ids()
    deg = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    deg_ids = _persistent_ids() - ids0
    _free(e0_ids)

    # |V| longs broadcast comfortably far beyond this; above it the
    # removed-set semi-join falls back to a shuffle (still correct).
    # |V| only shrinks during the peel, so ONE count up front decides
    # the broadcast strategy for every round (no per-round count job).
    BROADCAST_V = 5_000_000
    COMPACT_EVERY = 8
    v_small = deg.count() <= BROADCAST_V

    converged = False
    rounds = 0
    warn_at = 40
    while max_iterations is None or rounds < max_iterations:
        rounds += 1
        if max_iterations is None and rounds > warn_at:
            import logging

            logging.getLogger(__name__).warning(
                "kcore(k=%d, max_iterations=None) past %d peeling "
                "rounds — deep peel chain (a path-like graph?); still "
                "converging", k, warn_at,
            )
            warn_at *= 2
        if deg.filter(F.col("d") < k).limit(1).count() == 0:
            converged = True
            break
        newly = deg.filter(F.col("d") < k).select("node")
        alive = deg.filter(F.col("d") >= k)
        if v_small:
            newly = F.broadcast(newly)
        # decrements: one edge row per (removed u -> neighbor v); a v
        # already dead (or removed this same round) simply finds no row
        # to update in the alive join below.  Synchronous-peel parity
        # with the old full-reaggregation loop: the removal set of each
        # round is decided from the PREVIOUS round's degrees only.
        decs = (
            sym.join(newly.withColumnRenamed("node", "u"), "u", "left_semi")
            .groupBy(F.col("v").alias("node"))
            .agg(F.count(F.lit(1)).alias("__dec"))
        )
        ids0 = _persistent_ids()
        new_deg = (
            alive.join(decs, "node", "left")
            .select(
                "node",
                (F.col("d") - F.coalesce(F.col("__dec"), F.lit(0))).alias("d"),
            )
            .localCheckpoint()
        )
        new_ids = _persistent_ids() - ids0
        _free(deg_ids)
        deg_ids = new_ids
        deg = new_deg
        if rounds % COMPACT_EVERY == 0:
            # deep peel: drop edges of long-dead vertices so the
            # per-round scan tracks the surviving graph, not |E0|
            alive_nodes = deg.select("node")
            if v_small:
                alive_nodes = F.broadcast(alive_nodes)
            ids0 = _persistent_ids()
            sym = (
                sym.join(alive_nodes.withColumnRenamed("node", "u"), "u", "left_semi")
                .join(alive_nodes.withColumnRenamed("node", "v"), "v", "left_semi")
                .localCheckpoint()
            )
            new_sym_ids = _persistent_ids() - ids0
            _free(sym_ids)
            sym_ids = new_sym_ids
    if not converged:
        raise RuntimeError(
            f"kcore(k={k}) did not converge within {max_iterations} "
            "peeling rounds; raise max_iterations (or pass "
            "max_iterations=None to peel to fixpoint with logged "
            "progress)"
        )
    out = deg.select("node", F.col("d").cast("bigint").alias("core_degree"))
    # materialize BEFORE freeing the final round's blocks
    result = out.localCheckpoint()
    _free(deg_ids)
    _free(sym_ids)
    return result
