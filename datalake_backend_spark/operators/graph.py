"""Iterative graph algorithms as deterministic DataFrame loops.

The reference has no graph engine; this module exists because a
training-data lakehouse keeps meeting graph-shaped questions — which
suppliers anchor the purchase network, which documents sit at the
center of a near-dup cluster, which users bridge sessions. Connected
components already live in ``datapipe.dedup`` (large-star/small-star);
this module adds PageRank, the canonical fixed-point iteration.

Cross-engine exactness: float PageRank sums contributions in
shuffle-partition order, so two engines (or two runs) disagree in the
last ulps and a value-hash oracle can never pin it. The ranks here are
INTEGER-scaled (``scale`` = 1e12 by default): the update is

    r'(v) = (teleport·scale) div (100·N)
            + Σ_{u→v} (damping·r(u)) div (100·deg(u))

with BIGINT ``div`` throughout — integer sums are order-independent,
so the k-th iterate is a bit-exact, engine-independent function of the
edge list. The flooring loses < 1 unit of mass per edge per round
(≤ 5e-12 of total at default scale) — noise for ranking, determinism
for the oracle.

Scale shape: per iteration ONE equi-join (ranks ⋈ edges on src) and
ONE groupBy(dst) aggregate; the node table and the 1-row node-count
aggregate are reused across iterations (scalar-totals idiom, no
``collect()``). Iterations are a fixed small constant — the loop is
driver-side control flow over lazy plans, the data never visits the
driver. Dangling nodes (no out-edges) keep the teleport share and
simply donate nothing, the standard "removed dangling mass"
simplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 10**12,
    teleport_pct: int = 15,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    ``edges`` must have string/integral columns ``src`` and ``dst``
    (pre-symmetrize for an undirected graph). Returns one row per node
    with ``rank_scaled`` — the integer rank after exactly
    ``iterations`` synchronous updates from the uniform start
    ``scale div N``.

    ``checkpoint_every=k`` cuts the lazy lineage chain with a
    ``localCheckpoint`` every k iterations: the default (None) keeps
    the whole loop one lazy DAG — correct and eager-free for the small
    fixed iteration counts the registry uses — but a long run would
    otherwise grow an O(iterations)-deep plan that bloats analysis and
    re-execution cost, the same hazard the connected-components loop in
    ``datapipe.dedup`` checkpoints against. Checkpointing changes WORK
    SCHEDULING only, never the integer ranks.
    """
    if not 0 < teleport_pct < 100:
        raise ValueError("teleport_pct must be in (0, 100)")
    damping = 100 - teleport_pct
    # persist the edge table: callers derive it (join + distinct +
    # symmetrize) and the per-iteration contribution join would
    # otherwise re-execute that derivation once per iteration
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg.withColumnRenamed("src", "node"), "node", "left")
        .withColumn("deg", F.coalesce("deg", F.lit(0)).cast("bigint"))
        .persist()
    )
    ncnt = nodes.agg(F.count("*").alias("_n"))
    ranks = (
        nodes.crossJoin(F.broadcast(ncnt))
        .withColumn("r", F.expr(f"{scale}L div _n"))
        .select("node", "deg", "r")
    )
    for it in range(1, iterations + 1):
        contrib = ranks.join(edges, ranks.node == edges.src).select(
            F.col("dst").alias("node"),
            F.expr(f"({damping}L * r) div (100L * deg)").alias("c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(ncnt))
            .withColumn(
                "r",
                F.expr(
                    f"({teleport_pct}L * {scale}L) div (100L * _n)"
                    " + coalesce(inflow, 0L)"
                ),
            )
            .select("node", "deg", "r")
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iterations:
            # lazy checkpoint: the caller's first action materializes it
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def bfs_hops(
    edges: DataFrame, sources: DataFrame, max_hops: int = 4
) -> DataFrame:
    """Bounded-depth BFS: the minimum hop count (0..max_hops) from any
    source node to every reachable node. All-integer, so bit-exact in
    any engine; the DuckDB twin (r147) computes per-level distinct
    frontier sets and takes MIN(hop) — the anti-join pruning here
    changes WORK, never the result.

    ``sources`` must have a ``node`` column. Scale shape: per level
    ONE equi-join frontier⋈edges and ONE distinct, with the visited
    set pruned via left_anti so a dense graph's frontier never
    re-expands already-settled nodes (at web scale this pruning is the
    difference between |V| and Σ|paths|). Each level's frontier is
    persisted — the union chain would otherwise re-execute every prior
    join once per remaining level — and so is the EDGE table: callers
    typically derive it (join + distinct + symmetrize), and without the
    cache that derivation re-executes once per level.
    """
    edges = edges.persist()
    frontier = sources.select("node").distinct().withColumn(
        "hop", F.lit(0).cast("bigint")
    ).persist()
    visited = frontier
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(k).cast("bigint"))
            .persist()
        )
        visited = visited.union(nxt)
        frontier = nxt
    return visited


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph (``src``/
    ``dst`` in either orientation; self-loops and duplicates dropped).
    Returns ``(node, n_triangles)`` for every node in ≥1 triangle —
    the local clustering primitive (community density, spam-graph
    detection).

    Scale shape: the classic degree-ordered orientation — canonicalize
    each edge, then point it from the (degree, node)-SMALLER endpoint
    to the larger, which turns the graph into a DAG where every
    triangle appears exactly once as a wedge u→v, v→w closed by u→w.
    The wedge join fans out by ORIENTED out-degree, bounded by
    O(sqrt(E)) per node (arboricity bound) instead of the raw max
    degree — the difference between a feasible join and a hub-squared
    explosion on power-law graphs. Three hash joins, all-integer."""
    canon = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("n"))
        .union(canon.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # orient by (degree, node): strict total order, no 2-cycles
    ranked = (
        canon.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    # persisted: the oriented edge list is consumed THREE times (both
    # wedge sides + the closing-edge probe) — uncached, the whole
    # canon->deg->join lineage would re-execute per consumer
    arrows = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).persist()
    wedges = arrows.alias("e1").join(
        arrows.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
    )
    tris = wedges.join(
        arrows.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"],
    )
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    iterations: int = 3,
    scale: int = 10**12,
    teleport_pct: int = 15,
) -> DataFrame:
    """Personalized PageRank: identical integer update to
    :func:`pagerank`, but ALL teleport mass returns to the ``sources``
    set (uniform over it) instead of the whole graph — the random walk
    with restart that scores every node by proximity to a seed set
    (recommendation, related-entity expansion, fraud neighborhoods).

    ``sources`` must have a ``node`` column. Start: ``scale div S`` on
    each of the S sources, 0 elsewhere; per iteration each node gets
    ``teleport·scale div (100·S)`` if it is a source (else 0) plus the
    damped in-neighbor contributions. All-BIGINT div arithmetic —
    bit-exact in any engine; nodes never reached keep rank 0 and are
    still returned (the twin must too)."""
    if not 0 < teleport_pct < 100:
        raise ValueError("teleport_pct must be in (0, 100)")
    damping = 100 - teleport_pct
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    src_set = sources.select("node").distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .union(src_set.select("node"))
        .distinct()
        .join(deg.withColumnRenamed("src", "node"), "node", "left")
        .withColumn("deg", F.coalesce("deg", F.lit(0)).cast("bigint"))
        .join(src_set.withColumn("_is_src", F.lit(1)), "node", "left")
        .withColumn("_is_src", F.coalesce("_is_src", F.lit(0)))
        .persist()
    )
    scnt = nodes.agg(F.sum("_is_src").alias("_s"))
    ranks = (
        nodes.crossJoin(F.broadcast(scnt))
        .withColumn(
            "r", F.expr(f"case when _is_src = 1 then {scale}L div _s else 0L end")
        )
        .select("node", "deg", "_is_src", "r")
    )
    for _ in range(iterations):
        contrib = ranks.join(edges, ranks.node == edges.src).select(
            F.col("dst").alias("node"),
            F.expr(f"({damping}L * r) div (100L * deg)").alias("c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(scnt))
            .withColumn(
                "r",
                F.expr(
                    f"case when _is_src = 1 then"
                    f" ({teleport_pct}L * {scale}L) div (100L * _s)"
                    " else 0L end + coalesce(inflow, 0L)"
                ),
            )
            .select("node", "deg", "_is_src", "r")
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))
