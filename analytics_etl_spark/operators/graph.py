"""Connected components over candidate-pair edges.

The missing last mile of near-dup dedup: LSH/verify produces PAIRS,
but removal needs CLUSTERS (a chain a~b~c must keep ONE canonical doc,
not drop both ends of each pair independently). Components give each
doc the min doc_id reachable from it — that minimum is the canonical
survivor.

Algorithm: min-label propagation (the DataFrame form of the classic
iterative algorithm; GraphFrames' connectedComponents is the same idea
with large/small-star optimizations). Each round, every node takes the
min of its own label and its neighbors' labels; fixpoint in
O(component diameter) rounds. Near-dup clusters are dense and tiny
(diameter 2-4 in practice), so the loop converges in a handful of
rounds even at corpus scale — the per-round cost is one join + one
groupBy shuffle on the edge list, NEVER corpus² work.

This is one of the engine's two deliberate driver-side loops (the
other is the REST cursor walk): iteration count is data-dependent, so
a driver fixpoint test is the honest control flow. Two costs bound the
loop, and both are halved relative to the naive formulation:

- labels are SEEDED with min(self, neighbors) — one groupBy fused into
  initialization (it replaces the `distinct()` that built the node
  list, so it costs nothing extra) that is exactly the first
  propagation round. Diameter-d components then converge in d-1
  further rounds instead of d.
- the driver-side fixpoint `count()` and the `localCheckpoint` run
  every TWO propagation rounds, not every round: two join+groupBy
  steps compose lazily into one checkpointed plan, so half the
  materializations and half the driver round-trips. Convergence is
  tested on the SECOND step's change flag alone — sound, because "step
  2 changed nothing" means step 1's output was already the fixpoint
  (and then step 2's output equals it).

Without the checkpoint, the lineage doubles every round and Catalyst
re-analysis dominates past ~10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) edge list → (doc_id, cluster_id).

    cluster_id = min doc id in the component (deterministic — the
    fixpoint is unique regardless of partitioning or join order).
    Every doc appearing in any edge gets a row; singletons (docs with
    no edges) are by construction absent — union them in at the call
    site if needed.
    """
    # Materialize the edge list ONCE: every iteration joins against it,
    # and without the checkpoint each join would re-run the whole
    # upstream pipeline that produced the edges (e.g. the full LSH
    # candidate+verify chain — measured ~3s per iteration at sf0.01).
    # The edge frame is pair-sized (bounded by near-dup density), never
    # corpus-sized, so this is cheap to hold.
    # r17: checkpoint the DIRECTED edges, then symmetrize over the
    # checkpointed rows — the old union-before-checkpoint shape ran the
    # whole edge pipeline once per union branch (Spark plans the two
    # branches as independent subtrees) inside the one materialization.
    # Same rows either way; the union over a checkpointed leaf is free.
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # min-neighbor seed: label(u) = min(u, min neighbor). This IS the
    # first propagation round, fused into the same groupBy that would
    # otherwise just build the distinct node list — one round's
    # convergence for free.
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("doc_id"),
            F.least(F.col("u"), F.col("mn")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )

    def _step(lbl: DataFrame) -> DataFrame:
        """One lazy propagation round: (doc_id, label) -> same + chg.

        r17 shape (guide §2.4): ONE join + ONE groupBy per round. The
        node's own label rides into the same aggregate as a tagged
        candidate row (is_self), so new = min(all candidates) and
        old = min(self rows) come out of one hash aggregation —
        replacing the old neigh-groupBy + left-join-back (two shuffles
        + a join per round). Labels are exact ids, so min over the
        identical candidate set is bit-identical to the old
        least(label, coalesce(min-neighbor)) form, including for
        isolated rounds where a node has no incoming edge rows (its
        self row alone survives); chg = (new < old) is unchanged."""
        cand = (
            sym.join(lbl, sym.v == lbl.doc_id)
            .select("u", "label", F.lit(False).alias("is_self"))
            .unionByName(
                lbl.select(
                    F.col("doc_id").alias("u"),
                    "label",
                    F.lit(True).alias("is_self"),
                )
            )
        )
        return (
            cand.groupBy("u")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("is_self"), F.col("label"))).alias("_old"),
            )
            .select(
                F.col("u").alias("doc_id"),
                "label",
                (F.col("label") < F.col("_old")).alias("chg"),
            )
        )

    for _ in range((max_iter + 1) // 2):
        # two rounds composed into ONE checkpointed plan: half the
        # materializations, half the driver fixpoint round-trips. The
        # changed flag of the SECOND step alone decides convergence —
        # if step 2 changed nothing, step 1's output was the fixpoint.
        new_labels = _step(_step(labels).drop("chg")).localCheckpoint(eager=True)
        changed = new_labels.filter("chg").limit(1).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    else:
        # the loop exhausted with the LAST round still changing labels
        # — but that round may itself have reached the fixpoint. Probe
        # once more: only if labels would STILL change is the result
        # genuinely unconverged, and silently returning it would split
        # one component into several "canonical" clusters — fail loudly.
        probe = (
            sym.join(labels, sym.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("nl"))
            .join(labels, F.col("u") == labels.doc_id)
            .filter(F.col("nl") < F.col("label"))
        )
        if probe.limit(1).count() > 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} iterations "
                "(component diameter exceeds max_iter — raise it for long chains)"
            )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic.

    Crawl-derived corpora weight documents by link importance
    (classically: PageRank over the host graph decides crawl priority
    and quality priors). Float PageRank can't be oracle-checked —
    per-node contribution sums re-associate across partitionings, so
    the low bits differ run to run. Here ranks are BIGINTs at a fixed
    point of `scale`: contribution = rank DIV out-degree, damping =
    (85 · Σ) DIV 100 — truncating integer ops both Spark and any SQL
    engine define identically, so the result is bit-exact across
    engines AND partitionings for the same iteration count. The
    truncation error is ≤ deg·1/scale per node per round — at
    scale=10^12, twelve decimal digits below the signal.

    Expects a SYMMETRIZED edge list (every node appears as src, so
    out-degree is never 0 — no dangling-mass redistribution needed).
    Per iteration: one join on src + one groupBy on dst — the same
    shuffle shape as connected_components, never node² work. Lineage
    is cut with localCheckpoint every 2 rounds past iters=3 (same
    policy and rationale as the CC loop above).
    """
    # Materialize the edge list ONCE (same policy and rationale as the
    # CC loop above): every iteration joins it, and lazily it would
    # re-run the whole upstream edge build — here a fact-fact join +
    # distinct — once per iteration per side.
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    nodes = edges.select(F.col(src).alias("node")).distinct()
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    base = (15 * scale) // 100
    for i in range(iters):
        # join order matters at scale: rank÷degree is computed on the
        # NODE-sized frame first, so the edge list is touched by exactly
        # one (edge-sized) join per iteration instead of two
        per_src = (
            ranks.join(deg, ranks["node"] == deg[src])
            .select(
                F.col("node").alias("_s"), F.expr("rank div deg").alias("c")
            )
        )
        contrib = edges.join(per_src, edges[src] == per_src["_s"]).select(
            F.col(dst).alias("node"), "c"
        )
        inbound = contrib.groupBy("node").agg(F.sum("c").alias("in_sum"))
        ranks = nodes.join(inbound, "node", "left").select(
            "node",
            F.expr(f"{base}L + (85 * coalesce(in_sum, 0L)) div 100").alias("rank"),
        )
        if iters > 3 and (i + 1) % 2 == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def bfs_levels(
    edges: DataFrame,
    seed: int,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Breadth-first shortest-path levels from `seed`, bounded by
    `max_hops` — (node, dist) for every node reachable within the
    bound. Exact integers, so the iterative loop is oracle-checkable
    against a recursive CTE.

    Per hop: one edge-sized join against the frontier + one anti-join
    against the visited set (node-sized). The frontier/visited frames
    are checkpointed every hop — same lineage policy as the CC and
    PageRank loops; hop count is a CONSTANT (not data-dependent), so
    unlike CC there is no driver-side fixpoint probe at all: the whole
    bounded BFS is one lazy plan per hop chain.
    """
    # one eager edge materialization (same policy as CC/PageRank): the
    # loop touches edges once per hop, and lazily every hop would
    # re-run the upstream edge build
    edges = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).localCheckpoint(
        eager=True
    )
    visited = (
        edges.sparkSession.range(1)
        .select(F.lit(seed).cast("long").alias("node"), F.lit(0).alias("dist"))
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier, edges["_s"] == frontier["node"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(
            nxt.select("node", F.lit(hop).alias("dist"))
        ).localCheckpoint(eager=False)
        frontier = nxt
    return visited


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via degree-ordered edge orientation (the
    "compact-forward" scheme every serious triangle counter uses —
    e.g. Spark GraphX's TriangleCount and the classic Latapy 2008
    formulation): orient each undirected edge from its lower-order
    endpoint to its higher-order endpoint under the total order
    (degree, node_id), then count wedges u→v, u→w (order(v)<order(w))
    closed by an oriented edge v→w. Every triangle is counted EXACTLY
    once, from its minimum-order vertex.

    Why this survives 100 TB: the orientation bounds every node's
    out-degree by O(sqrt(E)), so the wedge self-join generates
    O(E^1.5) rows worst-case instead of the O(Σ deg²) of a naive
    neighbor join — the difference between a power-law graph being
    computable and not (one celebrity node with 10M followers is 10^14
    naive wedges, but its EDGES all orient INTO it, so it generates
    zero). Three shuffles total: degree agg, wedge join, closing join.

    The order key packs (degree, node) into one long (degree·2^32 +
    node) so orientation needs no struct comparisons — which requires
    node ids in [0, 2^32): an id outside that range would silently
    collide order keys and corrupt the count, so the edge
    canonicalization raises loudly on the first offending row (a
    per-row guard expression, no extra pass). Exact integer count,
    oracle-checkable against a three-way SQL self-join.
    """
    # canonical edge list materialized ONCE (same policy as
    # pagerank_int/bfs_levels): the degree agg, the orientation join,
    # and the adjacency build all consume it — without the checkpoint
    # each subtree re-runs the upstream edge construction (measured
    # 3.2 s of the 10 s at sf0.1 re-paid per consumer)
    in_range = (F.col("a") >= 0) & (F.col("b") < F.lit(2**32))
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        # a <= b by construction, so checking a >= 0 and b < 2^32
        # bounds both endpoints; violations corrupt the packed order
        # key, so fail loud instead
        .withColumn(
            "a",
            F.when(in_range, F.col("a")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("triangle_count: node id out of [0, 2^32): ("),
                        F.col("a").cast("string"),
                        F.lit(", "),
                        F.col("b").cast("string"),
                        F.lit(") — remap ids to a dense range first"),
                    )
                ).cast("long")
            ),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    # ADVICE r6: the packed key deg·2^32 + n needs deg < 2^31 to stay
    # inside int64 (ids already < 2^32); a node of degree ≥ 2^31 would
    # silently wrap and corrupt the orientation order, so the same
    # fail-loud pattern guards degree too. (Unreachable below ~2^32
    # edges — but this function's framing is web-scale graphs.)
    deg_ok = F.col("deg") < F.lit(2**31)
    keyed = deg.select(
        "n",
        (
            F.when(deg_ok, F.col("deg")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("triangle_count: node degree >= 2^31 overflows the "
                              "packed order key (node "),
                        F.col("n").cast("string"),
                        F.lit(", degree "),
                        F.col("deg").cast("string"),
                        F.lit(")"),
                    )
                ).cast("long")
            )
            * F.lit(2**32)
            + F.col("n")
        ).alias("k"),
    )
    oriented = (
        e.join(keyed.select(F.col("n").alias("a"), F.col("k").alias("ka")), "a")
        .join(keyed.select(F.col("n").alias("b"), F.col("k").alias("kb")), "b")
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kv"),
        )
        # consumed twice (adjacency build + the per-edge probe): one
        # edge-sized materialization instead of re-running both joins
        .localCheckpoint(eager=True)
    )
    # edge-iterator form: a triangle u<v<w (in orientation order) is
    # found at edge (u,v) as w ∈ out(u) ∩ out(v). Materializing the
    # wedge set explicitly would shuffle O(Σ outdeg²) rows (measured
    # 10 s vs 6.6 s at sf0.1 on the full 1.2M-edge co-purchase graph,
    # where the wedge set is 40M rows); intersecting adjacency ARRAYS
    # instead keeps every shuffle edge-sized — each edge row carries
    # two neighbor arrays (≤ sqrt(2E) longs each, by the orientation
    # bound) and array_intersect runs JVM-local with no wedge blowup.
    adj = oriented.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    per_edge = (
        oriented.select("u", "v")
        .join(adj.select("u", F.col("nbrs").alias("nu")), "u")
        # inner join: an edge whose head has no out-neighbors closes
        # zero triangles, so dropping it leaves the sum unchanged
        .join(adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")), "v")
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
    )
    # coalesce: SUM over zero edges is NULL, but "no triangles" is 0
    return per_edge.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_triangles")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Deterministic synchronous label propagation → (node, community).

    Community detection for graphs where components are too coarse
    (one giant connected component, many internal communities — the
    shape of co-purchase, citation, and near-dup-plus-topic graphs).
    Raghavan et al. 2007's LPA, made engine-exact by pinning every
    degree of freedom the published algorithm leaves open:

    - SYNCHRONOUS updates for a FIXED number of rounds (asynchronous
      visit order is irreducibly nondeterministic on a cluster; a
      fixed-round synchronous sweep is a pure function of the graph);
    - each node votes its OWN current label once alongside its
      neighbors' labels (the standard oscillation damper for
      synchronous LPA — a 2-node component otherwise swaps labels
      forever);
    - ties broken toward the SMALLEST label (total order, no RNG).

    Labels are seeded with the node id, so a community's final label
    is the id of one of its members. The result after k rounds is a
    pure function of the edge set — partition- and join-order-
    independent, hash-checkable against an unrolled SQL oracle.

    Input is an UNDIRECTED simple edge list (one row per edge, either
    orientation); it is symmetrized AND deduplicated here — a
    duplicated input row would otherwise double-weight that
    neighbor's vote, silently breaking oracle parity for any caller
    that forgets its own distinct(). The frame is pair-sized and
    checkpointed once, so the extra keyed shuffle is paid once, not
    per round. Self-loops are dropped (a self-loop is already the
    self-vote).

    Scale shape: per round, one edge-sized equi-join (edges ⋈ labels
    on the src key) + one groupBy on (node, label) with map-side
    partial counts + one dense-rank window partitioned by node — all
    keyed shuffles bounded by |E|, never |V|². The edge list is
    checkpointed once and reused; labels are checkpointed every two
    rounds (same lineage-growth control as connected_components).
    rounds is small and fixed (LPA converges in a handful of sweeps;
    the published heuristic is ~5), so the loop is O(rounds) stages,
    not data-dependent.
    """
    from pyspark.sql import Window

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    sym = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(
            edges.filter(F.col(src) != F.col(dst)).select(
                F.col(dst).alias("u"), F.col(src).alias("v")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )

    def _round(lbl: DataFrame) -> DataFrame:
        votes = sym.join(lbl, sym.v == lbl.node).select(
            F.col("u").alias("node"), "lbl"
        )
        # the self-vote: every node's current label counts once
        votes = votes.unionAll(lbl.select("node", "lbl"))
        counts = votes.groupBy("node", "lbl").agg(F.count("*").alias("c"))
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl").asc())
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )

    for i in range(rounds):
        labels = _round(labels)
        # lineage cut every TWO rounds (the CC cadence); an odd final
        # round returns lazy — at most one round of lineage on top of
        # the last checkpoint, and the caller's action pays for it
        # exactly once. Side benefit: rounds=1 keeps the full round
        # plan inspectable (the scale rehearsal asserts its shape).
        if i % 2 == 1:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("lbl").alias("community"))
