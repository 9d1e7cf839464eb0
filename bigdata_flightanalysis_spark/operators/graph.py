"""Distributed connected components — the clustering step every
dedup pipeline needs AFTER candidate-pair generation (MinHash/SimHash/
embedding near-dup emit PAIRS; deduplication needs CLUSTERS, so that
transitively-linked docs A~B, B~C collapse to one canonical doc even
when A and C never collide directly).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Converges in
O(log n) rounds regardless of component diameter — the property that
matters at 100 TB, where a naive min-label propagation needs
O(diameter) rounds and a long dup-chain (shingled crawl snapshots) can
have diameter in the hundreds.

Scale notes:
- Each round is expressed as groupBy(min) + shuffle join — no
  ``collect_set`` of neighbor lists, so a celebrity node (a boilerplate
  doc near-duplicating millions of pages) never materializes its whole
  neighborhood in one task; the per-node min is a partial aggregate.
- Every round is checkpointed to truncate lineage — iterative Spark
  without it re-executes the whole chain each action and the plan
  grows unboundedly. The checkpoint is LAZY: the round's convergence
  checksum is the next (and only) action over the frame, so it doubles
  as the materializer — one Spark job per round instead of two. The
  posture is selectable (see ``operators/checkpointing.py``): with a
  ``checkpoint_dir`` argument or ``SPARK_GRAFT_CHECKPOINT_DIR`` set,
  rounds land on reliable shared storage (HDFS/object store) so a lost
  executor doesn't kill the job mid-iteration — the right cluster
  posture; local mode defaults to ``localCheckpoint``.
- Convergence is detected by an edge-set checksum (count + xor-ish
  hash sum), one cheap aggregate per round instead of a full
  ``exceptAll`` anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_flightanalysis_spark.operators.checkpointing import (
    checkpoint_scope,
    loop_width,
    static_partitioning_scope,
)

#: Conservative shuffled-bytes-per-edge weight for loop-width sizing:
#: three 8-byte columns (src, dst, deg) plus unsafe-row and shuffle
#: framing overhead.
_EDGE_ROW_BYTES = 64


def _oriented(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient every edge large→small, drop self-loops, dedupe."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(o: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(Γ(u) ∪ {u})."""
    sym = o.union(o.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(o: DataFrame) -> DataFrame:
    """Edges oriented large→small; per node u: link all smaller
    neighbors (and u itself) to m = min(Γ⁻(u))."""
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        o.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = mins.select("u", F.col("m").alias("v"))
    return relink.union(self_link).where(F.col("u") != F.col("v")).distinct()


def _checksum(o: DataFrame) -> tuple[int, int]:
    row = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    *,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return (node, component) for every node appearing in a
    NON-degenerate edge, where component is the MINIMUM node id of its
    connected component (a deterministic canonical label). Undirected:
    (a,b) ≡ (b,a). Self-loops are dropped by orientation, so a node
    whose ONLY edges are self-loops is absent from the output (it has
    no neighbors to group with; blessed by
    test_connected_components_empty_schema_matches_nonempty) —
    callers counting isolated nodes must union them in themselves.

    ``checkpoint_dir`` (or ``SPARK_GRAFT_CHECKPOINT_DIR``) switches
    the per-round lineage truncation to reliable ``checkpoint()`` —
    required on a multi-executor cluster, where a lost
    ``localCheckpoint`` block fails the job mid-iteration.
    """
    with checkpoint_scope(edges.sparkSession, checkpoint_dir) as ck:
        # Every round's frame is consumed by exactly one next action —
        # the convergence checksum — so the checkpoint is LAZY and the
        # checksum job doubles as the materializer: one Spark job per
        # round instead of two (eager-materialize + checksum), and the
        # old isEmpty() action is folded into the first checksum's
        # count (r16 optimization; guide §1.2 — remove passes).
        o = ck(_oriented(edges, src, dst), lazy=True)
        prev = _checksum(o)
        if prev[0] == 0:
            # Type from the ORIENTED frame, not the raw src column:
            # orientation coerces src/dst to a common type, so an
            # edge set that reduces to empty must return the same
            # node/component types as the non-empty path — a schema
            # must not flip with data content.
            node_t = o.schema["u"].dataType.simpleString()
            return edges.sparkSession.createDataFrame(
                [], f"node {node_t}, component {node_t}"
            )
        converged = False
        for _ in range(max_iter):
            o = ck(_small_star(_large_star(o)), lazy=True)
            cur = _checksum(o)
            if cur == prev:
                converged = True
                break
            prev = cur
    if not converged:
        # The star-forest extraction below is only valid on a
        # converged edge set; silently returning would hand members
        # non-root component labels with no signal.
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations (checksum still changing); raise max_iter — "
            "alternating large-star/small-star needs O(log^2 n) rounds "
            "in the worst case"
        )
    # Converged edge set is a star forest: every edge is (member, root).
    # The star-forest fixed point guarantees each member node appears
    # in EXACTLY ONE edge (two roots for one node would change under
    # another small-star round — contradicting the checksum
    # convergence the loop just proved) and that no member is also a
    # root (members are strictly greater than their component min;
    # a min never appears on the large side). So `members` is already
    # duplicate-free and disjoint from `roots`, and only the root
    # projection needs a distinct — the previous union-wide
    # .distinct() re-shuffled the ENTIRE label set once more per CC
    # run for nothing (r17, §2.3: shuffle fewer bytes; benefits every
    # CC consumer — clusters, keep_best, manifest, canonical_pagerank,
    # split_leakage).
    members = o.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = o.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.union(roots)


def assign_components(
    df: DataFrame, key: str | Column, cc: DataFrame, alias: str = "component"
) -> DataFrame:
    """Left-join component labels onto ``df``; nodes absent from the
    edge graph become singleton components labeled by their own key.

    Output = ``df``'s columns plus exactly one new/assigned column
    ``alias`` — the joined label column never leaks through under its
    raw ``component`` name (a non-default alias used to carry both),
    and a ``df`` that already has a ``component`` column no longer
    makes the coalesce ambiguous. Both joined-in columns live under
    reserved ``__cc_*`` names, so a ``df`` that carries its own
    ``node`` column (or joins on one) keeps it — drop-by-name on the
    bare ``node`` used to remove the caller's copy too."""
    key_col = F.col(key) if isinstance(key, str) else key
    reserved = {"__cc_node", "__cc_label"} & set(df.columns)
    if reserved:
        # drop-by-name below would delete the caller's same-named
        # column (drop('__cc_node') removes ALL columns of that name)
        # and the __cc_label coalesce would be ambiguous — fail loud
        # like the per_group_top_n/deduplicate_exact siblings
        # (r16 review)
        raise ValueError(
            f"assign_components reserves columns {sorted(reserved)} — "
            "rename them first"
        )
    labels = cc.select(
        F.col("node").alias("__cc_node"),
        F.col("component").alias("__cc_label"),
    )
    return (
        df.join(labels, key_col == labels["__cc_node"], "left")
        .drop("__cc_node")
        .withColumn(alias, F.coalesce(F.col("__cc_label"), key_col))
        .drop("__cc_label")
    )


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return ``(node, core_degree)`` for every node of the ``k``-core
    of the undirected graph: the maximal subgraph in which every node
    has degree >= k (Seidman 1983; the standard peel: repeatedly drop
    nodes with degree < k until fixed point). ``core_degree`` is the
    node's degree WITHIN the k-core.

    Dedup-QA use: the 2-core of the near-dup graph strips pendant
    (single-collision, likely false-positive) docs, leaving the densely
    connected clusters worth canonical-selection effort.

    Scale posture mirrors ``connected_components``: each peel round is
    one per-node degree aggregate (partial, map-side combined) plus a
    semi-join filter of the edge list — no adjacency lists; rounds are
    eagerly checkpointed so the plan can't grow with iteration count,
    and ``checkpoint_dir`` / ``SPARK_GRAFT_CHECKPOINT_DIR`` selects
    reliable ``checkpoint()`` for multi-executor fault tolerance.
    Worst-case round count is O(n) (a path peels from the ends in),
    so convergence is load-bearing: the function raises rather than
    return a not-yet-peeled subgraph.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u, v = F.col(src), F.col(dst)
    sym_in = (
        edges.select(u.alias("u"), v.alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    with checkpoint_scope(edges.sparkSession, checkpoint_dir) as ck:
        # Symmetrize once; each round only shrinks the edge set. Every
        # checkpointed frame here is immediately counted (the peel's
        # fixed-point test), so the checkpoints are LAZY and the count
        # job doubles as the materializer — one job per peel round
        # instead of two (r16 optimization, same fusion as
        # connected_components).
        sym = ck(
            sym_in.union(
                sym_in.select(F.col("v").alias("u"), F.col("u").alias("v"))
            ).distinct(),
            lazy=True,
        )
        n_edges = sym.count()
        # Size-derived loop width from the symmetric edge count the
        # fixed-point test just paid for — no extra sizing pass over
        # the source (unlike pagerank, whose width must exist before
        # its first checkpoint). Round 1 enters with the unpartitioned
        # initial checkpoint and pays its exchanges once; every later
        # round reads a frame captured as hashpartitioning(u, P) +
        # u-ascending (see static_partitioning_scope), so the degree
        # aggregate and the u-semi-join run exchange-free AND sort-free
        # on the big side — per round, two big-side exchanges instead
        # of three, and the final core-degree aggregate is exchange-free
        # too (r17, §2.4; measured 18 -> 7 jobs, 0.78 -> 0.66 s at
        # sf0.1, rows identical).
        n_part = loop_width(edges.sparkSession, n_edges * _EDGE_ROW_BYTES)
        for _ in range(max_iter):
            if n_edges == 0:
                break
            keep = (
                sym.groupBy("u")
                .agg(F.count(F.lit(1)).alias("d"))
                .where(F.col("d") >= k)
                .select("u")
            )
            # v-semi FIRST, u-semi LAST — both filter by the same
            # round-entry `keep`, so the order is semantics-free, but
            # ending on u leaves the round output u-partitioned for
            # capture (the orientation every next-round consumer keys
            # on). The MERGE hint pins the u-semi to sort-merge: a
            # stats-based broadcast of `keep` would make the round
            # output inherit the v-semi's hash(v) partitioning and
            # break the capture (and `keep` is a per-node frame — at
            # scale it never fits a broadcast anyway); SMJ also leaves
            # the output u-SORTED, so the next round is sort-free too.
            with static_partitioning_scope(edges.sparkSession, n_part):
                nxt = ck(
                    sym.join(
                        keep.select(F.col("u").alias("v")), "v", "left_semi"
                    ).join(keep.hint("merge"), "u", "left_semi"),
                    lazy=True,
                )
            n_next = nxt.count()
            # peeling only removes edges, so an unchanged count means an
            # unchanged set; and empty is a PROVEN fixed point (nothing
            # left to peel) — without the latter, a graph that empties
            # on the final allowed iteration would falsely raise
            # "not converged"
            done = n_next == n_edges or n_next == 0
            sym, n_edges = nxt, n_next
            if done:
                break
        else:
            raise RuntimeError(
                f"k_core(k={k}) did not converge within {max_iter} peel "
                "rounds; raise max_iter (a long path/chain component "
                "peels only two nodes per round)"
            )
    return (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Deterministic distributed PageRank (fixed iteration count).

    Iterative-algorithm surface beyond connected components: each
    round is contribution-scatter (edge join) + gather (groupBy sum).
    Scale posture mirrors ``connected_components``:

    - contributions are a partial aggregate — a hub's out-edges are
      summed map-side, never collected into one task;
    - lineage is truncated every ``checkpoint_interval`` rounds (plus
      always after the last), LAZILY: the rank chain is linear (each
      round feeds exactly the next), so the caller's single action
      executes every round once and eager per-interval materialization
      bought nothing but job-launch overhead — unlike
      connected_components, whose per-round checksum action is what
      materializes each round there.
      ``checkpoint_dir`` (or ``SPARK_GRAFT_CHECKPOINT_DIR``) selects
      reliable ``checkpoint()`` for cluster fault tolerance, local
      mode defaults to ``localCheckpoint``;
    - the degree frame is computed once and re-joined per round on the
      same key, so AQE reuses the exchange where possible;
    - rank sums accumulate in DECIMAL(38,18) and cast back to double
      once per round, making ranks independent of partition/merge
      order — bit-reproducible across runs, which plain double sums
      are not.

    Dangling nodes (no out-edges) leak their mass — the standard
    simplification; ranks still order nodes correctly for dedup-canon
    selection (pick the highest-rank doc of a cluster as canonical).
    """
    if checkpoint_interval < 1:
        # 0 would ZeroDivisionError mid-iteration (after jobs already
        # ran); negatives silently disable interval truncation and let
        # the plan grow unbounded for large iteration counts
        raise ValueError(
            f"checkpoint_interval must be >= 1, got {checkpoint_interval}"
        )
    e_raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    )
    e = e_raw.distinct()
    spark = edges.sparkSession
    # One SIZE-DERIVED partition width for every loop-state frame: the
    # rank and edge frames are re-joined on the SAME key every round,
    # so capturing hashpartitioning(key, P) into each checkpoint (see
    # static_partitioning_scope) lets every round's join run
    # exchange-free on both sides — each round then pays exactly ONE
    # exchange, the contribution scatter, the only place rows change
    # keys. P follows the edge volume (pre-dedup count × a conservative
    # per-row byte weight), floored at 1 so tiny inputs get single-task
    # rounds and capped at the session's shuffle width so a 100 TB
    # edge list uses the cluster's full parallelism — derived from
    # input size, not a constant tuned for either posture (§2.2).
    # Sizing count on the PRE-dedup frame: narrow scan + partial agg,
    # no shuffle — an upper bound on the true edge count, which is
    # exactly the safe direction for a width estimate.
    m_edges = e_raw.count()
    n_part = loop_width(spark, m_edges * _EDGE_ROW_BYTES)
    with checkpoint_scope(spark, checkpoint_dir) as ck:
        # LAZY checkpoint: the count() right below is the one next
        # action and doubles as the materializer — the later per-round
        # joins then read the materialized blocks (r16 optimization,
        # same job fusion as connected_components). Compiled under
        # static_partitioning_scope so the checkpoint captures the
        # distinct's hashpartitioning(node, P) — the partitioning every
        # round's gather join and rank update needs (r17 optimization:
        # one exchange per round instead of three).
        # sortWithinPartitions: the checkpoint captures output ORDERING
        # as well as partitioning, so every round's sort-merge join is
        # sort-free on this side — without it each round re-sorts the
        # frame (at 100 TB, a per-round sort of the edge list is the
        # dominant avoidable cost once the exchanges are gone).
        with static_partitioning_scope(spark, n_part):
            nodes = ck(
                e.select(F.col("src").alias("node"))
                .union(e.select(F.col("dst").alias("node")))
                .distinct()
                .sortWithinPartitions("node"),
                lazy=True,
            )
        n = nodes.count()
        if n == 0:
            # empty graph → empty ranks, not a ZeroDivisionError: an
            # upstream filter legitimately produces zero dup edges
            return nodes.select(
                "node", F.lit(0.0).alias("rank")
            )
        out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        # The big side of every round's scatter join, pre-shuffled by
        # the join key ONCE: the explicit repartition forces the
        # captured partitioning to be src alone (the broadcast-joined
        # plan would otherwise surface e's (src,dst)-keyed distinct,
        # which no round can reuse), so the per-round join against
        # ranks — itself (node, P)-partitioned, see below — needs no
        # exchange on EITHER side. At 100 TB this is the §2.4 win: the
        # edge list, the dominant byte volume, crosses the network
        # once per PageRank run instead of once per round.
        with static_partitioning_scope(spark, n_part):
            e_deg = ck(
                e.join(out_deg, "src")
                .repartition(n_part, "src")
                .sortWithinPartitions("src")
            )  # (src, dst, deg)

        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
        base = (1.0 - damping) / n
        for it in range(iterations):
            contribs = (
                e_deg.join(ranks, e_deg.src == ranks.node)
                .select(
                    F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                )
                .groupBy("node")
                .agg(
                    F.sum(F.col("c").cast("decimal(38,18)"))
                    .cast("double")
                    .alias("in_sum")
                )
            )
            ranks = nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
            if (it + 1) % checkpoint_interval == 0 or it == iterations - 1:
                # Local mode: LAZY — plan truncation happens at the
                # call (the frame is wrapped in a LogicalRDD either
                # way) and the rank chain is LINEAR (each round feeds
                # exactly the next), so the caller's single action
                # executes every round once; the eager form bought no
                # de-duplicated work, only one job launch per interval
                # (r16 optimization). Reliable mode stays EAGER: with
                # lazy marks Spark's doCheckpoint only writes the
                # TOPMOST marked ancestor (checkpointAllMarkedAncestors
                # defaults false), so the intermediate interval
                # checkpoints — the executor-loss recovery points a
                # configured dir is asking for — would silently never
                # land on reliable storage.
                # static_partitioning_scope compiles the interval's
                # rounds AQE-free: the rank update is a LEFT join, so
                # its output partitioning is the nodes side's
                # hashpartitioning(node, P) — captured into the
                # checkpoint, the rounds after the interval stay
                # exchange-free on both join sides, and each round
                # pays exactly ONE exchange (the contribution scatter
                # groupBy(dst), the only place rows genuinely change
                # keys). AQE loses nothing here: the co-partitioned
                # joins it would skew-split carry no shuffle at all.
                with static_partitioning_scope(spark, n_part):
                    ranks = ck(ranks, lazy=not _is_reliable(checkpoint_dir))
    return ranks


def _is_reliable(checkpoint_dir: str | None) -> bool:
    """True when checkpoint_scope will use reliable ``checkpoint()``
    (an explicit dir or the SPARK_GRAFT_CHECKPOINT_DIR contract)."""
    from bigdata_flightanalysis_spark.operators.checkpointing import (
        _resolve_dir,
    )

    return _resolve_dir(checkpoint_dir) is not None
