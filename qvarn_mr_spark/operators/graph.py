"""Link-graph centrality: PageRank as iterated DataFrame joins.

Web-corpus curation ranks documents by the link graph before any text is
read (the original PageRank use case; Common Crawl derivatives ship
centrality scores per host and curation pipelines gate on them). The
reference engine has nothing iterative at all — its closest shape is the
single-pass map/reduce join (``qvarnmr/processor.py``), so this is an
extension operator, same as the dedup/similarity families.

Execution model (per iteration, all declarative):

- ``contribs``: edges ⋈ ranks (on src) ⋈ out-degree → ``rank/outdeg`` per
  edge, then one ``groupBy(dst).sum`` — the only corpus-sized shuffle.
- ``dangling mass``: ranks of sink nodes (no out-edges) summed into a
  ONE-ROW frame, cross-joined (broadcast of a single row) back onto the
  node table — the textbook correction that keeps total rank at 1.0
  without a driver-side collect inside the loop.
- new rank = ``(1-d)/N + d * (contrib + dangling/N)``.

Each iteration's ranks are ``localCheckpoint``'ed (cluster: reliable
``checkpoint()``) — at 100 TB this is the standard Pregel-lite cadence,
and it is REQUIRED, not an optimization: every superstep references the
previous state more than once, so an un-truncated logical plan doubles
per iteration and the driver OOMs stringifying it long before the data
is a problem. Ranks and degrees are node-sized, edges are scanned once
per iteration. Iteration count is FIXED (no convergence test), which
keeps the operator deterministic and oracle-able; 6-10 iterations is the
conventional curation-quality setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qvarn_mr_spark.session import pin


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    damping: float = 0.85,
    digits: int | None = 6,
    weight_col: str | None = None,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
    init_ranks: DataFrame | None = None,
    init_rank_col: str = "rank",
    tol: float | None = None,
    return_iters: bool = False,
    edges_distinct: bool = False,
) -> DataFrame:
    """Rank every node of the directed graph ``edges`` (duplicate edges
    collapse; self-loops count). Returns ``(node, rank)`` with
    ``sum(rank) == 1`` up to float noise. ``digits`` rounds the final
    rank only — intermediates stay full double so Spark and a SQL oracle
    agree to well past the rounding point.

    - ``weight_col``: edge weights (duplicate (src, dst) rows SUM); a
      node's share splits proportionally to weight instead of uniformly
      — out-strength replaces out-degree, nothing else changes.
    - ``seeds``: personalized PageRank — teleport (and dangling) mass
      goes only to the seed node set (``seed_col`` of ``seeds``) instead
      of uniformly, and ranks start at the teleport vector. The
      recommendation / related-docs form. Seeds outside the graph's node
      set are IGNORED: the teleport vector lives on the graph's nodes,
      so the 1/|seeds ∩ nodes| shares are normalized over the seeds that
      actually exist — otherwise off-graph seeds' shares would vanish
      and total rank would decay below 1 each iteration. Pass off-graph
      seeds as self-loop edges if they should participate as nodes.
    - ``init_ranks``: WARM START — a ``(node, rank)`` frame (column
      names via ``init_rank_col``), typically the previous run's output
      before a CDC edge delta. Ranks start from it instead of uniform /
      teleport: nodes absent from it (newly appeared) get ``1/n``, then
      the vector renormalizes to sum 1 (one one-row aggregate +
      broadcast), preserving the per-iteration mass contract. Power
      iteration converges to the SAME fixpoint from any start; a
      near-converged start just gets there in 2-3 supersteps instead of
      6+ — the incremental-view-maintenance move for graphs, extending
      the engine's O(delta) identity (``operators/incremental.py``) to
      the one operator whose state is a fixpoint rather than an
      aggregate. Compose with :func:`degree_views` for O(delta) degree/
      adjacency upkeep between reruns.
    - ``tol``: the CONVERGENCE-TESTED production form — stop as soon as
      the supersteps' L1 delta ``sum(|rank_k − rank_{k−1}|)`` drops
      below ``tol`` (``iters`` becomes the safety cap). Costs one
      node-sized join + one-row collect per superstep (the bounded
      driver probe every convergence loop needs — same contract as
      dup_clusters' changed-flag). Data-dependent iteration count means
      no SQL unroll: rows-only at the driver gate, pinned instead by a
      pytest differential against the fixed-``iters`` form. ``None``
      (default) keeps the deterministic oracle-able unroll."""
    # the edge list is rescanned every iteration — pin it so the distinct
    # (its one shuffle) happens once, not per superstep. r13: pinned
    # PRE-PARTITIONED AND PRE-SORTED on the superstep join key (src), the
    # bucketed-table move of guide §2.4 applied in-memory: every
    # superstep's contributions join then needs NO exchange and NO sort
    # on the edge side (the cached plan's hashpartitioning(src)/ordering
    # satisfies the SMJ requirement), so the only corpus-sized shuffle
    # per superstep is the groupBy(dst) aggregation — the Pregel ideal.
    if weight_col is None:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        # ``edges_distinct=True``: the caller GUARANTEES (src, dst) rows
        # are already unique (r13, guide §2.4 "a distinct on data that
        # is already unique") — skips the collapse exchange+aggregate
        # pair from the pinned plan. Results are identical only under
        # that guarantee; default False keeps the collapse.
        if not edges_distinct:
            e = e.distinct()
        e = pin(e.repartition("src")
                 .sortWithinPartitions("src")
                 .withColumn("w", F.lit(1.0)))
    else:
        e = edges.select(F.col(src).alias("src"),
                         F.col(dst).alias("dst"),
                         F.col(weight_col).cast("double").alias("w"))
        # edges_distinct=True here means one row per (src, dst) already
        # — the weight-summing collapse is skipped the same way
        if not edges_distinct:
            e = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
        e = pin(e.repartition("src").sortWithinPartitions("src"))
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node")))
              .distinct())
    nodes = pin(nodes)
    n = nodes.count()  # bounded driver scalar: |V|, needed in the formula
    # out-strength; == out-degree when unweighted (w = 1.0 per edge).
    # e is cached hash(src)-partitioned, so this aggregate is
    # exchange-free (partial+final in place).
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    if seeds is not None:
        # intersect with the node set BEFORE counting: ns must be the
        # number of seeds that can actually hold teleport mass, else
        # sum(t) < 1 and total rank decays every iteration
        seed_set = pin(seeds.select(F.col(seed_col).alias("node"))
                            .distinct()
                            .join(nodes, "node"))
        ns = seed_set.count()  # bounded driver scalar: |seeds ∩ nodes|
        if ns == 0:
            raise ValueError(
                "pagerank: no seed is a node of the graph")
        # teleport vector t(v): 1/|seeds| on seeds, 0 elsewhere —
        # node-sized, joined once, reused by every superstep
        nodes_t = pin(nodes.join(
            seed_set.withColumn("_s", F.lit(1.0)), "node", "left")
            .select("node", (F.coalesce(F.col("_s"), F.lit(0.0))
                             / F.lit(float(ns))).alias("t")))
        return _pagerank_loop(e, nodes_t, outdeg, iters, damping, digits,
                              personalized=True, n=n,
                              init_ranks=init_ranks,
                              init_rank_col=init_rank_col, tol=tol,
                              return_iters=return_iters)

    return _pagerank_loop(e, nodes, outdeg, iters, damping, digits,
                          personalized=False, n=n, init_ranks=init_ranks,
                          init_rank_col=init_rank_col, tol=tol,
                          return_iters=return_iters)


def _pagerank_loop(e, nodes, outdeg, iters, damping, digits,
                   personalized, n, init_ranks=None,
                   init_rank_col="rank", tol=None, return_iters=False):
    """The shared damped power iteration. ``nodes`` carries a teleport
    column ``t`` in the personalized case (teleport + dangling mass go
    to ``t``; ranks start at ``t``); uniform otherwise (1/n everywhere).

    Superstep state is localCheckpoint'ed (cluster: checkpoint()) — NOT
    merely persisted: each update references the previous ranks twice
    (contributions + dangling mass), so without truncation the LOGICAL
    plan doubles per iteration (2^iters nodes; AQE stringifies it per
    job and OOMs the driver around 10 supersteps). Checkpointing cuts
    the lineage at node-sized state, the Pregel norm.

    r13 (guide §2.4, measured in OPTIMIZATION_r13.md): the checkpointed
    state CARRIES the (constant) out-strength column, so each superstep
    needs neither the outdeg join on the contributions path nor the
    left_anti sink join on the dangling path — dangling mass is a
    filter+sum over the node-sized state (sinks are exactly the rows
    whose outdeg is NULL). With the edge table pinned pre-partitioned
    on src and the state checkpoint preserving hash(node) partitioning,
    a superstep's only Exchange is the groupBy(dst) contribution
    shuffle (was 4 joins + 2 exchanges per superstep). Same arithmetic,
    value-for-value: share = rank·w/outdeg and the dangling sum range
    over identical rows."""
    node_cols = [c for c in nodes.columns]
    # constant per-node out-strength folded into the state vector: NULL
    # for sinks. nodes is cached hash(node)-partitioned and outdeg
    # derives from the hash(src)-partitioned edge cache, so this join
    # (and everything per-superstep below) is exchange-free.
    nodes = nodes.join(outdeg, nodes["node"] == outdeg["src"], "left") \
                 .select(*node_cols, "outdeg")
    if init_ranks is not None:
        # warm start: previous ranks where known, 1/n for new nodes,
        # renormalized to sum 1 (one-row aggregate, broadcast back) so
        # the mass-conservation contract holds from superstep 0
        joined = (nodes.join(
            init_ranks.select(F.col("node"),
                              F.col(init_rank_col).cast("double")
                               .alias("_r0")), "node", "left")
            .withColumn("_r0", F.coalesce(F.col("_r0"),
                                          F.lit(1.0 / n))))
        # one-row collect (bounded by contract) so an all-zero or
        # negative-sum init_ranks raises loudly instead of silently
        # dividing the whole rank vector into null/NaN
        tot = joined.agg(F.sum("_r0")).first()[0]
        if tot is None or tot <= 0:
            raise ValueError(
                f"pagerank warm start: init_ranks total {tot!r} is not "
                "positive; cannot renormalize to a probability vector")
        ranks = (joined.select(*node_cols, "outdeg",
                               (F.col("_r0") / F.lit(float(tot)))
                               .alias("rank"))
                 .localCheckpoint())
    else:
        if personalized:
            init = F.col("t")
        else:
            init = F.lit(1.0 / n)
        ranks = nodes.withColumn("rank", init).localCheckpoint()
    n_run = 0
    # tol path: the probe already collects one row per superstep, so the
    # NEXT superstep's dangling mass rides along in that same collect
    # (r13 — drops the per-superstep one-row aggregate job + broadcast);
    # the initial value needs one bounded collect over the init state
    dang_scalar = None
    if tol is not None:
        dang_scalar = (ranks.filter(F.col("outdeg").isNull())
                       .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                       .collect()[0][0])
    for _ in range(iters):
        n_run += 1
        # e is cached hash(src)-partitioned+sorted and the state
        # checkpoint preserves hash(node): this join plans with no
        # Exchange and no edge-side Sort; the groupBy(dst) below is the
        # superstep's one corpus-sized shuffle
        contribs = (e.join(ranks.select("node", "rank", "outdeg"),
                           e.src == F.col("node"))
                      .select(e.dst.alias("node"),
                              (F.col("rank") * F.col("w")
                               / F.col("outdeg")).alias("share"))
                      .groupBy("node")
                      .agg(F.sum("share").alias("contrib")))
        # sinks hold rank but emit no shares; their mass redistributes
        # to the teleport vector (uniform / seeds). Sinks are exactly
        # the NULL-outdeg state rows (r13: a filter over the node-sized
        # checkpoint replaces the per-superstep left_anti join — same
        # row set, same sum). Fixed-iters path: one-row aggregate,
        # broadcast back via cross join — no driver round-trip inside
        # the loop. tol path: the scalar arrives with the previous
        # superstep's probe collect (same filter+sum over the same
        # checkpointed rows) and is inlined as a literal.
        if tol is None:
            dangling = (ranks.filter(F.col("outdeg").isNull())
                             .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                                  .alias("dangling")))
            dang_col = F.col("dangling")
        else:
            dang_col = F.lit(float(dang_scalar))
        if personalized:
            rank_expr = (F.lit(1.0 - damping) * F.col("t")
                         + F.lit(damping)
                         * (F.coalesce(F.col("contrib"), F.lit(0.0))
                            + dang_col * F.col("t")))
        else:
            rank_expr = (F.lit((1.0 - damping) / n)
                         + F.lit(damping)
                         * (F.coalesce(F.col("contrib"), F.lit(0.0))
                            + dang_col / F.lit(float(n))))
        # join the new contributions back onto the PREVIOUS checkpoint
        # (same node set, already hash(node)-partitioned — contribs
        # arrives partitioned the same way out of its aggregation, so
        # this join is exchange-free too)
        carry_prev = ([F.col("rank").alias("_pr")]
                      if tol is not None else [])
        keep_prev = ["_pr"] if tol is not None else []
        nxt = (ranks.select(*node_cols, "outdeg", *carry_prev)
                    .join(contribs, "node", "left"))
        if tol is None:
            nxt = nxt.crossJoin(F.broadcast(dangling))
        nxt = nxt.select(*node_cols, "outdeg", *keep_prev,
                         rank_expr.alias("rank"))
        if tol is not None:
            # r13 (guide §2.4, dup_clusters' changed-flag discipline):
            # carry the per-node |Δrank| INTO the checkpoint — the old
            # rank is already a column of the frame this join builds —
            # so the convergence probe below reads the materialized
            # node-sized blocks with one column-sum instead of costing
            # a two-checkpoint join + re-scan per superstep. Same
            # per-row |rank_k − rank_{k−1}| values summed; measured in
            # OPTIMIZATION_r13.md.
            nxt = (nxt.withColumn("_d", F.abs(F.col("rank")
                                              - F.col("_pr")))
                      .drop("_pr"))
        # eager by default: materializes now, truncates lineage; the
        # previous step's blocks are released by the context cleaner
        ranks = nxt.localCheckpoint()
        if tol is not None:
            # convergence probe: one-row aggregate over the fresh
            # checkpoint — bounded by contract. The same collect also
            # returns the NEXT superstep's dangling mass (sinks are the
            # NULL-outdeg rows of this very frame).
            row = ranks.agg(
                F.sum("_d").alias("d"),
                F.coalesce(F.sum(F.when(F.col("outdeg").isNull(),
                                        F.col("rank"))),
                           F.lit(0.0)).alias("dang")).collect()[0]
            delta, dang_scalar = row["d"], row["dang"]
            if delta is not None and delta < tol:
                break

    out = ranks
    if digits is not None:
        out = out.select("node", F.round("rank", digits).alias("rank"))
    else:
        out = out.select("node", "rank")
    if return_iters:
        # the tol form's observed superstep count: pagerank(tol=..) ==
        # pagerank(iters=n_run) by construction (the loop runs the same
        # supersteps) — committing n_run is what lets an oracle replay
        # the convergence-tested form as a FIXED-depth SQL unroll
        return out, n_run
    return out


def degree_profile(edges: DataFrame, src: str = "src",
                   dst: str = "dst",
                   edges_distinct: bool = False) -> DataFrame:
    """Per-node (out_degree, in_degree) in ONE pass over the edge list —
    the cheap companion signal (link-farm / orphan detection) to
    :func:`pagerank`. Each edge contributes an out-credit to ``src`` and
    an in-credit to ``dst`` in-row; one map-side-combined aggregate over
    the exploded credit stream, node-sized output. (r13, guide §2.4:
    previously two separate edge-sized aggregates + a node-sized
    full-outer join — TWO scans of the edge subtree, which for the
    declared queries is itself a join+distinct, and two Exchanges. Same
    counts: ``sum`` of disjoint 0/1 credits per node ≡ the two
    ``count(*)`` sides with ``coalesce(_, 0)``.)"""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # edges_distinct=True: caller guarantees unique rows (same contract
    # as pagerank's flag) — the collapse exchange is skipped
    if not edges_distinct:
        e = e.distinct()
    credits = e.select(F.explode(F.array(
        F.struct(F.col("src").alias("node"),
                 F.lit(1).cast("long").alias("o"),
                 F.lit(0).cast("long").alias("i")),
        F.struct(F.col("dst").alias("node"),
                 F.lit(0).cast("long").alias("o"),
                 F.lit(1).cast("long").alias("i")))).alias("m"))
    return (credits.groupBy(F.col("m.node").alias("node"))
                   .agg(F.sum("m.o").alias("out_degree"),
                        F.sum("m.i").alias("in_degree")))


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    digits: int | None = 6,
    init_hubs: DataFrame | None = None,
    init_hub_col: str = "hub",
    tol: float | None = None,
    edges_distinct: bool = False,
) -> DataFrame:
    """Kleinberg's HITS: hub/authority scores by alternating power
    iteration — ``authority(v) = sum of hub(u) over u->v edges``, then
    ``hub(u) = sum of authority(v) over u->v``, each L1-normalized per
    half-step (L1 keeps the update division-only, so a SQL oracle
    reproduces it exactly; the fixpoint direction is the same as the
    usual L2 form). On a bipartite purchase graph this separates
    "breadth" customers (hubs) from "pull" suppliers (authorities) —
    a different curation signal than PageRank's stationary mass.

    Same execution cadence as :func:`pagerank`: per half-step one
    edge-sized shuffle, node-sized state checkpointed per superstep;
    fixed iteration count for determinism.

    ``init_hubs``: WARM START — a ``(node, hub)`` frame (column
    renameable via ``init_hub_col``), typically the previous run's
    output. Only the hub vector is true state (each superstep derives
    auth from hub first), so that is all a restart needs. Known nodes
    keep their hub mass, new nodes get 1/n, renormalized to sum 1
    (one-row aggregate; raises on a non-positive total) — the same
    IVM-for-fixpoint-state move as ``pagerank(init_ranks=)``.

    ``tol``: the convergence-tested production twin, mirroring
    ``pagerank(tol=)`` — stop when the superstep L1 delta over
    (hub, auth) drops below ``tol``, with ``iters`` as the safety cap;
    one node-sized join + a one-row collect per superstep."""
    # (r13 note: dual pre-partitioned edge pins — hash(src) for the auth
    # half-step, hash(dst) for the hub half-step — measured 1.6-1.9x
    # SLOWER at sf0.1 than this single pin: the node-sized state side of
    # each half-step join broadcasts, so the edge side is never shuffled
    # in the first place and the two repartition+sort+cache passes are
    # pure overhead. Single un-partitioned pin kept deliberately.)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # edges_distinct=True: caller guarantees unique (src, dst) rows —
    # skip the collapse exchange (same contract as pagerank's flag)
    if not edges_distinct:
        e = e.distinct()
    e = pin(e)
    nodes = pin(e.select(F.col("src").alias("node"))
                 .union(e.select(F.col("dst").alias("node")))
                 .distinct())
    # same lineage discipline as pagerank: each superstep references the
    # previous state several times (auth update, hub update, output
    # join), so state is localCheckpoint'ed per superstep
    if init_hubs is not None:
        n = nodes.count()
        joined = (nodes.join(
            init_hubs.select(F.col("node"),
                             F.col(init_hub_col).cast("double")
                             .alias("_h0")), "node", "left")
            .withColumn("_h0", F.coalesce(F.col("_h0"),
                                          F.lit(1.0 / n))))
        tot = joined.agg(F.sum("_h0")).first()[0]
        if tot is None or tot <= 0:
            raise ValueError(
                f"hits warm start: init_hubs total {tot!r} is not "
                "positive; cannot renormalize to a probability vector")
        state = (joined.select(
            "node", (F.col("_h0") / F.lit(float(tot))).alias("hub"),
            F.lit(1.0).alias("auth")).localCheckpoint())
    else:
        state = nodes.select("node", F.lit(1.0).alias("hub"),
                             F.lit(1.0).alias("auth")).localCheckpoint()
    for _ in range(iters):
        # checkpoint the RAW edge-sized aggregates, not normalized
        # frames: both their normalizers (the one-row totals) and the
        # next half-step read them, and without truncation each
        # reference re-runs the edge join — two extra corpus-sized
        # joins per superstep, measured 10x the whole operator's cost
        # at sf0.1. (r13 note: lazy checkpoints — letting the totals'
        # broadcast job materialize each half-step as a side effect —
        # measured no better than eager here; eager kept for the
        # deterministic job accounting.)
        #
        # r13 fold (guide §1.2 step 1, measured in OPTIMIZATION_r13.md):
        # the half-step L1 normalization is a division by a SCALAR, and
        # the hub update is linear, so the hub half-step can consume the
        # RAW auth sums — hub(u) = (Σ_v a_raw(v)) / Σ_u Σ_v a_raw(v),
        # the a_tot factor cancels algebraically. That drops the old
        # per-superstep normalized-auth frame (a node-sized left join +
        # one-row broadcast evaluated TWICE: once under the hub edge
        # join, once in the output join) — both normalizations now
        # happen once, in the superstep's single node-sized state
        # build. Same fixpoint, same L1 contract per superstep (state
        # stays normalized), value-for-value with the identically
        # folded oracle.hits_sql unroll.
        a_raw = (e.join(state.select(F.col("node").alias("src"), "hub"),
                        "src")
                  .groupBy(F.col("dst").alias("node"))
                  .agg(F.sum("hub").alias("auth"))
                  .localCheckpoint(eager=True))
        h_raw = (e.join(a_raw.select(F.col("node").alias("dst"),
                                     F.col("auth")), "dst")
                  .groupBy(F.col("src").alias("node"))
                  .agg(F.sum("auth").alias("hub"))
                  .localCheckpoint(eager=True))
        a_tot = a_raw.agg(F.sum("auth").alias("atot"))
        h_tot = h_raw.agg(F.sum("hub").alias("htot"))
        nxt = (nodes.join(h_raw, "node", "left")
                    .join(a_raw, "node", "left")
                    .crossJoin(F.broadcast(h_tot))
                    .crossJoin(F.broadcast(a_tot))
                    .select("node",
                            (F.coalesce(F.col("hub"), F.lit(0.0))
                             / F.col("htot")).alias("hub"),
                            (F.coalesce(F.col("auth"), F.lit(0.0))
                             / F.col("atot")).alias("auth")))
        prev = state
        state = nxt.localCheckpoint()
        if tol is not None:
            # convergence probe (pagerank's tol= discipline): node-sized
            # join over two checkpointed frames, one row to the driver
            delta = (state.join(
                prev.select("node", F.col("hub").alias("_ph"),
                            F.col("auth").alias("_pa")), "node")
                .agg(F.sum(F.abs(F.col("hub") - F.col("_ph"))
                           + F.abs(F.col("auth") - F.col("_pa")))
                .alias("d")).collect()[0]["d"])
            if delta is not None and delta < tol:
                break
    out = state
    if digits is not None:
        out = out.select("node", F.round("hub", digits).alias("hub"),
                         F.round("auth", digits).alias("auth"))
    return out


def degree_views(source: str = "edges", src_col: str = "src",
                 dst_col: str = "dst",
                 out_name: str = "out_degrees",
                 in_name: str = "in_degrees") -> dict:
    """ViewEngine config fragment for MAINTAINED degree/adjacency views —
    the incremental half of :func:`degree_profile`: per node, its
    out-degree + sorted neighbor list (``out_name``, keyed by ``src``)
    and in-degree + reverse neighbors (``in_name``, keyed by ``dst``).

    Driven by the incremental engine, a CDC edge delta costs O(delta):
    a changed edge re-maps to one key per direction and only dirty nodes
    re-reduce — the batch form rescans the edge table. At a 100 TB web
    graph with a trickle of recrawls, this is how the degree signal (and
    the adjacency lists PageRank iterates over) stays current without
    re-deriving the graph. Map-view names derive from the (necessarily
    unique) reduce-view names, same collision-free convention as
    :func:`~qvarn_mr_spark.functions.dedup.lsh_index_views`."""
    from qvarn_mr_spark.operators.mapreduce import map_expr, reduce_agg

    deg = {
        "degree": lambda c: F.count(F.lit(1)),
        "neighbors": lambda c: F.array_sort(F.collect_set(c)),
    }
    om, im = f"{source}__{out_name}__map", f"{source}__{in_name}__map"
    return {
        om: {source: map_expr(key=F.col(src_col), value=F.col(dst_col))},
        im: {source: map_expr(key=F.col(dst_col), value=F.col(src_col))},
        out_name: {om: reduce_agg(deg)},
        in_name: {im: reduce_agg(deg)},
    }


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst",
                   max_wedges: int | None = None,
                   edges_canonical: bool = False,
                   max_adj: int = 4096) -> DataFrame:
    """Per-node triangle participation over the UNDIRECTED collapse of
    ``edges`` (direction and duplicates ignored; self-loops dropped) —
    the classic cohesion/link-spam signal (a farm of pages linking each
    other is triangle-dense; organically linked pages are not).

    Skew-bounded by degree-ordered orientation: every undirected edge is
    directed from its lower endpoint to its higher endpoint under the
    total order (degree, node), so a hub of degree D fans out only to
    HIGHER-degree neighbors — max oriented out-degree is O(sqrt(m)) and
    the wedge self-join's row count is bounded by sum(out_deg^2) <=
    m^1.5, the standard bound, instead of the unbounded d_hub^2 a naive
    neighbor self-join pays. Each triangle materializes exactly once:
    both wedge directions (x; b, c) and (x; c, b) are generated, but the
    closure join demands the ORIENTED edge between the two tips, which
    exists in exactly one direction. One self-join + one closure join +
    one explode-aggregate; no iteration, no driver state.

    ``max_wedges`` is the explicit scale valve (same role as
    ``max_bucket`` in the LSH family): the wedge join's exact row count
    — sum over x of C(out_deg(x), 2) on the ORIENTED graph — is computed
    from the pinned orientation (one node-sized aggregate, a bounded
    driver scalar) and the operator REFUSES to run past the cap rather
    than silently launching an m^1.5 join that a 100×-denser graph turns
    into the cluster's biggest stage. The escape path is
    :func:`triangle_count_approx` (DOULION edge sampling: ~p²-fewer
    wedges at 1/p³-scaled counts), which the error message names.
    ``None`` (default) never trips — exact output, matching the oracle.

    Returns ``(node, triangles)`` for every node (0 for triangle-free
    nodes)."""
    und, deg = _und_deg(edges, src, dst, edges_canonical)
    return _triangle_core(und, deg, max_wedges, max_adj=max_adj)


def _und_deg(edges: DataFrame, src: str, dst: str,
             canonical: bool = False):
    """Pinned undirected collapse + per-node degree — shared by
    :func:`triangle_count` and :func:`clustering_coefficient` (r13: the
    coefficient previously re-derived both from the raw edges, paying
    the distinct and the degree aggregate twice per call).

    ``canonical=True``: the caller GUARANTEES ``edges`` is already the
    canonical undirected form — one row per unordered pair, ``src <
    dst``, no self-loops (e.g. a co-occurrence list built with a
    ``pa < pb`` filter + distinct) — so the least/greatest collapse and
    its distinct exchange are skipped outright (r13, guide §2.4)."""
    if canonical:
        und = pin(edges.select(F.col(src).alias("u"),
                               F.col(dst).alias("v")))
    else:
        und = pin(edges.select(F.col(src).alias("a"),
                               F.col(dst).alias("b"))
                       .filter(F.col("a") != F.col("b"))
                       .select(F.least("a", "b").alias("u"),
                               F.greatest("a", "b").alias("v"))
                       .distinct())
    deg = pin(und.select(F.col("u").alias("node"))
                 .union(und.select(F.col("v").alias("node")))
                 .groupBy("node").agg(F.count("*").alias("deg")))
    return und, deg


def _triangle_core(und: DataFrame, deg: DataFrame,
                   max_wedges: int | None,
                   max_adj: int = 4096) -> DataFrame:
    """The degree-ordered orientation + adjacency-intersection core of
    :func:`triangle_count` over a pinned ``(und, deg)`` pair.

    ``max_adj`` is the r14 degree-cap valve (VERDICT r13 #5): the
    adjacency-array shape carries ``collect_list`` out-neighbor arrays
    per oriented source and intersects them per base edge — at
    10^11-10^12 edges a √m-degree hub's array is ~10^5-10^6 entries
    moving through a shuffle, a task-memory risk (guide §5) the
    relational join shape never had. When any node's degree exceeds
    ``max_adj`` (one bounded max over the pinned node-degree table),
    the core goes HYBRID: arrays are built ONLY for sources whose
    undirected degree ≤ ``max_adj`` (so every array is provably
    bounded; und-degree upper-bounds oriented out-degree), base edges
    with both endpoints small keep the intersection path, and the
    tail — base edges touching a > ``max_adj`` node — falls back to
    the relational expand-and-close join (row-at-a-time, same
    asymptotics, no arrays). Base edges partition exactly in two, so
    each triangle is still found once at its base edge; counts sum.
    Graphs whose max degree fits the cap (every declared query at
    bench scale) take the pure array path — the r13 plan, unchanged."""
    lower = ((F.col("du") < F.col("dv"))
             | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))))
    oriented = pin(
        und.join(deg.select(F.col("node").alias("u"),
                            F.col("deg").alias("du")), "u")
           .join(deg.select(F.col("node").alias("v"),
                            F.col("deg").alias("dv")), "v")
           .select(F.when(lower, F.col("u")).otherwise(F.col("v"))
                    .alias("x"),
                   F.when(lower, F.col("v")).otherwise(F.col("u"))
                    .alias("y")))
    if max_wedges is not None:
        n_wedges = (oriented.groupBy("x")
                    .agg(F.count(F.lit(1)).alias("d"))
                    .agg(F.coalesce(
                        F.sum(F.col("d") * (F.col("d") - 1) / 2),
                        F.lit(0.0)).alias("w"))
                    .collect()[0]["w"])
        if n_wedges > max_wedges:
            raise ValueError(
                f"triangle_count: {int(n_wedges)} wedges exceed "
                f"max_wedges={max_wedges}; the wedge join would "
                f"dominate the job. Use triangle_count_approx "
                f"(DOULION edge sampling) or raise the cap.")
    # r13 (guide §2.3 "shuffle fewer bytes", measured in
    # OPTIMIZATION_r13.md): adjacency-array intersection replaces the
    # wedge self-join + closure join. Every triangle {a < b < c} (the
    # orientation's total order) is found ONCE, at its base edge
    # (a, b), as c ∈ out(a) ∩ out(b) — the "compact-forward" algorithm.
    # The old shape materialized and SHUFFLED the full wedge set
    # (Σ C(out_deg, 2) rows, ~m^1.5) into the closure join; this shape
    # shuffles the oriented edges (m rows) plus ONE array-carrying pass
    # of the same aggregate volume in ~m rows instead of ~m^1.5 rows,
    # and the closure test becomes a per-row array_intersect. Per-node
    # credits are identical: each of the three corners once per
    # triangle — base endpoints get |intersection|, each common
    # neighbor gets 1 — in ONE scan of the joined frame (the 3-branch
    # union lesson from the old shape still applies).
    # degree-cap valve (r14, VERDICT r13 #5 / guide §5): one bounded
    # max over the pinned node-degree table decides the shape. The
    # collect is a node-sized aggregate of an already-pinned frame —
    # milliseconds at bench scale, one cheap pass at cluster scale,
    # and it buys a provable per-row array bound.
    kmax = deg.agg(F.max("deg").alias("m")).collect()[0]["m"]
    hybrid = kmax is not None and int(kmax) > int(max_adj)
    if hybrid:
        small = pin(deg.filter(F.col("deg") <= int(max_adj))
                       .select("node"))
        # full out-lists, but ONLY for small sources: |out(x)| ≤
        # und-deg(x) ≤ max_adj, so no array ever exceeds the cap
        osm = oriented.join(small.select(F.col("node").alias("x")),
                            "x", "left_semi")
        adj = osm.groupBy("x").agg(F.collect_list("y").alias("ns"))
    else:
        adj = oriented.groupBy("x").agg(F.collect_list("y").alias("ns"))
    # the oriented edge list IS adj exploded — re-deriving it from adj
    # attaches ns without the extra oriented⋈adj join+exchange the
    # two-join form paid (r13; only the y-side attach shuffles). Under
    # the hybrid split this inner join ALSO restricts the array path to
    # base edges with BOTH endpoints small (a big or out-less y has no
    # adj row — out-less y closes no triangle, big y goes to the tail).
    edges2 = (adj.select("x", F.explode("ns").alias("y"), "ns")
              .join(adj.select(F.col("x").alias("y"),
                               F.col("ns").alias("ns_y")), "y")
              .withColumn("_common", F.array_intersect("ns", "ns_y"))
              .withColumn("_cnt", F.size("_common").cast("long"))
              .filter(F.col("_cnt") > 0))
    contrib = F.concat(
        F.array(F.struct(F.col("x").alias("n"), F.col("_cnt").alias("c")),
                F.struct(F.col("y").alias("n"), F.col("_cnt").alias("c"))),
        F.transform("_common",
                    lambda w: F.struct(w.alias("n"),
                                       F.lit(1).cast("long").alias("c"))))
    members = (edges2.select(F.explode(contrib).alias("m"))
                     .select(F.col("m.n").alias("node"),
                             F.col("m.c").alias("c")))
    if hybrid:
        # tail base edges — x big, or x small with y big: a disjoint
        # partition of the oriented edges against the array path, so
        # each triangle is still found exactly once at its base edge
        big = pin(deg.filter(F.col("deg") > int(max_adj))
                     .select("node"))
        tail = (oriented.join(big.select(F.col("node").alias("x")),
                              "x", "left_semi")
                .union(oriented
                       .join(small.select(F.col("node").alias("x")),
                             "x", "left_semi")
                       .join(big.select(F.col("node").alias("y")),
                             "y", "left_semi")))
        # relational expand-and-close (the pre-r13 wedge discipline,
        # restricted to the tail): c ∈ out(x) via one join, closed by
        # the oriented edge (y, c) via a second — no arrays, row-sized
        # state only; one row per tail triangle (x, y, c)
        tri_tail = (tail
                    .join(oriented.select("x", F.col("y").alias("c")),
                          "x")
                    .join(oriented.select(F.col("x").alias("y"),
                                          F.col("y").alias("c")),
                          ["y", "c"]))
        tail_members = (tri_tail
                        .select(F.explode(F.array("x", "y", "c"))
                                .alias("node"))
                        .select("node", F.lit(1).cast("long").alias("c")))
        members = members.union(tail_members)
    counts = members.groupBy("node").agg(F.sum("c").alias("triangles"))
    return (deg.select("node").join(counts, "node", "left")
               .select("node", F.coalesce("triangles", F.lit(0))
                       .alias("triangles")))


def triangle_count_approx(edges: DataFrame, src: str = "src",
                          dst: str = "dst", p: float = 0.25,
                          salt: str = "doulion",
                          digits: int | None = 6,
                          edges_canonical: bool = False) -> DataFrame:
    """DOULION approximate triangle counting (Tsourakakis, Kang, Miller,
    Faloutsos, KDD 2009): sparsify the undirected graph by keeping each
    edge independently with probability ``p``, count triangles EXACTLY
    on the sparsified graph, scale per-node counts by ``1/p³``. Each
    surviving triangle needed all three edges kept (probability p³), so
    the estimator is unbiased: ``E[est] = true count``, per node and in
    total. The wedge join runs on ~p·m edges — ~p² fewer wedge rows and
    (p·m)^1.5 worst case — which is the escape path
    :func:`triangle_count`'s ``max_wedges`` valve points at.

    The coin is a consistent hash (``sampling.hash_unit`` of the
    canonical edge key under ``salt``), NOT an RNG: reruns, retries and
    repartitioning keep the same edges, the estimate is deterministic,
    and a DuckDB twin (``oracle.triangle_count_approx_sql``) reproduces
    it value-for-value. Different salts give independent sparsifications
    — averaging over salts is the variance-reduction knob, and the
    unbiasedness pytest differential drives exactly that. ``p=1.0``
    degenerates to the exact count.

    Returns ``(node, triangles_est)`` over the FULL node set (nodes
    whose edges were all dropped report 0.0)."""
    from qvarn_mr_spark.functions.sampling import hash_unit

    if not 0.0 < p <= 1.0:
        raise ValueError(f"triangle_count_approx: p must be in (0, 1], "
                         f"got {p}")
    # edges_canonical: same caller contract as _und_deg(canonical=True)
    if edges_canonical:
        und = pin(edges.select(F.col(src).alias("u"),
                               F.col(dst).alias("v")))
    else:
        und = pin(edges.select(F.col(src).alias("a"),
                               F.col(dst).alias("b"))
                       .filter(F.col("a") != F.col("b"))
                       .select(F.least("a", "b").alias("u"),
                               F.greatest("a", "b").alias("v"))
                       .distinct())
    nodes = (und.select(F.col("u").alias("node"))
                .union(und.select(F.col("v").alias("node")))
                .distinct())
    kept = (und.withColumn("_ek", F.concat_ws("#", "u", "v"))
               .filter(hash_unit("_ek", salt) < F.lit(float(p)))
               .select("u", "v"))
    tri = triangle_count(kept, src="u", dst="v", edges_canonical=True)
    est = F.coalesce(F.col("triangles"), F.lit(0)) / F.lit(float(p) ** 3)
    if digits is not None:
        est = F.round(est, digits)
    return (nodes.join(tri, "node", "left")
                 .select("node", est.alias("triangles_est")))


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst",
                           digits: int | None = 6,
                           edges_canonical: bool = False,
                           max_wedges: int | None = None,
                           max_adj: int = 4096) -> DataFrame:
    """Local clustering coefficient per node: ``2*T / (d*(d-1))`` —
    what fraction of a node's neighbor pairs are themselves linked
    (1.0 = clique-like, 0.0 = star-like). Composes
    :func:`triangle_count` with the undirected degree; nodes of degree
    < 2 report 0.0. Same cost profile as triangle_count (the join and
    the degree aggregate are already in its plan; r13: the undirected
    collapse and degree table are SHARED with the triangle core via
    :func:`_und_deg` instead of re-derived — one distinct + one degree
    aggregate per call, not two)."""
    und, deg = _und_deg(edges, src, dst, edges_canonical)
    tri = _triangle_core(und, deg, max_wedges, max_adj=max_adj)
    coef = F.when(F.col("deg") >= 2,
                  2.0 * F.col("triangles")
                  / (F.col("deg") * (F.col("deg") - 1))) \
            .otherwise(F.lit(0.0))
    if digits is not None:
        coef = F.round(coef, digits)
    return (tri.join(deg, "node")
               .select("node", "triangles", F.col("deg").alias("degree"),
                       coef.alias("clustering_coef")))


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", iters: int = 5,
                      init_labels: DataFrame | None = None,
                      init_label_col: str = "label",
                      until_stable: bool = False,
                      edges_canonical: bool = False) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the undirected collapse of ``edges`` — the
    link-farm / topical-cluster signal between connected components
    (too coarse: everything reachable) and triangles (too local): after
    ``iters`` rounds every node carries the label most common among its
    neighbors, and densely linked groups converge to one label.

    Deterministic by construction, unlike textbook LPA's random
    tie-breaking: each round every node adopts the MAX-FREQUENCY label
    among its neighbors' labels PLUS ITS OWN (the self-vote damps the
    two-coloring oscillation synchronous LPA exhibits on bipartite
    structure), ties broken by SMALLEST label; labels start as the node
    ids. Fixed iteration count + total-order tie-break = the same
    SQL-unroll oracle discipline as :func:`pagerank`
    (``oracle.label_propagation_sql``).

    ``init_labels``: WARM START — a ``(node, label)`` frame (column
    renameable via ``init_label_col``), typically the previous run's
    output. Nodes present keep their label; new nodes fall back to
    their own id. The IVM move for fixpoint state, same as
    ``pagerank(init_ranks=)``: after a small edge delta, a
    near-converged label assignment needs a fraction of the rounds a
    cold start does. Composes with the SQL-unroll oracle by feeding
    the pre-delta unroll in as ``init_sql``.

    ``until_stable``: the convergence-tested production twin
    (``pagerank(tol=)`` / ``dup_clusters``'s probe discipline) — stop
    as soon as a round changes no label, ``iters`` the safety cap; the
    probe is a LIMIT-1 existence scan over the already-checkpointed
    round, not a count.

    Per round: one edge-sized join+shuffle (neighbor votes), one
    (node, label)-sized count aggregate, one per-node argmax window
    (groups are per-node label sets — bounded by degree), state
    localCheckpoint'ed per round (cluster: checkpoint()) under the same
    lineage discipline as the other iterative operators.

    Returns ``(node, label)``; nodes sharing a label are one community."""
    # edges_canonical: same caller contract as _und_deg(canonical=True)
    # — already one row per unordered pair, src < dst, no self-loops;
    # the collapse exchange is skipped (r13, guide §2.4)
    if edges_canonical:
        e = pin(edges.select(F.col(src).alias("u"),
                             F.col(dst).alias("v")))
    else:
        e = pin(edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
                     .filter(F.col("a") != F.col("b"))
                     .select(F.least("a", "b").alias("u"),
                             F.greatest("a", "b").alias("v"))
                     .distinct())
    # r13 (guide §2.4): the symmetric adjacency is joined on nbr every
    # round — pin it pre-partitioned+sorted on that key so the
    # per-round votes join needs no Exchange and no Sort on the
    # edge-sized side (labels arrive hash(node)-partitioned out of each
    # round's aggregation, alias-preserved through the rename)
    base = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")) \
            .union(e.select(F.col("v").alias("node"),
                            F.col("u").alias("nbr")))
    nodes = pin(base.select("node").distinct())
    # r14 (VERDICT r13 #9): the SELF-VOTE rides the adjacency as one
    # (node, node) row per node, pre-unioned into the same partitioned
    # pin — the per-round vote stream becomes ONE nbr-keyed join
    # against the label frame instead of join ∪ labels, which read the
    # label checkpoint twice per round. Vote multiset per (node, label)
    # is identical: the self row delivers exactly the one own-label
    # vote the union used to.
    sym = pin(base.union(nodes.select("node",
                                      F.col("node").alias("nbr")))
              .repartition("nbr").sortWithinPartitions("nbr"))
    if init_labels is not None:
        labels = (nodes.join(
            init_labels.select(F.col("node"),
                               F.col(init_label_col).alias("_l0")),
            "node", "left")
            .select("node", F.coalesce(F.col("_l0"), F.col("node"))
                    .alias("label"))
            .localCheckpoint())
    else:
        labels = nodes.withColumn("label",
                                  F.col("node")).localCheckpoint()
    for _ in range(iters):
        # ONE read of the label checkpoint per round (r14, VERDICT r13
        # #9): the self-vote arrives through sym's (node, node) rows,
        # so no second labels-frame branch is needed here
        votes = (sym.join(labels.select(F.col("node").alias("nbr"),
                                        "label"), "nbr")
                    .select("node", "label"))
        counts = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt"))
        # r13 (guide §2.3): the per-node argmax as a partial-aggregating
        # min_by over the (−cnt, label) total order instead of a
        # row_number window — row-identical (max count, smallest-label
        # tiebreak), but map-side combine replaces the window's full
        # per-partition sort of the (node, label) count table and the
        # shuffle into the argmax carries one row per node per partition
        nxt = (counts.groupBy("node")
                     .agg(F.min_by(F.col("label"),
                                   F.struct((-F.col("cnt")).alias("nc"),
                                            F.col("label")))
                          .alias("label")))
        if until_stable:
            # carry the changed-flag INTO the checkpoint so the probe
            # reads materialized partitions with a limit(1) early-exit
            flagged = (nxt.join(labels.select(
                "node", F.col("label").alias("_prev")), "node")
                .select("node", "label",
                        (F.col("label") != F.col("_prev")).alias("_chg"))
                .localCheckpoint(eager=True))
            stable = flagged.filter(F.col("_chg")).limit(1).isEmpty()
            labels = flagged.select("node", "label")
            if stable:
                break
        else:
            labels = nxt.localCheckpoint()
    return labels.select("node", "label")


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         init_components: DataFrame | None = None,
                         max_iter: int = 12) -> DataFrame:
    """Connected components over the undirected collapse of ``edges``:
    every node gets ``component`` = the smallest node id in its
    component. Thin graph-facing form of
    :func:`qvarn_mr_spark.functions.dedup.dup_clusters` (the dedup
    pipeline's cluster stage IS general CC over an arbitrary pair list —
    distributed min-label propagation with pointer-doubling, O(log n)
    rounds, per-round lineage checkpointed); see its docstring for the
    scale analysis.

    ``init_components``: WARM START for a growing edge set — a
    ``(node, component)`` frame, typically the previous run's output;
    the delta's merges propagate in 1-2 rounds instead of O(log n).
    ADDITIONS ONLY (see ``dup_clusters(init_labels=)``): after edge
    deletions run cold."""
    from qvarn_mr_spark.functions.dedup import dup_clusters
    ini = None
    if init_components is not None:
        ini = init_components.select(
            F.col("node"), F.col("component").alias("cluster_id"))
    return (dup_clusters(edges, a=src, b=dst, max_iter=max_iter,
                         init_labels=ini)
            .select(F.col("node"), F.col("cluster_id").alias("component")))
