"""Community detection: deterministic synchronous label propagation.

Reference: /root/reference/pipelines/analytics/helpers/networks.py:48-59 runs
sknetwork Louvain over a dense projection adjacency, and the driver
analytics/wallet_communities/analyze.py:28-90 builds a wallet-wallet
co-occurrence adjacency and persists (wallet, partition) rows (cyphers
helpers/queries.py:186-234 → Partition nodes + HAS_PARTITION edges).

Louvain itself is driver-bound in the reference (dense numpy matrix, global
modularity optimization) and nondeterministic across library versions, so
the Spark-native stand-in is *synchronous weighted label propagation* with a
min-label tie-break and a fixed round count:

  * label(v) starts as v's own id;
  * each round, every node simultaneously adopts the label with the highest
    total incident edge weight among its neighbors' previous-round labels,
    ties broken by the smallest label;
  * after ``rounds`` rounds, the label is the community id.

This is deterministic (no RNG, no update-order dependence), one
join + groupBy shuffle per round (both keyed on the node id, so a
co-partitioned exchange), and exactly SQL-replayable — the DuckDB oracle
unrolls the same K rounds. The semantic divergence from Louvain (no
modularity objective; LPA finds denser local majorities) is documented in
COVERAGE.md §2.10.

Scale: state per round is one row per node plus one row per (node, candidate
label) vote — bounded by the edge count, never quadratic. Lineage is cut
with localCheckpoint per round as in operators.canon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    rounds: int = 4,
) -> DataFrame:
    """edges(src, dst[, weight]) → (id, community) for every endpoint.

    Undirected: each input edge votes in both directions. ``weight`` (long
    counts; summed exactly) defaults to 1 per edge. ``rounds`` is fixed so
    runs are reproducible and the oracle can unroll the loop.
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    e = (
        half.unionByName(half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()
    )
    labels = e.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    for _ in range(rounds):
        votes = (
            e.join(labels.select(F.col("id").alias("b"), "label"), "b")
            .groupBy(F.col("a").alias("id"), "label")
            .agg(F.sum("w").alias("wt"))
        )
        # argmax by (wt desc, label asc): max(struct(wt, -label)) — struct
        # comparison is lexicographic, so max weight first, then max(-label)
        # = min label. Exact (long arithmetic), no window needed.
        labels = (
            votes.groupBy("id")
            .agg(F.max(F.struct(F.col("wt"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("id", (-F.col("m.nl")).alias("label"))
            .localCheckpoint()
        )
    return labels.select("id", F.col("label").alias("community"))


def materialize_partitions(labels: DataFrame) -> DataFrame:
    """(id, community) labels → the reference's wallet_communities persist
    shape: one HAS_PARTITION edge per member, annotated with its Partition
    node's member count (helpers/queries.py:186-234 creates Partition nodes
    and (wallet)-[:HAS_PARTITION]->(partition) edges; analyze.py:68-90
    saves the partition table).

    Plan: one groupBy on community for the member counts (the Partition
    node dimension — at most one row per community, tiny), then a
    broadcast-sized join back onto the labels. The labels relation never
    shuffles twice: the count aggregation output is dimension-sized, so
    AQE broadcasts it.
    """
    sizes = labels.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return labels.join(F.broadcast(sizes), "community").select(
        F.col("id").alias("user_id"),
        F.lit("HAS_PARTITION").alias("pred"),
        F.col("community").alias("partition"),
        "n_members",
    )


def partition_modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Per-community Newman modularity terms for a partition.

    The reference's Louvain (analytics/helpers/networks.py:48-59) optimizes
    modularity Q = Σ_c [in_c/(2m) − (tot_c/(2m))²]; the LPA stand-in above
    does not, so this operator QUANTIFIES the divergence: it scores any
    (id, community) assignment against the same graph. Σ q_term over the
    output is the partition's global Q.

    Columns: community, n_members, internal_weight (symmetrized intra-
    community weight = 2× undirected internal weight, exact long),
    total_degree (Σ member degrees, exact long), q_term (double from two
    deterministic scalar divisions — no accumulation-order dependence).

    Plan: the edge relation symmetrizes exactly as label_propagation does,
    then joins the label dimension onto both endpoints (two co-partitioned
    shuffles on node id); everything after is dimension-sized (one row per
    community). Scales with |E|, never |V|².
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    e = (
        half.unionByName(half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()  # two label joins + degree agg consume it
    )
    memb = labels.select(F.col("id"), F.col("community"))
    two_m = e.agg(F.sum("w").alias("m2"))  # symmetrized total = 2m, one row
    deg = e.groupBy(F.col("a").alias("id")).agg(F.sum("w").alias("deg"))
    in_c = (
        e.join(memb.select(F.col("id").alias("a"), F.col("community").alias("ca")), "a")
        .join(memb.select(F.col("id").alias("b"), F.col("community").alias("cb")), "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("w").alias("in_w"))
    )
    stats = (
        memb.join(deg, "id")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("deg").cast("long").alias("total_degree"),
        )
    )
    t = F.col("total_degree").cast("double") / F.col("m2").cast("double")
    return (
        stats.join(in_c, "community", "left")
        .crossJoin(F.broadcast(two_m))
        .select(
            "community",
            "n_members",
            F.coalesce("in_w", F.lit(0)).cast("long").alias("internal_weight"),
            "total_degree",
            (
                F.coalesce("in_w", F.lit(0)).cast("double")
                / F.col("m2").cast("double")
                - t * t
            ).alias("q_term"),
        )
    )


def refine_partition(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """ONE synchronous Louvain phase-1 refinement sweep over an existing
    (id, community) assignment: every node simultaneously moves to the
    neighboring community with the highest modularity gain, if positive.

    This adds the modularity OBJECTIVE the LPA stand-in lacks (the
    documented divergence from the reference's sknetwork Louvain,
    analytics/helpers/networks.py:48-59): with Q = Σ_c [in_c/m2 −
    (vol_c/m2)²] over the symmetrized graph (m2 = total symmetrized
    weight), the gain of moving v from c0 to c clears to the EXACT
    integer score  g(c) = m2·k(v,c) − deg(v)·volx(c),  where k(v,c) is
    v's weight into c and volx(c) is c's volume excluding v; v moves to
    argmax g (min-community tie-break) iff g(best) > g(current). All
    arithmetic is BIGINT (requires m2·max_degree < 2^63 — true for any
    graph whose total weight fits in 31 bits, documented bound), so the
    sweep is bit-exact SQL-replayable. Synchronous moves keep the sweep
    deterministic (no update-order dependence); apply once after LPA —
    the reference's Louvain iterates sequential moves to a fixed point,
    driver-bound on a dense matrix. Caveat (documented, inherent to the
    synchronous variant): each node's gain is computed against the OLD
    assignment, so two simultaneous moves can in principle interact and
    the global Q is not formally guaranteed to rise on adversarial
    graphs — on the partition shapes LPA produces (dense local
    majorities) interacting moves are rare, and the test asserts the
    canonical bridge-node case improves to the optimum.

    Plan: one co-partitioned join+agg for k(v,c) (rows ≤ |E|); degree and
    volume relations are node- and community-dimensional; m2 is a 1-row
    broadcast. Scales with |E|.
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    e = (
        half.unionByName(half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()  # k-join + degree agg + m2 consume it
    )
    return _refine_sweep(e, labels)


def _refine_sweep(e_all: DataFrame, labels: DataFrame, parity: int | None = None) -> DataFrame:
    """One synchronous gain sweep over an already-SYMMETRIZED edge
    relation ``e_all(a, b, w)`` that may carry self rows (a == b): coarse
    graphs store each community's intra weight there. Degrees, volumes
    and m2 are summed over ALL rows (a node's self weight is part of its
    volume); the k(v, c) join excludes self rows (a self loop moves with
    its node, so its in_c term appears identically in every destination's
    gain — including staying — and cancels; the volume terms already
    carry it through deg). With no self rows and ``parity=None`` this is
    exactly the refine_partition sweep. ``parity`` (0/1) makes the sweep
    SEMI-synchronous: only nodes with id ≡ parity (mod 2) may move — the
    standard determinism-preserving fix for interacting simultaneous
    moves (two adjacent movers each computing gains against the old
    assignment can jointly lower Q; alternating halves cannot swap)."""
    memb = labels.select("id", F.col("community").alias("c0"))
    deg = e_all.groupBy(F.col("a").alias("id")).agg(F.sum("w").alias("deg"))
    vol = (
        memb.join(deg, "id")
        .groupBy(F.col("c0").alias("c"))
        .agg(F.sum("deg").alias("vol"))
    )
    m2 = e_all.agg(F.sum("w").alias("m2"))
    # k(v, c): v's total weight into each neighboring community
    # (self rows excluded — see docstring)
    k = (
        e_all.where(F.col("a") != F.col("b"))
        .join(memb.select(F.col("id").alias("b"), F.col("c0").alias("c")), "b")
        .groupBy(F.col("a").alias("id"), "c")
        .agg(F.sum("w").alias("k"))
    )
    # candidate set = neighboring communities ∪ the current community
    # (k = 0 when v has no intra-community neighbor)
    cand = (
        k.unionByName(
            memb.select("id", F.col("c0").alias("c"), F.lit(0).cast("long").alias("k"))
        )
        .groupBy("id", "c")
        .agg(F.max("k").alias("k"))
    )
    scored = (
        cand.join(memb, "id")
        .join(deg, "id")
        .join(F.broadcast(vol), "c")
        .crossJoin(F.broadcast(m2))
        .select(
            "id", "c", "c0",
            (
                F.col("m2") * F.col("k")
                - F.col("deg")
                * (F.col("vol") - F.when(F.col("c") == F.col("c0"), F.col("deg")).otherwise(F.lit(0)))
            ).alias("g"),
        )
    )
    # argmax by (g desc, c asc) — exact long struct max; move only on a
    # STRICT gain over staying (g_best > g_current)
    best = scored.groupBy("id").agg(
        F.max(F.struct(F.col("g"), (-F.col("c")).alias("nc"))).alias("m")
    ).select("id", (-F.col("m.nc")).alias("c_best"), F.col("m.g").alias("g_best"))
    stay = scored.where(F.col("c") == F.col("c0")).select(
        "id", F.col("g").alias("g_stay"), "c0"
    )
    move = F.col("g_best") > F.col("g_stay")
    if parity is not None:
        move = move & (F.pmod(F.col("id"), F.lit(2)) == F.lit(parity))
    return best.join(stay, "id").select(
        "id",
        F.when(move, F.col("c_best")).otherwise(F.col("c0")).alias("community"),
    )


def refine_partition_fixed_point(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_sweeps: int = 3,
) -> DataFrame:
    """Iterate refine_partition to a fixed point, bounded at
    ``max_sweeps`` synchronous sweeps (round-5 item: the reference's
    Louvain phase 1 iterates moves until none improves,
    analytics/helpers/networks.py:48-59). Early-exits when a sweep
    changes no assignment — a converged sweep is a deterministic no-op,
    so stopping early returns EXACTLY what running all ``max_sweeps``
    would, which keeps the result replayable by the SQL oracle's fixed
    ``sweeps``-deep unroll regardless of where convergence lands.

    Plan: the symmetrized edge relation is built and localCheckpointed
    ONCE before the loop (the edges never change between sweeps — only
    the assignment moves), so each sweep is the _refine_sweep
    single-exchange plan over a localCheckpointed assignment (the
    assignment is node-dimensional, the checkpoint bounds lineage growth
    across sweeps); the change probe is a limit-1 join count per sweep."""
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    e_all = (
        half.unionByName(
            half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()
    )
    cur = labels.select("id", "community")
    for _ in range(max_sweeps):
        nxt = _refine_sweep(e_all, cur).localCheckpoint()
        changed = (
            nxt.join(
                cur.select("id", F.col("community").alias("c_prev")), "id"
            )
            .where(F.col("community") != F.col("c_prev"))
            .limit(1)
            .count()
        )
        cur = nxt
        if changed == 0:
            break
    return cur


def coarsen_graph(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Louvain phase-2 graph contraction: map both endpoints of the
    symmetrized graph to their communities and sum weights. Intra-
    community weight lands on SELF rows (a == b) — _refine_sweep counts
    those in degrees/volumes but not in k, which is exactly the coarse
    graph Louvain's next level runs on (networks.py:48-59: sknetwork
    Louvain's aggregate step). One |E|-sized join + one (c_a, c_b) agg;
    output is community-dimensional."""
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    e = (
        half.unionByName(half.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    memb = labels.select("id", F.col("community").alias("c0"))
    return (
        e.join(memb.select(F.col("id").alias("a"), F.col("c0").alias("ca")), "a")
        .join(memb.select(F.col("id").alias("b"), F.col("c0").alias("cb")), "b")
        .groupBy(F.col("ca").alias("a"), F.col("cb").alias("b"))
        .agg(F.sum("w").alias("w"))
    )


def _qnum(ce_all: DataFrame, deg: DataFrame, labels: DataFrame, m2: int) -> int:
    """Exact-integer modularity numerator Q·m2² = m2·Σ_c in_c − Σ_c vol_c²
    over a symmetrized relation with self rows (in_c includes self weight —
    a community's intra edges live there after contraction). BIGINT-exact
    under the same documented bound as the gain score (total symmetrized
    weight < 2^31 ⇒ every term < 2^62). One scalar job: both aggregates
    are community-dimensional, crossJoined into a single row."""
    memb = labels.select("id", F.col("community").alias("c0"))
    intra = (
        ce_all.join(memb.select(F.col("id").alias("a"), F.col("c0").alias("ca")), "a")
        .join(memb.select(F.col("id").alias("b"), F.col("c0").alias("cb")), "b")
        .where(F.col("ca") == F.col("cb"))
        .agg(F.sum("w").alias("in_w"))
    )
    volsq = (
        memb.join(deg, "id")
        .groupBy("c0")
        .agg(F.sum("deg").alias("vol"))
        .agg(F.sum(F.col("vol") * F.col("vol")).alias("vv"))
    )
    row = intra.crossJoin(volsq).first()
    return m2 * int(row["in_w"] or 0) - int(row["vv"] or 0)


def louvain_communities(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    rounds: int = 4,
    max_sweeps: int = 3,
    coarse_sweeps: int = 3,
) -> DataFrame:
    """Full multi-level Louvain shape (round-5 item; reference
    analytics/helpers/networks.py:48-59 — sknetwork Louvain iterates
    local moves, CONTRACTS the graph, and repeats on the coarse graph):
    LPA seed → phase-1 synchronous sweeps to a bounded fixed point →
    phase-2 contraction (coarsen_graph) → gated semi-synchronous sweeps
    on the coarse graph from singleton communities (each super-node
    alone — merging two coarse nodes is merging whole fine communities,
    the move the node-level sweep cannot express) → unfold to
    (id, community).

    Two guards make the coarse stage monotone where the fine stage's
    synchronous caveat (see refine_partition) would bite — on the coarse
    graph EVERY node borders every move candidate, so interacting
    simultaneous moves are the common case, not the rare one:

      * sweep t only lets nodes with pmod(id, 2) == t % 2 move
        (parity alternation — adjacent movers of opposite parity can
        never jointly act on one sweep's stale assignment);
      * a sweep is ACCEPTED only if the exact-integer modularity
        numerator m2·Σin − Σvol² strictly increases (_qnum), else the
        previous assignment carries forward — so Q(result) ≥ Q(fine)
        unconditionally, since the singleton coarse partition IS the
        fine partition.

    Deterministic and exactly SQL-replayable (louvain_oracle_sql unrolls
    LPA rounds + fine sweeps + the contraction + gated coarse sweeps with
    the same parity and the same integer comparison); the early exit is
    no-op-equivalent to the fixed unroll: a rejected sweep leaves the
    assignment unchanged, so after BOTH parities reject consecutively
    every later sweep recomputes one of the same two rejected candidates.
    The integer gain score is unchanged on the coarse graph because a
    self loop's contribution cancels across destinations (_refine_sweep).

    Scale: contraction shrinks the graph to community-dimensional; every
    stage is the single-exchange sweep plan and the gate is one scalar
    job per sweep. One level of coarsening (the reference's Louvain
    usually converges in 1-2 levels; a deeper hierarchy would repeat
    coarsen+sweep on an already-tiny graph)."""
    fine = refine_partition_fixed_point(
        edges, label_propagation(edges, src=src, dst=dst, weight=weight, rounds=rounds),
        src=src, dst=dst, weight=weight, max_sweeps=max_sweeps,
    ).localCheckpoint()
    ce = coarsen_graph(edges, fine, src=src, dst=dst, weight=weight).localCheckpoint()
    deg = ce.groupBy(F.col("a").alias("id")).agg(F.sum("w").alias("deg")).localCheckpoint()
    m2 = int(ce.agg(F.sum("w")).first()[0] or 0)
    cur = ce.select(F.col("a").alias("id")).distinct().withColumn(
        "community", F.col("id")
    ).localCheckpoint()
    q_cur = _qnum(ce, deg, cur, m2)
    rejected = 0
    for t in range(1, coarse_sweeps + 1):
        nxt = _refine_sweep(ce, cur, parity=t % 2).localCheckpoint()
        q_nxt = _qnum(ce, deg, nxt, m2)
        if q_nxt > q_cur:
            cur, q_cur, rejected = nxt, q_nxt, 0
        else:
            rejected += 1
            if rejected >= 2:
                break
    return fine.select(
        "id", F.col("community").alias("cf")
    ).join(
        cur.select(F.col("id").alias("cf"), "community"), "cf"
    ).select("id", "community")


def refine_oracle_sql(edges_cte: str, rounds: int = 4, sweeps: int = 1) -> str:
    """DuckDB replay of label_propagation → ``sweeps`` refine_partition
    sweeps over an ``e(a, b, w)`` symmetrized edge CTE (the label
    assignment is the unrolled LPA subquery and each sweep is a generated
    CTE block, so the oracles can never disagree on the starting
    partition or the sweep count — the Spark side's early exit is a
    no-op-equivalence, see refine_partition_fixed_point)."""
    parts = _refine_oracle_parts(edges_cte, rounds, sweeps)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id, c0 AS community FROM lab{sweeps}"
    )


def _refine_oracle_parts(edges_cte: str, rounds: int, sweeps: int) -> list[str]:
    lpa = label_propagation_oracle_sql(edges_cte, rounds=rounds)
    # em / lab0 MATERIALIZED: each sweep references the edge relation
    # twice and the previous labels four times — DuckDB's default CTE
    # inlining would re-expand the whole edges subquery (and its parquet
    # scan) per reference, exhausting file handles at sweeps ≥ 2
    parts = [
        edges_cte,
        "em AS MATERIALIZED (SELECT a, b, w FROM e)",
        f"lab0 AS MATERIALIZED (SELECT id, community AS c0 FROM ({lpa}))",
        "ndeg AS MATERIALIZED (SELECT a AS id, CAST(SUM(w) AS BIGINT) AS deg"
        " FROM em GROUP BY a)",
        "twom AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM em)",
    ]
    for s in range(1, sweeps + 1):
        p = s - 1
        parts += [
            f"""vol{s} AS (SELECT lb.c0 AS c, CAST(SUM(d.deg) AS BIGINT) AS vol
        FROM lab{p} lb JOIN ndeg d USING (id) GROUP BY lb.c0)""",
            f"""kk{s} AS (SELECT em.a AS id, lb.c0 AS c, CAST(SUM(em.w) AS BIGINT) AS k
       FROM em JOIN lab{p} lb ON em.b = lb.id GROUP BY em.a, lb.c0)""",
            f"""cand{s} AS (SELECT id, c, MAX(k) AS k FROM (
  SELECT id, c, k FROM kk{s}
  UNION ALL SELECT id, c0 AS c, CAST(0 AS BIGINT) AS k FROM lab{p}
) GROUP BY id, c)""",
            f"""scored{s} AS (
  SELECT cd.id, cd.c, lb.c0,
    m2 * cd.k - ndeg.deg *
      (vl.vol - CASE WHEN cd.c = lb.c0 THEN ndeg.deg ELSE 0 END) AS g
  FROM cand{s} cd JOIN lab{p} lb USING (id) JOIN ndeg USING (id)
  JOIN vol{s} vl ON cd.c = vl.c CROSS JOIN twom)""",
            f"""best{s} AS (SELECT id, c AS c_best, g AS g_best FROM (
  SELECT id, c, g, ROW_NUMBER() OVER (PARTITION BY id ORDER BY g DESC, c ASC) AS rn
  FROM scored{s}) WHERE rn = 1)""",
            f"""stay{s} AS (SELECT id, g AS g_stay, c0 FROM scored{s} WHERE c = c0)""",
            f"""lab{s} AS MATERIALIZED (SELECT bs.id,
  CASE WHEN g_best > g_stay THEN c_best ELSE c0 END AS c0
FROM best{s} bs JOIN stay{s} USING (id))""",
        ]
    return parts


def _qnum_sql(lab: str) -> str:
    """Scalar subquery body: the exact-integer modularity numerator
    m2·Σin − Σvol² of coarse assignment relation ``{lab}(id, c0)`` over
    ``ce``/``cdeg``/``twom`` (mirrors _qnum; in includes self rows)."""
    return f"""(SELECT m2 FROM twom) * COALESCE((SELECT SUM(ce.w)
    FROM ce JOIN {lab} x ON ce.a = x.id JOIN {lab} y ON ce.b = y.id
    WHERE x.c0 = y.c0), 0)
  - COALESCE((SELECT SUM(vol * vol) FROM (
      SELECT CAST(SUM(d.deg) AS BIGINT) AS vol
      FROM {lab} lb JOIN cdeg d USING (id) GROUP BY lb.c0)), 0)"""


def louvain_oracle_sql(
    edges_cte: str, rounds: int = 4, sweeps: int = 3, coarse_sweeps: int = 3
) -> str:
    """DuckDB replay of louvain_communities over an ``e(a, b, w)``
    symmetrized edge CTE: the fine stage is _refine_oracle_parts' unroll
    (LPA rounds + phase-1 sweeps), then the phase-2 contraction (ce: both
    endpoints mapped to lab{sweeps}, intra weight on self rows) and
    ``coarse_sweeps`` GATED sweep blocks over it — degrees from ALL
    coarse rows, k from a <> b only, m2 reused (contraction preserves
    total weight), sweep t's movers parity-gated to pmod(id,2) = t % 2,
    and the whole sweep accepted only if the exact-integer modularity
    numerator (same _qnum formula, scalar subqueries) strictly rises —
    from singleton coarse labels, unfolded through the fine assignment.
    The Spark side's early exits are no-op-equivalent to this fixed
    unroll (see refine_partition_fixed_point / louvain_communities)."""
    S = sweeps
    parts = _refine_oracle_parts(edges_cte, rounds, sweeps)
    parts += [
        f"""ce AS MATERIALIZED (SELECT la.c0 AS a, lb.c0 AS b, CAST(SUM(em.w) AS BIGINT) AS w
  FROM em JOIN lab{S} la ON em.a = la.id JOIN lab{S} lb ON em.b = lb.id
  GROUP BY la.c0, lb.c0)""",
        "cdeg AS MATERIALIZED (SELECT a AS id, CAST(SUM(w) AS BIGINT) AS deg"
        " FROM ce GROUP BY a)",
        "clab0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS c0 FROM ce)",
    ]
    for t in range(1, coarse_sweeps + 1):
        p = t - 1
        parts += [
            f"""cvol{t} AS (SELECT lb.c0 AS c, CAST(SUM(d.deg) AS BIGINT) AS vol
        FROM clab{p} lb JOIN cdeg d USING (id) GROUP BY lb.c0)""",
            f"""ckk{t} AS (SELECT ce.a AS id, lb.c0 AS c, CAST(SUM(ce.w) AS BIGINT) AS k
       FROM ce JOIN clab{p} lb ON ce.b = lb.id WHERE ce.a <> ce.b
       GROUP BY ce.a, lb.c0)""",
            f"""ccand{t} AS (SELECT id, c, MAX(k) AS k FROM (
  SELECT id, c, k FROM ckk{t}
  UNION ALL SELECT id, c0 AS c, CAST(0 AS BIGINT) AS k FROM clab{p}
) GROUP BY id, c)""",
            f"""cscored{t} AS (
  SELECT cd.id, cd.c, lb.c0,
    m2 * cd.k - cdeg.deg *
      (vl.vol - CASE WHEN cd.c = lb.c0 THEN cdeg.deg ELSE 0 END) AS g
  FROM ccand{t} cd JOIN clab{p} lb USING (id) JOIN cdeg USING (id)
  JOIN cvol{t} vl ON cd.c = vl.c CROSS JOIN twom)""",
            f"""cbest{t} AS (SELECT id, c AS c_best, g AS g_best FROM (
  SELECT id, c, g, ROW_NUMBER() OVER (PARTITION BY id ORDER BY g DESC, c ASC) AS rn
  FROM cscored{t}) WHERE rn = 1)""",
            f"""cstay{t} AS (SELECT id, g AS g_stay, c0 FROM cscored{t} WHERE c = c0)""",
            # parity gate: ((id % 2) + 2) % 2 is DuckDB's remainder made
            # non-negative — matches Spark's F.pmod on negative ids
            f"""craw{t} AS MATERIALIZED (SELECT bs.id,
  CASE WHEN g_best > g_stay AND ((bs.id % 2) + 2) % 2 = {t % 2}
       THEN c_best ELSE c0 END AS c0
FROM cbest{t} bs JOIN cstay{t} USING (id))""",
            f"""cq{t} AS (SELECT {_qnum_sql(f"craw{t}")} AS qn)""",
            f"""cqp{t} AS (SELECT {_qnum_sql(f"clab{p}")} AS qn)""",
            f"""clab{t} AS MATERIALIZED (SELECT r.id,
  CASE WHEN (SELECT qn FROM cq{t}) > (SELECT qn FROM cqp{t})
       THEN r.c0 ELSE l.c0 END AS c0
FROM craw{t} r JOIN clab{p} l USING (id))""",
        ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT l.id, cl.c0 AS community
FROM lab{S} l JOIN clab{coarse_sweeps} cl ON l.c0 = cl.id"""
    )


def partition_modularity_oracle_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB replay of label_propagation → partition_modularity over an
    ``e(a, b, w)`` symmetrized edge CTE (same contract as the LPA oracle;
    the label assignment is the unrolled LPA subquery, so the two oracles
    can never disagree on the partition)."""
    lpa = label_propagation_oracle_sql(edges_cte, rounds=rounds)
    return f"""
WITH {edges_cte},
lab AS (SELECT * FROM ({lpa})),
ndeg AS (SELECT a AS id, SUM(w) AS deg FROM e GROUP BY a),
twom AS (SELECT SUM(w) AS m2 FROM e),
in_c AS (
  SELECT x.community AS community, SUM(e.w) AS in_w
  FROM e JOIN lab x ON e.a = x.id JOIN lab y ON e.b = y.id
  WHERE x.community = y.community GROUP BY x.community),
stats AS (
  SELECT m.community, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(d.deg) AS BIGINT) AS total_degree
  FROM lab m JOIN ndeg d USING (id) GROUP BY m.community)
SELECT s.community, n_members,
  CAST(COALESCE(i.in_w, 0) AS BIGINT) AS internal_weight,
  total_degree,
  CAST(COALESCE(i.in_w, 0) AS DOUBLE) / CAST(m2 AS DOUBLE)
    - (CAST(total_degree AS DOUBLE) / CAST(m2 AS DOUBLE))
      * (CAST(total_degree AS DOUBLE) / CAST(m2 AS DOUBLE)) AS q_term
FROM stats s LEFT JOIN in_c i USING (community) CROSS JOIN twom
"""


def label_propagation_oracle_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB SQL replaying label_propagation verbatim: ``edges_cte`` must
    define a relation ``e(a, b, w)`` already symmetrized; the rounds are
    unrolled as K join+window CTE pairs (generated, so the oracle can never
    drift from the configured round count)."""
    parts = [edges_cte, "l0 AS (SELECT DISTINCT a AS id, a AS label FROM e)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"v{r} AS (SELECT e.a AS id, l.label AS label, SUM(e.w) AS wt\n"
            f"  FROM e JOIN l{r - 1} l ON e.b = l.id GROUP BY e.a, l.label)"
        )
        parts.append(
            f"l{r} AS (SELECT id, label FROM (\n"
            f"  SELECT id, label, ROW_NUMBER() OVER (PARTITION BY id ORDER BY wt DESC, label ASC) AS rn\n"
            f"  FROM v{r}) WHERE rn = 1)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT id, label AS community FROM l{rounds}"
    )
