"""Shared connected-components kernel: alternating star contraction.

Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14) — alternating large-star / small-star rounds until the edge
set is a fixpoint star forest rooted at each component's minimum id.
Chosen over plain min-label propagation because propagation needs
O(diameter) rounds (>20 observed on long near-dup chains) while star
contraction converges in O(log^2 n) worst case (~6 rounds observed on
the fixtures) — and every round is two (groupBy-min + join) stages
over the EDGE relation only, so the iteration state is |E|-sized at
any corpus scale, never corpus-sized.

One kernel, two users: `dedup_connected_components` (shingle-Jaccard
text pair graph) and `dedup_semantic_cc` (mutual-kNN embedding graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Round cap (provably O(log^2 n) rounds worst case, ~6 observed on
#: the fixtures; the loop exits on star-forest fixpoint).
STAR_CC_MAX_ITERS = 40

#: Shuffle sizing for the per-round stages: edges per shuffle
#: partition. Each edge is two longs (~16 B + row overhead), so 250k
#: edges/partition keeps partitions ~MB-sized; the round cost is
#: per-stage scheduling constants times partition count, so a
#: 2k-edge fixture graph runs at 1 partition (measured 2x faster than
#: a fixed 8) while a 1e9-edge production graph gets ~4000, capped.
STAR_CC_EDGES_PER_PARTITION = 250_000
STAR_CC_MAX_PARTITIONS = 2048


def large_star(E: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Kiveris et al. large-star: every strictly-larger neighbor of u
    re-links to min(N(u) + {u}). Preserves connectivity; shrinks tall
    structures toward minima.

    No closing distinct: star relinking is idempotent on duplicate
    edges (dups only inflate the intermediate by a bounded factor),
    and small_star's closing distinct dedups the round's output — one
    fewer shuffle per round on the iteration hot path.

    ``n_parts`` sizes the round's shuffles PER-PLAN via an explicit
    repartition(n, u): hash(u, n) satisfies both the groupBy's and the
    join's clustering requirement, so the single repartition Exchange
    is shared by both consumers (ReuseExchange) — one shuffle of sym
    instead of two, and no session-global shuffle.partitions mutation
    (r10 advisor: the save/set/restore pattern is not reentrant and
    leaks the reduced count into concurrent queries)."""
    sym = E.unionAll(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if n_parts is not None:
        sym = sym.repartition(n_parts, "u")
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def small_star(E: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Kiveris et al. small-star: orient edges toward the larger node,
    re-link each node's smaller neighbors (and itself) to their
    minimum.

    ``n_parts`` sizes the shuffles per-plan (see large_star): one
    repartition(n, u) feeds the groupBy AND the join exchange-free,
    and the closing distinct runs as dropDuplicates over an explicit
    (u, v) repartition so no stage inherits the session default."""
    o = E.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    if n_parts is not None:
        o = o.repartition(n_parts, "u")
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    em = o.join(m, "u")
    out = em.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    ).unionAll(m.select(F.col("u"), F.col("m").alias("v")))
    out = out.filter(F.col("u") != F.col("v"))
    if n_parts is not None:
        return out.repartition(n_parts, "u", "v").dropDuplicates()
    return out.distinct()


def _driver_union_find_labels(
    spark: SparkSession, E: DataFrame, nodes: DataFrame
) -> DataFrame:
    """Label a SMALL (pre-counted <= STAR_CC_EDGES_PER_PARTITION) edge
    relation with path-compressed union-find on the driver; lbl = MIN
    member id, exactly the star-contraction fixpoint. Nodes touching
    no edge label themselves via a left join against the broadcast
    label relation (at most 2|E| rows)."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in E.collect():
        u, v = row[0], row[1]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[rv] = ru
    roots: dict = {}
    for x in parent:
        r = find(x)
        if r not in roots or x < roots[r]:
            roots[r] = x  # min member id per component
    id_type = E.schema["u"].dataType
    lbl_df = spark.createDataFrame(
        [(x, roots[find(x)]) for x in parent],
        T.StructType(
            [T.StructField("n", id_type), T.StructField("lbl", id_type)]
        ),
    )
    return nodes.join(F.broadcast(lbl_df), "n", "left").select(
        "n", F.coalesce("lbl", F.col("n")).alias("lbl")
    )


def star_contraction_labels(
    spark: SparkSession,
    E: DataFrame,
    nodes: DataFrame,
    max_iters: int = STAR_CC_MAX_ITERS,
) -> DataFrame:
    """Run the alternation to fixpoint and return (n, lbl) — one row
    per node of ``nodes``, lbl = MIN id of its connected component
    (isolated nodes label themselves).

    ``E`` is the undirected edge relation with columns (u, v);
    ``nodes`` the single-column (n) vertex relation to label (must
    cover every edge endpoint). The kernel sizes its OWN shuffle
    partitions from the materialized edge count (|E| /
    STAR_CC_EDGES_PER_PARTITION, clamped) — the per-round stages are
    edge-relation-sized, and a fixed caller-side setting is either too
    many partitions for a fixture graph (scheduling constants
    dominate) or too few for a 1e9-edge production graph. The sizing
    is applied PER-PLAN (explicit repartition inside large/small star,
    never a session-global shuffle.partitions mutation — r10 advisor:
    that pattern leaked the reduced count into concurrent queries and
    overlapping save/restore pairs could clobber the saved value).
    Per-round localCheckpoint truncates lineage; one semi-join
    emptiness probe per round detects the star-forest fixpoint (no
    edge's parent is itself a child), and once a star forest, one more
    alternation is a no-op, so exiting there returns the fixpoint
    itself."""
    E = E.select("u", "v").localCheckpoint(eager=True)
    nodes = nodes.select("n").localCheckpoint(eager=True)
    n_edges = E.count()
    if n_edges <= STAR_CC_EDGES_PER_PARTITION:
        # Bounded driver fast path: a graph this size would run every
        # contraction round in ONE task anyway (the partition sizing
        # below floors at 1), so ~6 rounds x 4 stages of scheduling
        # constants buy nothing — same discipline as the IVF-codebook /
        # CMS-sketch bounded collects: the edge relation is <= one
        # shuffle partition (~4 MB of long pairs) by the SAME constant
        # that sizes the distributed rounds, union-find labels it in
        # O(|E| alpha) driver-side, and the label relation broadcasts
        # back. The distributed alternation below is the 100 TB path.
        return _driver_union_find_labels(spark, E, nodes)
    target = max(
        1,
        min(
            STAR_CC_MAX_PARTITIONS,
            -(-n_edges // STAR_CC_EDGES_PER_PARTITION),
        ),
    )
    converged = False
    for _ in range(max_iters):
        E = small_star(large_star(E, target), target).localCheckpoint(
            eager=True
        )
        nonstar = E.join(
            E.select(F.col("u").alias("p")).repartition(target, "p").distinct(),
            E.v == F.col("p"),
            "leftSemi",
        )
        if nonstar.isEmpty():
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge in {max_iters} rounds"
        )
    # fixpoint E is a star forest: (child, root); every node that is
    # not a child (roots AND isolated nodes) labels itself
    child = E.select(F.col("u").alias("n"), F.col("v").alias("lbl"))
    selfl = nodes.join(
        E.select(F.col("u").alias("n")), "n", "leftAnti"
    ).select("n", F.col("n").alias("lbl"))
    return child.unionAll(selfl)
