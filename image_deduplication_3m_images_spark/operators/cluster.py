"""Connected components over verified duplicate pairs — distributed union-find.

Reference analog: in-memory path-compressed union-find + four BFS variants
(``/root/reference/modules/deduplication.py:284-346,454-481,1258-1283``;
``memory_efficient_deduplication.py:531-582`` — the reference has ~5 copies;
we have exactly one implementation reused by every caller, SURVEY.md §2.4 G1/G2).

Algorithm: iterative minimum-label propagation on DataFrames.  Each node's
label is the min id seen in its neighborhood; iterate until fixpoint.
Converges in O(graph diameter) rounds — LSH duplicate components are
overwhelmingly tiny/star-shaped (the reference observed mostly singletons,
``OPTIMIZATION_SUMMARY.md:93-97``), so 3-5 rounds in practice; a pointer-
jumping step (label -> label-of-label) halves long chains so worst-case
rounds are O(log d).  Every iteration breaks lineage with a checkpoint —
without it the plan doubles per round and the job dies at scale; pass
``checkpoint_dir`` for RELIABLE (executor-loss-tolerant) checkpoints on a
real cluster, default localCheckpoint for local/dev speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges (id_a, id_b) -> assignments (id, cluster_id).

    cluster_id = min node id in the component — deterministic under any
    partitioning (FIXTURES.md hard part #2: never partition-dependent values).
    Only nodes that appear in an edge are returned; callers re-attach
    singletons with a left join (reference analog: singleton re-merge,
    ``memory_efficient_deduplication.py:79-99``).

    ``checkpoint_dir``: when set, per-iteration lineage breaks use RELIABLE
    checkpoints written under it (survives executor loss — required on a
    real cluster, where a lost executor mid-loop would otherwise kill the
    job because localCheckpoint blocks live only on executors).  When None
    (local/dev), the cheaper localCheckpoint is used.  The caller owns
    cleanup of the directory once the result is materialized downstream.
    """
    if checkpoint_dir:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:

        def ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    sym = ckpt(
        edges.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        ).unionByName(
            edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
    )

    # neighbor-min per node, including self -> initial labels.  This first
    # aggregation already resolves every star/bucket component (the common
    # case by far); iterations below only chase multi-hop chains.
    labels = ckpt(
        sym.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("cluster_id"))
        .withColumnRenamed("src", "id")
    )

    for _ in range(max_iterations):
        # hash-min + pointer jumping in ONE plan per iteration:
        #   label(v) <- min(label(v), min_{u in N(v)} label(u), label(label(v)))
        # The jump term (label-of-label) gives O(log diameter) convergence on
        # chains; `labels` is checkpointed, so referencing it three times
        # scans materialized data instead of recomputing.  One checkpoint +
        # one action (the convergence probe) per iteration.
        neigh = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("neigh_min"))
            .withColumnRenamed("src", "id")
        )
        jump = labels.select(
            F.col("id").alias("cluster_id"), F.col("cluster_id").alias("jump_min")
        )
        updated = ckpt(
            labels.join(neigh, "id", "left")
            .join(jump, "cluster_id", "left")
            .select(
                "id",
                F.col("cluster_id").alias("old_cluster"),
                F.least(
                    F.col("cluster_id"), F.col("neigh_min"), F.col("jump_min")
                ).alias("cluster_id"),
            )
        )
        labels = updated.select("id", "cluster_id")
        if updated.where(F.col("cluster_id") < F.col("old_cluster")).limit(1).count() == 0:
            break

    return labels


def attach_singletons(
    assignments: DataFrame, all_ids: DataFrame, id_col: str
) -> DataFrame:
    """Every input id appears exactly once in the output (row-preservation
    invariant, FIXTURES.md §4); ids without edges become their own cluster.
    """
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(assignments, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster_id", "id").alias("cluster_id"),
        )
    )
