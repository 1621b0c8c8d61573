"""Connected components over a pair list — duplicate-cluster formation.

Near-dup detection produces PAIRS; deduplication needs CLUSTERS (every
doc transitively connected to a canonical survivor).  This is connected
components, computed by iterative min-label propagation expressed in
DataFrame operations:

    label(n) ← min(label(n), min over neighbors m of label(m))

repeated until no label changes.  Each iteration is one join + one
aggregation (shuffle on node id); convergence takes O(diameter)
iterations — near-dup graphs are unions of small cliques, so 2–3
rounds in practice.  This is the dataframe-native form of the
small-star/large-star technique (cf. "Connected Components in
MapReduce and Beyond", SoCC 2014); for billion-edge graphs the same
loop runs unchanged, with checkpointing every few rounds to truncate
lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.cache import track


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (node, component) where component = min node id reachable.
    Deterministic; isolated nodes (absent from edges) are the caller's
    concern — a left join against the corpus adds singletons.

    Every ``checkpoint_every`` rounds the label relation is
    localCheckpoint'ed: persist() alone bounds RECOMPUTATION but the
    logical plan still deepens by three operators per round, and past
    ~15 rounds (high-diameter graphs — duplicate CHAINS, not cliques)
    Catalyst analysis time dominates the actual shuffle work.
    Checkpointing truncates lineage to the materialized rows.  Near-dup
    clique graphs converge in 2–3 rounds and never hit this; on a real
    cluster swap localCheckpoint for a reliable ``checkpoint()`` dir so
    executor loss cannot orphan the truncated lineage.
    """
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    both = both.persist()

    labels = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )

    converged = False
    for it in range(max_iterations):
        neighbor_min = (
            both.join(labels, both.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
        if (it + 1) % checkpoint_every == 0:
            truncated = labels.localCheckpoint()  # also materializes
            labels.unpersist()
            labels = truncated.persist()
    both.unpersist()
    if not converged:
        # Exhausting the budget means the labels are WRONG (a component
        # with diameter > max_iterations still carries several labels),
        # and a dedup pipeline would then keep multiple "canonical" docs
        # from one duplicate cluster.  Silent truncation is corruption;
        # fail loudly and let the caller raise the budget.
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the budget); raise "
            "max_iterations — labels at this point would be incorrect"
        )
    # The final labels handle stays persisted while the caller consumes
    # it; track() hands it to the registry's deferred-release scope so it
    # is unpersisted when the next query builds.
    return track(labels)
