"""Distributed connected components over an edge list.

The iterative core shared by ``label`` (voxel adjacency, measure.py) and the
generic graph query surface: alternating neighbor-min propagation with
pointer-jumping (path halving), the large-star/small-star family that
converges in O(log diameter) rounds — a single-node union-find (what the
reference delegates to cc3d, ``measure.py:114-119``) cannot distribute, this
can.  Convergence is detected with a monotone ``sum(comp)`` probe: component
ids only ever decrease, so an unchanged global sum is a fixpoint.  The probe
is an ``observe()`` metric collected DURING the round's checkpoint job — no
separate aggregate job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["connected_components_df"]


def connected_components_df(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    partition_cols: list[str] | None = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components; returns ``(*partition_cols, node, comp)``.

    ``edges``: ``(*partition_cols, src, dst)`` undirected (symmetrized here).
    ``nodes``: optional ``(*partition_cols, node)`` to include isolated nodes.
    ``comp`` is the minimum node id of the component.
    """
    parts = list(partition_cols or [])
    e = edges.select(*parts, "src", "dst")
    # Duplicate/parallel edges are harmless under min-aggregation — no
    # dedup shuffle needed before the loop.
    e = e.unionAll(
        e.select(*parts, F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    if nodes is None:
        nodes = (
            e.select(*parts, F.col("src").alias("node"))
            .unionAll(e.select(*parts, F.col("dst").alias("node")))
            .distinct()
        )
    obs0 = Observation()
    comp = (
        nodes.select(*parts, "node", F.col("node").alias("comp"))
        .observe(obs0, F.sum("comp").alias("s"))
        .localCheckpoint()
    )
    prev_sum = obs0.get["s"]

    for _ in range(max_iterations):
        nbr = (
            e.join(
                comp.select(*parts, F.col("node").alias("src"), "comp"),
                on=[*parts, "src"],
            )
            .groupBy(*parts, F.col("dst").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_comp = comp.join(nbr, on=[*parts, "node"], how="left").select(
            *parts,
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
        )
        # Pointer jumping (path halving): comp(v) <- comp(comp(v)), twice.
        for _ in range(2):
            parents = new_comp.select(
                *parts, F.col("node").alias("comp"), F.col("comp").alias("grand")
            )
            new_comp = new_comp.join(parents, on=[*parts, "comp"], how="left").select(
                *parts,
                "node",
                F.coalesce(F.col("grand"), F.col("comp")).alias("comp"),
            )
        obs = Observation()
        new_comp = new_comp.observe(obs, F.sum("comp").alias("s")).localCheckpoint()
        new_sum = obs.get["s"]
        comp = new_comp
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return comp
