"""Distributed connected components over an edge list.

Two-level design (the contraction family used by large-scale CC systems —
local contraction + small-kernel solve, cf. the large-star/small-star and
FastSV literature):

1. **Per-partition contraction** (``mapInPandas``): every Spark partition
   runs a vectorized numpy min-propagation over its local edges and emits
   one *star* edge ``(local_root, member)`` per distinct node it saw.  The
   union of the stars across partitions has exactly the original graph's
   connectivity, and its size is bounded by the number of distinct
   (partition, node) pairs — typically orders of magnitude below the edge
   count.  This pass is shuffle-free and reads the edges exactly once.
2. **Kernel solve**: if the contracted graph fits under
   ``driver_solve_threshold`` rows it is solved on the driver with the same
   vectorized numpy routine (one collect, zero iterative Spark jobs);
   otherwise the iterative distributed fixpoint below runs on the contracted
   stars — strictly no more data than the original edges, usually far less.

The distributed fixpoint is alternating neighbor-min propagation with
pointer-jumping (path halving), converging in O(log diameter) rounds — a
single-node union-find (what the reference delegates to cc3d,
``measure.py:114-119``) cannot distribute, this can.  Convergence is
detected with a monotone ``sum(comp)`` probe: component ids only ever
decrease, so an unchanged global sum is a fixpoint.  The probe is an
``observe()`` metric collected DURING the round's checkpoint job — no
separate aggregate job per round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["connected_components_df"]


def _cc_numpy(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized CC on an in-memory edge list.

    Returns ``(nodes, comp)``: the sorted distinct node ids and, aligned,
    the minimum node id of each node's component.  Min-propagation with
    pointer jumping over index arrays — no Python-level loop over edges,
    O(log diameter) vectorized passes.
    """
    nodes, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = idx[: len(src)], idx[len(src) :]
    comp = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = comp.copy()
        # neighbor min (both directions: the edge list is directed as given)
        np.minimum.at(m, si, comp[di])
        np.minimum.at(m, di, comp[si])
        # pointer jumping: comp(v) <- comp(comp(v)), twice
        m = np.minimum(m, m[m])
        m = np.minimum(m, m[m])
        if np.array_equal(m, comp):
            break
        comp = m
    # np.unique sorts, so index order == id order: min index <=> min id.
    return nodes, nodes[comp]


def _contract_stars(e: DataFrame, parts: list[str]) -> DataFrame:
    """Phase 1: per-Spark-partition CC -> star edges ``(root, member)``.

    Keyed by ``parts`` within the partition (edges of different groups never
    union).  Assumes a partition's edges fit in executor memory — the same
    contract as any aggregation task.
    """
    schema = e.schema

    def contract(batches):
        chunks = [p for p in batches if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if parts:
            grouped = pdf.groupby(parts, sort=False)
        else:
            grouped = [((), pdf)]
        out = []
        for key, g in grouped:
            if not isinstance(key, tuple):
                key = (key,)
            nodes, comp = _cc_numpy(
                g["src"].to_numpy(np.int64), g["dst"].to_numpy(np.int64)
            )
            star = pd.DataFrame({"src": comp, "dst": nodes})
            for c, v in zip(parts, key):
                star[c] = v
            out.append(star[[*parts, "src", "dst"]])
        yield pd.concat(out, ignore_index=True)

    return e.mapInPandas(contract, schema=schema)


def _fixpoint(
    e: DataFrame, nodes: DataFrame, parts: list[str], max_iterations: int
) -> DataFrame:
    """Iterative distributed CC (neighbor-min + pointer jumping).

    Each round runs two bounded jobs: the neighbor-min step is checkpointed
    BEFORE the pointer jump, so the jump's self-join reads two scans of the
    same materialized RDD.  Self-joining the un-checkpointed multi-join plan
    instead looks harmless (the logical plan stays constant-size) but was
    measured to blow up per-round wall time ~8x/round after a handful of
    rounds — the attribute-deduplicated self-join copies defeat stage reuse
    and the recomputation compounds across rounds.
    """
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
        mid = (
            comp.join(nbr, on=[*parts, "node"], how="left")
            .select(
                *parts,
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        # Pointer jumping (path halving): comp(v) <- comp(comp(v)).
        parents = mid.select(
            *parts, F.col("node").alias("comp"), F.col("comp").alias("grand")
        )
        obs = Observation()
        new_comp = (
            mid.join(parents, on=[*parts, "comp"], how="left")
            .select(
                *parts,
                "node",
                F.coalesce(F.col("grand"), F.col("comp")).alias("comp"),
            )
            .observe(obs, F.sum("comp").alias("s"))
            .localCheckpoint()
        )
        new_sum = obs.get["s"]
        comp = new_comp
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return comp


def connected_components_df(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    partition_cols: list[str] | None = None,
    max_iterations: int = 50,
    driver_solve_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components; returns ``(*partition_cols, node, comp)``.

    ``edges``: ``(*partition_cols, src, dst)`` undirected (symmetrization is
    implicit — both phases propagate minima along both edge directions).
    ``nodes``: optional ``(*partition_cols, node)`` to include isolated nodes.
    ``comp`` is the minimum node id of the component.

    ``driver_solve_threshold``: if the contracted star graph has at most this
    many rows it is solved on the driver (one collect of ~16 bytes/row);
    above it, the distributed fixpoint runs on the contracted graph.  The
    size probe is fused into the collect (``limit(threshold+1)``) — the
    common small case pays ONE job instead of count-then-collect, and the
    large case's probe pull is bounded at threshold rows (~32 MB at the
    default) before falling through to the fixpoint.
    Duplicate/parallel edges are harmless under min-aggregation — no dedup
    shuffle is ever needed.
    """
    parts = list(partition_cols or [])
    e = edges.select(*parts, "src", "dst")

    stars = _contract_stars(e, parts).localCheckpoint()
    # Fused size-probe + collect: pull threshold+1 rows — if the limit did
    # not truncate we already hold the WHOLE contracted graph and the
    # count job is redundant (one job instead of two on the checkpointed
    # frame; at cluster scale a job is a scheduling round-trip either way)
    pdf = stars.limit(driver_solve_threshold + 1).toPandas()

    if len(pdf) <= driver_solve_threshold:
        if len(pdf) == 0:
            mapping = None
        else:
            if parts:
                grouped = pdf.groupby(parts, sort=False)
            else:
                grouped = [((), pdf)]
            out = []
            for key, g in grouped:
                if not isinstance(key, tuple):
                    key = (key,)
                ns, comp = _cc_numpy(
                    g["src"].to_numpy(np.int64), g["dst"].to_numpy(np.int64)
                )
                m = pd.DataFrame({"node": ns, "comp": comp})
                for c, v in zip(parts, key):
                    m[c] = v
                out.append(m[[*parts, "node", "comp"]])
            mpdf = pd.concat(out, ignore_index=True)
            mapping = stars.sparkSession.createDataFrame(mpdf)
        if nodes is None:
            if mapping is None:
                # no edges, no node list: empty result with the right schema
                return stars.select(*parts, F.col("src").alias("node"), F.col("dst").alias("comp"))
            return mapping
        if mapping is None:
            return nodes.select(*parts, "node", F.col("node").alias("comp"))
        # isolated nodes keep comp = node
        return nodes.join(F.broadcast(mapping), on=[*parts, "node"], how="left").select(
            *parts, "node", F.coalesce("comp", "node").alias("comp")
        )

    # Distributed fixpoint on the contracted graph (symmetrized).
    st = stars.unionAll(
        stars.select(*parts, F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    if nodes is None:
        nodes = (
            st.select(*parts, F.col("src").alias("node"))
            .unionAll(st.select(*parts, F.col("dst").alias("node")))
            .distinct()
        )
    return _fixpoint(st, nodes, parts, max_iterations)
