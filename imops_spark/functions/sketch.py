"""Mergeable sketch aggregates: the 100 TB answer to distinct counts,
quantiles, and set cardinalities that exact operators can't afford.

Exact COUNT(DISTINCT x) shuffles every distinct value; exact percentiles
sort (or hold) whole columns.  At cluster scale the standard substitution is
a MERGEABLE sketch: each partition/day/shard aggregates into a small binary
summary, summaries union associatively, and the estimate reads off the
merged summary — one pass, bounded memory, reusable partials.  Spark ships
the Apache DataSketches family natively (JVM-side aggregates, no UDFs):

- HLL (``hll_sketch_agg``/``hll_union_agg``): distinct counts, ~1.6%/sqrt-k
  relative error;
- Theta (``theta_sketch_agg`` + union/intersection/difference): distinct
  counts UNDER SET ALGEBRA — "how many doc ids appear in shard A but not
  B" without materializing either set;
- KLL (``kll_sketch_agg_double`` + merge/get_quantile): rank/quantile
  estimates with a priori error bounds.

Everything here is a thin, typed wrapper that (a) names the pipeline
operation rather than the sketch, and (b) keeps the two-phase
partial-then-merge shape explicit so callers can persist the partial
sketches (e.g. one row per day) and re-merge them later — the
pre-aggregation pattern the exact operators can't offer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch_by",
    "merge_distinct_sketches",
    "approx_distinct_df",
    "theta_set_cardinalities",
    "quantile_sketch_by",
    "merge_quantile_sketches",
]


def distinct_sketch_by(
    df: DataFrame, keys: Sequence[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketch of distinct ``col`` values:
    ``(*keys, sketch binary, n_rows)``.

    This is the PARTIAL: persist one row per (day, shard, ...) and merge
    later with :func:`merge_distinct_sketches` — re-aggregating a year of
    daily partials touches 365 small rows, not the raw corpus.
    """
    keys = list(keys)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("distinct_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_distinct_sketches(
    partials: DataFrame, keys: Sequence[str] = (), allow_different_lg_k: bool = False
) -> DataFrame:
    """Merge HLL partials (union is associative and lossless at equal
    ``lg_k``) and read off the estimate: ``(*keys, approx_distinct)``."""
    keys = list(keys)
    merged = F.hll_union_agg("distinct_sketch", F.lit(bool(allow_different_lg_k)))
    est = F.hll_sketch_estimate(merged).alias("approx_distinct")
    if keys:
        return partials.groupBy(*keys).agg(est, F.sum("n_rows").alias("n_rows"))
    return partials.agg(est, F.sum("n_rows").alias("n_rows"))


def approx_distinct_df(df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05) -> DataFrame:
    """One-shot per-group approximate distinct count
    (``approx_count_distinct``, HLL++ under the hood): ``(*keys,
    approx_distinct)``.  Use the sketch_by/merge pair instead when the
    partials should be persisted."""
    return df.groupBy(*list(keys)).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct")
    )


def theta_set_cardinalities(
    a: DataFrame, b: DataFrame, col: str, lg_k: int = 14
) -> DataFrame:
    """Distinct-set algebra between two frames' ``col`` values via Theta
    sketches: one row ``(n_a, n_b, n_union, n_intersection, n_only_a)``.

    Neither side's distinct set ever materializes — each frame collapses to
    one small sketch (a map-side-combined aggregate), and union /
    intersection / difference run on the two summaries.  The question "how
    many training docs of shard A does shard B already cover" costs two
    scans and O(k) memory at any corpus size.
    """
    sa = a.agg(F.theta_sketch_agg(col, F.lit(lg_k)).alias("s")).withColumn(
        "side", F.lit(1)
    )
    sb = b.agg(F.theta_sketch_agg(col, F.lit(lg_k)).alias("s")).withColumn(
        "side", F.lit(2)
    )
    both = sa.unionByName(sb)
    pivoted = both.agg(
        F.max(F.when(F.col("side") == 1, F.col("s"))).alias("sa"),
        F.max(F.when(F.col("side") == 2, F.col("s"))).alias("sb"),
    )
    rnd = lambda c: F.round(c).cast("long")
    return pivoted.select(
        rnd(F.theta_sketch_estimate("sa")).alias("n_a"),
        rnd(F.theta_sketch_estimate("sb")).alias("n_b"),
        rnd(F.theta_sketch_estimate(F.theta_union("sa", "sb"))).alias("n_union"),
        rnd(
            F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
        ).alias("n_intersection"),
        rnd(F.theta_sketch_estimate(F.theta_difference("sa", "sb"))).alias("n_only_a"),
    )


def quantile_sketch_by(
    df: DataFrame, keys: Sequence[str], col: str, k: int = 2048
) -> DataFrame:
    """Per-group KLL quantile sketch over a double column: the persistable
    PARTIAL for rank/quantile queries (``(*keys, q_sketch)``)."""
    return df.groupBy(*list(keys)).agg(
        F.kll_sketch_agg_double(F.col(col).cast("double"), F.lit(k)).alias("q_sketch")
    )


def merge_quantile_sketches(
    partials: DataFrame,
    probs: Sequence[float],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Merge KLL partials and evaluate quantiles:
    ``(*keys, q_<prob> ...)``."""
    keys = list(keys)
    # kll_sketch_merge_double is a two-sketch scalar (no union aggregate
    # exists); fold the group's partials with a JVM-side higher-order
    # aggregate — partial counts are tiny (one per shard/day), so the
    # collect_list is bounded by design, not by data size
    lst = F.collect_list("q_sketch")
    merged = F.aggregate(
        F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    if keys:
        base = partials.groupBy(*keys).agg(merged.alias("m"))
    else:
        base = partials.agg(merged.alias("m"))
    qs = [
        F.kll_sketch_get_quantile_double("m", F.lit(float(p))).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probs
    ]
    return base.select(*keys, *qs)
