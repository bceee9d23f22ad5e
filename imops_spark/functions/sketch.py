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
    "freq_sketch_by",
    "cms_merge",
    "cms_estimate",
    "top_items_df",
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


def freq_sketch_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Per-group Count-Min frequency sketch of ``col``: ``(*keys,
    freq_sketch, n_rows)`` — point-frequency estimates ("how often did
    THIS url/token/user appear") in ``O(1/eps)`` memory per group with a
    one-sided error: estimates NEVER undercount, and overcount by at most
    ``eps * n_rows`` with probability ``confidence``.

    This is the persistable PARTIAL (one row per day/shard); fold partials
    with :func:`cms_merge` and read estimates with :func:`cms_estimate`.
    Merging requires identical ``eps``/``confidence``/``seed`` — Spark's
    ``count_min_sketch`` aggregate is JVM-native and map-side combined, so
    the exchange carries one ``~(2/eps) * depth * 8``-byte blob per
    upstream partition, never the raw rows.
    """
    keys = list(keys)
    agg = [
        F.expr(
            f"count_min_sketch({col}, {float(eps)}d, {float(confidence)}d, {int(seed)})"
        ).alias("freq_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if keys:
        return df.groupBy(*keys).agg(*agg)
    return df.agg(*agg)


def _cms_read(spark, blob: bytes):
    return spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(blob))


def cms_merge(spark, sketches: Sequence[bytes]) -> bytes:
    """Merge Count-Min partials (elementwise table addition — associative
    and EXACT, so merged estimates equal a single-pass sketch over the
    union).  Driver-side over the collected partial blobs: the partial
    count is bounded by design (one per shard/day), not by data size —
    the same contract as persisting any sketch family's partials.  Raises
    on incompatible parameters (different eps/confidence/seed)."""
    if not sketches:
        raise ValueError("no sketches to merge")
    acc = _cms_read(spark, sketches[0])
    for blob in sketches[1:]:
        acc.mergeInPlace(_cms_read(spark, blob))
    out = spark._jvm.java.io.ByteArrayOutputStream()
    acc.writeTo(out)
    return bytes(out.toByteArray())


def cms_estimate(spark, sketch: bytes, items: Sequence) -> list[int]:
    """Point-frequency estimates for ``items`` from a serialized Count-Min
    sketch.  Estimates are upper bounds: ``true <= est <= true +
    eps * total`` w.p. ``confidence``.  Items must match the sketched
    column's type family (integral types hash identically via their long
    value; strings hash their UTF-8 bytes)."""
    cms = _cms_read(spark, sketch)
    return [int(cms.estimateCount(it)) for it in items]


def top_items_df(
    df: DataFrame, col: str, k: int, max_tracked: int | None = None, by: Sequence[str] = ()
) -> DataFrame:
    """Heavy hitters: the ``k`` most frequent ``col`` values (per ``by``
    group), ``(*by, item, est_count)`` via the native ``approx_top_k``
    aggregate — a bounded-memory frequent-items summary (tracks
    ``max_tracked`` candidates, default 10000) that map-side combines, so
    the exchange carries summaries, never value counts.

    EXACTNESS REGIME: counts are exact whenever the number of distinct
    values is <= ``max_tracked`` (nothing is ever evicted); beyond that,
    tail counts can be over-estimated and a near-boundary item can
    displace another — the standard frequent-items trade.  Ties at rank k
    are broken by the aggregate's internal order; re-sort on
    ``(est_count DESC, item)`` like the output here does before treating
    the cut as deterministic."""
    by = list(by)
    if int(k) <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if max_tracked is not None:
        max_tracked = int(max_tracked)
        # `if max_tracked` would silently ignore an explicit 0 and fall
        # back to the 10000 default; validate instead of splicing garbage
        # into the generated SQL
        if max_tracked < int(k):
            raise ValueError(
                f"max_tracked ({max_tracked}) must be >= k ({k})"
            )
    args = f"{col}, {int(k)}" + (
        f", {max_tracked}" if max_tracked is not None else ""
    )
    agg = F.expr(f"approx_top_k({args})").alias("tk")
    base = df.groupBy(*by).agg(agg) if by else df.agg(agg)
    return (
        base.select(*by, F.explode("tk").alias("e"))
        .select(*by, F.col("e.item").alias("item"), F.col("e.count").alias("est_count"))
        .orderBy(*by, F.col("est_count").desc(), "item")
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
