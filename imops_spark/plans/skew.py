"""Skew mitigation for shuffle joins: explicit key salting.

AQE's skew-join splitting (regression-tested in tests/test_sources.py)
handles most hot keys at runtime, but it only works for sort-merge joins
AFTER a shuffle materializes — it cannot help when AQE is disabled, when the
build side is already partitioned (bucketed scans), or for the first shuffle
of a streaming-static join.  Explicit salting is the planner-level fallback:
split every hot key into ``num_salts`` synthetic sub-keys so no single
reducer owns a whole hot key's rows.

Standard hybrid recipe (the one a 100 TB fact-dim join uses):

1. ``hot_keys_df`` finds keys whose row count exceeds a threshold (one cheap
   aggregate over the fact table — at scale, run it on a sample).
2. ``salted_join`` salts ONLY those keys: hot fact rows get a deterministic
   salt in ``[0, num_salts)``, the dim side replicates its hot rows
   ``num_salts``x (an explode of a literal sequence — dim rows are small),
   and cold keys take the plain join path.  The union of the two joins is
   exactly the plain join's result, row for row.

Only the dim side replicates, and only for hot keys — the fact table is
never duplicated, so the extra shuffle volume is ``num_salts * |hot dim
rows|``, i.e. negligible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hot_keys_df", "salted_join"]

_SALT = "__skew_salt"


def hot_keys_df(df: DataFrame, on: Sequence[str], min_rows: int) -> DataFrame:
    """Keys of ``df`` with at least ``min_rows`` rows: ``(*on, n_rows)``.

    One map-side-combined aggregate; the result is by construction tiny
    (at most ``|df| / min_rows`` rows) and safe to broadcast.
    """
    on = list(on)
    return df.groupBy(*on).agg(F.count(F.lit(1)).alias("n_rows")).filter(
        F.col("n_rows") >= int(min_rows)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
    hot: DataFrame | None = None,
) -> DataFrame:
    """Skew-safe equi-join of a large ``fact`` frame against ``dim``.

    ``hot`` (a frame of hot key tuples, e.g. from ``hot_keys_df``) selects
    the keys to salt; ``hot=None`` salts every key (simplest, costs
    ``num_salts``x dim replication).  ``how`` may be ``inner`` or ``left``
    (the fact side survives unmatched) — semantics equal the plain
    ``fact.join(dim, on, how)`` in both cases.

    The fact-side salt is ``xxhash64`` of the whole row modulo
    ``num_salts`` — deterministic (re-runs and speculative task retries
    agree), uniform, and computed without shuffling the fact table.
    """
    on = list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(num_salts)).cast(
        "int"
    )
    burst = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias(_SALT)

    if hot is None:
        f = fact.withColumn(_SALT, salt)
        d = dim.select("*", burst)
        return f.join(d, on=on + [_SALT], how=how).drop(_SALT)

    marker = hot.select(*on, F.lit(True).alias("__is_hot"))
    f = fact.join(F.broadcast(marker), on=on, how="left")
    d = dim.join(F.broadcast(marker), on=on, how="left")
    f_hot = f.filter(F.col("__is_hot").isNotNull()).drop("__is_hot").withColumn(_SALT, salt)
    f_cold = f.filter(F.col("__is_hot").isNull()).drop("__is_hot")
    d_hot = d.filter(F.col("__is_hot").isNotNull()).drop("__is_hot").select("*", burst)
    d_cold = d.filter(F.col("__is_hot").isNull()).drop("__is_hot")
    joined_hot = f_hot.join(d_hot, on=on + [_SALT], how=how).drop(_SALT)
    joined_cold = f_cold.join(d_cold, on=on, how=how)
    return joined_hot.unionByName(joined_cold)
