"""Event-table analytics: windowed aggregates, sessionization, as-of
interpolation, neighborhood smoothing.

These are the batch twins of the Structured Streaming surface in
``imops_spark.streaming`` and the relational isomorphs of several reference
operators (SURVEY.md §2.3): the as-of join mirrors ``interp1d``'s
searchsorted+lerp (`/root/reference/imops/src/_zoom.pyx:30-120`), the
neighborhood bool_or/bool_and mirror binary dilation/erosion
(`/root/reference/imops/src/_morphology.pyx:254-310`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "load_events",
    "with_ts_sec",
    "tumbling_window_df",
    "sessionize_df",
    "asof_join_df",
    "asof_interpolate_df",
    "neighborhood_flag_df",
]


def load_events(spark, sf_dir: str) -> DataFrame:
    """Read the events table, tolerating parquet TIMESTAMP(NANOS).

    Spark has no nanosecond timestamp type; parquet NANOS columns fail the
    schema conversion unless ``spark.sql.legacy.parquet.nanosAsLong`` is set,
    in which case ``ts`` arrives as a long of epoch-nanoseconds.  Either way
    we normalize to an epoch-seconds column ``ts_sec`` (bigint) — every
    downstream operator keys on seconds, and the DuckDB oracle computes the
    identical ``FLOOR(epoch(ts))``.
    """
    path = f"{sf_dir}/events.parquet"
    # Set nanosAsLong unconditionally (the streaming twin does the same):
    # NANOS columns then read as nano-longs, MICROS/MILLIS still read as
    # timestamps, and ``with_ts_sec`` normalizes either.  Probing with a
    # try/except would burn an intentionally-failing Spark job per session.
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        df.schema  # force schema resolution while the conf is set
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return with_ts_sec(df)


def with_ts_sec(events: DataFrame) -> DataFrame:
    """Add ``ts_sec`` (bigint epoch seconds) from a timestamp or nano-long ts."""
    dtype = dict(events.dtypes)["ts"]
    if dtype.startswith("timestamp"):
        ts_sec = F.unix_timestamp("ts")
    else:  # long: epoch nanoseconds (nanosAsLong read path); exact int division
        ts_sec = F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    return events.withColumn("ts_sec", ts_sec)


def tumbling_window_df(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling-window aggregates per event type: count + rounded value sum."""
    bucket = (F.floor(F.col("ts_sec") / (minutes * 60))).alias("win")
    return (
        events.groupBy(bucket, "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def sessionize_df(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: session id = cumulative count of
    gaps > ``gap_minutes`` (classic lag+cumsum window pattern).

    Ordering key is (ts_sec, event_id) — deterministic total order that both
    engines reproduce regardless of sub-second timestamp precision.
    """
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    gap = F.col("ts_sec") - F.lag("ts_sec").over(w)
    with_new = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    sess = with_new.withColumn(
        "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event_id"),
    )


def asof_join_df(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts_sec",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the right row with the greatest
    ``on`` <= its own (``direction='backward'``, inclusive), the smallest
    ``on`` >= its own (``'forward'``), or whichever of those two is closer
    (``'nearest'``, exact ties resolve backward — the pandas
    ``merge_asof`` convention), per ``by`` group.  Left rows with no
    matching right row are dropped (inner asof, DuckDB's default).

    Implemented with the UNION + running ``last(ignorenulls)`` window trick —
    the scale-correct plan: one shuffle on (``by``, sort ``on``), no range
    join and no per-interval row explosion, so it survives arbitrarily dense
    right sides (``'nearest'`` adds a second sort over the SAME partitioning,
    not a second shuffle).  Right rows must be unique per (``by``, ``on``) —
    enforce upstream with an aggregate — otherwise "the" prior row is
    ambiguous.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    by = list(by or [])
    value_cols = list(value_cols or [c for c in right.columns if c not in by + [on]])
    if not value_cols:
        raise ValueError(
            "asof_join_df: no value columns — `right` has only key/on columns; "
            "pass value_cols explicitly"
        )
    if "_on" in value_cols:
        raise ValueError(
            "asof_join_df: value column name '_on' is reserved (it carries "
            "the matched row's timestamp for the 'nearest' distance compare);"
            " rename the column before joining"
        )
    l_cols = [c for c in left.columns if c not in by + [on]]
    # All value columns ride in ONE struct per right row.  The struct itself
    # is never NULL for a right row (even if every field is NULL), so it
    # doubles as the match marker: last(ignorenulls) carries the single
    # nearest right row atomically — matched-but-NULL values stay NULL (no
    # silent carry of an older row, no per-column row tearing), and 'no
    # match' is exactly `struct IS NULL`.
    # `_on` rides along so 'nearest' can compare the two candidates'
    # distances; backward/forward ignore it
    payload = F.struct(
        F.col(on).alias("_on"), *[F.col(c).alias(c) for c in value_cols]
    )
    payload_type = right.select(payload.alias("_p")).schema["_p"].dataType
    r_u = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_tag"),
        payload.alias("_r_payload"),
        *[F.lit(None).alias(c) for c in l_cols],
    )
    l_u = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_r_payload"),
        *l_cols,
    )
    # tag=0 sorts right rows toward the window edge at equal timestamps ->
    # inclusive in either direction
    back_order = [F.col(on).asc(), F.col("_tag").asc()]
    fwd_order = [F.col(on).desc(), F.col("_tag").asc()]

    def _running(order):
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("_r_payload", ignorenulls=True).over(w)

    base = r_u.unionByName(l_u)
    if direction == "nearest":
        carried = base.select(
            "*",
            _running(back_order).alias("_pb"),
            _running(fwd_order).alias("_pf"),
        )
        pb, pf = F.col("_pb"), F.col("_pf")
        # distances are non-negative by construction; exact tie -> backward
        chosen = (
            F.when(pb.isNull(), pf)
            .when(pf.isNull(), pb)
            .when(
                (pf.getField("_on") - F.col(on)) < (F.col(on) - pb.getField("_on")),
                pf,
            )
            .otherwise(pb)
        )
        carried = carried.select("*", chosen.alias("_asof_payload"))
    else:
        order = back_order if direction == "backward" else fwd_order
        carried = base.select("*", _running(order).alias("_asof_payload"))
    out = carried.filter((F.col("_tag") == 1) & F.col("_asof_payload").isNotNull())
    return out.select(
        *by,
        F.col(on),
        *l_cols,
        *[F.col("_asof_payload").getField(c).alias(f"asof_{c}") for c in value_cols],
    )


def asof_interpolate_df(events: DataFrame, knot_mod: int = 50, query_mod: int = 7) -> DataFrame:
    """Linear interpolation of ``value`` at query timestamps between knot
    events — the interp1d as-of-join pattern.

    Knots: events with ``event_id % knot_mod == 0`` ordered by ts; knot
    intervals built with ``lead()``; queries join into their bracketing
    interval (range join) and lerp on epoch seconds.  Out-of-range queries are
    dropped (bounds_error=False, fill=NULL semantics -> filtered).
    """
    knots = (
        events.filter(F.col("event_id") % knot_mod == 0)
        .select(
            F.col("ts_sec").alias("kx"),
            F.col("value").alias("ky"),
            F.col("event_id").alias("knot_id"),
        )
    )
    w = Window.orderBy("kx", "knot_id")
    intervals = knots.select(
        "kx",
        "ky",
        F.lead("kx").over(w).alias("kx2"),
        F.lead("ky").over(w).alias("ky2"),
    ).filter(F.col("kx2").isNotNull())
    queries = events.filter(F.col("event_id") % query_mod == 0).select(
        "event_id", F.col("ts_sec").alias("qx")
    )
    lerp = F.col("ky") + (F.col("ky2") - F.col("ky")) * (F.col("qx") - F.col("kx")) / (
        F.col("kx2") - F.col("kx")
    )
    return (
        queries.join(
            intervals,
            on=[queries.qx >= F.col("kx"), queries.qx < F.col("kx2")],
        )
        .select("event_id", F.round(lerp, 6).alias("value_interp"))
    )


def neighborhood_flag_df(events: DataFrame, minutes: int = 10, threshold: float = 90.0) -> DataFrame:
    """Per (user, time-bucket): did any event in the ±1-bucket neighborhood
    exceed ``threshold``?  The 1-D binary-dilation pattern: bucket flags are
    shifted by a broadcast offset table and OR-reduced."""
    bucket = F.floor(F.col("ts_sec") / (minutes * 60))
    flags = (
        events.groupBy(F.col("user_id"), bucket.alias("b"))
        .agg(F.max(F.when(F.col("value") > threshold, 1).otherwise(0)).alias("flag"))
    )
    # Output rows are exactly the occupied buckets (no border growth), so the
    # shift-union-reduce is equivalent to a RANGE window over present
    # neighbors — one shuffle on user_id, no self-join, flags computed once.
    w = Window.partitionBy("user_id").orderBy("b").rangeBetween(-1, 1)
    return flags.select(
        "user_id", F.col("b").alias("bucket"), F.max("flag").over(w).alias("any_near")
    )
