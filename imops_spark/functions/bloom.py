"""Distributed Bloom filters from native column expressions: the broadcast
membership prefilter for 100 TB semi-joins.

The scale problem this solves: "drop every row of a huge table whose key
appears in set S" is a semi-join, and at cluster scale the join shuffles
(or broadcasts) ALL of S's keys and repartitions the probe side.  When S
has 10^8..10^9 keys it no longer broadcasts, so the probe side — the 100 TB
one — pays a full shuffle.  A Bloom filter compresses S to a user-chosen
number of BITS (~14.4 bits/key at 1e-4 false-positive rate), which stays
broadcastable long after the key set itself stops being so; probing is
row-local bit arithmetic with NO shuffle of the big side.  Bloom filters
have no false negatives, so using one as a PREFILTER in front of an exact
join keeps the final answer bit-identical while shrinking the join input
to (true matches + fpr * n).

Spark's own ``BloomFilterAggregate`` exists but is not SQL-registered (it
is internal to AQE runtime filtering), and ``DataFrame.stat.bloomFilter``
returns a driver-side JVM object unusable inside column expressions.  This
module therefore builds the filter out of registered primitives only —
``xxhash64`` (seeded, 64-bit), ``bit_or`` aggregation, ``getbit`` tests —
so both the build and the probe stay inside whole-stage codegen.

Plan shape, and why it scales:

- BUILD: each key row derives its ``num_hashes`` bit positions row-locally
  (``xxhash64(key, i)`` for i in 0..k-1), explodes to ``(word_idx,
  bit_mask)`` and aggregates ``bit_or`` per 64-bit word.  The shuffle
  cardinality is bounded by ``num_bits / 64`` — the FILTER's size, never
  the key count — and map-side partial ``bit_or`` collapses each upstream
  partition to at most that many rows before the exchange.  The final
  densification (map -> fixed-length array<bigint>) is a single-row scalar
  aggregate, the same shape as any global agg.  No driver-side data pass:
  the bits never leave the JVM.
- PROBE: ``crossJoin(broadcast(one_row_bloom))`` + ``getbit`` tests per
  hash — row-local, zero shuffle, codegen'd.

Sizing: for ``n`` keys and target false-positive rate ``p``, the classic
optimum is ``m = -n ln p / (ln 2)^2`` bits and ``k = (m/n) ln 2`` hashes;
:func:`bloom_size` computes both.  The reference engine has no Bloom
surface (membership checks there are exact in-memory ``isin`` —
``/root/reference/imops/utils.py`` scale assumptions); this module is part
of the large-scale curation family layered on top of the ported surface.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BloomFilter",
    "bloom_size",
    "bloom_fpr",
    "bloom_build",
    "bloom_from_df",
    "bloom_filter_df",
    "with_bloom_contains",
    "bloom_words",
    "bloom_write_index",
    "bloom_stamp_index",
    "bloom_read_index",
]


@dataclass(frozen=True)
class BloomFilter:
    """A built Bloom filter: a ONE-ROW DataFrame (``bits array<bigint>``,
    ``num_bits``, ``num_hashes``, ``key_type``) plus its parameters
    mirrored python-side so probe expressions can be constructed without a
    driver collect.

    ``key_type`` records the HASH CLASS of the build column
    (:func:`_hash_type_class`) — xxhash64 hashes physical bytes, so probing
    a BIGINT-built filter with STRING keys would silently return all-false,
    i.e. FALSE NEGATIVES, breaking the guarantee every prefilter caller
    relies on.  :func:`with_bloom_contains` raises on mismatch.  ``None``
    means unknown (a frame persisted before the stamp existed).

    The frame is self-describing (params ride as columns), so it can be
    persisted with a plain ``df.write.parquet`` and rehydrated with
    :func:`bloom_from_df`.
    """

    df: DataFrame
    num_bits: int
    num_hashes: int
    key_type: str | None = None


def _hash_type_class(dtype: str) -> str:
    """The xxhash64 EQUIVALENCE CLASS of a Spark SQL dtype string: Spark's
    hash expressions fold tinyint/smallint/int to one 4-byte hash — but
    BIGINT hashes 8 bytes and differs (measured: xxhash64(7::int) !=
    xxhash64(7::bigint)), and string/float/double/binary each hash their
    own physical layout.  Only widths measured hash-identical collapse."""
    if dtype in ("tinyint", "smallint", "int"):
        return "int"
    return dtype


def bloom_size(n_items: int, fpp: float = 1e-4) -> tuple[int, int]:
    """Optimal ``(num_bits, num_hashes)`` for ``n_items`` keys at target
    false-positive rate ``fpp`` — ``m = -n ln p / (ln 2)^2`` rounded up to
    a multiple of 64, ``k = (m/n) ln 2``."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round((m / n_items) * math.log(2)))
    return m, int(k)


def bloom_fpr(num_bits: int, num_hashes: int, n_items: int) -> float:
    """Expected false-positive rate after inserting ``n_items`` keys:
    ``(1 - e^{-kn/m})^k``."""
    if n_items <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_items / num_bits)) ** num_hashes


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a key: ``pmod(xxhash64(key, i), m)``.

    ``xxhash64`` chains its arguments (each value hashed with the running
    result as seed), so varying the trailing literal yields k independent
    64-bit streams from one registered, codegen'd primitive.  NOTE the
    hashes are TYPED — xxhash64 hashes the column's physical bytes, so a
    filter built over BIGINT keys must be probed with BIGINT keys (same
    rule as joining on mismatched types, but silent: document at call
    sites, asserted in :func:`with_bloom_contains`).
    """
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits).cast("long"))
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> BloomFilter:
    """Build a Bloom filter over ``df[col]`` distributedly.

    One exchange whose cardinality is ``<= num_bits/64`` REGARDLESS of the
    input row count (map-side partial ``bit_or`` caps each input partition
    at that many rows), then a single-row densification aggregate.  NULL
    keys are skipped (NULL is not a member).  Memory at the final task is
    ``num_bits/8`` bytes plus map overhead — bounded by the caller-chosen
    filter size, not the data.
    """
    num_bits, num_hashes = _check_params(num_bits, num_hashes)
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"no column {col!r} in frame")
    key_type = _hash_type_class(dtype)
    words = bloom_words(df, col, num_bits, num_hashes)
    dense = _densify(df.sparkSession, words, num_bits, num_hashes, key_type)
    return BloomFilter(
        df=dense, num_bits=num_bits, num_hashes=num_hashes, key_type=key_type
    )


def _check_params(num_bits: int, num_hashes: int) -> tuple[int, int]:
    num_bits, num_hashes = int(num_bits), int(num_hashes)
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    if num_hashes <= 0:
        raise ValueError("num_hashes must be positive")
    return num_bits, num_hashes


def bloom_words(df: DataFrame, col: str, num_bits: int, num_hashes: int) -> DataFrame:
    """The SPARSE form of a Bloom filter over ``df[col]``: ``(word_idx,
    word)`` rows, one per set 64-bit word (``<= num_bits/64`` rows).  This
    is the mergeable partial — sparse sets from any number of shards or
    micro-batches union by re-aggregating ``bit_or(word)`` per index, and
    because OR is idempotent, REPLAYED inputs change nothing (the property
    the streaming index maintenance leans on)."""
    src = df.filter(F.col(col).isNotNull())
    pos = F.array(*_positions(F.col(col), num_bits, num_hashes))
    return (
        src.select(F.explode(pos).alias("pos"))
        .select(
            F.expr("pos DIV 64").cast("int").alias("word_idx"),
            # F.shiftleft only takes a python-int shift; the per-row shift
            # needs the SQL form
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def _densify(
    spark,
    words: DataFrame,
    num_bits: int,
    num_hashes: int,
    key_type: str | None = None,
) -> DataFrame:
    """Sparse words -> the 1-row dense ``(bits, num_bits, num_hashes)``
    frame: left-join the full word-index range against the sparse set and
    collect in index order.  (NOT element_at over a map_from_entries —
    Spark maps are entry ARRAYS, so each lookup is a linear scan and the
    densify goes O(n_words * n_set_words): measured 6.8 s for a 2^20-bit
    filter where this form takes ~0.2 s.)"""
    n_words = num_bits // 64
    idx = spark.range(n_words).select(F.col("id").cast("int").alias("word_idx"))
    dense_rows = idx.join(words, "word_idx", "left").select(
        "word_idx", F.coalesce("word", F.lit(0).cast("long")).alias("word")
    )
    return dense_rows.agg(
        F.array_sort(F.collect_list(F.struct("word_idx", "word"))).alias("e")
    ).select(
        F.expr("transform(e, x -> x.word)").alias("bits"),
        F.lit(num_bits).alias("num_bits"),
        F.lit(num_hashes).alias("num_hashes"),
        F.lit(key_type).cast("string").alias("key_type"),
    )


def bloom_from_df(df: DataFrame) -> BloomFilter:
    """Rehydrate a persisted Bloom filter frame (one driver read of the
    scalar params — the bits array stays JVM-side).  Frames persisted
    before the ``key_type`` stamp existed rehydrate with
    ``key_type=None`` (probe type unenforced)."""
    has_kt = "key_type" in df.columns
    cols = ["num_bits", "num_hashes"] + (["key_type"] if has_kt else [])
    row = df.select(*cols).first()
    if row is None:
        raise ValueError("empty bloom filter frame")
    return BloomFilter(
        df=df,
        num_bits=int(row[0]),
        num_hashes=int(row[1]),
        key_type=(str(row[2]) if has_kt and row[2] is not None else None),
    )


def with_bloom_contains(
    df: DataFrame, col: str, bloom: BloomFilter, out: str = "might_contain"
) -> DataFrame:
    """Add a boolean ``out`` column: may ``df[col]`` be in the filter?

    ``crossJoin(broadcast(1-row bits))`` then k ``getbit`` tests — all
    row-local codegen'd expressions; the big side is never shuffled.
    ``True`` may be wrong at the filter's fpr; ``False`` is always right
    (no false negatives), which is what makes this safe as an exact-join
    prefilter.  NULL keys probe as ``False``.
    """
    dtype = dict(df.dtypes).get(col)
    # typed-hash contract (see _positions); catch the silent cross-type case
    bloom_cols = set(bloom.df.columns)
    if not {"bits", "num_bits", "num_hashes"} <= bloom_cols:
        raise ValueError("bloom frame missing bits/num_bits/num_hashes columns")
    if dtype is None:
        raise ValueError(f"no column {col!r} in frame")
    if bloom.key_type is not None:
        probe_type = _hash_type_class(dtype)
        if probe_type != bloom.key_type:
            raise TypeError(
                f"bloom filter was built over {bloom.key_type} keys but the "
                f"probe column {col!r} is {dtype}; xxhash64 is typed, so a "
                "cross-type probe silently returns false for true members "
                "(false negatives) — cast the probe column to match"
            )
    if "bits" in df.columns:
        raise ValueError(
            "probe frame already has a 'bits' column — the broadcast join "
            "would make it ambiguous; rename it before probing"
        )
    probed = df.crossJoin(F.broadcast(bloom.df.select("bits")))
    tests = []
    for p in _positions(F.col(col), bloom.num_bits, bloom.num_hashes):
        # p is non-negative (pmod), so floor-division is integer division
        word = F.element_at(F.col("bits"), F.floor(p / F.lit(64)).cast("int") + 1)
        tests.append(F.getbit(word, (p % 64).cast("int")) == 1)
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return probed.withColumn(out, F.coalesce(cond, F.lit(False))).drop("bits")


def bloom_filter_df(df: DataFrame, col: str, bloom: BloomFilter) -> DataFrame:
    """Keep only rows whose ``col`` MAY be in the filter (the semi-join
    prefilter: guaranteed superset of the exact match set)."""
    flagged = with_bloom_contains(df, col, bloom, out="__bloom_hit")
    return flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")


def bloom_write_index(
    df: DataFrame,
    col: str,
    path: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    mode: str = "overwrite",
) -> None:
    """Persist (or extend) a Bloom membership index at ``path`` as an
    APPEND-ONLY sparse-word log: each call writes ``df[col]``'s sparse
    words (``<= num_bits/64`` rows) with the parameters stamped on every
    row; readers re-aggregate ``bit_or`` per word index, so appended
    generations MERGE by construction and replaying an input is a no-op
    (OR-idempotence).  That makes the log safe under at-least-once
    delivery — the streaming maintenance sink
    (``streaming.curate.start_bloom_index_maintenance``) gets
    exactly-once SEMANTICS without exactly-once plumbing.

    ``mode='append'`` validates the existing log's parameters FIRST and
    raises on mismatch — appending under different (num_bits, num_hashes)
    would silently corrupt membership answers (the LSH-index lesson:
    self-describing storage must refuse to self-contradict).

    Log growth: each append adds at most ``num_bits/64`` rows; a
    long-running maintenance stream should periodically rewrite the log
    (read + ``mode='overwrite'`` of the aggregated words) during a
    single-writer maintenance window — the same readers-only concurrency
    contract as ``sources.parquet.compact_partitions``.
    """
    num_bits, num_hashes = _check_params(num_bits, num_hashes)
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"no column {col!r} in frame")
    key_type = _hash_type_class(dtype)
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    stamp_kt = True
    if mode == "append":
        # Only a MISSING log means "first write".  Any other read failure
        # (transient IO, an unrelated dataset at the path) must propagate —
        # swallowing it would disable this guard exactly when it matters
        # and let a mismatched append corrupt the log.  Validation reads
        # EVERY generation's parameters (distinct over the bounded log),
        # not one sampled row: a log that is already mixed must refuse
        # further appends no matter which generation a .first() would hit.
        spark = df.sparkSession
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            log = spark.read.parquet(path)
            has_kt = "key_type" in log.columns
            # appending a wider schema to a pre-stamp log would make reads
            # schema-dependent on which file gets sampled; keep the log's
            # own shape (the stamp only ever applies to whole generations)
            stamp_kt = has_kt
            if not has_kt:
                # a pre-stamp log can never enforce key-type compatibility:
                # every append here re-opens the false-negative hazard the
                # stamp exists to close.  Warn loudly and point at the
                # one-shot migration (which requires the operator to DECLARE
                # the legacy key type — this code cannot infer it).
                import warnings

                warnings.warn(
                    f"bloom index at {path} predates the key_type stamp; "
                    "this append is accepted unchecked (a mixed-type append "
                    "would silently probe all-false). Migrate once with "
                    "bloom_stamp_index(spark, path, key_type=...) to make "
                    "the log enforceable.",
                    stacklevel=2,
                )
            sel = ["num_bits", "num_hashes"] + (["key_type"] if has_kt else [])
            params = log.select(*sel).distinct().collect()
            bad = [
                tuple(p)
                for p in params
                if int(p[0]) != num_bits
                or int(p[1]) != num_hashes
                or (has_kt and p[2] is not None and str(p[2]) != key_type)
            ]
            if bad:
                raise ValueError(
                    f"bloom index at {path} holds generations with "
                    f"(num_bits, num_hashes, key_type) in {sorted(bad)}; "
                    f"refusing to append num_bits={num_bits}, "
                    f"num_hashes={num_hashes}, key_type={key_type}"
                )
    out_cols = [
        F.col("word_idx"),
        F.col("word"),
        F.lit(num_bits).alias("num_bits"),
        F.lit(num_hashes).alias("num_hashes"),
    ]
    if stamp_kt:
        out_cols.append(F.lit(key_type).alias("key_type"))
    words = bloom_words(df, col, num_bits, num_hashes).select(*out_cols)
    words.write.mode(mode).parquet(path)


def bloom_stamp_index(spark, path: str, key_type: str) -> None:
    """One-shot migration of a pre-stamp Bloom log: rewrite every
    generation with the DECLARED ``key_type`` so future appends and
    probes are enforceable (``bloom_write_index`` warns on every append
    to an unstamped log until this runs).

    The legacy key type is not inferable from the stored words — the
    operator must declare what the log was built from; ``key_type``
    accepts either a Spark dtype string (``'bigint'``, ``'string'``, a
    legacy ``'int'``-class width) or an exact hash class.  Raises if the
    log is already stamped (nothing to migrate — a RE-stamp could
    relabel generations) or holds mixed parameters.  Single-writer
    maintenance-window contract, like every log rewrite here."""
    log = spark.read.parquet(path)
    if "key_type" in log.columns:
        raise ValueError(
            f"bloom index at {path} is already key_type-stamped; "
            "re-stamping could relabel existing generations"
        )
    params = log.select("num_bits", "num_hashes").distinct().collect()
    if len(params) != 1:
        raise ValueError(
            f"bloom index at {path} holds {len(params)} parameter sets; "
            "the log is corrupt (mixed-parameter appends)"
        )
    kt = _hash_type_class(str(key_type))
    stamped = log.select(
        "word_idx", "word", "num_bits", "num_hashes",
        F.lit(kt).alias("key_type"),
    )
    # the read is fully materialized before the overwrite (bounded log:
    # <= generations * num_bits/64 rows), so the rewrite never reads its
    # own output
    rows = stamped.collect()
    spark.createDataFrame(rows, stamped.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def bloom_read_index(spark, path: str) -> BloomFilter:
    """Load a persisted Bloom index: validate the log's parameters are
    consistent, merge all appended generations (``bit_or`` per word index —
    one bounded exchange), densify, and return the probe-ready filter."""
    log = spark.read.parquet(path)
    has_kt = "key_type" in log.columns
    sel = ["num_bits", "num_hashes"] + (["key_type"] if has_kt else [])
    params = log.select(*sel).distinct().collect()
    if len(params) == 0:
        raise ValueError(
            f"bloom index at {path} is empty (no generations written yet); "
            "parameters are unknowable — build it with bloom_write_index "
            "over a non-empty key frame first"
        )
    if len(params) > 1:
        raise ValueError(
            f"bloom index at {path} holds {len(params)} parameter sets; "
            "the log is corrupt (mixed-parameter appends)"
        )
    num_bits, num_hashes = int(params[0][0]), int(params[0][1])
    key_type = (
        str(params[0][2]) if has_kt and params[0][2] is not None else None
    )
    merged = log.groupBy("word_idx").agg(F.expr("bit_or(word)").alias("word"))
    dense = _densify(spark, merged, num_bits, num_hashes, key_type)
    return BloomFilter(
        df=dense, num_bits=num_bits, num_hashes=num_hashes, key_type=key_type
    )
