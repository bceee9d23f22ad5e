"""Streaming maintenance for the persisted embedding index.

An ANN service over a growing crawl needs the embedding column of NEW
documents appended as they land — never a corpus re-featurization.  The
batch builder (``functions.text.hashed_embedding_df``) aggregates, which
is illegal mid-stream in append mode; its zero-shuffle row-local twin
(``hashed_embedding_local_df``, differential-tested value-identical)
embeds each micro-batch with no exchange at all, and ``foreachBatch``
re-enters the batch index writer with ``mode='append'`` — so the index
layout AND the stamp validation (family/dim/id-type mismatches RAISE)
live in exactly one place for build and maintenance.

Delivery guarantee: at-least-once (the ``start_lsh_index_maintenance``
contract) — a crash between table append and checkpoint commit replays a
batch, duplicating its ``(doc_id, embedding)`` rows.  Duplicate rows are
value-identical (the embedding is a pure function of the text), so top-k
consumers see the same neighbor at the same cosine twice; an application
needing exact row counts dedups on ``doc_id`` at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["start_embedding_index_maintenance"]


def start_embedding_index_maintenance(
    docs: DataFrame,
    table: str,
    family: str = "hashed_md5",
    dim: int = 32,
    num_buckets: int = 16,
    path: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Keep a persisted embedding index (``functions.similarity.
    embedding_write_index`` layout) current as documents stream in: each
    micro-batch embeds ROW-LOCALLY (zero shuffles) and appends to the
    bucketed index under the stored stamp's validation.  Returns the
    started ``StreamingQuery`` (``available_now=True`` drains the backlog
    and stops — the test/backfill mode)."""
    from ..functions.similarity import _emb_stored_props, embedding_write_index
    from ..functions.text import hashed_embedding_local_df

    # Fail FAST: the stamp is readable at start() time, and a
    # missing/mismatched index should be a clean error here — not a
    # StreamingQueryException out of the first micro-batch after the
    # checkpoint directory already exists.
    stored = _emb_stored_props(docs.sparkSession, table)
    if not stored:
        raise ValueError(
            f"embedding index {table!r} carries no stamp; batch-build it with "
            "embedding_write_index before starting maintenance"
        )
    asked = {"family": str(family), "dim": int(dim)}
    if {k: stored.get(k) for k in asked} != asked:
        raise ValueError(
            f"embedding index {table!r} was built with {stored}; maintenance "
            f"with {asked} would mix meaningless-to-compare vectors"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        emb = hashed_embedding_local_df(batch_df, dim=dim)
        embedding_write_index(
            emb,
            table,
            family=family,
            dim=dim,
            num_buckets=num_buckets,
            path=path,
            mode="append",
        )

    w = docs.writeStream.foreachBatch(write_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
