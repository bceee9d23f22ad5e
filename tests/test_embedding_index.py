"""Persisted embedding index (functions/similarity.py): write once /
probe many, self-describing stamp (family/dim/id-type mismatches RAISE —
the bloom key_type recipe applied to embeddings), in-plan length check,
and streaming maintenance value-identical to a one-shot batch build."""

import pytest
from pyspark.sql import functions as F

from imops_spark.functions.similarity import (
    _emb_stored_props,
    cosine_topk_df,
    embedding_index_topk,
    embedding_read_index,
    embedding_write_index,
)
from imops_spark.functions.text import hashed_embedding_df


def _emb(spark, dim=16):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    return hashed_embedding_df(docs, dim=dim)


def test_index_roundtrip_and_probe_equals_inline(spark, tmp_path):
    """An index-fed top-k must be value-identical to the inline
    cosine_topk_df over the same embedding frame, and the stored stamp
    must describe the build."""
    emb = _emb(spark)
    table = "emb_idx_roundtrip"
    try:
        embedding_write_index(
            emb, table, family="hashed_md5", dim=16, path=str(tmp_path / "idx")
        )
        assert _emb_stored_props(spark, table) == {
            "family": "hashed_md5",
            "dim": 16,
            "id_type": "bigint",
            "num_buckets": 16,
        }
        stored = embedding_read_index(spark, table, family="hashed_md5", dim=16)
        assert stored.columns == ["doc_id", "embedding"]
        q = stored.filter(F.col("doc_id") < 5)
        got = {
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in embedding_index_topk(
                spark, table, q, k=3, family="hashed_md5", dim=16
            ).collect()
        }
        exp = {
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in cosine_topk_df(
                emb, emb.filter(F.col("doc_id") < 5), k=3, id_col="doc_id"
            ).collect()
        }
        assert got == exp and len(got) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_index_stamp_guards(spark, tmp_path):
    """Family/dim/id-type mismatches must RAISE at read and append time;
    an unstamped table is not an embedding index; a matching append
    works (the maintenance path)."""
    emb = _emb(spark)
    table = "emb_idx_guards"
    try:
        embedding_write_index(
            emb, table, family="hashed_md5", dim=16, path=str(tmp_path / "idx")
        )
        with pytest.raises(ValueError, match="family"):
            embedding_read_index(spark, table, family="model_v2")
        with pytest.raises(ValueError, match="dim"):
            embedding_read_index(spark, table, dim=32)
        with pytest.raises(ValueError, match="would mix"):
            embedding_write_index(
                emb, table, family="model_v2", dim=16, mode="append"
            )
        with pytest.raises(ValueError, match="would mix"):
            embedding_write_index(
                emb.withColumn("doc_id", F.col("doc_id").cast("string")),
                table,
                family="hashed_md5",
                dim=16,
                mode="append",
            )
        # append to a table that was never stamped: refused outright
        emb.selectExpr("doc_id", "embedding").write.mode("overwrite").option(
            "path", str(tmp_path / "plain")
        ).saveAsTable("emb_idx_plain")
        with pytest.raises(ValueError, match="no imops.emb"):
            embedding_write_index(
                emb, "emb_idx_plain", family="hashed_md5", dim=16, mode="append"
            )
        with pytest.raises(ValueError, match="not an"):
            embedding_read_index(spark, "emb_idx_plain")
        # matching append doubles the rows and keeps the stamp
        before = spark.table(table).count()
        embedding_write_index(
            emb.withColumn("doc_id", F.col("doc_id") + 10_000),
            table,
            family="hashed_md5",
            dim=16,
            mode="append",
        )
        assert spark.table(table).count() == 2 * before
        assert _emb_stored_props(spark, table)["dim"] == 16
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql("DROP TABLE IF EXISTS emb_idx_plain")


def test_index_write_length_check_raises(spark, tmp_path):
    """A vector whose length disagrees with the stamped dim must fail the
    WRITE (a short row would poison every downstream GEMM)."""
    bad = spark.createDataFrame(
        [(1, [0.6, 0.8]), (2, [1.0])], "doc_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="length != dim"):
        embedding_write_index(
            bad,
            "emb_idx_badlen",
            family="toy",
            dim=2,
            path=str(tmp_path / "bad"),
        )
    spark.sql("DROP TABLE IF EXISTS emb_idx_badlen")


def test_index_write_empty_frame_needs_explicit_dim(spark, tmp_path):
    bad = spark.createDataFrame([], "doc_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty frame"):
        embedding_write_index(bad, "emb_idx_empty", family="toy")


def test_streaming_embedding_index_maintenance(spark, tmp_path):
    """Documents streamed in two micro-batches append row-locally embedded
    vectors under the stamp's validation; the maintained index must be
    value-identical to a one-shot batch build over the full corpus (the
    local twin is differential-tested equal to the batch builder), and an
    index-fed probe must return identical neighbors."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from imops_spark.streaming.similarity import (
        start_embedding_index_maintenance,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    pdf = new.toPandas().sort_values("doc_id")
    d = tmp_path / "docstream"
    d.mkdir()
    n = len(pdf)
    for i, part in enumerate([pdf.iloc[: n // 2], pdf.iloc[n // 2 :]]):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False), d / f"b{i}.parquet"
        )
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    try:
        embedding_write_index(
            hashed_embedding_df(hist, dim=16),
            "emb_idx_stream",
            family="hashed_md5",
            dim=16,
            path=str(tmp_path / "emb_idx_stream"),
        )
        q = start_embedding_index_maintenance(
            stream,
            "emb_idx_stream",
            family="hashed_md5",
            dim=16,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

        maintained = {
            (r["doc_id"], tuple(r["embedding"]))
            for r in spark.table("emb_idx_stream").collect()
        }
        batch = {
            (r["doc_id"], tuple(r["embedding"]))
            for r in hashed_embedding_df(docs, dim=16).collect()
        }
        assert maintained == batch and len(maintained) > 0

        queries = spark.table("emb_idx_stream").filter(F.col("doc_id") < 5)
        got = {
            tuple(r)
            for r in embedding_index_topk(
                spark, "emb_idx_stream", queries, k=3, family="hashed_md5"
            ).collect()
        }
        embedding_write_index(
            hashed_embedding_df(docs, dim=16),
            "emb_idx_full",
            family="hashed_md5",
            dim=16,
            path=str(tmp_path / "emb_idx_full"),
        )
        exp = {
            tuple(r)
            for r in embedding_index_topk(
                spark, "emb_idx_full", queries, k=3, family="hashed_md5"
            ).collect()
        }
        assert got == exp and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS emb_idx_stream")
        spark.sql("DROP TABLE IF EXISTS emb_idx_full")


def test_ann_builders_consume_the_index(spark, tmp_path):
    """The persisted embedding column feeds the ANN builders directly:
    an IVF index built FROM embedding_read_index probes identically to
    one built from the inline embedding frame — write the featurization
    once, build every downstream index off the stored column."""
    from imops_spark.functions.similarity import (
        ivf_query_index,
        ivf_write_index,
    )

    emb = _emb(spark)
    table = "emb_idx_for_ivf"
    try:
        embedding_write_index(
            emb, table, family="hashed_md5", dim=16, path=str(tmp_path / "idx")
        )
        stored = embedding_read_index(spark, table, family="hashed_md5", dim=16)
        cents_a = ivf_write_index(
            stored, "ivf_from_index", n_centroids=4,
            path=str(tmp_path / "ivf_a"), id_col="doc_id", vec_col="embedding",
        )
        cents_b = ivf_write_index(
            emb, "ivf_inline", n_centroids=4,
            path=str(tmp_path / "ivf_b"), id_col="doc_id", vec_col="embedding",
        )
        assert (cents_a == cents_b).all()
        q = stored.filter(F.col("doc_id") < 5)
        got = {
            tuple(r)
            for r in ivf_query_index(
                spark, "ivf_from_index", q, cents_a, k=3, n_probe=2,
                id_col="doc_id", vec_col="embedding",
            ).collect()
        }
        exp = {
            tuple(r)
            for r in ivf_query_index(
                spark, "ivf_inline", emb.filter(F.col("doc_id") < 5), cents_b,
                k=3, n_probe=2, id_col="doc_id", vec_col="embedding",
            ).collect()
        }
        assert got == exp and len(got) > 0
    finally:
        for t in (table, "ivf_from_index", "ivf_from_index__centroids",
                  "ivf_inline", "ivf_inline__centroids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_fingerprint_staleness_and_append_invalidation(spark, tmp_path):
    """corpus_fingerprint stamps index currency: a matching read passes, a
    changed corpus raises 'stale', and an append DROPS the stored
    fingerprint (the content no longer matches what it vouched for) from
    both the catalog stamp and the sidecar."""
    from imops_spark.functions.similarity import (
        _emb_read_sidecar,
        corpus_fingerprint,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    fp = corpus_fingerprint(docs)
    emb = _emb(spark)
    table, path = "emb_idx_fp", str(tmp_path / "idx")
    try:
        embedding_write_index(
            emb, table, family="hashed_md5", dim=16, path=path, fingerprint=fp
        )
        assert _emb_stored_props(spark, table)["fingerprint"] == fp
        assert _emb_read_sidecar(spark, path)["fingerprint"] == fp
        ok = embedding_read_index(spark, table, fingerprint=fp)
        assert ok.count() > 0
        changed = corpus_fingerprint(docs.limit(10))
        with pytest.raises(ValueError, match="stale"):
            embedding_read_index(spark, table, fingerprint=changed)
        # append invalidates the fingerprint everywhere
        embedding_write_index(
            emb.withColumn("doc_id", F.col("doc_id") + 10_000),
            table,
            family="hashed_md5",
            dim=16,
            path=path,
            mode="append",
        )
        assert "fingerprint" not in _emb_stored_props(spark, table)
        assert "fingerprint" not in _emb_read_sidecar(spark, path)
        with pytest.raises(ValueError, match="stale"):
            embedding_read_index(spark, table, fingerprint=fp)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cross_session_registration_from_sidecar(spark, tmp_path):
    """Table properties die with the session-local catalog; the sidecar
    stamp survives on disk.  embedding_register_index re-creates the
    external table from the path, restores the stamp (guards enforce
    again), and the re-registered index probes identically."""
    from imops_spark.functions.similarity import (
        corpus_fingerprint,
        embedding_register_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    fp = corpus_fingerprint(docs)
    emb = _emb(spark)
    table, path = "emb_idx_xsession", str(tmp_path / "idx")
    try:
        embedding_write_index(
            emb, table, family="hashed_md5", dim=16, path=path, fingerprint=fp
        )
        q = spark.table(table).filter(F.col("doc_id") < 5).collect()
        before = {
            tuple(r)
            for r in embedding_index_topk(
                spark, table, spark.createDataFrame(q), k=3, family="hashed_md5"
            ).collect()
        }
        # simulate a new session: the catalog entry (and its properties)
        # are gone, the files + sidecar remain
        spark.sql(f"DROP TABLE {table}")
        with pytest.raises(Exception):
            spark.table(table).count()

        restored = embedding_register_index(spark, table, path)
        assert sorted(restored.columns) == ["doc_id", "embedding"]
        assert _emb_stored_props(spark, table)["fingerprint"] == fp
        after = {
            tuple(r)
            for r in embedding_index_topk(
                spark,
                table,
                spark.createDataFrame(q),
                k=3,
                family="hashed_md5",
                dim=16,
            ).collect()
        }
        assert after == before and len(after) > 0
        with pytest.raises(ValueError, match="family"):
            embedding_read_index(spark, table, family="model_v2")
        # cross-process MAINTENANCE: the re-registered table must accept
        # bucketed appends (the recreate carries the original bucket spec;
        # an unbucketed recreate fails 'Specified bucketing does not
        # match' — reproduced pre-fix)
        n_before = spark.table(table).count()
        embedding_write_index(
            emb.withColumn("doc_id", F.col("doc_id") + 50_000),
            table,
            family="hashed_md5",
            dim=16,
            path=path,
            mode="append",
        )
        assert spark.table(table).count() == 2 * n_before
        with pytest.raises(ValueError, match="sidecar"):
            embedding_register_index(
                spark, "emb_idx_nothing", str(tmp_path / "missing")
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_query_dim_mismatch_raises_cleanly(spark, tmp_path):
    """A wrong-dim query side must raise the stamp error from the plan,
    not an opaque numpy shape error inside the executor GEMM; stamp
    values with quotes are refused before any SQL splicing."""
    emb = _emb(spark, dim=16)
    table = "emb_idx_qdim"
    try:
        embedding_write_index(
            emb, table, family="hashed_md5", dim=16, path=str(tmp_path / "idx")
        )
        bad_q = _emb(spark, dim=32).filter(F.col("doc_id") < 3)
        with pytest.raises(Exception, match="length != index dim"):
            embedding_index_topk(spark, table, bad_q, k=3).collect()
        with pytest.raises(ValueError, match="plain identifiers"):
            embedding_write_index(
                emb, "emb_idx_badfam", family="o'brien", dim=16,
                path=str(tmp_path / "bad"),
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_maintenance_fails_fast_without_index(spark, tmp_path):
    """Starting maintenance against a missing or mismatched index must
    raise at start() time, not as a StreamingQueryException out of the
    first micro-batch."""
    from imops_spark.streaming.similarity import (
        start_embedding_index_maintenance,
    )

    static = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet("/root/testdata/sf0.001")
        .select("doc_id", "text")
    )
    with pytest.raises(ValueError, match="no stamp"):
        start_embedding_index_maintenance(
            stream, "emb_idx_never_built", dim=16,
            checkpoint=str(tmp_path / "ck1"),
        )
    try:
        embedding_write_index(
            _emb(spark, dim=16), "emb_idx_ff", family="hashed_md5", dim=16,
            path=str(tmp_path / "idx"),
        )
        with pytest.raises(ValueError, match="would mix"):
            start_embedding_index_maintenance(
                stream, "emb_idx_ff", dim=32,
                checkpoint=str(tmp_path / "ck2"),
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS emb_idx_ff")
