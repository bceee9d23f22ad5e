"""Round-10 Arrow twins: hashed_embedding_local_df, classifier_score_local_df,
and md5 winnowing on the Arrow kernel — each re-expresses an interpreted
row-local JVM HOF (the class measured bimodal in long-lived mixed JVMs) as a
stateless mapInPandas kernel, bit-identical to the JVM form (the
token_entropy_local_df recipe, round 9)."""

import numpy as np
import pytest


def test_round_half_up_6_vec_matches_decimal():
    from imops_spark.functions.text import _round_half_up_6, _round_half_up_6_vec

    rng = np.random.default_rng(19)
    x = np.concatenate([
        rng.uniform(-1, 1, 400),
        np.array([0.0, 1.0, -1.0, 0.1234565, -0.1234565, 0.9999995,
                  -0.9999995, 0.49999999999999994, 2.5e-7, -2.5e-7]),
    ])
    got = _round_half_up_6_vec(x)
    want = np.array([_round_half_up_6(float(v)) for v in x])
    assert got.tolist() == want.tolist()


def test_sigmoid_round6_vec_matches_decimal_arbiter():
    from imops_spark.functions.curate import (
        _sigmoid_round6_decimal,
        _sigmoid_round6_vec,
    )

    lm = np.array(
        [0, 1, -1, 100000, -100000, 2_000_000, -2_000_000, 13_862_944,
         -13_862_944, 57, -57, 999_999, 7_000_000],
        dtype=np.int64,
    )
    got = _sigmoid_round6_vec(lm)
    for j, v in enumerate(lm):
        x = float(np.float64(v) / 1e6)
        exact = _sigmoid_round6_decimal(x)
        # off the tie band the fast path must equal the exact arbiter
        assert abs(got[j] - exact) < 1.5e-6, (v, got[j], exact)


def test_hashed_embedding_arrow_twin(spark):
    """batch == hof == arrow bit-for-bit across dims, including NULL
    text, whitespace-only docs, multi-byte tokens, and single-token
    docs; arrow plan has no Exchange and no interpreted filter HOFs."""
    from imops_spark.functions.text import (
        hashed_embedding_df,
        hashed_embedding_local_df,
    )

    docs = spark.range(300).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 29 = 0 THEN NULL"
        " WHEN id % 31 = 0 THEN '   '"
        " WHEN id % 13 = 0 THEN 'single'"
        " ELSE concat('tok', CAST(id % 17 AS STRING), ' foo 世界 bar',"
        " repeat(' w', CAST(id % 7 AS INT)), ' ', CAST(id % 50 AS STRING))"
        " END AS text",
    )
    for dim in (1, 16, 60):
        b = sorted(
            (r[0], tuple(r[1]))
            for r in hashed_embedding_df(docs, dim=dim).collect()
        )
        h = sorted(
            (r[0], tuple(r[1]))
            for r in hashed_embedding_local_df(
                docs, dim=dim, strategy="hof"
            ).collect()
        )
        a = sorted(
            (r[0], tuple(r[1]))
            for r in hashed_embedding_local_df(
                docs, dim=dim, strategy="arrow"
            ).collect()
        )
        assert b == h == a, dim
    plan = (
        hashed_embedding_local_df(docs, dim=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan and "Exchange" not in plan
    with pytest.raises(ValueError, match="strategy"):
        hashed_embedding_local_df(docs, strategy="window")
    with pytest.raises(ValueError, match="dim"):
        hashed_embedding_local_df(docs, dim=61)


def test_hashed_embedding_arrow_streaming(spark, tmp_path):
    """The arrow twin drains a stream to exactly the batch rows."""
    from imops_spark.functions.text import hashed_embedding_local_df
    from imops_spark.streaming.events import run_stream_to_memory

    static = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet("/root/testdata/sf0.001")
        .select("doc_id", "text")
    )
    out = hashed_embedding_local_df(stream, dim=8)
    assert out.isStreaming
    drained = run_stream_to_memory(
        out, "emb_arrow_twin_test", spark, mode="append"
    )
    want = sorted(
        (r[0], tuple(r[1]))
        for r in hashed_embedding_local_df(
            static.select("doc_id", "text"), dim=8, strategy="arrow"
        ).collect()
    )
    got = sorted((r[0], tuple(r[1])) for r in drained.collect())
    assert got == want


def test_classifier_score_arrow_twin(spark):
    """groupBy == hof == arrow bit-for-bit, including negative bias,
    non-default salt/buckets, single-token docs (no bigrams), and
    out-of-range weight buckets (ignored by every form)."""
    from imops_spark.functions.curate import (
        classifier_score_df,
        classifier_score_local_df,
    )

    docs = spark.range(400).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 29 = 0 THEN NULL"
        " WHEN id % 31 = 0 THEN '   '"
        " WHEN id % 13 = 0 THEN 'single'"
        " ELSE concat('tok', CAST(id % 17 AS STRING), ' foo 世界 bar ',"
        " CAST(id % 50 AS STRING))"
        " END AS text",
    )
    weights = spark.range(600).selectExpr(  # 512..599 are out of range
        "id AS bucket",
        "CAST((id * 2654435761) % 1000003 AS DOUBLE)"
        " / CAST(1000003 AS DOUBLE) - CAST(0.5 AS DOUBLE) AS weight",
    )
    for kw in (
        {"num_buckets": 512, "bias": 0.1},
        {"num_buckets": 64, "bias": -0.7, "salt": 9},
    ):
        g = sorted(
            map(tuple, classifier_score_df(docs, weights, **kw).collect())
        )
        h = sorted(
            map(
                tuple,
                classifier_score_local_df(
                    docs, weights, strategy="hof", **kw
                ).collect(),
            )
        )
        a = sorted(
            map(
                tuple,
                classifier_score_local_df(
                    docs, weights, strategy="arrow", **kw
                ).collect(),
            )
        )
        assert g == h == a, kw
    plan = (
        classifier_score_local_df(docs, weights, num_buckets=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan and "Exchange" not in plan
    with pytest.raises(ValueError, match="strategy"):
        classifier_score_local_df(docs, weights, strategy="fold")


def test_winnow_md5_arrow_twin(spark):
    """md5 winnowing on the Arrow kernel == window == local (fp-set and
    positional forms), on multi-byte text too; streams auto-route to the
    kernel since round 10."""
    from imops_spark.functions.text import (
        winnow_fingerprints_df,
        winnow_fp_set_df,
    )

    docs = spark.range(200).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 29 = 0 THEN NULL"
        " ELSE concat('the quick 世界 brown fox ', CAST(id % 23 AS STRING),"
        " ' jumps over the lazy dog ', repeat('abcdef ', CAST(id % 9 AS INT)))"
        " END AS text",
    )
    w = sorted(map(tuple, winnow_fp_set_df(docs, strategy="window").collect()))
    l = sorted(map(tuple, winnow_fp_set_df(docs, strategy="local").collect()))
    a = sorted(map(tuple, winnow_fp_set_df(docs, strategy="arrow").collect()))
    assert w == l == a
    pw = sorted(
        map(tuple, winnow_fingerprints_df(docs, strategy="window").collect())
    )
    pa = sorted(
        map(tuple, winnow_fingerprints_df(docs, strategy="arrow").collect())
    )
    assert pw == pa

    static = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet("/root/testdata/sf0.001")
        .select("doc_id", "text")
    )
    splan = (
        winnow_fp_set_df(stream)  # auto, md5
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "mapInPandas" in splan or "MapInPandas" in splan
