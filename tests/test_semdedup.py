"""SemDeDup differential tests: the clustered path (n_clusters > 1) pinned
against a full numpy re-derivation of the deterministic k-means +
within-cluster pruning, the saturated path against the global near-dup
rule, and the plan contract (one exchange feeding window, explode, and
the block-GEMM groups)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from imops_spark.functions.dedup import embedding_near_dup_df, semdedup_df


def _corpus(rng, n=40, dim=16, dup_every=5):
    base = rng.normal(size=(n, dim))
    rows = [(i, base[i].tolist()) for i in range(n)]
    for i in range(0, n, dup_every):
        rows.append((1000 + i, (base[i] + rng.normal(scale=1e-3, size=dim)).tolist()))
    return rows


def _numpy_semdedup(rows, k, thr, n_iter=5):
    """Re-derive centroids (ivf_centroids recipe: lowest-id sample, first-k
    init, spherical updates, empty keeps previous), top-1 assignment
    (argmax = lowest centroid on ties), and the lowest-lower-id drop rule."""
    ids = np.array(sorted(r[0] for r in rows))
    by_id = dict(rows)
    v = np.stack([np.asarray(by_id[i], dtype=np.float64) for i in ids])
    vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    c = vn[:k].copy()
    for _ in range(n_iter):
        a = (vn @ c.T).argmax(axis=1)
        for j in range(k):
            m = vn[a == j]
            if len(m):
                c[j] = m.sum(axis=0)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    a = (vn @ c.T).argmax(axis=1)
    assign = {int(ids[i]): int(a[i]) for i in range(len(ids))}
    dup_of = {}
    for x in range(len(ids)):
        for y in range(x):
            if a[x] == a[y] and round(float(vn[x] @ vn[y]), 6) >= thr:
                dup_of.setdefault(int(ids[x]), int(ids[y]))
    return assign, dup_of


def test_clustered_semdedup_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows = _corpus(rng)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["centroid_id"], r["dup_of"], r["keep"])
        for r in semdedup_df(emb, n_clusters=4, threshold=0.98).collect()
    }
    assign, dup_of = _numpy_semdedup(rows, 4, 0.98)
    assert set(out) == set(assign)
    for i in assign:
        assert out[i][0] == assign[i], f"assignment {i}"
        assert out[i][1] == dup_of.get(i), f"dup_of {i}"
        assert out[i][2] == (i not in dup_of), f"keep {i}"
    # the construction planted at least one dup per 5 docs
    assert sum(1 for v in out.values() if not v[2]) >= 8


def test_saturated_equals_global_near_dup(spark):
    """n_clusters=1 must equal the global rule derived from
    embedding_near_dup_df pairs (the independent block-GEMM operator)."""
    rng = np.random.default_rng(7)
    rows = _corpus(rng, n=30)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["dup_of"]
        for r in semdedup_df(emb, n_clusters=1, threshold=0.97).collect()
    }
    pairs = embedding_near_dup_df(emb, threshold=0.97).collect()
    exp = {}
    for r in pairs:
        a, b = r["id_a"], r["id_b"]
        exp[b] = min(exp.get(b, a), a)
    assert {k: v for k, v in out.items() if v is not None} == exp


def test_semdedup_small_cluster_single_block(spark):
    """block_target larger than every cluster -> nblk == 1 everywhere and
    results identical to a tiny block_target that forces multi-block."""
    rng = np.random.default_rng(11)
    rows = _corpus(rng, n=24)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = sorted(
        map(tuple, semdedup_df(emb, n_clusters=3, threshold=0.98).collect())
    )
    many = sorted(
        map(
            tuple,
            semdedup_df(
                emb, n_clusters=3, threshold=0.98, block_target=4
            ).collect(),
        )
    )
    assert one == many


def test_semdedup_pair_stage_single_exchange(spark, tmp_path):
    """The pair search (window count -> pair explode -> block-GEMM groups)
    must reuse the ONE centroid_id exchange; only the final dup join adds
    shuffles."""
    rng = np.random.default_rng(5)
    p = str(tmp_path / "emb")
    spark.createDataFrame(
        _corpus(rng, n=64), "vec_id long, embedding array<double>"
    ).write.parquet(p)
    emb = spark.read.parquet(p)
    from imops_spark.functions.dedup import _pair_replicated

    from pyspark.sql import Window

    from imops_spark.functions.similarity import ivf_assign_df, ivf_centroids

    cents = ivf_centroids(emb, n_centroids=4)
    assign = ivf_assign_df(emb, cents, n_probe=1)
    w_c = Window.partitionBy("centroid_id")
    staged = (
        assign.withColumn("__n", F.count(F.lit(1)).over(w_c))
        .select(
            "centroid_id",
            F.col("vec_id").alias("vid").cast("long"),
            F.col("vec").cast("array<double>").alias("vec"),
            F.least(F.ceil(F.col("__n") / F.lit(16)), F.lit(64))
            .cast("int")
            .alias("nblk"),
        )
        .withColumn("blk", F.pmod(F.xxhash64("vid"), F.col("nblk")).cast("int"))
    )
    from imops_spark.functions.dedup import _cosine_pairs_compute

    pairs = (
        _pair_replicated(staged, group_cols=("centroid_id",))
        .groupBy("centroid_id", "bi", "bj")
        .applyInPandas(
            _cosine_pairs_compute(0.98), "id_a long, id_b long, cosine double"
        )
    )
    pairs.collect()
    plan = (
        pairs._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange") == 1, plan
