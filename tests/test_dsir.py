"""DSIR importance resampling (curate.dsir_logweights_df / dsir_sample_df).

Differential oracle: a pure-python md5 re-derivation of the hashed-n-gram
bucket models and micro-nat log-weights — an independent implementation of
the same published recipe (Xie et al. 2023), exact to the integer grid.
The cross-engine (DuckDB) check is the driver gate `cur_dsir`.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from imops_spark.functions.curate import dsir_logweights_df, dsir_sample_df

TARGETY = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the brown tree",
    "a quick fox and a lazy dog play in the sun",
    "brown fox quick dog lazy the the the",
]
RAWY = [
    "stock prices fell sharply amid market turmoil today",
    "the committee approved the quarterly budget revision",
    "insert tab a into slot b and rotate clockwise",
    "error code forty two retry the transaction later",
    "qzx vbn mlk jhg fds apw oeiru tyqn",
]


def _corpus(spark, with_empty=True):
    rows = [(i, t) for i, t in enumerate(TARGETY + RAWY)]
    if with_empty:
        rows += [(90, "   "), (91, None)]  # no tokens / NULL text: absent
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGETY)], "doc_id long, text string"
    )


def _py_feats(text):
    toks = [x for x in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if x]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_h60(s, salt):
    return int(hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:15], 16)


def _py_weights(docs, target, B, a=1.0, salt=50):
    tc, rc = {}, {}
    for _, t in target:
        for f in _py_feats(t):
            b = _py_h60(f, salt) % B
            tc[b] = tc.get(b, 0) + 1
    for _, t in docs:
        for f in _py_feats(t):
            b = _py_h60(f, salt) % B
            rc[b] = rc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for did, t in docs:
        fs = _py_feats(t)
        if not fs:
            continue
        s = 0
        for f in fs:
            b = _py_h60(f, salt) % B
            lr = math.log(
                ((tc.get(b, 0) + a) / (tt + a * B))
                / ((rc.get(b, 0) + a) / (rt + a * B))
            )
            s += round(lr * 1e6)
        out[did] = (len(fs), s)
    return out


def test_logweights_match_python_rederivation(spark):
    docs = _corpus(spark)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir_logweights_df(docs, _target(spark), num_buckets=128).collect()
    }
    py_docs = [(i, t) for i, t in enumerate(TARGETY + RAWY)]
    want = _py_weights(py_docs, list(enumerate(TARGETY)), B=128)
    assert got == want
    # zero-token and NULL docs produce no features and are absent
    assert 90 not in got and 91 not in got


def test_target_like_docs_score_higher(spark):
    docs = _corpus(spark, with_empty=False)
    w = {
        r["doc_id"]: r["logw_micro"] / r["n_feats"]
        for r in dsir_logweights_df(docs, _target(spark), num_buckets=256).collect()
    }
    tgt_ids = set(range(len(TARGETY)))
    tgt_mean = sum(w[i] for i in tgt_ids) / len(tgt_ids)
    raw_ids = set(w) - tgt_ids
    raw_mean = sum(w[i] for i in raw_ids) / len(raw_ids)
    assert tgt_mean > raw_mean  # the selection signal DSIR exists for
    assert max(w[i] for i in raw_ids) < min(w[i] for i in tgt_ids)


def test_sample_topk_and_gumbel(spark):
    docs = _corpus(spark, with_empty=False)
    tgt = _target(spark)
    plain = dsir_sample_df(docs, tgt, k=4, num_buckets=256, gumbel=False)
    rows = plain.collect()
    assert [r["key"] for r in rows] == sorted(
        (r["key"] for r in rows), reverse=True
    )
    # gumbel=False is pure argmax-k: key IS the log weight
    assert all(r["key"] == r["logw_micro"] for r in rows)
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_logweights_df(docs, tgt, num_buckets=256).collect()
    }
    want_top = set(sorted(w, key=lambda d: (-w[d], d))[:4])
    assert {r["doc_id"] for r in rows} == want_top

    g1 = dsir_sample_df(docs, tgt, k=4, num_buckets=256).collect()
    g2 = dsir_sample_df(docs, tgt, k=4, num_buckets=256).collect()
    assert g1 == g2  # hash-derived Gumbel: reruns are identical
    # the gumbel key is the log weight plus the doc's micro-snapped variate
    for r in g1:
        h = int(
            hashlib.md5(f"51|{r['doc_id']}".encode()).hexdigest()[:15], 16
        )
        u = (h % 1_000_000 + 0.5) / 1_000_000.0
        assert r["key"] == r["logw_micro"] + round(-math.log(-math.log(u)) * 1e6)


def test_validation_and_plan(spark):
    docs = _corpus(spark, with_empty=False)
    tgt = _target(spark)
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_logweights_df(docs, tgt, num_buckets=0)
    with pytest.raises(ValueError, match="add_k"):
        dsir_logweights_df(docs, tgt, add_k=0.0)
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_sample_df(docs, tgt, k=0)

    w = dsir_logweights_df(docs, tgt, num_buckets=128)
    plan = w._jdf.queryExecution().executedPlan().toString()
    # model tables broadcast; the corpus side never sort-merge joins
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    s = dsir_sample_df(docs, tgt, k=3, num_buckets=128)
    splan = s._jdf.queryExecution().executedPlan().toString()
    # global top-k must be per-partition heaps + driver merge, not a sort
    assert "TakeOrderedAndProject" in splan
