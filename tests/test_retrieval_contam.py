"""Round-8b additions: BM25 retrieval, the per-eval contamination report,
and cross-corpus (semantic) embedding decontamination."""

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# contamination_report_df
# ---------------------------------------------------------------------------


def test_contamination_report_planted_leak(spark):
    """The eval doc containing a verbatim >= k+window-1 char leak reports
    n_hit > 0; the clean eval doc reports exactly 0 hits; totals are sane
    (0 <= n_hit <= n_fps, frac = n_hit/n_fps)."""
    from imops_spark.functions.curate import (
        contamination_pairs_df,
        contamination_report_df,
    )

    leak = "the secret benchmark answer is forty two exactly"
    train = spark.createDataFrame(
        [
            (0, f"some long training text with {leak} embedded in the middle"),
            (1, "perfectly clean training document about distributed joins"),
            (2, "another clean one discussing parquet row group statistics"),
        ],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(100, f"eval question: {leak}?"), (101, "unrelated eval prompt xyzzy")],
        "doc_id long, text string",
    )
    rep = {r["eval_id"]: r for r in contamination_report_df(train, holdout).collect()}
    assert set(rep) == {100, 101}
    assert rep[100]["n_hit"] > 0
    assert rep[101]["n_hit"] == 0
    for r in rep.values():
        assert 0 <= r["n_hit"] <= r["n_fps"]
        assert r["frac"] == pytest.approx(r["n_hit"] / r["n_fps"], abs=1e-6)

    # consistency with the pair scan: an eval doc has n_hit >= 1 iff it
    # appears in contamination_pairs_df at min_shared=1
    pairs = contamination_pairs_df(train, holdout, min_shared=1).collect()
    flagged = {r["eval_id"] for r in pairs}
    assert flagged == {e for e, r in rep.items() if r["n_hit"] > 0}


def test_contamination_report_train_side_never_shuffles(spark):
    """The 100 TB contract: the train-side fingerprint stream feeds only
    broadcast joins — no Exchange may sit between the train scan and the
    probe (the eval set broadcasts, not the corpus)."""
    from imops_spark.functions.curate import contamination_report_df

    train = spark.range(200).selectExpr(
        "id AS doc_id", "repeat(concat('w', CAST(id AS STRING), ' '), 30) AS text"
    )
    holdout = spark.range(10).selectExpr(
        "id + 1000 AS doc_id", "repeat(concat('w', CAST(id AS STRING), ' '), 30) AS text"
    )
    plan = (
        contamination_report_df(train, holdout)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the probe of train fps must be a LeftSemi BroadcastHashJoin building
    # on the (broadcast) eval fp set — train rows enter no sort-merge join
    # and therefore no train-sized exchange; the hash exchanges that remain
    # (eval fp dedup, the final groupBy) are bounded by the EVAL side
    assert "BroadcastHashJoin" in plan and "LeftSemi, BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_contamination_hits_stream_multibatch_and_replay(spark, tmp_path):
    """The streamed hit-log report over multiple micro-batches equals the
    batch report; a full re-ingestion with a FRESH checkpoint (the
    worst-case at-least-once replay — every batch delivered twice) leaves
    the report IDENTICAL (monotone set union + reader dedup); a missing
    log reports all n_hit = 0 without erroring."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from imops_spark.functions.curate import contamination_report_df
    from imops_spark.streaming.curate import (
        contamination_report_from_hits,
        start_contamination_hits_maintenance,
    )

    leak_a = "the secret benchmark answer is forty two exactly"
    leak_b = "another planted evaluation passage that leaks verbatim"
    d = tmp_path / "trainstream"
    d.mkdir()
    batches = [
        pd.DataFrame({"doc_id": [0], "text": [f"training text with {leak_a} inside"]}),
        pd.DataFrame({"doc_id": [1], "text": ["clean doc about shuffle hash joins"]}),
        pd.DataFrame({"doc_id": [2], "text": [f"prefix {leak_b} suffix padding words"]}),
    ]
    for i, b in enumerate(batches):
        pq.write_table(
            pa.Table.from_pandas(b, preserve_index=False), d / f"b{i}.parquet"
        )
    holdout = spark.createDataFrame(
        [
            (100, f"eval item one: {leak_a}?"),
            (101, f"eval item two: {leak_b}!"),
            (102, "untouched eval prompt xyzzy plugh"),
        ],
        "doc_id long, text string",
    )

    # missing log: zero hits, no error
    empty = {
        r["eval_id"]: r
        for r in contamination_report_from_hits(
            spark, str(tmp_path / "never_written"), holdout
        ).collect()
    }
    assert set(empty) == {100, 101, 102}
    assert all(r["n_hit"] == 0 and r["frac"] == 0.0 for r in empty.values())

    def drain(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        q = start_contamination_hits_maintenance(
            stream, holdout, str(tmp_path / "hits"), checkpoint=str(tmp_path / ckpt)
        )
        q.awaitTermination(120)

    drain("ckpt1")
    got1 = sorted(
        map(tuple, contamination_report_from_hits(
            spark, str(tmp_path / "hits"), holdout).collect())
    )
    train = spark.createDataFrame(pd.concat(batches))
    want = sorted(map(tuple, contamination_report_df(train, holdout).collect()))
    assert got1 == want
    by_id = {t[0]: t for t in got1}
    assert by_id[100][2] > 0 and by_id[101][2] > 0 and by_id[102][2] == 0

    # replay: fresh checkpoint re-appends every batch's hits; report unchanged
    drain("ckpt2")
    got2 = sorted(
        map(tuple, contamination_report_from_hits(
            spark, str(tmp_path / "hits"), holdout).collect())
    )
    assert got2 == got1


# ---------------------------------------------------------------------------
# bm25_topk_df
# ---------------------------------------------------------------------------


def _bm25_reference(rows, query, k1=1.2, b=0.75, top_k=20):
    """Independent driver-side BM25 with the same micro-integer rounding."""
    norm = lambda s: re.sub(r"\s+", " ", s.strip().lower())
    docs = {i: [t for t in norm(t).split(" ") if t] for i, t in rows if t is not None}
    terms = sorted({t for t in norm(query).split(" ") if t})
    n_docs = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n_docs
    k1p1, omb = k1 + 1.0, 1.0 - b
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    out = {}
    for i, toks in docs.items():
        dl = len(toks)
        micros, n_terms = 0, 0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * ((tf * k1p1) / (tf + k1 * (omb + b * (dl / avgdl))))
            micros += math.floor(s * 1000000.0 + 0.5)
            n_terms += 1
        if n_terms:
            out[i] = (n_terms, micros)
    ranked = sorted(out.items(), key=lambda kv: (-kv[1][1], kv[0]))[:top_k]
    return [
        (i, nt, mic, r + 1) for r, (i, (nt, mic)) in enumerate(ranked)
    ]


def test_bm25_differential_vs_python(spark):
    """bm25_topk_df == an independent driver-side BM25 (same micro
    rounding), exact to the integer micro unit, including rank order."""
    from imops_spark.functions.text import bm25_topk_df

    rows = [
        (0, "spark shuffles the hash join build side"),
        (1, "a hash   HASH hash index beats a scan for point lookups"),
        (2, "broadcast join avoids the shuffle entirely"),
        (3, "columnar scan with predicate pushdown"),
        (4, None),
        (5, "hash join and sort merge join trade memory for time"),
        (6, "unrelated text about gardening and tomatoes"),
    ]
    query = "Hash  JOIN scan"
    got = [
        (r["doc_id"], r["n_terms"], r["score_micro"], r["rank"])
        for r in bm25_topk_df(
            spark.createDataFrame(rows, "doc_id long, text string"), query, top_k=5
        ).collect()
    ]
    assert got == _bm25_reference(rows, query, top_k=5)


def test_bm25_empty_query_raises(spark):
    from imops_spark.functions.text import bm25_topk_df

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk_df(docs, "   ")


def test_bm25_topk_is_take_ordered(spark):
    """The final top-k must compile to TakeOrderedAndProject (distributed
    heap), never a global Sort of the scored corpus."""
    from imops_spark.functions.text import bm25_topk_df

    docs = spark.range(100).selectExpr(
        "id AS doc_id", "concat('hash join number ', CAST(id AS STRING)) AS text"
    )
    plan = (
        bm25_topk_df(docs, "hash join", top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bm25_index_probe_equals_inline(spark, tmp_path):
    """The persisted-index probe returns BIT-IDENTICAL rows to the inline
    operator (shared scoring tail; df derived from postings == df derived
    from the filtered explode); the stamp guards fire: unstamped tables
    refused, stale fingerprints refused, tokenizer-identity mismatches
    refused; cross-session re-registration restores the probe."""
    from imops_spark.functions import text as tx
    from imops_spark.functions.similarity import corpus_fingerprint
    from imops_spark.functions.text import (
        bm25_index_topk,
        bm25_register_index,
        bm25_topk_df,
        bm25_write_index,
    )

    docs = spark.range(200).selectExpr(
        "id AS doc_id",
        # id % 11 == 10 -> zero-token docs: present in n_docs/avgdl but
        # absent from the postings — the stamped stats must count them
        # exactly as the inline operator's corpus aggregation does
        "CASE WHEN id % 11 = 10 THEN '   ' ELSE"
        " concat('hash join number ', CAST(id AS STRING),"
        " CASE WHEN id % 3 = 0 THEN ' scan scan' ELSE '' END,"
        " CASE WHEN id % 7 = 0 THEN ' vector' ELSE '' END) END AS text",
    )
    fp = corpus_fingerprint(docs)
    table = "bm25_idx_test"
    path = str(tmp_path / "bm25idx")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    bm25_write_index(docs, table, num_buckets=4, path=path, fingerprint=fp)

    q = "scan  Vector HASH"
    inline = [tuple(r) for r in bm25_topk_df(docs, q, top_k=7).collect()]
    probe = [
        tuple(r)
        for r in bm25_index_topk(spark, table, q, top_k=7, fingerprint=fp).collect()
    ]
    assert probe == inline and len(probe) == 7

    # stale corpus -> clear error
    changed = docs.filter("doc_id < 150")
    with pytest.raises(ValueError, match="stale"):
        bm25_index_topk(
            spark, table, q, fingerprint=corpus_fingerprint(changed)
        )
    # unstamped table -> refused
    spark.range(3).selectExpr(
        "'t' AS token", "id AS doc_id", "id AS tf", "1 AS dl"
    ).write.saveAsTable("bm25_not_an_index")
    try:
        with pytest.raises(ValueError, match="stamp"):
            bm25_index_topk(spark, "bm25_not_an_index", q)
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_not_an_index")
    # tokenizer-identity mismatch -> refused (a future normalization bump
    # must not silently score against old postings)
    orig = tx._BM25_NORM_FAMILY
    try:
        tx._BM25_NORM_FAMILY = "ws_lower_v2"
        with pytest.raises(ValueError, match="tokenized as"):
            bm25_index_topk(spark, table, q)
    finally:
        tx._BM25_NORM_FAMILY = orig

    # cross-session reuse: the catalog entry dies, the sidecar does not
    spark.sql(f"DROP TABLE {table}")
    bm25_register_index(spark, table, path)
    probe2 = [
        tuple(r)
        for r in bm25_index_topk(spark, table, q, top_k=7, fingerprint=fp).collect()
    ]
    assert probe2 == inline
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    # missing sidecar -> clear error
    with pytest.raises(ValueError, match="sidecar"):
        bm25_register_index(spark, "bm25_idx_none", str(tmp_path / "nowhere"))


def test_bm25_index_probe_bucket_prunes(spark, tmp_path):
    """The probe's postings scans must be BUCKET-PRUNED to the query
    terms' buckets (SelectedBucketsCount < total) — the physical property
    that makes the index a probe-few-postings read instead of a corpus
    scan at 100 TB."""
    import re

    from imops_spark.functions.text import bm25_index_topk, bm25_write_index

    docs = spark.range(100).selectExpr(
        "id AS doc_id", "concat('alpha beta gamma delta word', CAST(id AS STRING)) AS text"
    )
    table = "bm25_prune_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    bm25_write_index(docs, table, num_buckets=8, path=str(tmp_path / "idx"))
    try:
        plan = (
            bm25_index_topk(spark, table, "alpha")
            ._jdf.queryExecution().executedPlan().toString()
        )
        counts = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert counts, "postings scan lost its bucket spec"
        assert all(int(sel) < int(tot) for sel, tot in counts), counts
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# bm25_phrase_topk_df / bm25_phrase_index_topk
# ---------------------------------------------------------------------------


def _bm25_phrase_reference(rows, phrase, k1=1.2, b=0.75, top_k=20):
    """Independent driver-side phrase BM25: direct token-list scanning
    (no positional index), overlapping occurrences count, same
    micro-integer rounding as the operator."""
    norm = lambda s: re.sub(r"\s+", " ", s.strip().lower())
    docs = {i: [t for t in norm(t).split(" ") if t] for i, t in rows if t is not None}
    ptoks = [t for t in norm(phrase).split(" ") if t]
    m = len(ptoks)
    n_docs = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n_docs
    cand = {}
    for i, toks in docs.items():
        tf = sum(1 for p in range(len(toks) - m + 1) if toks[p : p + m] == ptoks)
        if tf:
            cand[i] = (tf, len(toks))
    df = len(cand)
    out = []
    for i, (tf, dl) in cand.items():
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        s = idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
        out.append((i, tf, math.floor(s * 1000000.0 + 0.5)))
    out.sort(key=lambda r: (-r[2], r[0]))
    return [(i, tf, mic, r + 1) for r, (i, tf, mic) in enumerate(out[:top_k])]


def test_bm25_phrase_differential_vs_python(spark):
    """bm25_phrase_topk_df == an independent driver-side phrase scan —
    including the hard cases: a repeated-token phrase ('a a') whose
    occurrences OVERLAP ('a a a' counts 2), phrase terms present but
    never adjacent (no candidate), and a doc missing one term."""
    from imops_spark.functions.text import bm25_phrase_topk_df

    rows = [
        (0, "a a a big build side"),  # 'a a' twice (overlap)
        (1, "the a hash a join a"),  # 'a' present, never adjacent
        (2, "a a hash join trade memory"),  # once
        (3, "hash join a a a a scan"),  # three times
        (4, None),
        (5, "no letter token here"),
    ]
    for phrase in ["a  A", "hash join", "a"]:
        got = [
            (r["doc_id"], r["phrase_tf"], r["score_micro"], r["rank"])
            for r in bm25_phrase_topk_df(
                spark.createDataFrame(rows, "doc_id long, text string"),
                phrase,
                top_k=5,
            ).collect()
        ]
        assert got == _bm25_phrase_reference(rows, phrase, top_k=5), phrase


def test_bm25_phrase_empty_raises(spark):
    from imops_spark.functions.text import bm25_phrase_topk_df

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        bm25_phrase_topk_df(docs, "  \t ")


def test_bm25_phrase_index_equals_inline(spark, tmp_path):
    """The positional-index probe returns BIT-IDENTICAL rows to the
    inline phrase operator; a TERM probe on the same positional index
    still works (column pruning drops pos); a phrase probe on a
    NON-positional index raises; re-registration from the sidecar
    restores the positional schema (pos column + bucket spec)."""
    from imops_spark.functions.text import (
        bm25_index_topk,
        bm25_phrase_index_topk,
        bm25_phrase_topk_df,
        bm25_register_index,
        bm25_topk_df,
        bm25_write_index,
    )

    docs = spark.range(300).selectExpr(
        "id AS doc_id",
        "concat('pad', CAST(id AS STRING),"
        " CASE WHEN id % 3 = 0 THEN ' hash join' ELSE ' hash scan join' END,"
        " CASE WHEN id % 5 = 0 THEN ' hash join hash join' ELSE '' END)"
        " AS text",
    )
    table = "bm25_pidx_test"
    path = str(tmp_path / "pidx")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    bm25_write_index(docs, table, num_buckets=4, path=path, positions=True)
    try:
        inline = [
            tuple(r) for r in bm25_phrase_topk_df(docs, "hash join", top_k=9).collect()
        ]
        probe = [
            tuple(r)
            for r in bm25_phrase_index_topk(spark, table, "hash join", top_k=9).collect()
        ]
        assert probe == inline and len(probe) == 9

        # term probes are unaffected by the positional column
        t_inline = [tuple(r) for r in bm25_topk_df(docs, "hash scan", top_k=9).collect()]
        t_probe = [
            tuple(r) for r in bm25_index_topk(spark, table, "hash scan", top_k=9).collect()
        ]
        assert t_probe == t_inline

        # cross-session re-registration keeps the positional schema
        spark.sql(f"DROP TABLE {table}")
        bm25_register_index(spark, table, path)
        probe2 = [
            tuple(r)
            for r in bm25_phrase_index_topk(spark, table, "hash join", top_k=9).collect()
        ]
        assert probe2 == inline
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")

    # non-positional index refuses phrase probes
    table2 = "bm25_npidx_test"
    spark.sql(f"DROP TABLE IF EXISTS {table2}")
    bm25_write_index(docs, table2, num_buckets=4, path=str(tmp_path / "npidx"))
    try:
        with pytest.raises(ValueError, match="positional"):
            bm25_phrase_index_topk(spark, table2, "hash join")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table2}")


def test_bm25_phrase_probe_bucket_prunes_and_takes_ordered(spark, tmp_path):
    """The phrase probe keeps the two physical properties that make it
    scale: postings scans bucket-pruned to the phrase terms, and the
    final top-k a TakeOrderedAndProject (never a global sort)."""
    import re as _re

    from imops_spark.functions.text import bm25_phrase_index_topk, bm25_write_index

    docs = spark.range(100).selectExpr(
        "id AS doc_id",
        "concat('alpha beta gamma delta word', CAST(id AS STRING)) AS text",
    )
    table = "bm25_pprune_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    bm25_write_index(
        docs, table, num_buckets=8, path=str(tmp_path / "idx"), positions=True
    )
    try:
        plan = (
            bm25_phrase_index_topk(spark, table, "alpha beta")
            ._jdf.queryExecution().executedPlan().toString()
        )
        counts = _re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert counts, "postings scan lost its bucket spec"
        assert all(int(sel) < int(tot) for sel, tot in counts), counts
        assert "TakeOrderedAndProject" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# cross_near_dup_df / decontaminate_by_embedding_df
# ---------------------------------------------------------------------------


def _random_vectors(n, dim, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim)


def test_cross_near_dup_differential_vs_numpy(spark):
    """cross_near_dup_df == brute-force numpy cosine over the cross
    product, at the rounded-6dp threshold semantics."""
    from imops_spark.functions.dedup import cross_near_dup_df

    dim, thr = 16, 0.35
    cm = _random_vectors(40, dim, 7)
    qm = _random_vectors(9, dim, 8)
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(cm)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + j, v.tolist()) for j, v in enumerate(qm)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["corpus_id"], r["query_id"]): r["cosine"]
        for r in cross_near_dup_df(corpus, queries, threshold=thr).collect()
    }
    cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    cos = np.round(cn @ qn.T, 6)
    want = {
        (i, 100 + j): cos[i, j]
        for i, j in zip(*np.nonzero(cos >= thr))
    }
    assert got == want


def test_decontaminate_by_embedding_drops_exactly_flagged(spark):
    from imops_spark.functions.dedup import (
        cross_near_dup_df,
        decontaminate_by_embedding_df,
    )

    cm = _random_vectors(30, 8, 11)
    qm = cm[[3, 17]] + 0.01 * _random_vectors(2, 8, 12)  # near-dups of 3, 17
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(cm)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(j, v.tolist()) for j, v in enumerate(qm)],
        "vec_id long, embedding array<double>",
    )
    flagged = {
        r["corpus_id"]
        for r in cross_near_dup_df(corpus, queries, threshold=0.95).collect()
    }
    assert {3, 17} <= flagged
    kept = {r["vec_id"] for r in decontaminate_by_embedding_df(
        corpus, queries, threshold=0.95).collect()}
    assert kept == set(range(30)) - flagged


def test_cross_near_dup_string_ids_and_empty_queries(spark):
    """Id dtypes are derived from the inputs (string ids round-trip through
    the Arrow schema — the bpe_apply_df hardcoded-long lesson); an empty
    query side yields an empty, correctly-typed frame."""
    from imops_spark.functions.dedup import cross_near_dup_df

    corpus = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("q-1", [1.0, 0.001])], "vec_id string, embedding array<double>"
    )
    rows = cross_near_dup_df(corpus, queries, threshold=0.9).collect()
    assert [(r["corpus_id"], r["query_id"]) for r in rows] == [("doc-a", "q-1")]

    empty = cross_near_dup_df(
        corpus, queries.filter(F.lit(False)), threshold=0.9
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "corpus_id", "query_id", "cosine",
    ]
    assert empty.schema["corpus_id"].dataType.simpleString() == "string"


def test_cross_near_dup_broadcast_contract(spark, monkeypatch):
    """A query side past the broadcast budget raises the clear contract
    error instead of OOMing the driver."""
    from imops_spark.functions import similarity
    from imops_spark.functions.dedup import cross_near_dup_df

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(similarity, "_TOPK_BROADCAST_MAX", 3)
    with pytest.raises(ValueError, match="broadcast contract"):
        cross_near_dup_df(corpus, queries)
