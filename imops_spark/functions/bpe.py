"""Byte-pair-encoding tokenizer TRAINING at corpus scale.

The missing third leg of the tokenizer surface: ``text.bpe_pretokenize``
segments, ``text.bpe_token_count_df`` budgets, and this module LEARNS the
merge table — the part a training-data pipeline runs once per corpus
(Sennrich et al. 2016; the HuggingFace/SentencePiece trainer shape).

Scale design (the connected-components recipe, ``operators/graph.py``):
the ONLY corpus-scale pass is the word-frequency aggregation — one
map-side-combined ``groupBy(word)`` whose output cardinality is the
corpus' distinct-word count, not its token count.  The merge loop then
runs over that compact model:

- **driver path** (default when distinct words fit
  ``driver_threshold``): an exact python loop over ``{symbols: freq}`` —
  the same economics as every single-node BPE trainer, reached after
  Spark did the one pass those trainers cannot do;
- **distributed path** (forced or above threshold): each ROUND derives
  weighted adjacent-pair counts once (explode + map-side-combined
  groupBy, top-M as TakeOrderedAndProject), accepts the longest PREFIX
  of the ranked candidates that is provably identical to running the
  sequential loop (see ``_safe_batch`` — symbol-disjointness plus a
  created-pair count bound make up to ``batch_k`` merges per round
  exact, so N merges cost ~N/k jobs instead of N), applies the accepted
  merges ROW-LOCALLY as chained NATIVE string ``replace``s over a
  flanked double-space symbol encoding (exactly greedy-leftmost — the
  proof is in ``_train_distributed``'s docstring; symbols bind via
  ``F.lit`` Columns, never interpolated into SQL text, so symbols
  containing quotes/backslashes are safe), and ``localCheckpoint``s the
  words frame once per round — an ITERATIVE DataFrame loop must cut its
  lineage every round or the self-referential plan recompute compounds
  (``graph.py``'s measured 0.7 s -> 67 s lesson).

Both paths are EXACTLY deterministic (ties break on the pair itself) and
equality-tested against each other and a pure-python reference.  Merge
semantics: per round, the single most frequent adjacent symbol pair
(count desc, pair asc) merges everywhere with a greedy LEFTMOST scan
(``aaa`` under pair (a,a) becomes ``(aa, a)``) — the standard BPE rule,
applied identically in the fold, the python loop, and ``bpe_apply_df``.

``bpe_apply_df`` tokenizes with a learned merge table via an
Arrow-batched ``mapInPandas`` — iterative rank-ordered merging is the
one text operator here that genuinely cannot be expressed in built-in
column functions (the UDF-last-resort rule, satisfied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_freq_df",
    "bpe_pair_counts_df",
    "bpe_train_df",
    "bpe_apply_df",
    "bpe_vocab_df",
    "bpe_encode_df",
    "bpe_write_model",
    "bpe_read_model",
    "bpe_register_model",
]


def word_freq_df(docs: DataFrame) -> DataFrame:
    """The corpus' word-frequency model ``(word, freq)`` — whitespace
    words of the normalized text, the one corpus-scale aggregation of
    BPE training.  Map-side combine collapses each partition to its
    distinct words before the exchange."""
    from .dedup import normalized_text

    return (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(normalized_text(), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts_df(docs: DataFrame, top_k: int | None = None) -> DataFrame:
    """Weighted adjacent CHARACTER-pair counts over the word-frequency
    model — BPE training's round-0 statistics, exposed (and gated) as the
    cross-engine-verifiable primitive: ``(left, right, n)`` where ``n``
    sums word frequencies over every adjacent occurrence (pairs never
    cross word boundaries).  ``top_k`` returns the head by
    ``(n DESC, left, right)`` — the deterministic merge-selection order —
    as a TakeOrderedAndProject (no full sort shuffle)."""
    wf = word_freq_df(docs)
    pairs = wf.filter(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " p -> struct(substring(word, p, 1) AS left,"
                "             substring(word, p + 1, 1) AS right))"
            )
        ).alias("pr"),
    )
    out = (
        pairs.select(F.col("pr.left").alias("left"), F.col("pr.right").alias("right"), "freq")
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("n"))
    )
    if top_k is not None:
        out = out.orderBy(F.desc("n"), F.asc("left"), F.asc("right")).limit(
            int(top_k)
        )
    return out


def _merge_word(symbols: tuple, left: str, right: str) -> tuple:
    """Greedy leftmost merge of adjacent (left, right) in one word."""
    out: list = []
    for s in symbols:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def _train_python(word_freqs: dict, n_merges: int, min_freq: int) -> list:
    """Exact single-node merge loop over ``{symbols tuple: freq}``."""
    merges = []
    state = dict(word_freqs)
    for _ in range(int(n_merges)):
        counts: dict = {}
        for syms, freq in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((left, right, int(n)))
        nxt: dict = {}
        for syms, freq in state.items():
            ns = _merge_word(syms, left, right)
            nxt[ns] = nxt.get(ns, 0) + freq
        state = nxt
    return merges


def bpe_train_df(
    docs: DataFrame,
    n_merges: int = 100,
    min_freq: int = 2,
    driver_threshold: int = 2_000_000,
    batch_k: int = 16,
    stats: dict | None = None,
    top_m: int | None = None,
    mode: str = "exact",
) -> DataFrame:
    """Learn a BPE merge table from the corpus: ``(rank, left, right, n)``
    — merge ``rank`` (0-based) fused symbols ``left + right`` which
    co-occurred adjacently with total weighted count ``n`` at selection
    time.  See the module docstring for the two execution paths; results
    are path-identical and exactly deterministic.  ``batch_k`` caps how
    many merges the distributed path may fold per materialization round
    (the safe-prefix batching — exactness is never traded for it).
    ``top_m`` sets how many ranked candidate pairs each round collects
    (default ``max(64, 4 * batch_k)``): a deeper collection lowers the
    safety floor — candidates are only provably safe while strictly
    above the last collected count — so widening it raises the ACCEPTED
    batch size toward ``batch_k`` at the cost of a larger (still
    driver-trivial) TakeOrderedAndProject; measured curves in
    SCALING.md.  ``stats``, if given a dict, receives ``{"path",
    "rounds", "checkpoints", "effective_k"}`` diagnostics for the run.

    ``mode``: ``'exact'`` (default, the gated contract) accepts only the
    provably-safe prefix per round — identical to the one-at-a-time
    greedy loop, measured DATA-bound at ~6 merges/round by merge 4k
    (SCALING.md), so a 30k-merge vocabulary costs ~5k sequential jobs.
    ``'approx'`` is the opt-in RANK-NOISE contract for production-size
    vocabularies: each round accepts up to ``batch_k`` top-ranked
    candidates that are merely SYMBOL-DISJOINT within the round (counts
    judged at selection time only — no invariance proof), so a merge
    whose count a batch-mate would have changed can land earlier or
    later than the exact sequence.  The output is still a valid,
    deterministic, corpus-derived merge table (the parallel-BPE batching
    every production tokenizer trainer ships); divergence vs exact is
    quantified by test and by the SCALING.md probe.  ``mode`` only
    affects the distributed path — below ``driver_threshold`` training
    is exact either way."""
    n_merges, min_freq = int(n_merges), int(min_freq)
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    if int(batch_k) < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k}")
    if top_m is not None and int(top_m) < int(batch_k):
        raise ValueError(
            f"top_m must be >= batch_k, got top_m={top_m}, batch_k={batch_k}"
        )
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    spark = docs.sparkSession
    wf = word_freq_df(docs)
    # size probe without a count-then-collect double job (the graph_cc
    # limit-fusion recipe)
    head = wf.limit(int(driver_threshold) + 1).toPandas()
    if len(head) <= driver_threshold:
        state = {tuple(w): int(f) for w, f in zip(head["word"], head["freq"])}
        merges = _train_python(state, n_merges, min_freq)
        if stats is not None:
            stats.update(path="driver", rounds=0, checkpoints=0)
    else:
        merges = _train_distributed(
            spark,
            wf,
            n_merges,
            min_freq,
            int(batch_k),
            stats,
            top_m=top_m,
            mode=mode,
        )
    return spark.createDataFrame(
        [(i, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "rank int, left string, right string, n long",
    )


def _safe_batch(
    rows: list, complete: bool, min_freq: int, batch_k: int
) -> list:
    """The longest prefix of the ranked candidate pairs ``rows`` (sorted
    by ``n DESC, left, right`` — the sequential selection order) that is
    PROVABLY the next merges of the exact one-at-a-time loop.

    Candidate p after accepted merges S is safe iff (a) p's symbols are
    disjoint from every accepted merge's ``{left, right, left+right}``
    (so p's own count is invariant — merging symbol-disjoint pairs can
    neither create nor destroy an occurrence of p), and (b) no
    still-unmerged pair of the form ``(x, a)`` or ``(b, x)`` for an
    accepted ``(a, b)`` has count >= p's: a pair CREATED by that merge
    is bounded by exactly those counts (each ``(x, a+b)`` occurrence was
    an ``(x, a)`` occurrence; each ``(a+b, x)`` was a ``(b, x)``), and a
    touched pair that merely decays starts at one of them too — so
    nothing the batch changes can outrank p.  Pairs outside the
    collected top-M can't violate (b) because candidates beyond the
    first are only accepted while strictly above the collection floor
    (``complete`` lifts the floor when the collection holds EVERY
    pair).  The global top-1 is always safe, so a round always
    progresses."""
    floor = None if complete or not rows else rows[-1][2]
    accepted: list = []
    touched: set = set()
    accepted_pairs: set = set()
    for left, right, n in rows:
        if n < min_freq:
            break
        if accepted:
            if floor is not None and n <= floor:
                break
            if left in touched or right in touched:
                break
            rights_of_accepted = {a for a, _b, _n in accepted}
            lefts_of_accepted = {b for _a, b, _n in accepted}
            unsafe = False
            for xl, xr, xn in rows:
                if xn < n:
                    break
                # an accepted pair's own count drops to ~0 once merged, so
                # it can't outrank p — EXCEPT a self-pair (a, a), whose
                # created pairs (aa, a)/(a, aa) are bounded by count(a, a)
                # itself (the "aaa" -> (aa, a) occurrence routes through
                # the merged pair), so it must stay in the scan
                if ((xl, xr) in accepted_pairs and xl != xr) or (
                    xl, xr
                ) == (left, right):
                    continue
                if xr in rights_of_accepted or xl in lefts_of_accepted:
                    unsafe = True
                    break
            if unsafe:
                break
        accepted.append((left, right, n))
        touched.update((left, right, left + right))
        accepted_pairs.add((left, right))
        if len(accepted) >= batch_k:
            break
    return accepted


def _approx_batch(
    rows: list, complete: bool, min_freq: int, batch_k: int
) -> list:
    """The rank-noise batch (``mode='approx'``): up to ``batch_k``
    top-ranked candidates that are SYMBOL-DISJOINT within the round —
    disjointness keeps the chained replace application well-defined and
    commutative (no pattern can match text another creates), and it
    skips candidates touching an accepted merge's symbols (including the
    CREATED symbol, so a replace can never match occurrences the round
    itself produces).  Unlike :func:`_safe_batch` there is NO
    count-invariance proof: accepted counts are selection-time values,
    and a pair the batch creates or decays may outrank a later
    batch-mate in the exact sequence — that reordering is the documented
    noise.  Candidates at or below the collection floor are still
    rejected (an uncollected pair could outrank them even at selection
    time), and the global top-1 is always accepted, so every round
    progresses and approx == exact whenever the exact safe prefix and
    the disjoint prefix coincide."""
    floor = None if complete or not rows else rows[-1][2]
    accepted: list = []
    touched: set = set()
    for left, right, n in rows:
        if n < min_freq:
            break
        if accepted and floor is not None and n <= floor:
            break
        if left in touched or right in touched:
            continue  # skip, not break: disjoint candidates below remain fair
        accepted.append((left, right, n))
        touched.update((left, right, left + right))
        if len(accepted) >= batch_k:
            break
    return accepted


def _train_distributed(
    spark,
    wf: DataFrame,
    n_merges: int,
    min_freq: int,
    batch_k: int = 16,
    stats: dict | None = None,
    top_m: int | None = None,
    mode: str = "exact",
) -> list:
    """The above-driver-threshold loop: symbol state stays distributed;
    each ROUND is one pair aggregation (top-M via TakeOrderedAndProject),
    a driver-side safe-prefix selection (``_safe_batch`` — up to
    ``batch_k`` merges, provably identical to one-at-a-time), and ONE
    chained row-local merge pass + ``localCheckpoint`` (lineage cut —
    the iterative-loop contract).  N merges therefore cost ~N/k jobs and
    checkpoints, not N of each.

    Symbol-array state rides as ONE FLANKED STRING per word — symbols
    joined by TWO spaces with a single-space flank at each end
    (``[ab, c]`` = ``" ab  c "``) — because on that encoding Java's
    native non-overlapping left-to-right ``replace`` IS the
    greedy-leftmost merge: replacing ``" l  r "`` with ``" lr "``
    (a) can only match a WHOLE adjacent symbol pair — symbols contain no
    spaces (whitespace-split words, and merges only concatenate), and
    the pattern's space flanks occur exactly at symbol boundaries;
    (b) consumes the matched pair's both flanks and emits them back, so
    the invariant holds and the NEXT adjacent pair (sharing no flank
    chars, e.g. ``"a a a a"`` → ``[aa, aa]``) still matches while the
    OVERLAPPING one (``"a a a"`` → ``[aa, a]``) cannot — exactly the
    fold's leftmost-wins rule; and (c) a symbol created by the pass is
    never re-matched within it (the scan resumes after the replacement,
    and ``l == l+r`` is impossible), matching the fold's
    only-later-ranks rule.  Property- and path-equality-tested against
    the interpreted-fold form and the driver loop.  This replaces the
    previous chained ``F.aggregate`` array fold — an interpreted
    higher-order expression (the measured bimodal-JIT class) that also
    rebuilt every row's array per merge; the replace chain is
    whole-stage-codegen'd string scanning."""
    words = wf.select(
        F.concat(
            F.lit(" "),
            F.expr(
                "concat_ws('  ', transform(sequence(1, length(word)),"
                " p -> substring(word, p, 1)))"
            ),
            F.lit(" "),
        ).alias("s"),
        "freq",
    ).localCheckpoint(eager=False)
    merges: list = []
    rounds = checkpoints = 0
    top_m = int(top_m) if top_m is not None else max(64, 4 * batch_k)
    while len(merges) < n_merges:
        top = (
            # >= 2 symbols iff the double-space separator occurs (native
            # contains — the size(syms) >= 2 filter without building arrays)
            words.filter(F.contains("s", F.lit("  ")))
            .select("freq", F.split(F.trim(F.col("s")), "  ").alias("syms"))
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " p -> struct(element_at(syms, p) AS l,"
                        "             element_at(syms, p + 1) AS r))"
                    )
                ).alias("pr"),
            )
            .groupBy("pr.l", "pr.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(top_m)
            .collect()
        )
        rounds += 1
        rows = [(t["l"], t["r"], int(t["n"])) for t in top]
        pick = _safe_batch if mode == "exact" else _approx_batch
        batch = pick(
            rows,
            complete=len(rows) < top_m,
            min_freq=min_freq,
            batch_k=min(batch_k, n_merges - len(merges)),
        )
        if not batch:
            break
        merges.extend(batch)
        if len(merges) >= n_merges:
            break  # done — don't pay a fold + checkpoint nobody reads
        col = F.col("s")
        for left, right, _n in batch:
            # symbols bind as literal Columns, never SQL text (a learned
            # symbol may contain quotes or backslashes)
            col = F.replace(
                col,
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            )
        words = words.select(col.alias("s"), "freq").localCheckpoint(
            eager=False
        )
        checkpoints += 1
    if stats is not None:
        stats.update(
            path="distributed",
            rounds=rounds,
            checkpoints=checkpoints,
            # the achieved batching: merges per pair-count job — the
            # number SCALING.md's vocab-scale probe tracks vs batch_k
            effective_k=round(len(merges) / max(rounds, 1), 2),
        )
    return merges


def bpe_apply_df(docs: DataFrame, merges: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Tokenize with a learned merge table: ``(id_col, tokens
    array<string>, n_tokens)`` — each whitespace word of the normalized
    text split to characters and merged in RANK ORDER with the greedy
    leftmost scan (exactly the training semantics, so applying a trainer's
    merges to its own corpus reproduces the trainer's final state).

    The merge table (<= vocab-size rows) ships in the kernel closure;
    the corpus streams through an Arrow-batched ``mapInPandas`` —
    iterative rank-ordered merging is not expressible in built-in column
    functions (the documented UDF last resort)."""
    import pandas as pd

    from .dedup import normalized_text

    ranked = [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").select("left", "right", "rank").collect()
    ]

    def encode_word(word: str, cache: dict) -> list:
        # per-task word cache: natural text repeats words heavily, so the
        # fold runs once per DISTINCT word per batch stream
        got = cache.get(word)
        if got is None:
            syms: tuple = tuple(word)
            for left, right in ranked:
                syms = _merge_word(syms, left, right)
            got = list(syms)
            cache[word] = got
        return got

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf["__nt"]:
                out: list = []
                for w in text.split(" "):
                    if w:
                        out.extend(encode_word(w, cache))
                toks.append(out)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    src = docs.filter(F.col("text").isNotNull()).select(
        F.col(id_col).alias("__id"), normalized_text().alias("__nt")
    )
    # the id rides through unchanged, so the output schema carries its
    # ACTUAL type — hardcoding `long` broke string/decimal doc ids at
    # Arrow conversion time
    id_type = docs.schema[id_col].dataType.simpleString()
    out = src.mapInPandas(
        run, schema=f"__id {id_type}, tokens array<string>, n_tokens int"
    )
    return out.withColumnRenamed("__id", id_col)


def bpe_vocab_df(docs: DataFrame, merges: DataFrame) -> DataFrame:
    """The tokenizer's vocabulary as data: ``(token_id, token, kind)`` —
    every distinct base character of the corpus' words (``kind='char'``,
    ids ``0..B-1`` in sorted order) followed by the merge products
    (``kind='merge'``, id ``B + rank``).  Deterministic, so the vocab is
    reproducible from (corpus, merge table) alone — persist it like any
    small model table and ship it to serving.

    Two merge rules can produce the SAME string (``ab+c`` and ``a+bc``
    both yield ``abc``); like every production BPE vocab the string keeps
    its FIRST id (lowest), so token->id is a function.  The vocab is
    bounded by ``n_chars + n_merges`` rows — the single-partition windows
    here sort a model, not a corpus."""
    from pyspark.sql import Window

    wf = word_freq_df(docs)
    chars = (
        wf.select(
            F.explode(
                F.expr("transform(sequence(1, length(word)), p -> substring(word, p, 1))")
            ).alias("token")
        )
        .distinct()
        .withColumn(
            "token_id",
            F.row_number().over(Window.orderBy("token")).cast("long") - 1,
        )
        .select("token_id", "token", F.lit("char").alias("kind"))
    )
    n_base = chars.count()
    fused = merges.select(
        (F.col("rank").cast("long") + F.lit(int(n_base))).alias("token_id"),
        F.concat("left", "right").alias("token"),
        F.lit("merge").alias("kind"),
    )
    both = chars.unionByName(fused)
    w = Window.partitionBy("token").orderBy("token_id")
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def bpe_encode_df(
    docs: DataFrame,
    merges: DataFrame,
    vocab: DataFrame | None = None,
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """Tokenize to INTEGER ids with a learned merge table: ``(id_col,
    token_ids array<long>, n_tokens, n_unk)`` — the artifact a training
    pipeline actually writes.  ``vocab`` defaults to
    ``bpe_vocab_df(docs, merges)`` (self-encoding never produces
    unknowns); pass the TRAINING corpus' persisted vocab when encoding
    new text, where unseen characters map to ``unk_id`` and are counted
    in ``n_unk`` (the drop/replace policy is the caller's).

    Same execution shape as :func:`bpe_apply_df`: the merge table and
    vocab (model-sized) ship in the Arrow kernel's closure; the corpus
    streams through ``mapInPandas`` with a per-task distinct-word cache."""
    import pandas as pd

    from .dedup import normalized_text

    if vocab is None:
        vocab = bpe_vocab_df(docs, merges)
    ranked = [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").select("left", "right", "rank").collect()
    ]
    tok2id = {r["token"]: int(r["token_id"]) for r in vocab.collect()}
    unk = int(unk_id)

    def encode_word(word: str, cache: dict) -> list:
        got = cache.get(word)
        if got is None:
            syms: tuple = tuple(word)
            for left, right in ranked:
                syms = _merge_word(syms, left, right)
            got = [tok2id.get(s, unk) for s in syms]
            cache[word] = got
        return got

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            ids, n_unk = [], []
            for text in pdf["__nt"]:
                out: list = []
                for w in text.split(" "):
                    if w:
                        out.extend(encode_word(w, cache))
                ids.append(out)
                n_unk.append(sum(1 for t in out if t == unk))
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "token_ids": ids,
                    "n_tokens": [len(t) for t in ids],
                    "n_unk": n_unk,
                }
            )

    src = docs.filter(F.col("text").isNotNull()).select(
        F.col(id_col).alias("__id"), normalized_text().alias("__nt")
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    out = src.mapInPandas(
        run,
        schema=f"__id {id_type}, token_ids array<long>, n_tokens int, n_unk int",
    )
    return out.withColumnRenamed("__id", id_col)


_BPE_PROP_PREFIX = "imops.bpe."
_BPE_INT_KEYS = ("n_merges",)
# the text identity the merge table was learned over: whitespace words of
# lower/trim/space-collapsed text (dedup.normalized_text) — bump if the
# normalization ever changes, so a stale model cannot silently tokenize
# differently-normalized text
_BPE_NORM_FAMILY = "ws_lower_v1"


def bpe_write_model(merges: DataFrame, table: str, path: str | None = None,
                    fingerprint: str | None = None) -> None:
    """Persist a learned merge table as the TOKENIZER ARTIFACT: a tiny
    parquet table ``(rank, left, right, n)`` stamped with the model
    identity (normalization family, merge count, optional corpus
    fingerprint) as table properties + a ``path__meta`` sidecar — the
    embedding/BM25-index recipe applied to the model the whole training
    pipeline depends on.  Train once, stamp, and every later session
    (token counting, encoding, packing, serving) loads the SAME
    tokenizer or fails loudly; an unstamped ad-hoc parquet of merges
    cannot be told apart from the wrong tokenizer at read time, which is
    how silent vocabulary drift ships.

    Cite: reference has no tokenizer; public BPE semantics per Sennrich
    et al. 2016, persistence shape per the HuggingFace tokenizer-file
    convention (merges as ordered pairs)."""
    from .similarity import _check_stamp_value, _emb_write_sidecar

    spark = merges.sparkSession
    if fingerprint is not None:
        _check_stamp_value("fingerprint", fingerprint)
    n = merges.count()
    w = (
        merges.select("rank", "left", "right", "n")
        .coalesce(1)  # a model table: one file, not one-per-partition
        .write.mode("overwrite")
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    stamp = {"norm": _BPE_NORM_FAMILY, "n_merges": int(n)}
    if fingerprint is not None:
        stamp["fingerprint"] = str(fingerprint)
    props = ", ".join(
        f"'{_BPE_PROP_PREFIX}{k}'='{v}'" for k, v in stamp.items()
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES({props})")
    if path:
        _emb_write_sidecar(spark, path, stamp)


def bpe_read_model(spark, table: str, fingerprint: str | None = None) -> DataFrame:
    """Load a persisted merge table after validating the stamp: refuses
    unstamped tables, normalization-family mismatches, corpus-fingerprint
    staleness (when the caller passes the current fingerprint), and a
    row count that disagrees with the stamped ``n_merges`` (a partial
    write or manual edit).  Returns the merges ordered by rank — the
    exact frame ``bpe_apply_df``/``bpe_encode_df`` consume."""
    from .similarity import _emb_stored_props

    stored = _emb_stored_props(
        spark, table, prefix=_BPE_PROP_PREFIX, int_keys=_BPE_INT_KEYS
    )
    if not stored:
        raise ValueError(
            f"{table!r} carries no {_BPE_PROP_PREFIX}* stamp — not a BPE "
            "model written by bpe_write_model"
        )
    if stored.get("norm") != _BPE_NORM_FAMILY:
        raise ValueError(
            f"BPE model {table!r} was trained over {stored.get('norm')!r} "
            f"normalization, this module normalizes as {_BPE_NORM_FAMILY!r} "
            "— tokenization would silently drift; retrain the model"
        )
    if fingerprint is not None and stored.get("fingerprint") != str(fingerprint):
        raise ValueError(
            f"BPE model {table!r} was trained on corpus fingerprint "
            f"{stored.get('fingerprint')!r}, the corpus now fingerprints "
            f"{fingerprint!r}: the model is stale — retrain it"
        )
    merges = spark.table(table).orderBy("rank")
    n = merges.count()
    if n != int(stored["n_merges"]):
        raise ValueError(
            f"BPE model {table!r} stamps n_merges={stored['n_merges']} but "
            f"holds {n} rows — partial write or manual edit; rewrite it"
        )
    return merges


def bpe_register_model(spark, table: str, path: str) -> None:
    """Re-register a BPE model written by another session from its
    ``path__meta`` sidecar (table properties die with the session-local
    catalog).  Idempotent."""
    from .similarity import _emb_read_sidecar

    stamp = _emb_read_sidecar(spark, path, int_keys=_BPE_INT_KEYS)
    if not stamp:
        raise ValueError(
            f"no BPE-model sidecar at {path}__meta — was this model "
            "written by bpe_write_model with an explicit path?"
        )
    for key in ("norm", "n_merges"):
        if key not in stamp:
            raise ValueError(
                f"BPE-model sidecar at {path}__meta lacks {key!r}; rewrite "
                "the model with this version's bpe_write_model"
            )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = path.replace("'", "''")
    spark.sql(
        f"CREATE TABLE {table} (rank int, left string, right string, "
        f"n bigint) USING parquet LOCATION '{loc}'"
    )
    props = ", ".join(
        f"'{_BPE_PROP_PREFIX}{k}'='{v}'" for k, v in sorted(stamp.items())
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES({props})")
