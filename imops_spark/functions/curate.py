"""End-to-end document curation: the one call a training-data pipeline makes.

Composes the individually-gated operators of ``functions.text`` and
``functions.dedup`` into the standard pretraining-corpus recipe:

1. **Quality gate** — C4/Gopher-style column-arithmetic filters
   (token count, chars/token, stopword ratio, type-token ratio) drop
   boilerplate and garbage rows at scan speed (predicates are pure
   expressions, so Catalyst pushes what it can into the scan).
2. **Exact dedup** — md5-of-normalized-text groupBy keeps the lowest
   doc_id per identical document.
3. **Near dedup** — MinHash -> banded LSH -> exact n-gram Jaccard
   verification -> connected components; one canonical survivor per
   cluster (``dedup.drop_near_duplicates_df``).
4. **Token budgeting** — whitespace word and BPE-pre-token counts
   annotated per surviving document (``text.bpe_token_count_df``), the
   numbers a training-mix planner consumes.

Stage order matters at 100 TB: quality filtering is the cheapest stage and
runs first so the (shuffle-bearing) dedup stages see only rows that can
survive; near dedup runs after exact dedup so identical copies collapse
before signatures are computed.

Every stage is the already-hash-gated operator — this module adds
composition and bookkeeping, no new math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import drop_exact_duplicates, drop_near_duplicates_df
from .text import bpe_token_count_df, quality_df

__all__ = ["quality_filter_df", "curate_documents"]


def quality_filter_df(
    docs: DataFrame,
    min_tokens: int = 5,
    max_chars_per_token: float = 12.0,
    min_stopword_ratio: float = 0.0,
    min_type_token_ratio: float = 0.2,
) -> DataFrame:
    """Documents passing the heuristic quality gate (same metrics as the
    gated ``quality_df``); NULL-text rows never pass."""
    q = quality_df(docs.where(F.col("text").isNotNull()))
    keep = q.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("chars_per_token") <= max_chars_per_token)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("type_token_ratio") >= min_type_token_ratio)
    ).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")


def curate_documents(
    docs: DataFrame,
    min_tokens: int = 5,
    max_chars_per_token: float = 12.0,
    min_type_token_ratio: float = 0.2,
    near_dup_threshold: float = 0.6,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Full curation: quality gate -> exact dedup -> near dedup -> token
    budgets.  Returns the surviving documents with ``n_words`` / ``n_bpe``
    annotations: ``(doc_id, text, n_words, n_bpe, n_unique_bpe)``.
    """
    passed = quality_filter_df(
        docs,
        min_tokens=min_tokens,
        max_chars_per_token=max_chars_per_token,
        min_type_token_ratio=min_type_token_ratio,
    )
    unique = drop_exact_duplicates(passed)
    survivors = drop_near_duplicates_df(
        unique,
        num_hashes=num_hashes,
        bands=bands,
        rows_per_band=rows_per_band,
        threshold=near_dup_threshold,
    )
    budgets = bpe_token_count_df(survivors)
    return survivors.join(budgets, "doc_id").select(
        "doc_id", "text", "n_words", "n_bpe", "n_unique_bpe"
    )
