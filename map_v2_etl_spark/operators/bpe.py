"""Byte-Pair Encoding merge learning — distributed tokenizer training.

The missing piece between ``vocab_induction`` (the unigram frequency
table every tokenizer build starts from) and ``subword_count`` (a
BPE-ish counting regex): the actual merge-learning loop of Sennrich et
al. 2016 ("Neural Machine Translation of Rare Words with Subword
Units", ACL) — public literature; the reference (/root/reference) has
no tokenizer surface at all.

Algorithm (classic, on the word-frequency table):

1. ONE corpus pass builds ``(word, count)`` — after this, every
   iteration runs on the *vocabulary*, not the corpus. This is the
   standard BPE compression and the whole reason the loop scales: at
   100 TB the corpus is billions of documents but the distinct-word
   table is 10–100 M rows, so K merge iterations are K vocab-sized
   hash aggregates, each with map-side partial aggregation, never a
   second corpus scan.
2. Each word is represented as its symbol sequence, space-joined
   (symbols never contain whitespace — the canonical tokenizer splits
   on ``\\s+``).
3. Per iteration: count adjacent symbol pairs weighted by word count
   (vocab-sized explode + hash agg), pick the most frequent pair with
   the deterministic tie-break (count DESC, left, right — binary
   string order on both engines), and rewrite every word's symbol
   sequence with the pair merged.

Merge rewrite = a leftmost-greedy non-overlapping fold, NOT a string
replace: ``replace(' l r ' -> ' lr ')`` consumes the shared delimiter
and misses immediately-adjacent occurrences (``a a a a`` must become
``aa aa``), and RE2 (DuckDB's regex engine) has no lookbehind to paper
over it. The fold walks the symbol list once with a string
accumulator:

    acc, x -> acc || x          if x == r and last_token(acc) == l
    acc, x -> acc || ' ' || x   otherwise

``last_token(acc) == l`` is exactly ``acc = l OR ends_with(acc, ' '||l)``
(symbols contain no spaces). A merged token can never be re-consumed
as the LEFT of another merge in the same pass: that would need
``l || r`` to end with ``' ' || l`` (impossible — no spaces inside
symbols) or ``l || r = l`` (impossible — r is non-empty). So the fold
is precisely the leftmost-greedy semantics of the classic algorithm,
and DuckDB's ``list_reduce`` replicates it token for token, which is
what makes the learned merge table value-hash certifiable.

Iteration hygiene mirrors dedup.connected_components: each rewritten
representation is persisted before the next pair count forces it and
the previous round's block is dropped, so lineage does not chain K
HOF folds end to end.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the canonical tokenizer — the one corpus pass."""
    from .dedup import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _chars(col: Column) -> Column:
    """Symbol-sequence seed: one symbol per character (codepoint-level —
    both engines' regex `.` walks codepoints), space-joined."""
    return F.array_join(F.regexp_extract_all(col, F.lit("(.)")), " ")


def merge_pair(rep: Column, left: str, right: str) -> Column:
    """Rewrite a space-joined symbol sequence with (left, right) merged,
    leftmost-greedy non-overlapping (see module docstring for why this
    fold — and not a string replace — is the correct primitive)."""
    toks = F.split(rep, " ")
    l, r = F.lit(left), F.lit(right)
    folded = F.aggregate(
        F.slice(toks, 2, F.size(toks) - 1),
        F.element_at(toks, 1),
        lambda acc, x: F.when(
            (x == r) & ((acc == l) | acc.endswith(F.concat(F.lit(" "), l))),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )
    # single-symbol words have no pairs; slice(…, 2, 0) is an empty
    # fold so `folded` would be correct anyway, but the guard keeps the
    # expression total under size() = 1 on every Spark version
    return F.when(F.size(toks) <= 1, rep).otherwise(folded)


def pair_counts(reps: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    vocab-sized explode -> one hash aggregate (map-side combined)."""
    toks = F.split("rep", " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("l"),
                F.element_at(toks, i + F.lit(1)).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        reps.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def learn_bpe(
    docs: DataFrame, k: int, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``k`` BPE merges; returns (merges, final symbol table).

    merges = [(step, left, right, pair_count), ...] — bounded driver
    scalars (k rows), the same shape as k-means' collected centroids.
    The returned DataFrame is (w, cnt, rep) after all merges, eagerly
    checkpointed so callers can compose on it after the loop's interim
    persists are dropped.
    """
    reps = (
        word_counts(docs, text_col)
        .select("w", "cnt", _chars(F.col("w")).alias("rep"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merges: list[tuple[int, str, str, int]] = []
    live = reps
    prev = None  # the already-cached frame `live` was derived from
    try:
        for step in range(1, k + 1):
            top = (
                pair_counts(live)
                .orderBy(F.desc("c"), "l", "r")
                .limit(1)
                .collect()
            )
            # ^ this action materialized (and cached) `live`; only NOW
            # is its parent safe to drop — unpersisting before the
            # child's first action would force every iteration to
            # recompute the whole fold chain from the base table
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:  # every word is a single symbol — nothing left
                break
            l, r, c = top[0].l, top[0].r, int(top[0].c)
            merges.append((step, l, r, c))
            nxt = live.withColumn(
                "rep", merge_pair(F.col("rep"), l, r)
            ).persist(StorageLevel.MEMORY_AND_DISK)
            if live is not reps:
                prev = live
            live = nxt
        # materialize OUTSIDE the loop's persist chain so the interim
        # blocks can be dropped now, not when the caller finally acts
        final = live.localCheckpoint(eager=True)
    finally:
        if prev is not None:
            prev.unpersist()
        if live is not reps:
            live.unpersist()
        reps.unpersist()
    return merges, final
