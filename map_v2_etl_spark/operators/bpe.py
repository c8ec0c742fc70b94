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

Iteration hygiene mirrors dedup.connected_components: each round's
rewritten representation is ``localCheckpoint(eager=True)``-ed, so the
plan never chains the rounds' HOF folds end to end — persist alone
caches the data but leaves the lineage growing, and Catalyst
re-analysis over the stacked nested-HOF projections goes superlinear
in the round count (measured: k=16 in 6s, k=24 in 347s on 500 docs).
Driver round-trips are batched: each round collects a bounded
top-``window`` slice of the pair table and applies every merge that is
provably order-equivalent to the sequential algorithm (see
``_select_merge_batch``), so K merges take ~K/batch rounds on corpora
whose top pairs don't chain on a shared symbol.
"""

from __future__ import annotations

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


def merge_pairs_batch(rep: Column, pairs: list[tuple[str, str]]) -> Column:
    """Apply one round's merges SEQUENTIALLY inside a single expression:
    an outer fold over the merge list whose accumulator is the symbol
    string, each step running the same leftmost-greedy token fold as
    ``merge_pair``. This keeps the expression tree O(len(pairs)) —
    composing ``merge_pair`` textually instead multiplies the tree by
    the ~6 references each fold makes to its input string (6^batch
    nodes before any common-subexpression elimination can help)."""
    merges = F.array(
        *[
            F.struct(F.lit(pl).alias("l"), F.lit(pr).alias("r"))
            for pl, pr in pairs
        ]
    )

    def _apply_one(acc: Column, m: Column) -> Column:
        toks = F.split(acc, " ")
        folded = F.aggregate(
            F.slice(toks, 2, F.size(toks) - 1),
            F.element_at(toks, 1),
            lambda a, x: F.when(
                (x == m.r)
                & ((a == m.l) | a.endswith(F.concat(F.lit(" "), m.l))),
                F.concat(a, x),
            ).otherwise(F.concat(a, F.lit(" "), x)),
        )
        return F.when(F.size(toks) <= 1, acc).otherwise(folded)

    return F.aggregate(merges, rep, _apply_one)


def _select_merge_batch(rows, remaining: int, window: int):
    """Pick the longest prefix of the sorted pair table that one round
    can apply while staying MERGE-FOR-MERGE IDENTICAL to the classic
    one-pair-per-iteration loop (counts, order and tie-breaks included).

    ``rows`` is the top-``window`` slice of the pair table in the
    canonical (count DESC, l, r) order. Rule:

    1. Walk the prefix; accept a pair only while it is COUNT-INVARIANT
       under every already-accepted merge. Applying (l1, r1) can only
       change the count of a pair (l2, r2) when

         * r2 == l1 — an "x l1 r1" occurrence consumes the l1, so
           (x, l1) may decrease (l1 is blocked as a future RIGHT);
         * l2 == r1 — an "l1 r1 y" occurrence consumes the r1, so
           (r1, y) may decrease (r1 is blocked as a future LEFT);
         * l2 or r2 == l1||r1 — the merge MINTS that symbol, so such a
           pair may gain (the minted symbol is blocked in BOTH roles).

       Pairs sharing only the LEFT symbol — (l1, a) and (l1, b) with
       a != b — are invariant under each other (each l1-token occurrence
       has exactly one right neighbor, so their occurrence sets are
       disjoint and a merge of one touches no occurrence of the other);
       symmetrically for a shared RIGHT symbol. The r12 selector blocked
       {l, r} in both roles and therefore serialized exactly this case
       (BENCH_SCALE bpe 2x: half the vocab leads with '1', so the
       ('1', x) chain ran 1 merge/round — 12 rounds for 12 merges).
       STOP at the first conflict (skipping would let the conflicting
       pair's post-merge count race the ones we keep).
    2. A SELF-pair (l == r) ends the batch after being accepted.
       Merging ``s s`` over a run ``s s s`` mints the pair (ss, s)
       whose parent occurrence is the accepted pair ITSELF, so its
       post-merge count is bounded only by the accepted pair's count —
       not by any conflict boundary — and the sequential loop may pick
       that minted continuation before anything else we would have
       batched (found by the 4000-case selection fuzzer: with
       {aaa x4, bb x1}, sequential runs (a,a) -> (aa,a) -> (b,b), but a
       batch of [(a,a),(b,b)] records (b,b) second). For a non-self
       accepted pair every mintable pair's parent either conflicts
       with an accepted pair (bounded by the stop, because a
       conflicting row BETWEEN accepted rows would itself have stopped
       the walk) or straddles two accepted pairs (bounded by the
       conflicting bridge pair), so only l == r needs the early cut.
    2b. A pair whose minted symbol l||r ALREADY APPEARS as a symbol in
       the collected window likewise ends the batch after acceptance
       (r12 advice): pre-existing (l||r, x) pairs then hold pre + gain
       occurrences after the merge — each component is bounded by the
       stop boundary but their SUM need not be, so nothing later in the
       batch may rely on outranking them. Residual risk accepted and
       documented: a colliding symbol that appears in NO collected row
       has every pre-count < the bottom-of-window count, still making
       pre + gain potentially exceed c_stop in principle — but reaching
       it needs the symbol minted earlier from a DIFFERENT split
       (l'||r' = l||r) while adjacent (l, r) tokens survive, and no
       reachable instance exists in 100k+ randomized trials (the
       advisor's 60k plus the permanent fuzzers below); char-level
       greedy exhaustiveness appears to preclude the needed
       adjacencies.
    3. Truncate the accepted list to counts STRICTLY above the stop
       boundary (the first conflicting pair's count, or the last
       collected count when the window may have been cut short by
       ``limit``). Every pair whose count the batch can change —
       conflicting pairs, pairs newly minted mid-batch, resurrected
       pairs — sits at or below that boundary, so everything we keep
       outranks anything the batch perturbs: the sequential loop would
       pick exactly this prefix, in this order, with these counts.
    4. The top-1 pair is unconditionally the sequential argmax, so when
       truncation empties the list (e.g. the top two pairs conflict at
       equal counts) fall back to it — the round degrades to the
       classic single merge rather than stalling.

    Equivalence is fuzz-pinned against a pure-Python sequential
    reference over thousands of random multisets
    (tests/test_wave20.py::test_select_merge_batch_fuzz_equivalence,
    plus the collision-biased
    test_select_merge_batch_fuzz_minted_collisions) in addition to the
    Spark-level twins.
    """
    accepted: list[tuple[str, str, int]] = []
    # role-aware blocking (rule 1): an accepted (l, r) blocks r and the
    # minted l||r as future LEFT symbols, and l and l||r as future
    # RIGHT symbols — but NOT l as a left or r as a right, which is
    # what lets same-left / same-right chains batch.
    blocked_left: set[str] = set()
    blocked_right: set[str] = set()
    seen_syms = {s for row in rows for s in (row.l, row.r)}
    c_stop = None
    accepting = True
    for row in rows:
        if row.l in blocked_left or row.r in blocked_right:
            # first conflicting row: every mintable pair's parent
            # conflicts with an accepted pair and therefore sorts here
            # or later, so this count bounds everything the batch can
            # perturb. The scan must reach this row even after
            # acceptance stopped at a self-pair — breaking the scan
            # there left minted pairs free to TIE a kept pair and win
            # the (l, r) tie-break (fuzzer round 2).
            c_stop = int(row.c)
            break
        if accepting:
            accepted.append((row.l, row.r, int(row.c)))
            minted = row.l + row.r
            blocked_left.update((row.r, minted))
            blocked_right.update((row.l, minted))
            if row.l == row.r or minted in seen_syms:
                # rule 2 (self-pair) / rule 2b (minted-symbol collision
                # with a window-visible symbol): end the batch but keep
                # scanning (not accepting) for the c_stop row.
                accepting = False
    else:
        if len(rows) == window:
            # table may extend past the collected window; its next
            # count is <= the last collected one, so that is the
            # boundary everything kept must strictly beat
            c_stop = int(rows[-1].c)
    if c_stop is not None:
        accepted = [a for a in accepted if a[2] > c_stop]
    if not accepted:
        accepted = [(rows[0].l, rows[0].r, int(rows[0].c))]
    return accepted[:remaining]


def learn_bpe(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    batch: int = 16,
    stats: dict | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``k`` BPE merges; returns (merges, final symbol table).

    merges = [(step, left, right, pair_count), ...] — bounded driver
    scalars (k rows), the same shape as k-means' collected centroids.
    The returned DataFrame is (w, cnt, rep) after all merges, already
    checkpoint-materialized (it is the last round's truncation point),
    so callers compose on a constant-size plan.

    ``batch`` > 1 applies up to that many symbol-disjoint merges per
    driver round (one pair-count job + one collect per ROUND instead of
    per MERGE), cutting driver round-trips ~3-4x while staying
    merge-for-merge identical to the sequential algorithm — see
    ``_select_merge_batch`` for the equivalence argument. ``batch=1``
    is exactly the classic loop.

    ``stats``, when given, is filled with ``{"rounds": N}`` — the
    number of driver round-trips actually taken (bench introspection;
    the merge list alone can't distinguish 1 round of 12 from 12 of 1).
    """
    window = max(4 * batch, 16)  # collect depth: room for conflicts
    rounds = 0
    # localCheckpoint (NOT persist) per round, the connected_components
    # hygiene: persist caches the DATA but the logical plan still
    # stacks one nested-HOF projection per round, and Catalyst
    # re-analysis of that growing lineage goes superlinear (measured:
    # k=16 in 6s, k=24 in 347s on the same 500-doc corpus before the
    # truncation). Checkpointing makes every round's plan
    # scan-of-checkpoint + one projection; dropped rounds' blocks are
    # reclaimed by the ContextCleaner, same as the CC loop.
    live = word_counts(docs, text_col).select(
        "w", "cnt", _chars(F.col("w")).alias("rep")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < k:
        rounds += 1
        top = (
            pair_counts(live)
            .orderBy(F.desc("c"), "l", "r")
            .limit(window)
            .collect()
        )
        if not top:  # every word is a single symbol — nothing left
            break
        picked = _select_merge_batch(
            top, min(batch, k - len(merges)), window
        )
        for pl, pr, pc in picked:
            merges.append((len(merges) + 1, pl, pr, pc))
        live = live.withColumn(
            "rep",
            merge_pairs_batch(
                F.col("rep"), [(pl, pr) for pl, pr, _ in picked]
            ),
        ).localCheckpoint(eager=True)
    if stats is not None:
        stats["rounds"] = rounds
    return merges, live
