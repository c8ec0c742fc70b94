"""Wave-20 tests: BPE merge learning and rolling anomaly flags.

The BPE engine path is pinned against an independent pure-Python
reference implementation of the classic algorithm (Sennrich et al.
2016) — merge table AND final symbol sequences, exact equality — plus
unit cases for the leftmost-greedy fold's documented edge semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_v2_etl_spark.operators.bpe import learn_bpe, merge_pair, word_counts
from map_v2_etl_spark.plans.registry import REGISTRY, all_queries
from map_v2_etl_spark.sources.registry import load_table

all_queries()


# ---------------------------------------------------------------------------
# pure-Python reference BPE (independent of the Spark implementation)
# ---------------------------------------------------------------------------

def _py_merge(toks: list[str], l: str, r: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _py_bpe(words: dict[str, int], k: int):
    reps = {w: list(w) for w in words}
    merges = []
    for step in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, toks in reps.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        # tie-break: count DESC, then (l, r) ascending
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, c))
        reps = {w: _py_merge(t, l, r) for w, t in reps.items()}
    return merges, reps


def test_learn_bpe_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    wc = {
        r.w: r.cnt for r in word_counts(docs).collect()
    }
    exp_merges, exp_reps = _py_bpe(wc, 6)
    merges, final = learn_bpe(docs, 6)
    assert merges == exp_merges
    got = {r.w: r.rep.split(" ") for r in final.collect()}
    assert got == exp_reps
    # sanity: the loop actually merged something
    assert len(merges) == 6
    assert any(len(t) > 1 for toks in got.values() for t in toks)


@pytest.mark.parametrize(
    "word,l,r,expected",
    [
        # leftmost-greedy non-overlap: a run of four merges pairwise
        ("a a a a", "a", "a", "aa aa"),
        # odd run: the tail symbol survives
        ("a a a", "a", "a", "aa a"),
        # merged token must not chain as LEFT within the same pass
        ("a a b", "a", "b", "a ab"),
        # pair where right is a multi-char symbol
        ("a a ab", "a", "ab", "a aab"),
        # no occurrence -> unchanged
        ("h e l l o", "x", "y", "h e l l o"),
        # single symbol -> unchanged
        ("x", "a", "b", "x"),
    ],
)
def test_merge_pair_semantics(spark, word, l, r, expected):
    df = spark.createDataFrame([(word,)], ["rep"])
    got = df.select(merge_pair(F.col("rep"), l, r).alias("m")).first().m
    assert got == expected


def test_bpe_token_counts_consistent(spark, sf_dir):
    """Total BPE token count == sum over words of occurrences x symbol
    count — recomputed independently from the python reference reps."""
    docs = load_table(spark, "documents", sf_dir)
    wc = {r.w: r.cnt for r in word_counts(docs).collect()}
    _, exp_reps = _py_bpe(wc, 6)
    expected_total = sum(wc[w] * len(t) for w, t in exp_reps.items())
    out = REGISTRY["bpe_token_counts"].fn(spark, sf_dir).collect()
    assert sum(r.n_tokens for r in out) == expected_total
    # every doc with at least one token appears
    n_docs_with_tokens = (
        docs.select(F.trim("text").alias("t")).filter(F.col("t") != "").count()
    )
    assert len(out) == n_docs_with_tokens


def test_rolling_anomaly_matches_pandas(spark, sf_dir):
    """Re-derive the 2-sigma flags for every event type with pandas
    integer arithmetic and compare the flagged id set exactly."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "ts", "value"
    )
    pdf = ev.toPandas().sort_values(["event_type", "ts", "event_id"])
    import math

    flagged = set()
    for _, g in pdf.groupby("event_type"):
        vals = [int(math.floor(v * 1000.0)) for v in g["value"]]
        ids = list(g["event_id"])
        for i in range(len(vals)):
            lo = max(0, i - 20)
            wnd = vals[lo:i]
            if len(wnd) != 20:
                continue
            s, q = sum(wnd), sum(x * x for x in wnd)
            v = vals[i]
            if (20 * v - s) ** 2 > 4 * (20 * q - s * s):
                flagged.add(int(ids[i]))
    out = REGISTRY["events_rolling_anomaly"].fn(spark, sf_dir).collect()
    assert {int(r.event_id) for r in out} == flagged
    # the flag set is non-trivial at every SF (measured: ~7% of events)
    assert flagged


# ---------------------------------------------------------------------------
# property: learn_bpe == pure-Python BPE on arbitrary word multisets
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_spark = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark


# small alphabet maximizes pair collisions/ties — the stress case for
# the tie-break and the greedy fold; sizes keep each example to one job
_words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_words)
def test_learn_bpe_property(words):
    docs = _spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )
    wc: dict[str, int] = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    exp_merges, exp_reps = _py_bpe(wc, 4)
    merges, final = learn_bpe(docs, 4)
    assert merges == exp_merges
    assert {r.w: r.rep.split(" ") for r in final.collect()} == exp_reps


def test_select_merge_batch_fuzz_equivalence():
    """Volume fuzz of the batched merge selection against a pure-Python
    sequential reference: 4000 random word multisets over tiny
    alphabets (maximal pair collisions, ties, self-pairs). This harness
    found BOTH real holes in the original selection rule — (1) a
    self-pair's minted continuation pair is bounded by the accepted
    pair itself, not by any conflict boundary; (2) stopping the scan at
    the self-pair skipped the conflict row that sets the strict count
    boundary, letting a minted pair tie a kept pair and win the (l, r)
    tie-break — so it must keep running as the selection rule's
    regression net. Pure Python, no Spark session."""
    import random
    from collections import namedtuple

    from map_v2_etl_spark.operators.bpe import _select_merge_batch

    Row = namedtuple("Row", "l r c")

    def py_merge(toks, l, r):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    def pair_counts(reps, words):
        counts = {}
        for w, toks in reps.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        return counts

    def seq_bpe(words, k):
        reps = {w: list(w) for w in words}
        merges = []
        for step in range(1, k + 1):
            counts = pair_counts(reps, words)
            if not counts:
                break
            (l, r), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merges.append((step, l, r, c))
            reps = {w: py_merge(t, l, r) for w, t in reps.items()}
        return merges, reps

    def batched_bpe(words, k, batch, window):
        reps = {w: list(w) for w in words}
        merges = []
        while len(merges) < k:
            counts = pair_counts(reps, words)
            if not counts:
                break
            rows = [
                Row(l, r, c)
                for (l, r), c in sorted(
                    counts.items(), key=lambda kv: (-kv[1], kv[0])
                )
            ][:window]
            picked = _select_merge_batch(
                rows, min(batch, k - len(merges)), window
            )
            for l, r, c in picked:
                merges.append((len(merges) + 1, l, r, c))
                reps = {w: py_merge(t, l, r) for w, t in reps.items()}
        return merges, reps

    rng = random.Random(12)
    for trial in range(4000):
        alpha = rng.choice(["ab", "abc", "abcd", "01", "a"])
        words = {}
        for _ in range(rng.randint(1, 14)):
            w = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, 10))
            )
            words[w] = words.get(w, 0) + rng.randint(1, 5)
        k = rng.randint(1, 14)
        batch = rng.choice([1, 2, 3, 4, 8, 16])
        window = rng.choice([2, 4, 8, 16, 64])
        sm, sr = seq_bpe(words, k)
        bm, br = batched_bpe(words, k, batch, window)
        assert sm == bm and sr == br, (
            f"trial {trial}: words={words} k={k} batch={batch} "
            f"window={window}\n seq={sm}\n bat={bm}"
        )


def test_select_merge_batch_fuzz_minted_collisions():
    """Regime-biased companion to the generic fuzzer (r13): 4000 trials
    split between (a) same-left-chain corpora — many words led by one
    hot symbol, the BENCH_SCALE 2x shape the role-aware blocking rule
    exists to batch — and (b) repeated-motif corpora where multi-char
    symbols recur, stressing the rule-2b minted-symbol-collision cut
    (r12 advice: a minted l||r colliding with a live vocab symbol makes
    pre + gain counts that the c_stop boundary alone does not bound).
    Pure Python, no Spark session."""
    import random
    from collections import namedtuple

    from map_v2_etl_spark.operators.bpe import _select_merge_batch

    Row = namedtuple("Row", "l r c")

    def py_merge(toks, l, r):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    def pair_counts(reps, words):
        counts = {}
        for w, toks in reps.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        return counts

    def seq_bpe(words, k):
        reps = {w: list(w) for w in words}
        merges = []
        for step in range(1, k + 1):
            counts = pair_counts(reps, words)
            if not counts:
                break
            (l, r), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merges.append((step, l, r, c))
            reps = {w: py_merge(t, l, r) for w, t in reps.items()}
        return merges, reps

    def batched_bpe(words, k, batch, window):
        reps = {w: list(w) for w in words}
        merges = []
        while len(merges) < k:
            counts = pair_counts(reps, words)
            if not counts:
                break
            rows = [
                Row(l, r, c)
                for (l, r), c in sorted(
                    counts.items(), key=lambda kv: (-kv[1], kv[0])
                )
            ][:window]
            picked = _select_merge_batch(
                rows, min(batch, k - len(merges)), window
            )
            for l, r, c in picked:
                merges.append((len(merges) + 1, l, r, c))
                reps = {w: py_merge(t, l, r) for w, t in reps.items()}
        return merges, reps

    rng = random.Random(777)
    for trial in range(4000):
        if rng.random() < 0.5:
            lead = rng.choice("xy")
            words = {}
            for _ in range(rng.randint(2, 12)):
                w = lead + "".join(
                    rng.choice("abcd") for _ in range(rng.randint(1, 5))
                )
                words[w] = words.get(w, 0) + rng.randint(1, 6)
            for _ in range(rng.randint(0, 4)):
                w = "".join(
                    rng.choice("abcd" + lead)
                    for _ in range(rng.randint(1, 6))
                )
                words[w] = words.get(w, 0) + rng.randint(1, 4)
        else:
            motif = "".join(
                rng.choice("ab") for _ in range(rng.randint(2, 4))
            )
            words = {}
            for _ in range(rng.randint(2, 10)):
                pad = "".join(
                    rng.choice("abc") for _ in range(rng.randint(0, 3))
                )
                w = (motif * rng.randint(1, 4)) + pad
                words[w] = words.get(w, 0) + rng.randint(1, 6)
        k = rng.randint(1, 16)
        batch = rng.choice([1, 2, 3, 4, 8, 16])
        window = rng.choice([2, 4, 8, 16, 64])
        sm, sr = seq_bpe(dict(words), k)
        bm, br = batched_bpe(dict(words), k, batch, window)
        assert sm == bm and sr == br, (
            f"trial {trial}: words={words} k={k} batch={batch} "
            f"window={window}\n seq={sm}\n bat={bm}"
        )


def test_learn_bpe_plan_is_lineage_truncated(spark, sf_dir):
    """The merge loop must localCheckpoint each round: with persist-only
    hygiene the logical plan stacks one nested-HOF projection per round
    and Catalyst re-analysis goes superlinear in k (measured before the
    fix: k=16 in 6s, k=24 in 347s on 500 docs). The returned frame's
    analyzed plan must therefore be a checkpoint scan, not a fold
    chain."""
    docs = load_table(spark, "documents", sf_dir)
    _, final = learn_bpe(docs, 8)
    plan = final._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan, plan
    # no per-round fold expressions may survive in the lineage
    assert "aggregate(" not in plan, plan
    assert len(plan.splitlines()) <= 3, plan


def test_learn_bpe_batched_equals_sequential(spark, sf_dir):
    """batch>1 must be MERGE-FOR-MERGE identical to the classic
    one-pair-per-iteration loop (order, counts, tie-breaks, final
    symbol table) — the whole point of _select_merge_batch's stop/
    truncate discipline. k=24 is deep enough that several rounds hit
    conflicts, truncation, and the top-1 fallback on real text."""
    docs = load_table(spark, "documents", sf_dir)
    seq_merges, seq_final = learn_bpe(docs, 24, batch=1)
    bat_merges, bat_final = learn_bpe(docs, 24, batch=16)
    assert bat_merges == seq_merges
    assert len(bat_merges) == 24
    seq = {r.w: r.rep for r in seq_final.collect()}
    bat = {r.w: r.rep for r in bat_final.collect()}
    assert bat == seq


def test_xml_roundtrip_row_exact(spark, sf_dir):
    """The docstring's claim, asserted: every (key, double) row survives
    the XML write + schema-pinned read bit-exactly."""
    import shutil
    import tempfile

    cu = load_table(spark, "customer", sf_dir)
    path = tempfile.mkdtemp(prefix="m2e_xml_t_")
    try:
        cu.write.mode("overwrite").format("xml").option(
            "rowTag", "row"
        ).save(path)
        from map_v2_etl_spark.plans.queries_wave20 import _XML_SCHEMA

        back = (
            spark.read.schema(_XML_SCHEMA)
            .format("xml")
            .option("rowTag", "row")
            .load(path)
        )
        cols = ["c_custkey", "c_acctbal", "c_name", "c_mktsegment"]
        assert cu.select(cols).exceptAll(back.select(cols)).count() == 0
        assert back.count() == cu.count()
    finally:
        shutil.rmtree(path, ignore_errors=True)
