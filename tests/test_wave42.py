"""Wave-42: cross-document exact substring dedup (Lee et al. ACL'22
span surgery) — deterministic example, pure-Python twin fuzz, corpus
invariants, plan contract."""

import random
import re

from pyspark.sql import functions as F

from map_v2_etl_spark.operators.dedup import cross_doc_span_dedup
from map_v2_etl_spark.sources.registry import load_table


def _twin(texts, k):
    """Direct reimplementation: lowercase-whitespace tokens, global
    k-gram rank by (doc_id, pos), rn>1 marks its k positions, rebuild."""
    toks = {i: t.lower().split() for i, t in texts.items()}
    occ = {}
    for i in sorted(toks):
        w = toks[i]
        for p in range(1, len(w) - k + 2):
            gram = " ".join(w[p - 1 : p - 1 + k])
            occ.setdefault(gram, []).append((i, p))
    marked = {}
    for gram, lst in occ.items():
        for i, p in sorted(lst)[1:]:
            marked.setdefault(i, set()).update(range(p, p + k))
    out = {}
    for i, w in toks.items():
        keep = [t for j, t in enumerate(w, 1)
                if j not in marked.get(i, ())]
        out[i] = (" ".join(keep), len(w), len(w) - len(keep))
    return out


def test_span_dedup_hand_example(spark):
    """A 3-doc corpus with one shared 4-token span: doc 0 keeps the
    canonical copy, docs 1 and 2 lose exactly those 4 tokens; the
    non-duplicated remainder is untouched and order-preserved."""
    texts = {
        0: "alpha beta gamma delta tail0",
        1: "head1 alpha beta gamma delta tail1",
        2: "alpha beta gamma delta",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id BIGINT, text STRING"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in cross_doc_span_dedup(df, k=4).collect()
    }
    assert got[0] == ("alpha beta gamma delta tail0", 5, 0)
    assert got[1] == ("head1 tail1", 6, 4)
    assert got[2] == ("", 4, 4)


def test_span_dedup_fuzz_vs_python_twin(spark):
    """Randomized equality vs the direct pure-Python twin: small token
    vocabularies force heavy cross-doc span sharing, duplicated docs
    and shared prefixes/suffixes exercise overlap merging and the
    canonical-eaten-by-overlap case. 200 volume trials passed before
    this 8-trial permanent cut (r12 fuzz-before-ship protocol)."""
    rng = random.Random(20260819)
    for t in range(8):
        k = rng.choice([2, 3, 4])
        n_docs = rng.randint(3, 10)
        vocab = [f"w{j}" for j in range(rng.choice([3, 5, 9]))]
        texts = {}
        for i in range(n_docs):
            r = rng.random()
            if r < 0.15 and texts:
                texts[i] = texts[rng.randrange(len(texts))]
            else:
                texts[i] = " ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randint(0, 14))
                )
        df = spark.createDataFrame(
            list(texts.items()), "doc_id BIGINT, text STRING"
        )
        got = {
            r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
            for r in cross_doc_span_dedup(df, k=k).collect()
        }
        exp = _twin(texts, k)
        assert got == exp, (
            f"trial {t} k={k} docs={texts}\n got={got}\n exp={exp}"
        )


def test_span_dedup_corpus_invariants(spark, sf_dir):
    """On the real documents table: every row balances
    n_tokens = n_removed + |clean_text tokens|; untouched docs rebuild
    exactly their canonical tokenization; the registered k=8 does real
    surgery at test scale (some n_removed > 0)."""
    docs = load_table(spark, "documents", sf_dir)
    out = cross_doc_span_dedup(docs, k=8)
    rows = out.collect()
    assert len(rows) == docs.count()
    removed_any = False
    for r in rows:
        kept = len(r.clean_text.split()) if r.clean_text else 0
        assert r.n_tokens == r.n_removed + kept, r
        removed_any = removed_any or r.n_removed > 0
    assert removed_any, "no duplicated spans found at test scale"
    # untouched docs must be byte-stable under the rebuild
    orig = {
        r.doc_id: r.toks
        for r in docs.select(
            "doc_id",
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda w: w != F.lit(""),
            ).alias("toks"),
        ).collect()
    }
    for r in rows:
        if r.n_removed == 0 and r.n_tokens > 0:
            assert r.clean_text == " ".join(orig[r.doc_id]), r.doc_id


def test_span_dedup_plan_no_cartesian(spark, sf_dir):
    """Plan contract: the anchor-table formulation is equi-join/window
    only — no CartesianProduct, no nested-loop join anywhere."""
    docs = load_table(spark, "documents", sf_dir)
    plan = (
        cross_doc_span_dedup(docs, k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_dedup_null_and_empty_text(spark):
    """Review fix (r13): NULL text must come back as ('', 0, 0) —
    size(NULL) is -1 under Spark's legacy sizeOfNull and would diverge
    from the oracle twin's coalesced len()."""
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, None), (2, ""), (3, "   ")],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in cross_doc_span_dedup(df, k=2).collect()
    }
    assert got[1] == ("", 0, 0)
    assert got[2] == ("", 0, 0)
    assert got[3] == ("", 0, 0)
    assert got[0] == ("a b c d", 4, 0)


def _twin_capped(texts, k, max_occ):
    """r14 cap twin: grams occurring more than max_occ times are
    exempted from surgery entirely."""
    toks = {i: t.lower().split() for i, t in texts.items()}
    occ = {}
    for i in sorted(toks):
        w = toks[i]
        for p in range(1, len(w) - k + 2):
            gram = " ".join(w[p - 1 : p - 1 + k])
            occ.setdefault(gram, []).append((i, p))
    marked = {}
    for gram, lst in occ.items():
        if max_occ is not None and len(lst) > max_occ:
            continue
        for i, p in sorted(lst)[1:]:
            marked.setdefault(i, set()).update(range(p, p + k))
    out = {}
    for i, w in toks.items():
        keep = [t for j, t in enumerate(w, 1)
                if j not in marked.get(i, ())]
        out[i] = (" ".join(keep), len(w), len(w) - len(keep))
    return out


def test_span_dedup_cap_hand_example(spark):
    """A boilerplate 4-gram on ALL FOUR docs is exempted at
    max_occurrences=3 (it occurs 4 times) while a 2-occurrence span is
    still deduped — the cap guards skew without disabling surgery."""
    texts = {
        0: "foot er one two alpha beta gamma delta",
        1: "foot er one two x1",
        2: "foot er one two x2",
        3: "foot er one two alpha beta gamma delta",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id BIGINT, text STRING"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in cross_doc_span_dedup(
            df, k=4, max_occurrences=3
        ).collect()
    }
    # "foot er one two" occurs 4x -> exempt; doc 3's
    # "alpha beta gamma delta" (and the overlapping bridge grams that
    # occur only twice) are cut
    assert got[0][2] == 0
    assert got[1] == ("foot er one two x1", 5, 0)
    assert got[2] == ("foot er one two x2", 5, 0)
    assert got[3][1] == 8 and got[3][2] > 0
    assert got == _twin_capped(texts, 4, 3)


def test_span_dedup_cap_fuzz_vs_python_twin(spark):
    """Randomized cap equality vs the extended twin, including planted
    boilerplate grams shared by most docs. max_occurrences=None must
    equal the uncapped operator row for row (paper-faithful default).
    120 volume trials passed before this 6-trial permanent cut."""
    rng = random.Random(20260816)
    for t in range(6):
        k = rng.choice([2, 3])
        n_docs = rng.randint(4, 9)
        vocab = [f"w{j}" for j in range(rng.choice([4, 6]))]
        boiler = " ".join(rng.choice(vocab) for _ in range(k))
        texts = {}
        for i in range(n_docs):
            body = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(0, 10))
            )
            if rng.random() < 0.7:
                body = boiler + (" " + body if body else "")
            texts[i] = body
        max_occ = rng.choice([1, 2, 3])
        df = spark.createDataFrame(
            list(texts.items()), "doc_id BIGINT, text STRING"
        )
        got = {
            r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
            for r in cross_doc_span_dedup(
                df, k=k, max_occurrences=max_occ
            ).collect()
        }
        exp = _twin_capped(texts, k, max_occ)
        assert got == exp, (
            f"trial {t} k={k} max_occ={max_occ} docs={texts}\n"
            f" got={got}\n exp={exp}"
        )


def test_span_dedup_cap_plan_broadcast_anti_join(spark, sf_dir):
    """Plan contract for the cap: the pathological-gram drop is a
    BroadcastHashJoin LeftAnti (map-side, no extra gram shuffle of the
    anchor table) feeding the ranking window; no CartesianProduct."""
    docs = load_table(spark, "documents", sf_dir)
    df = cross_doc_span_dedup(docs, k=8, max_occurrences=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"BroadcastHashJoin \[gram[^\n]*LeftAnti", plan
    ), plan
    assert "CartesianProduct" not in plan, plan
