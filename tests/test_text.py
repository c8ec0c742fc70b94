"""Text-analysis operators."""

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import text as X


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "  a  b   c  "), (4, "don't stop!")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["nt"], r["ns"]) for r in df.select(
        "doc_id",
        X.token_count(F.col("text")).alias("nt"),
        X.subword_count(F.col("text")).alias("ns"),
    ).collect()}
    assert out[1] == (2, 2)
    assert out[2][0] == 0
    assert out[3][0] == 3
    assert out[4] == (2, 5)  # don ' t stop !


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "el perro y la casa de que los"),
            (3, "der hund und die katze ist das"),
            (4, "xyz qqq zzz"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", X.lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_fingerprint_invariance(spark):
    # order- and repetition-invariant, case-insensitive
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "a b c"), (3, "C a B b"), (4, "a b d")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", X.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_quality_score_bounds(spark, sf_dir):
    from map_v2_etl_spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = X.quality_features(docs).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)


def test_lang_id_detects_cjk(spark):
    """Chinese marker words carry no ASCII word boundaries — \\b的\\b
    can never match, so zh patterns drop the anchors (mirroring the
    DuckDB oracle's long-standing special case)."""
    from map_v2_etl_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [(1, "的是了在和的是了"),
         (2, "the cat and the dog is happy"),
         (3, "zzz qqq")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {1: "zh", 2: "en", 3: "und"}


def test_quality_not_punct_soup_for_unicode_text(spark):
    """Non-ASCII letters must not count as punctuation (\\w is
    ASCII-only in Java regex AND RE2)."""
    from map_v2_etl_spark.operators.text import quality_features

    df = spark.createDataFrame(
        [(1, "le café est agréable et la vie est belle"),
         (2, "的是了在和的是了的是了在和")],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[1]["punct_ratio"] == 0.0
    assert rows[2]["punct_ratio"] == 0.0


def test_token_count_and_fingerprint_whitespace_robust(spark):
    """Tabs/newlines at the edges must not inject empty tokens: counts
    drop to the true token count and fingerprints are invariant to
    surrounding whitespace."""
    from map_v2_etl_spark.operators.text import fingerprint, token_count

    df = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\thello world"), (3, "hello world"),
         (4, "\t\n "), (5, "b a")],
        "doc_id LONG, text STRING",
    )
    out = {
        r["doc_id"]: (r["n"], r["fp"])
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert [out[i][0] for i in (1, 2, 3, 4)] == [2, 2, 2, 0]
    assert out[1][1] == out[2][1] == out[3][1]  # whitespace-invariant
    assert out[5][1] != out[3][1]  # different token sets still differ


def test_mean_word_len_exact_on_padded_text(spark):
    from map_v2_etl_spark.operators.text import quality_features

    df = spark.createDataFrame(
        [(1, "  a  b   c  "), (2, ""), (3, "ab cd")],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r["mean_word_len"]
            for r in quality_features(df).collect()}
    assert rows[1] == 1.0
    assert rows[2] == 0.0
    assert rows[3] == 2.0


def _winnow_reference(text, k=4, w=5):
    """Pure-Python robust winnowing (Schleimer et al. 2003, Fig. 5
    semantics expressed as rightmost-min-per-window): returns the
    selected {(pos, h)} set, 1-based gram positions."""
    import hashlib
    import re

    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    grams = [
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    ]
    from map_v2_etl_spark.operators.text import WINNOW_HASH_HEX

    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:WINNOW_HASH_HEX], 16)
        for g in grams
    ]
    n = len(hs)
    if n == 0:
        return set(), 0
    sel = set()
    for s in range(max(n - w + 1, 1)):
        window = hs[s : s + w]
        m = min(window)
        # rightmost minimal
        j = max(i for i, h in enumerate(window) if h == m)
        sel.add((s + j + 1, m))
    return sel, n


def test_winnow_fingerprints_match_python_reference(spark):
    from map_v2_etl_spark.operators.text import winnow_fingerprints

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a b c"),                      # shorter than k -> no grams
        (3, "x y z w"),                    # exactly one gram
        (4, "one two three four five six one two three four five six"),
        (5, ""),                           # empty
        (6, "  pad\tpad  pad\npad pad pad pad  "),  # whitespace edges
        (7, ("tok " * 40).strip()),        # all-identical tokens: every
                                           # gram hash ties; rightmost
                                           # rule must pick determinate
                                           # positions
    ]
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_fp"], r["fp_sum"], r["fp_min"], r["fp_max"]
        )
        for r in winnow_fingerprints(df).collect()
    }
    for doc_id, text in texts:
        sel, n = _winnow_reference(text)
        hs = [h for _, h in sel]
        want = (
            n,
            len(sel),
            sum(hs) if hs else None,
            min(hs) if hs else None,
            max(hs) if hs else None,
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_winnow_shared_run_guarantee(spark):
    """The winnowing guarantee: two docs sharing a run of >= w+k-1
    tokens share at least one selected fingerprint hash — asserted on
    the ENGINE's selection (winnow_pairs with min_shared=1), with the
    pure-Python reference as a second witness."""
    from map_v2_etl_spark.operators.text import winnow_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    a = "unrelated prefix words here " + shared
    b = shared + " totally different suffix tokens"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id LONG, text STRING"
    )
    pairs = winnow_pairs(df, min_shared=1).collect()
    assert any(
        (r["id_a"], r["id_b"]) == (1, 2) and r["n_shared"] >= 1
        for r in pairs
    ), pairs
    sel_a, _ = _winnow_reference(a)
    sel_b, _ = _winnow_reference(b)
    assert {h for _, h in sel_a} & {h for _, h in sel_b}


def test_winnow_pairs_detects_shared_runs(spark):
    from map_v2_etl_spark.operators.text import winnow_pairs

    shared = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lam mu nu xi omicron pi rho sigma tau upsilon")
    df = spark.createDataFrame(
        [
            (1, "intro words " + shared + " closing remarks"),
            (2, shared + " completely different ending here"),
            (3, "nothing in common with anything else at all whatsoever "
                "unrelated tokens only forever and ever amen"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = winnow_pairs(df, min_shared=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in rows}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["n_shared"] >= 2 and 0 < r["overlap"] <= 1.0
    assert not any(3 in p for p in pairs)


def test_winnow_selected_fuzz_vs_textbook_reference(spark):
    """Volume fuzz of winnow_selected against an INDEPENDENT pure-Python
    implementation of textbook winnowing (Schleimer et al. SIGMOD'03:
    per window, the RIGHTMOST minimal hash), packed into the engine key
    form only at comparison time — the engine instead encodes the tie
    rule as an integer ORDER BY over h*2^23 + (2^23-1-pos), so set
    equality here proves the two derivations agree (r12 hand-off
    fuzz-net item; 12k-doc volume run passed before this 2.4k-doc
    permanent cut). Regimes: 1-2 token alphabets (maximal gram-hash
    ties), boundary lengths around k and k+w-1, whitespace chaos
    (tabs/newlines/multi-space, leading/trailing), six (k, w)
    geometries incl. w=1 (select everything) and k=1."""
    import hashlib
    import random

    from map_v2_etl_spark.operators.text import (
        WINNOW_POS_W,
        winnow_selected,
    )

    W = WINNOW_POS_W

    def ref_winnow(text, k, w):
        toks = text.strip().lower().split()
        grams = (
            [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else []
        )
        ng = len(grams)
        if ng == 0:
            return set(), 0
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:10], 16)
            for g in grams
        ]
        sel = set()
        for s in range(max(ng - (w - 1), 1)):
            wnd = hs[s : s + w]
            mh = min(wnd)
            pos0 = s + max(i for i, h in enumerate(wnd) if h == mh)
            sel.add(h_pack(mh, pos0))
        return sel, ng

    def h_pack(h, p0):
        return h * W + (W - 1 - p0 - 1)

    def gen_doc(rng):
        regime = rng.random()
        if regime < 0.25:
            alpha, n = ["a", "b"], rng.randint(0, 30)
        elif regime < 0.4:
            alpha, n = ["a"], rng.randint(0, 25)
        elif regime < 0.6:
            alpha = ["x", "y", "z", "w", "v"]
            n = rng.choice([0, 1, 2, 3, 4, 5, 7, 8, 9, 12])
        else:
            alpha, n = [f"t{i}" for i in range(12)], rng.randint(0, 40)
        toks = [rng.choice(alpha) for _ in range(n)]
        seps = [" ", "  ", "\t", "\n", " \t "]
        return (
            rng.choice(["", " ", "\n"])
            + rng.choice(seps).join(toks)
            + rng.choice(["", " ", "\t\n"])
        )

    rng = random.Random(4242)
    for k, w in [(4, 5), (1, 1), (1, 4), (2, 3), (3, 8), (5, 2)]:
        docs = [(i, gen_doc(rng)) for i in range(400)]
        df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
        got, ngs = {}, {}
        for r in winnow_selected(df, k=k, w=w).collect():
            got.setdefault(r["doc_id"], set()).add(r["mk"])
            ngs[r["doc_id"]] = r["ng"]
        for i, doc in docs:
            exp, ng = ref_winnow(doc, k, w)
            assert got.get(i, set()) == exp, (
                f"k={k} w={w} doc={doc!r}: got "
                f"{sorted(got.get(i, set()))} want {sorted(exp)}"
            )
            if ng > 0:
                assert ngs[i] == ng
