"""Text-analysis operators for corpus curation (SURVEY.md §2.11).

All pure Column expressions (regexp/split/HOF) — JVM-side, codegen'd, and
each reproducible in ANSI-ish SQL so every operator carries a DuckDB
oracle. Operates on the `documents` table shape (doc_id, text, ...).

  * token_count       — whitespace tokens + a BPE-ish subword estimate
  * quality_score     — length / punctuation / stopword-ratio heuristics
  * lang_id           — marker-word n-gram heuristic over a fixed table
  * fingerprint       — canonical md5 fingerprint (sorted distinct tokens)
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic, documented marker sets (tiny stopword tables; the classic
# n-gram-profile approach reduced to its highest-signal unigrams)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "了", "在", "和"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _word_regex(words: list[str], word_boundaries: bool = True) -> str:
    """Alternation over LITERAL words (re.escape guards future markers
    containing metacharacters). ``word_boundaries=False`` drops the
    \\b anchors — required for CJK markers, where Java's ASCII-word
    \\b never matches between two CJK codepoints, so \\b的\\b
    cannot match inside Chinese text at all."""
    alts = "|".join(re.escape(w) for w in words)
    if word_boundaries:
        return r"\b(" + alts + r")\b"
    return "(" + alts + ")"


def whitespace_strip(text: Column) -> Column:
    """Strip ALL leading/trailing whitespace. F.trim strips only 0x20
    spaces while \\s+ tokenizers treat tabs/newlines as separators —
    the mismatch injects empty edge tokens for '\\ttext' or
    'text\\n' inputs (over-counting tokens, perturbing fingerprints)."""
    return F.regexp_replace(text, r"^\s+|\s+$", "")


def token_count(text: Column) -> Column:
    """Whitespace token count (empty/whitespace-only text -> 0).

    One regex pass counting non-whitespace runs — value-identical to
    strip+split+size for every input (including all-whitespace -> 0),
    but with no stripped-string build and no token-array allocation."""
    return F.regexp_count(text, F.lit(r"\S+"))


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: split on word/number/punct boundaries —
    the standard cheap proxy for tokenizer counts at corpus scale.
    regexp_count, not size(regexp_extract_all): counting matches must
    not allocate a per-match string array."""
    return F.regexp_count(
        F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality heuristics + a composite score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    # Unicode classes, not \\w (ASCII-only in Java regex AND RE2): with
    # \\w every CJK/accented letter counted as punctuation, scoring
    # Chinese text as pure punctuation soup (punct_ratio 1.0)
    n_punct = F.regexp_count(t, F.lit(r"[^\p{L}\p{N}_\s]"))
    n_stop = F.regexp_count(F.lower(t), F.lit(_word_regex(EN_STOPWORDS)))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    # total non-whitespace chars / tokens — exact for ANY whitespace
    # shape (the old (n_chars - n_tokens + 1)/n_tokens closed form
    # assumed exactly single-space separators and no padding); counted
    # as length minus whitespace-char count, no stripped-string build
    n_word_chars = n_chars - F.regexp_count(t, F.lit(r"\s"))
    mean_word_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        n_word_chars / n_tokens
    )
    # composite: long enough, not punctuation soup, some function words
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.3
    )
    return df.withColumns(
        {
            "n_chars_m": n_chars.cast("bigint"),
            "n_tokens": n_tokens.cast("bigint"),
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "mean_word_len": mean_word_len,
            "quality": score,
        }
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker hits per language (per 'n-gram heuristic' language ID)."""
    lt = F.lower(text)
    return {
        lang: F.regexp_count(
            lt, F.lit(_word_regex(words, word_boundaries=lang != "zh"))
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column, default: str = "und") -> Column:
    """argmax over marker-hit counts; ties broken by language order;
    all-zero -> 'und'."""
    scores = lang_scores(text)
    best_lang, best_score = None, None
    for lang, sc in scores.items():
        if best_lang is None:
            best_lang, best_score = F.lit(lang), sc
        else:
            cond = sc > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, sc).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit(default))


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct
    lowercased token set — invariant to token order, repetition, AND
    surrounding whitespace (a doc with/without a trailing newline must
    dedup together), the classic 'fingerprint clustering' key. md5
    keeps it engine-portable. Tokenization is dedup.tokens — the ONE
    canonical tokenizer the dedup stack and its oracles share."""
    from .dedup import tokens

    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    )


#: winnowing packed-key geometry (r10): 40-bit gram hash (10 md5 hex
#: chars) × 23-bit position field — h·2^23 + (2^23−1−pos) ≤ 2^63−1, the
#: widest split that stays inside a signed 64-bit key in BOTH engines.
#: The DuckDB oracles (plans/queries_wave19.py) import these so the
#: geometry cannot drift between engines.
WINNOW_HASH_HEX = 10
WINNOW_POS_W = 1 << 23


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — public literature; the MOSS local-fingerprint
    algorithm): hash every k-token gram, slide a w-gram window, keep
    each window's RIGHTMOST minimal hash. Guarantees: any shared run of
    w+k-1 tokens between two documents shares >= 1 selected
    fingerprint, and selection density is ~2/(w+1) — the standard
    position-aware near-dup/plagiarism signature that set-based
    fingerprints (``fingerprint``) cannot provide.

    Output: one row per input document —
      (id, n_grams, n_fp, fp_sum, fp_min, fp_max)
    with NULL fp stats and n_fp = 0 for docs shorter than k tokens.

    Engine shape (and why it is exactly the textbook algorithm):
      * gram hash h = first 10 md5 hex chars as int (40 bits) — the
        repo's engine-portable hash (bit-equal in DuckDB via
        ``CAST('0x'||substr(md5(g),1,10) AS BIGINT)``). 40 bits, not
        the r6 28: downstream match joins bucket on h, and accidental
        collision PAIRS grow as n_fp²/2^bits — at 28 bits a 6.5M-
        fingerprint corpus already produced ~80k phantom candidate
        pairs (measured superlinear in bench_scale r10); at 40 bits
        the same corpus expects ~20. At true 100 TB fingerprint counts
        you would store h as its own full-64-bit column; the packed
        form is kept because it makes the tie rule one integer ORDER BY
        in both engines.
      * per-window rightmost-min without an argmin aggregate: the
        window minimum of key = h·2^23 + (2^23−1−pos) decodes to
        (min h, LARGEST pos among ties) — ties cannot survive the key
        (pos is injective), so the tie rule is enforced by integer
        ordering, not engine-specific argmin behavior. 40-bit h keeps
        key ≤ 2^63−1 exactly: no ANSI overflow; pos capacity 2^23
        grams/doc, enforced by a loud raise_error guard (a silent
        wrap would corrupt selection for megadocs).
      * ONE window pass (ROWS BETWEEN CURRENT AND w−1 FOLLOWING),
        partitioned by document — each reducer sorts its own docs'
        grams, nothing global. DISTINCT on the decoded key dedups
        positions selected by overlapping windows, exactly the paper's
        fingerprint set.
      * windows are the n_grams−w+1 FULL windows (a short doc keeps
        its single all-grams window), enforced by the pos bound, so a
        trailing partial frame never adds phantom fingerprints.

    Scale: explode is |tokens| rows/doc; the window is per-doc (skew =
    longest single document); the final agg is per-doc. No self-join,
    no broadcast, no driver state — the signature of choice when the
    downstream join is on selected-hash equality (winnow_pairs).
    """
    sel = winnow_selected(df, id_col, text_col, k, w)
    # decode h = key DIV 2^23 — INTEGER division ("/" would go through
    # double and lose bits above the 53-bit mantissa on 63-bit keys)
    hdec = F.expr(f"mk DIV {WINNOW_POS_W}")
    fp = sel.groupBy(id_col).agg(
        F.max("ng").alias("n_grams"),
        F.count("*").alias("n_fp"),
        F.sum(hdec).cast("long").alias("fp_sum"),
        F.min(hdec).cast("long").alias("fp_min"),
        F.max(hdec).cast("long").alias("fp_max"),
    )
    return (
        df.select(id_col)
        .join(fp, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_fp", F.lit(0)).cast("long").alias("n_fp"),
            "fp_sum",
            "fp_min",
            "fp_max",
        )
    )


def winnow_selected(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """The winnowing SELECTION set: one row per selected fingerprint,
    (id, ng, mk) where ng = the doc's gram count and mk = the packed
    (hash, position) key (h·2^23 + (2^23−1−pos), 40-bit h — see the
    winnow_fingerprints docstring for the width rationale). Shared
    subplan of winnow_fingerprints (per-doc summary) and winnow_pairs
    (bucket join) so the algorithm exists exactly once."""
    from .dedup import tokens

    # token array bound ONCE per row via the transform-over-singleton
    # trick (see word_shingles): Catalyst collapses the projection, so
    # referencing a toks COLUMN inside the gram lambda would inline and
    # re-run the tokenizer regex once per gram position (measured 4.2 s
    # -> 0.6 s at sf0.01 for this query)
    def ordered_grams(w: Column) -> Column:
        kk = F.size(w) - (k - 1)
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(w, i + j) for j in range(k)]
        )
        return F.when(
            kk >= 1, F.transform(F.sequence(F.lit(1), kk), gram)
        ).otherwise(F.array().cast("array<string>"))

    toks = F.filter(tokens(F.col(text_col)), lambda t: t != F.lit(""))
    grams = df.select(
        F.col(id_col),
        F.posexplode(
            F.element_at(F.transform(F.array(toks), ordered_grams), 1)
        ).alias("p0", "g"),
    )
    h = F.conv(
        F.substring(F.md5("g"), 1, WINNOW_HASH_HEX), 16, 10
    ).cast("long")
    # loud capacity guard: pos beyond the packed width would silently
    # fold into the hash bits and corrupt selection for megadocs
    pos1 = F.col("p0") + 1
    guarded = F.when(
        pos1 < WINNOW_POS_W, pos1
    ).otherwise(
        F.raise_error(
            F.lit(
                f"winnow_selected: document exceeds {WINNOW_POS_W - 1} "
                "grams — widen WINNOW_POS_W / store h unpacked"
            )
        ).cast("long")
    )
    keyed = grams.select(
        id_col,
        guarded.alias("pos"),  # 1-based gram position
        (
            h * WINNOW_POS_W
            + (F.lit(WINNOW_POS_W - 1) - F.col("p0") - 1)
        ).alias("key"),
    )
    from pyspark.sql.window import Window as W

    per_doc = W.partitionBy(id_col)
    frame = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(W.currentRow, w - 1)
    )
    m = keyed.select(
        id_col,
        "pos",
        F.min("key").over(frame).alias("mk"),
        F.max("pos").over(per_doc).alias("ng"),
    )
    return (
        m.filter(
            F.col("pos")
            <= F.greatest(F.col("ng") - (w - 1), F.lit(1))
        )
        .select(id_col, "ng", "mk")
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` DISTINCT winnowing
    fingerprint hashes — MOSS's match-detection join. Output:
    (id_a, id_b, n_shared, overlap) with id_a < id_b, where overlap is
    the containment-style ratio n_shared / min(|fp_a|, |fp_b|) rounded
    to 6 decimals (the MOSS report metric: how much of the SMALLER
    document's fingerprint set the pair shares).

    Scale shape — identical to the shingle-bucket family
    (dedup.jaccard_pairs): docs meet ONLY through an equi-join on a
    shared fingerprint hash, so work is sum-of-bucket-sizes², never
    |docs|²; winnowing's ~2/(w+1) selection density makes the posting
    lists ~3x shorter than raw-gram buckets at the same k. Per-doc
    fingerprint sizes join back by id (AQE broadcasts them when small;
    at corpus scale they hash-join like any dimension — the
    jaccard_pairs rule: no forced broadcast of corpus-sized tables)."""
    sel = winnow_selected(df, id_col, text_col, k, w)
    # distinct HASH per doc (a hash selected at several positions is one
    # match key; MOSS matches on hash equality, not position)
    fph = sel.select(
        id_col, F.expr(f"mk DIV {WINNOW_POS_W}").alias("h")
    ).distinct()
    sizes = fph.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    a, b = fph.alias("a"), fph.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_b"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b"), 6
            ).alias("overlap"),
        )
    )
