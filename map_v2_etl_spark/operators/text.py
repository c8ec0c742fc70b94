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


def _word_regex(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(text: Column) -> Column:
    """Whitespace token count (empty text -> 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: split on word/number/punct boundaries —
    the standard cheap proxy for tokenizer counts at corpus scale."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality heuristics + a composite score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(_word_regex(EN_STOPWORDS)), 0)
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    mean_word_len = (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1))
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
        lang: F.size(F.regexp_extract_all(lt, F.lit(_word_regex(words)), 0))
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
    lowercased token set — invariant to token order and repetition, the
    classic 'fingerprint clustering' key. md5 keeps it engine-portable."""
    toks = F.array_sort(
        F.array_distinct(F.split(F.lower(F.trim(text)), r"\s+"))
    )
    return F.md5(F.array_join(toks, " "))
