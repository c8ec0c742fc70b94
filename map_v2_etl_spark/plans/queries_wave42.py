"""Wave-42 surface: cross-document exact substring dedup.

* cross_doc_span_dedup — the span-surgery operator of Lee et al.,
  "Deduplicating Training Data Makes Language Models Better" (ACL'22):
  every k-token span occurring more than once in the corpus keeps one
  canonical occurrence and every other occurrence is CUT from its
  document (position-level marking, overlaps merge). The exact-match
  complement to the approximate MinHash/winnowing family and the
  cross-corpus complement to block_dedup's within-doc repetition pass.
  At sf0.01 the synthetic documents carry ~1000 cross-doc duplicated
  8-grams, so the registered query does real surgery (driver-checked
  row parity + value-hash over the rebuilt text).

Scale notes: one |tokens|-row k-gram explode shuffled by gram (the
anchor table — the standard distributed reformulation of the paper's
suffix array), per-gram occurrence ranking, a position explode bounded
by DUPLICATED volume only, one doc_id shuffle to reassemble. No
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import load_table, widen_partitions
from .queries_wave12 import _DUCK_TOKS_F
from .registry import query

_K = 8


def _duck_span_dedup(max_occ: int | None = None) -> str:
    """Span-dedup oracle builder. ``max_occ`` adds the r14
    boilerplate-gram cap as a count CTE + anti-join before the ranking
    window (operators/dedup.cross_doc_span_dedup's max_occurrences);
    the default emission is byte-identical to the r13 literal
    (cert-fingerprint discipline)."""
    cap = ""
    src = "g"
    if max_occ is not None:
        cap = f"""gc AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > {max_occ}
),
g2 AS (
  SELECT g.* FROM g ANTI JOIN gc USING (gram)
),
"""
        src = "g2"
    return f"""
WITH d AS (SELECT doc_id,
                  coalesce({_DUCK_TOKS_F}, []) AS toks FROM documents),
g AS (
  SELECT doc_id, p,
         array_to_string(list_slice(toks, p, p + {_K - 1}), chr(32))
           AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {_K - 1})) AS p
        FROM d)
),
{cap}r AS (
  SELECT doc_id, p,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
  FROM {src}
),
mk AS (
  SELECT DISTINCT doc_id, p + off AS pos
  FROM (SELECT doc_id, p, unnest(generate_series(0, {_K - 1})) AS off
        FROM r WHERE rn > 1)
),
tp AS (
  SELECT doc_id, pos, toks[pos] AS tok
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks))) AS pos FROM d)
),
k2 AS (
  SELECT tp.doc_id,
         array_to_string(list(tp.tok ORDER BY tp.pos), chr(32))
           AS clean_text,
         COUNT(*) AS n_kept
  FROM tp LEFT JOIN mk ON mk.doc_id = tp.doc_id AND mk.pos = tp.pos
  WHERE mk.pos IS NULL GROUP BY tp.doc_id
)
SELECT d.doc_id,
       coalesce(k2.clean_text, '') AS clean_text,
       CAST(len(d.toks) AS BIGINT) AS n_tokens,
       CAST(len(d.toks) - coalesce(k2.n_kept, 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN k2 ON k2.doc_id = d.doc_id
"""


_DUCK_SPAN_DEDUP = _duck_span_dedup()


@query(
    "cross_doc_span_dedup",
    _DUCK_SPAN_DEDUP,
    tags=["text", "dedup", "substring", "spans"],
)
def q_cross_doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact k-token-span dedup, k=8
    (operators/dedup.cross_doc_span_dedup): duplicated spans keep one
    canonical occurrence (lowest (doc_id, pos)); every other occurrence
    is cut and the text rebuilt in token order. Emits every document —
    (doc_id, clean_text, n_tokens, n_removed). Reference parity: the
    reference engine has no text surface (build.sh:75-233 is tile ETL);
    §2.11 training-pipeline extension, Lee et al. ACL'22 semantics."""
    from ..operators.dedup import cross_doc_span_dedup

    docs = widen_partitions(load_table(spark, "documents", sf_dir))
    return cross_doc_span_dedup(docs, k=_K)


@query(
    "span_dedup_capped",
    _duck_span_dedup(max_occ=2),
    tags=["text", "dedup", "substring", "spans", "skew"],
)
def q_span_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span dedup with the r14 BOILERPLATE-GRAM CAP
    (operators/dedup.cross_doc_span_dedup(max_occurrences=2)): grams
    occurring more than twice are exempted from surgery — the web-scale
    skew guard (a header/footer gram on ~every document would
    concentrate its whole occurrence list in one ranking-window
    partition; the cap counts with map-side partial aggregation and
    drops pathological grams via a broadcast anti-join BEFORE the
    window). At sf0.01, 71 grams occur three times, so the cap BINDS
    and this witness certifies a genuinely different surgery than
    cross_doc_span_dedup. Reference parity: no text surface in the
    reference (build.sh:75-233); §2.11 extension, Lee et al. ACL'22."""
    from ..operators.dedup import cross_doc_span_dedup

    docs = widen_partitions(load_table(spark, "documents", sf_dir))
    return cross_doc_span_dedup(docs, k=_K, max_occurrences=2)
