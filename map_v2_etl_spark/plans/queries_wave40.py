"""Wave-40 surface: tokenizer fertility — the standard tokenizer-eval
metric (mean BPE tokens emitted per whitespace word, reported per
language). Fertility is what tokenizer teams actually watch when a new
vocab lands: a language whose fertility drifts up pays proportionally
more sequence length for the same text, so the per-lang breakdown is
the regression signal (public precedent: the fertility tables in the
XLM-R / NLLB / Gemma tokenizer reports).

Exactness discipline: fertility is reported in parts-per-million via
exact integer arithmetic — ppm = (Σtokens · 10^6) intdiv Σwords — with
the product widened to DECIMAL(38,0) on Spark and HUGEINT in DuckDB
(the wave-38 pattern): int64 would wrap once Σtokens exceeds ~9·10^12,
and 100 TB corpora hold more tokens than that per language. No float
ratios anywhere, so the report value-hashes bit-for-bit.

Scale: one corpus token explode, a vocabulary-bounded broadcast join
(flips to a shuffle join at web-vocab sizes — same plan semantics), a
per-doc aggregate, and a languages-sized final aggregate. Composes the
learned tokenizer (operators/bpe.learn_bpe) exactly as bpe_token_counts
does; the oracle reuses the proven `_bpe_chain` CTE stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import learn_bpe
from ..sources.registry import load_table
from .queries_wave20 import _BPE_K, _bpe_chain, _DUCK_TOKS_F
from .registry import query


def _bpe_fertility_sql(k: int) -> str:
    return f"""{_bpe_chain(k)},
tok AS (SELECT doc_id, unnest({_DUCK_TOKS_F}) AS w FROM documents),
per AS (
  SELECT tok.doc_id,
         count(*) AS n_words,
         sum(len(string_split(wk.rep, ' '))) AS n_toks
  FROM tok JOIN w{k} wk USING (w)
  GROUP BY tok.doc_id
)
SELECT d.lang,
       CAST(sum(per.n_words) AS BIGINT) AS n_words,
       CAST(sum(per.n_toks) AS BIGINT) AS n_tokens,
       CAST((CAST(sum(per.n_toks) AS HUGEINT) * 1000000)
            // sum(per.n_words) AS BIGINT) AS fertility_ppm
FROM per JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


@query(
    "bpe_fertility",
    _bpe_fertility_sql(_BPE_K),
    tags=["text", "tokenizer", "bpe", "observability"],
)
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility under the learned BPE (K=6
    merges): (lang, n_words, n_tokens, fertility_ppm). Docs with zero
    words contribute nothing (the token join drops them, both
    engines)."""
    from ..operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    _, final = learn_bpe(docs, _BPE_K)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    sym = final.select(
        "w", F.size(F.split("rep", " ")).cast("long").alias("n_sym")
    )
    per = (
        tok.join(F.broadcast(sym), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_toks"),
        )
    )
    return (
        per.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.expr(
                "(CAST(sum(n_toks) AS DECIMAL(38,0)) * 1000000)"
                " DIV sum(n_words)"
            )
            .cast("long")
            .alias("fertility_ppm"),
        )
    )
