"""Wave-9 semantics: maximal dup spans (gaps-and-islands), quality-
priority canonical selection, sliding windows."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F


def _write_docs(spark, rows, tmp):
    spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(f"{tmp}/documents.parquet")


def test_dup_spans_finds_maximal_runs(spark):
    base = "a b c d e f g h i j k l m n o p"  # 16 tokens: 9 8-gram starts
    rows = [
        (0, base),
        # shares positions 1..9's grams, then diverges, then shares the
        # SAME leading 8-gram again at the tail -> two islands for doc 1
        (1, base + " q r s a b c d e f g h"),
        (2, "z y x w v u t s r q p o n m l k"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_docs(spark, rows, tmp)
        from map_v2_etl_spark.plans.queries_wave9 import q_dup_spans

        spans = {}
        for r in q_dup_spans(spark, tmp).collect():
            spans.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["n_positions"], r["span_len_tokens"])
            )
        for v in spans.values():
            v.sort()
    # doc 0: tokens 1..16 all covered by shared grams -> one island of 9
    assert spans[0] == [(1, 9, 16)]
    # doc 1: leading 9 positions shared, tail 'a b c d e f g h' is one
    # more shared gram at position 20 (27 tokens -> starts 1..20)
    assert spans[1] == [(1, 9, 16), (20, 1, 8)]
    assert 2 not in spans


def test_dedup_keep_best_prefers_longest_then_lowest_id(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma alpha alpha"),  # same fp, longer text
        (2, "alpha beta gamma"),  # same fp, same len as doc 0
        (3, "unrelated words here"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_docs(spark, rows, tmp)
        from map_v2_etl_spark.plans.queries_wave9 import q_dedup_keep_best

        out = {r["min_id"]: r for r in q_dedup_keep_best(spark, tmp).collect()}
    grp = out[0]
    assert grp["n_dups"] == 3
    assert grp["best_id"] == 1  # longest text wins
    assert grp["best_n_chars"] == len(rows[1][1])
    assert out[3]["best_id"] == 3


def test_sliding_window_double_counts_each_event(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0 + dt.timedelta(minutes=1), "a", 1.0),
        (2, t0 + dt.timedelta(minutes=6), "a", 2.0),
        (3, t0 + dt.timedelta(minutes=11), "b", 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    win = (
        ev.select(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            "event_type",
            "value",
        )
        .groupBy(F.col("w.start").alias("ws"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    got = {(r["ws"].minute + 60 * r["ws"].hour, r["event_type"]): (r["n"], r["tv"]) for r in win}
    # event@1min -> windows starting -5 and 0; @6min -> 0 and 5; @11 -> 5,10
    assert got[(0, "a")] == (2, 3.0)
    assert got[(5, "a")] == (1, 2.0)
    assert got[(1435, "a")] == (1, 1.0)  # window starting 23:55 prev day
    assert got[(5, "b")] == (1, 4.0)
    assert got[(10, "b")] == (1, 4.0)
    # every event appears in exactly window/slide = 2 windows
    assert sum(n for n, _ in got.values()) == 2 * len(rows)
