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
