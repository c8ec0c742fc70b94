"""Dedup operators: LSH vs exact ground truth, SimHash properties."""

from pyspark.sql import functions as F

from map_v2_etl_spark.operators import dedup as D
from map_v2_etl_spark.sources.registry import load_table


def pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_lsh_recall_equals_exact(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    exact = pairs_set(D.jaccard_pairs(docs, threshold=0.8))
    lsh = pairs_set(D.minhash_lsh_pairs(docs, threshold=0.8))
    # verification makes precision exact; banding params make recall ~1
    assert lsh == exact
    assert len(exact) > 0  # the testdata plants near-dup pairs


def test_exact_dedup_survivor_is_min_id(spark):
    df = spark.createDataFrame(
        [(10, "a b c"), (3, "a b c"), (7, "x y z")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["n_dups"]
        for r in D.exact_dedup(df, F.col("text")).collect()
    }
    assert out == {3: 2, 7: 1}


def test_shingles_short_text_empty(spark):
    df = spark.createDataFrame([(1, "one two")], ["doc_id", "text"])
    r = df.select(D.word_shingles(F.col("text"), 3).alias("s")).collect()[0]
    assert r["s"] == []


def test_simhash_near_dup_small_hamming(spark):
    # two docs differing by one token out of many -> tiny hamming distance;
    # an unrelated doc -> large distance
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok7", "tok7x")
    other = " ".join(f"zzz{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    fps = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", D.simhash(F.col("text")).alias("fp")).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fps[1], fps[2]) < 12
    assert ham(fps[1], fps[3]) > 15


def test_simhash_pairs_match_bruteforce(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(120)
    fps = {r["doc_id"]: r["fp"] for r in
           docs.select("doc_id", D.simhash(F.col("text")).alias("fp")).collect()}
    brute = {
        (a, b)
        for a in fps for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    banded = pairs_set(D.simhash_pairs(docs, max_hamming=3))
    assert banded == brute  # pigeonhole banding guarantees exact recall


def test_simhash_pairs_collapses_duplicate_id_rows(spark):
    """An exact re-ingest (same id, same text appearing twice) must not
    inflate pair multiplicity (code-review regression: the first-band
    filter alone dedups across bands, not across duplicate input rows)."""
    from map_v2_etl_spark.operators.dedup import simhash_pairs

    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    dup = base + [base[0]]  # id 1 ingested twice
    a = sorted(
        map(tuple, simhash_pairs(
            spark.createDataFrame(base, ["doc_id", "text"])).collect())
    )
    b = sorted(
        map(tuple, simhash_pairs(
            spark.createDataFrame(dup, ["doc_id", "text"])).collect())
    )
    assert a == b
    assert len(b) == len({(x[0], x[1]) for x in b})  # no duplicate pairs
