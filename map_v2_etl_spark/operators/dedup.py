"""Deduplication operators for large-scale text corpora (SURVEY.md §2.11).

North-star extension surface — not in the reference (which has no dedup);
designed for the 100 TB training-data-pipeline use case:

  * exact_dedup          — hash groupBy on a normalization key
  * shingle/ngram sets   — word n-grams, JVM-side (split/transform/sequence)
  * jaccard_pairs        — exact n-gram Jaccard similarity join (quadratic
                           in shingle-sharing docs; ground truth / verifier)
  * minhash_lsh_pairs    — MinHash signatures + banded LSH: candidate
                           generation touches only same-bucket docs, then
                           exact-Jaccard verification of candidates. The
                           scale path: shuffle is bounded by band buckets,
                           never all-pairs.
  * simhash_pairs        — 60-bit SimHash + pigeonhole banding for
                           hamming-distance candidates, verified by
                           bit_count(xor).

Everything is built from built-in column expressions (xxhash64/md5, HOFs)
— no Python UDFs in any hot path. Hash-family notes:
  * MinHash permutations: h_i(s) = xxhash64(i, s) — Spark-native, fast;
    signatures are engine-specific so the *verified output* (exact Jaccard
    over candidates) is what the oracle checks.
  * SimHash uses md5-derived 60-bit token hashes (first 15 hex chars) so
    the value is reproducible in any engine with md5 — including DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------

def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens — the ONE canonical tokenizer
    (fingerprint/shingles/minhash/simhash and the _DUCK_TOKENS oracle
    fragment all share it). Strips ALL surrounding whitespace: trim()
    only removes 0x20 while the \\s+ split treats tabs/newlines as
    separators, so a leading tab or trailing newline would inject an
    empty edge token into every downstream signature."""
    from .text import whitespace_strip

    return F.split(F.lower(whitespace_strip(text)), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>; empty if < n words.

    The token array is bound ONCE per row as a lambda variable (the
    transform-over-singleton trick) before the n-gram lambda references
    it. Embedding ``tokens(text)`` directly inside the gram lambda would
    re-evaluate the regex split per element_at reference — higher-order
    functions run on the interpreted expression path with no
    common-subexpression elimination, so an 8-gram shingler would re-split
    the text ~8x per gram position (~350 splits/row; measured ~10 ms/row
    → ~0.1 ms/row with the binding, a ~100x hot-path difference at any
    scale).
    """

    def grams(w: Column) -> Column:
        k = F.size(w) - (n - 1)
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(w, i + j) for j in range(n)]
        )
        return F.when(
            k >= 1,
            F.array_distinct(F.transform(F.sequence(F.lit(1), k), gram)),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens(text)), grams), 1)


def exact_dedup(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per normalization-key group.

    One hash aggregation; at scale this is a single shuffle on the key and
    the survivor choice (min id) is deterministic — unlike dropDuplicates,
    whose survivor depends on partition order.
    """
    return (
        df.groupBy(key.alias("dedup_key"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(id_col, "n_dups")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (ground truth; quadratic only in shingle-sharing docs)
# --------------------------------------------------------------------------

def _shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, shingle) rows: widen the scan, then explode the shingle
    expression INLINE.

    Two measured pitfalls shape this plan (sf0.1, 32 cores):
      * a narrow local scan serializes the shingle HOF on one core —
        widen_partitions puts the exchange below the expensive projection;
      * materializing the array as a projected column and exploding the
        column afterwards runs 3.4x slower than explode(<expr>) inline
        (the intermediate UnsafeArrayData breaks whole-stage codegen
        fusion of scan->generate->partial-agg). Same trap with a
        size(sh)>0 pre-filter, which also gets predicate-pushed below the
        exchange and re-evaluates the HOF on the narrow side; explode
        drops empty arrays for free anyway."""
    from ..sources.registry import widen_partitions

    carry = list(carry or [])
    return widen_partitions(df.select(id_col, text_col, *carry)).select(
        F.col(id_col),
        *carry,
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold: (id_a, id_b, jaccard).

    Shuffle pattern: explode shingles -> self equi-join on shingle ->
    per-pair intersection counts. Docs sharing no shingle never meet — the
    join is linear in sum-of-bucket-sizes^2 per shingle, not |docs|^2.
    jaccard = c / (|A| + |B| - c) as exact integer division in double.
    """
    sh = _shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    # no broadcast HINT on the size tables: they are corpus-sized (one
    # row per doc), so a forced broadcast would ship the whole corpus to
    # every executor regardless of autoBroadcastJoinThreshold. AQE still
    # broadcasts them when they actually fit; at scale they hash-join on
    # the pair keys like any dimension.
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard", F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + banded LSH (the scale path for near-dup detection)
# --------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """MinHash signature array<bigint>[num_perm] per doc.

    h_i(s) = xxhash64(i, s): explode shingles, num_perm mins per doc in a
    single hash aggregation. Partial (map-side) min collapse means the
    shuffle carries one 64-long row per doc per partition, and the whole
    agg stays in whole-stage codegen — measured ~5x faster than the
    "clever" zero-shuffle array-HOF formulation, whose nested lambdas drop
    out of codegen into per-element interpretation."""
    agg = _minhash_columns(df, id_col, text_col, n, num_perm)
    return agg.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig")
    )


def _minhash_columns(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_perm: int,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, [carry...], h0..h{num_perm-1}) — signature as SEPARATE columns.

    Internal consumers (banding) reference individual mins; wrapping the
    64 agg outputs in one array() and indexing it per band duplicates the
    whole expression tree 16x, which measurably chokes analysis + codegen
    (6s of plan build before a single task ran). This is the ONE copy of
    the signature aggregation — minhash_signatures and the LSH banding
    both call it, so the hash family cannot drift between the two APIs.

    Hash family: h_i(s) = xxhash64(i, xxhash64(s)) — the shingle STRING
    is hashed once per row and the num_perm permutations derive from
    that fixed-width long, instead of re-hashing the full string once
    per permutation (measured 0.90 s -> 0.52 s for the 64-min aggregate
    at sf0.1; the saving scales with shingle length). Downstream
    near-dup OUTPUT is invariant to the family choice because LSH
    candidates are exact-Jaccard-verified; only recall depends on it,
    and seeded-xxhash64-over-xxhash64 is as uniform as the direct
    form (recall property tested against exact in tests/test_dedup.py)."""
    carry = carry or []
    sh = _shingle_table(df, id_col, text_col, n, carry=carry).withColumn(
        "hs", F.xxhash64("s")
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("hs"))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy(id_col, *carry).agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    new_side: Column | None = None,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, verified by exact Jaccard.

    bands=16 x rows=4 over 64 perms: P(candidate) = 1-(1-j^4)^16 — at the
    planted-dup regime (j ~ 0.98) recall is 1-1e-18; at j = 0.5 the false-
    candidate rate is ~0.64 per pair *that shares a bucket*, all discarded
    by the exact verification. Only same-bucket docs are ever paired, so
    the shuffle is |docs| x bands rows, never all-pairs. Output == exact
    jaccard_pairs(threshold) whenever LSH recall holds (verified in tests).

    ``new_side`` (boolean Column over ``df``) switches to INCREMENTAL
    mode: candidates pair only across the split — id_a from the new
    batch, id_b from the existing corpus — the shape of screening an
    incoming crawl increment against the already-ingested corpus
    (signatures on the existing side would be a precomputed table in
    production; one pass computes both here).

    CACHE CONTRACT: the candidate-pair and candidate-shingle tables are
    persisted and NOT unpersisted here — the returned DataFrame is lazy
    and its plan references them (both are output-bounded: pairs, and
    docs appearing in >= 1 pair). Callers running many LSH builds in
    one session should ``spark.catalog.clearCache()`` between builds.
    """
    if bands < 1 or num_perm % bands != 0:
        # a non-dividing band count would silently ignore trailing
        # permutations (changing the documented 1-(1-j^r)^b recall
        # curve), and bands > num_perm would hash ZERO columns per band
        raise ValueError(
            f"bands must divide num_perm: num_perm={num_perm} bands={bands}"
        )
    rows_per_band = num_perm // bands
    base = df
    extra_group: list[str] = []
    if new_side is not None:
        base = df.withColumn("__is_new", new_side.cast("int"))
        extra_group = ["__is_new"]
    sigs = _minhash_columns(
        base, id_col, text_col, n, num_perm, carry=extra_group
    )
    banded = _band_frame(sigs, id_col, bands, rows_per_band, extra_group)
    x, y = banded.alias("x"), banded.alias("y")
    if new_side is not None:
        pair_cond = (
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.__is_new") == 1)
            & (F.col("y.__is_new") == 0)
        )
    else:
        pair_cond = (
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        )
    cand = (
        x.join(
            y,
            pair_cond,
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
        # the candidate set is referenced three times below (id extraction,
        # intersection join, final output); without a persist each reference
        # re-runs the whole signature+banding pipeline
        .persist()
    )
    return _verify_candidates(df, cand, threshold, id_col, text_col, n)


def _band_frame(
    sigs: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    extra: list[str] | None = None,
) -> DataFrame:
    """(id, *extra, band, bucket) rows — the LSH bucketing key:
    xxhash64 over each band's ``rows_per_band`` signature mins, one
    explode per signature row (|docs| x bands output rows, never
    all-pairs). Factored out (r17) so the persisted-signature-store
    path (minhash_lsh_pairs_vs_store) buckets stored signatures with
    the IDENTICAL expressions as the one-pass path — the band/bucket
    key cannot drift between them."""
    extra = extra or []
    return sigs.select(
        id_col,
        *extra,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, *extra, "bb.band", "bb.bucket")


def _verify_candidates(
    df: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str,
    text_col: str,
    n: int,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate-pair frame (id_a,
    id_b) against the docs in ``df`` — factored out of
    minhash_lsh_pairs (r17) unchanged, shared with the
    signature-store path.

    Only docs that appear in a candidate pair are ever re-shingled
    (candidate ids are a tiny broadcast semi-join on the raw docs; the
    full corpus never joins at shingle granularity). Verification
    keeps each candidate doc's shingle set as ONE array row and
    computes the intersection with array_intersect per pair — two
    equi-joins + a per-row hash-set intersection, instead of the
    explode -> (id, shingle) self-join -> per-pair count aggregation
    (3 extra shuffles; measured 2.1s -> 0.4s at sf0.1 where the
    candidate set is a few hundred pairs). The candidate-doc set is
    output-bounded (docs in >= 1 near-dup pair), so the array rows
    stay small relative to the corpus at any scale."""
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # persist is load-bearing, not a cache hint: without it Catalyst's
    # project-collapse inlines the word_shingles HOF into every downstream
    # reference (sh_a, sh_b, both sizes, the intersection, the jaccard
    # expression AND its filter copy), re-evaluating the shingle pipeline
    # ~8x per row — measured 0.45s -> 19.7s at sf0.1. The persisted set is
    # output-bounded (only docs in >= 1 candidate pair).
    sharr = (
        df.join(F.broadcast(cand_ids), id_col, "left_semi")
        .select(
            F.col(id_col),
            word_shingles(F.col(text_col), n).alias("sh"),
        )
        .persist()
    )
    a = sharr.select(
        F.col(id_col).alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.size("sh").alias("n_a"),
    )
    b = sharr.select(
        F.col(id_col).alias("id_b"),
        F.col("sh").alias("sh_b"),
        F.size("sh").alias("n_b"),
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("c", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard", F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature_columns(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """PUBLIC column-form signatures — (id, h0..h{num_perm-1}) — the
    schema a persisted signature STORE carries (r17): one row per doc,
    num_perm bigint mins, plain parquet-friendly. The store is what
    makes incremental dedup pay at deployment cadence: the corpus's
    signatures are computed once at ingest and an arrival batch
    re-shingles only itself (minhash_lsh_pairs_vs_store). Same single
    aggregation as minhash_signatures (which packs the array form) —
    the hash family cannot drift between the store and the one-pass
    path."""
    return _minhash_columns(df, id_col, text_col, n, num_perm)


def minhash_lsh_pairs_vs_store(
    new_docs: DataFrame,
    store_sigs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup screening of an ARRIVAL batch against a persisted
    signature store (r17) — the deployment form of incremental dedup:
    the already-ingested corpus is represented ONLY by its stored
    (id, h0..h{num_perm-1}) signatures (minhash_signature_columns —
    in production a table maintained by commits, e.g. on the manifest
    log), so the batch pays one signature pass over ITSELF plus a
    banded join against the store. Candidates are new-vs-store (the
    cross screen) plus new-vs-new (within-batch dups arrive together);
    both verify by exact Jaccard over ``corpus`` (any superset of the
    candidate docs carrying the raw text — the store holds no text).
    Output pairs are orientation-normalized (id_a < id_b), so the
    union of per-batch outputs with the bootstrap's self-pairs equals
    the full-corpus minhash_lsh_pairs — certified by the registered
    dedup_signature_log query against the exact-Jaccard oracle.

    Scale: the store never re-shingles (signatures are 64 longs per
    doc); the banded join is |new| x bands vs |store| x bands rows on
    (band, bucket) equi-keys — same-bucket rows only, never
    all-pairs; verification is output-bounded exactly as in
    minhash_lsh_pairs."""
    if bands < 1 or num_perm % bands != 0:
        raise ValueError(
            f"bands must divide num_perm: num_perm={num_perm} bands={bands}"
        )
    rows_per_band = num_perm // bands
    new_sigs = _minhash_columns(new_docs, id_col, text_col, n, num_perm)
    bn = _band_frame(new_sigs, id_col, bands, rows_per_band)
    bs = _band_frame(
        store_sigs.select(
            id_col, *[f"h{i}" for i in range(num_perm)]
        ),
        id_col,
        bands,
        rows_per_band,
    )
    key = ["band", "bucket"]
    cross = (
        bn.alias("x")
        .join(
            bs.alias("y"),
            [F.col(f"x.{k}") == F.col(f"y.{k}") for k in key]
            + [F.col(f"x.{id_col}") != F.col(f"y.{id_col}")],
        )
        .select(
            F.least(
                F.col(f"x.{id_col}"), F.col(f"y.{id_col}")
            ).alias("id_a"),
            F.greatest(
                F.col(f"x.{id_col}"), F.col(f"y.{id_col}")
            ).alias("id_b"),
        )
    )
    within = (
        bn.alias("x")
        .join(
            bn.alias("y"),
            [F.col(f"x.{k}") == F.col(f"y.{k}") for k in key]
            + [F.col(f"x.{id_col}") < F.col(f"y.{id_col}")],
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
    )
    # distinct + persist: same contract as minhash_lsh_pairs' candidate
    # table (referenced three times by the verification)
    cand = cross.union(within).distinct().persist()
    return _verify_candidates(
        corpus, cand, threshold, id_col, text_col, n
    )


# --------------------------------------------------------------------------
# connected components: near-dup pairs -> duplicate clusters
# --------------------------------------------------------------------------

def connected_components(
    vertices: DataFrame | None,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    small_graph_vertices: int = 200_000,
) -> DataFrame:
    """(id, cluster) — cluster = min vertex id reachable from id.

    ``vertices=None`` means "the edge endpoints ARE the vertex
    universe" — callers whose vertex set is derived from the edges
    (dup_clusters) would otherwise distinct the endpoints themselves
    only for this function to union-and-distinct them again: one
    redundant pairs-table pass per build (r10).

    Iterative min-label propagation: each round every vertex adopts the
    smallest label among itself and its neighbors; converges in
    O(graph diameter) rounds. Near-dup graphs are unions of near-cliques,
    so 2-3 rounds in practice.

    Scale posture: each round is one equi-join + one min-aggregation —
    both shuffle on vertex id, so a cluster co-partitions after round one.
    ``localCheckpoint(eager=True)`` truncates lineage every round: without
    it the plan doubles per iteration and Catalyst re-analysis dominates
    (classic iterative-join trap). The driver-side convergence check is
    one count per round — the standard pattern for iterative algorithms
    (GraphX/GraphFrames do the same); for graphs with huge diameters the
    production upgrade is the large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    which squares the reach per round.
    """
    from pyspark import StorageLevel

    from .iteration import iteration_partitions

    # the vertex universe is vertices ∪ edge endpoints: an endpoint
    # absent from `vertices` must still propagate (and be eligible as a
    # min label) or the iterative path diverges from the union-find
    # fast path, which has always unioned endpoints in
    endpoints = edges.select(F.col(src_col).alias("id")).union(
        edges.select(F.col(dst_col).alias("id"))
    )
    all_verts = (
        endpoints
        if vertices is None
        else vertices.select(F.col(id_col).alias("id")).union(endpoints)
    ).distinct()
    # iteration partitioning sized to the actual vertex count (the
    # pagerank discipline): a 5k-vertex label table over 32 partitions
    # pays rounds of near-empty-task scheduling for nothing
    n_vertices = all_verts.count()  # bounded driver scalar
    if n_vertices <= small_graph_vertices:
        # gate-bounded fast path (the pagerank/tfidf regime switch):
        # union-find on the driver in one edge pass — identical
        # min-label components, none of the per-round stage overhead
        edges_c = edges.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # _components_local consumes the edge list eagerly
            # (toPandas), so the finally-unpersist is safe on BOTH
            # outcomes — previously a passed vertex gate + failed edge
            # gate leaked the persisted edge set for the session
            if edges_c.count() <= 2_000_000:
                return _components_local(
                    all_verts, edges_c, "id", src_col, dst_col
                )
        finally:
            edges_c.unpersist()
    n_part = iteration_partitions(edges.sparkSession, n_vertices)
    labels = all_verts.select(
        F.col("id"), F.col("id").alias("label")
    ).repartition(n_part, "id")
    # Self-loops are dropped (see _symmetrize): they never change a
    # label, and the round-1 convergence-count skip below relies on
    # "any edge changes a label in round 1" — a self-loop-only graph
    # would violate that invariant (round-1 advice). The persisted
    # repartition co-partitions the edge table with the per-round join
    # key ONCE. Locally this is ~neutral (measured 3.5s vs 3.8s at
    # sf0.1 — Spark's shuffle-file reuse was already absorbing most
    # re-derivation), but it makes the edge materialization explicit
    # instead of leaning on shuffle retention, which an external
    # shuffle service or node loss can evict at scale.
    sym = (
        _symmetrize(edges, src_col, dst_col)
        .repartition(n_part, "a")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    converged = False
    for it in range(max_iter):
        msgs = sym.join(labels, sym.a == labels.id).select(
            F.col("b").alias("id"), F.col("label")
        )
        new_labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # skip the round-1 convergence count: any graph with an edge
        # changes a label in round 1, so the count is a wasted job there
        # (a vertex-only graph just pays one extra cheap round)
        if it > 0:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            if changed == 0:
                labels = new_labels
                converged = True
                break
        labels = new_labels
    if not converged and max_iter > 1:
        # detection trails production by one round — the final labels
        # may already be stable; probe once before declaring failure
        msgs = sym.join(labels, sym.a == labels.id).select(
            F.col("b").alias("id"), F.col("label")
        )
        probe = (
            labels.union(msgs).groupBy("id").agg(F.min("label").alias("label"))
        )
        changed = (
            probe.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        converged = changed == 0
    sym.unpersist()
    if not converged and max_iter > 1:
        # min-label propagation needs O(diameter) rounds; returning the
        # partial labels would silently split one component into many
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds (graph diameter exceeds max_iter); raise max_iter "
            "or use connected_components_star (O(log d) rounds)"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster"))


def _components_local(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
) -> DataFrame:
    """Driver-side union-find for gate-bounded graphs: cluster = the
    MINIMUM vertex id of each component — the same labels the iterative
    min-label loop converges to (and the recursive-CTE oracle computes),
    in one pass over the edge list."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    # Arrow toPandas, not collect(): columnar transfer of the
    # gate-bounded edge list, then a plain python union-find loop over
    # primitive values (.tolist() converts the whole column to python
    # scalars in one C pass — no per-Row deserialization)
    for v in vertices.select(F.col(id_col).alias("id")).toPandas()[
        "id"
    ].tolist():
        parent.setdefault(v, v)
    e_pdf = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).toPandas()
    for ra, rb in zip(e_pdf["a"].tolist(), e_pdf["b"].tolist()):
        # endpoints outside `vertices` still label (the iterative loop's
        # union introduces them too)
        parent.setdefault(ra, ra)
        parent.setdefault(rb, rb)
        a, b = find(ra), find(rb)
        if a != b:
            # union by MIN id so every root is its component's minimum
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    out = [(i, find(i)) for i in parent]
    return vertices.sparkSession.createDataFrame(
        out,
        vertices.select(F.col(id_col).alias("id")).schema.add(
            "cluster", vertices.schema[id_col].dataType, True
        ),
    )


def _symmetrize(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Undirected edge set as both orientations, self-loops dropped."""
    return (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
    )


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14). Converges in O(log d) rounds vs O(d) for plain min-label
    propagation — the scale path for high-diameter graphs (long chains,
    web-link graphs); ``connected_components`` stays the default for
    near-clique dup graphs where d is 2-3.

    large-star(u): every neighbor v > u re-attaches to
    m = min(N(u) ∪ {u}); small-star(u): with edges oriented (max, min),
    every neighbor plus u itself attaches to m. Both are one window-min
    over the neighbor list keyed by u — one shuffle each, no all-pairs
    blowup; the edge set only ever shrinks toward the star forest, and
    labels (attachment targets) decrease monotonically.

    Convergence test: the oriented edge set is a fixpoint of the round.
    Checked as |new| == |old| and new ⊄ old via ``subtract`` — one extra
    shuffle per round, amortized by the O(log d) round count.
    """
    from pyspark.sql import Window as W

    def _oriented(e: DataFrame) -> DataFrame:
        return (
            e.select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = F.least(F.min("b").over(W.partitionBy("a")), F.col("a"))
        return (
            sym.withColumn("m", m)
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        o = _oriented(e)  # a > b for every row
        withm = o.withColumn(
            "m", F.min("b").over(W.partitionBy("a"))
        )
        nbr = withm.select(F.col("b").alias("a"), F.col("m").alias("b"))
        self_ = withm.select(F.col("a"), F.col("m").alias("b")).distinct()
        return (
            nbr.union(self_).filter(F.col("a") != F.col("b")).distinct()
        )

    cur = _oriented(_symmetrize(edges, src_col, dst_col)).localCheckpoint(
        eager=True
    )
    converged = False
    for _ in range(max_iter):
        nxt = _oriented(_small_star(_large_star(cur))).localCheckpoint(
            eager=True
        )
        n_new, n_old = nxt.count(), cur.count()
        if n_new == n_old and nxt.subtract(cur).count() == 0:
            cur = nxt
            converged = True
            break
        cur = nxt
    if not converged:
        # the final round's output may itself be the fixpoint (detection
        # always trails production by one round) — probe once before
        # declaring failure
        probe = _oriented(_small_star(_large_star(cur))).localCheckpoint(
            eager=True
        )
        if (
            probe.count() == cur.count()
            and probe.subtract(cur).count() == 0
        ):
            converged = True
    if not converged:
        # before the star-forest fixpoint a node can still appear as
        # `a` with several targets — emitting labels then would
        # duplicate ids with conflicting clusters
        raise RuntimeError(
            f"connected_components_star did not reach its star-forest "
            f"fixpoint in {max_iter} rounds; raise max_iter"
        )

    # fixpoint edge set is a star forest rooted at each component's min:
    # every non-root points straight at its root. Label the SAME vertex
    # universe as connected_components: vertices ∪ edge endpoints (an
    # endpoint absent from `vertices` must not drop from the output —
    # the two CC implementations are interchangeable).
    roots = cur.select(F.col("a").alias("id"), F.col("b").alias("label"))
    all_verts = (
        vertices.select(F.col(id_col).alias("id"))
        .union(edges.select(F.col(src_col).alias("id")))
        .union(edges.select(F.col(dst_col).alias("id")))
        .distinct()
    )
    labels = (
        all_verts.join(roots, "id", "left")
        .select(
            "id", F.coalesce("label", F.col("id")).alias("cluster")
        )
    )
    return labels


def dup_clusters(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    exact: bool = True,
) -> DataFrame:
    """(doc_id, cluster) for every doc: near-dup docs share a cluster id
    (the minimum doc_id of the group), unique docs form singletons.

    Edges come from the exact n-gram Jaccard join (``exact=True``, the
    oracle-checkable path) or MinHash-LSH candidates (the 100 TB path —
    identical output whenever LSH recall holds).

    The iterative CC runs only over vertices that appear in an edge —
    docs in no near-dup pair are singleton clusters by definition and
    join back afterwards, so label propagation touches |dup docs| rows,
    not |corpus| rows.

    CACHE CONTRACT: the pair table is persisted and NOT unpersisted
    here (it feeds both the vertex extraction and the CC edge joins of
    the returned lazy plan; it is output-bounded — near-dup pairs
    only). Sessions running many cluster builds should
    ``spark.catalog.clearCache()`` between builds."""
    pair_fn = jaccard_pairs if exact else minhash_lsh_pairs
    pairs = pair_fn(
        df, threshold, id_col=id_col, text_col=text_col, n=n
    ).persist()
    # vertices=None: the dup-graph vertex universe IS the pair
    # endpoints — connected_components derives (and distincts) it
    # internally, so computing edge_ids here was a second pass over the
    # pairs table per build (r10)
    cc = connected_components(
        None, pairs, id_col="id", src_col="id_a", dst_col="id_b"
    )
    return (
        df.select(F.col(id_col))
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster"),
        )
    )


# --------------------------------------------------------------------------
# SimHash (hamming-distance near-dup; md5-based for cross-engine parity)
# --------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit int


def _token_hash60(tok: Column) -> Column:
    """Deterministic 60-bit token hash reproducible in any md5-capable
    engine: first 15 hex chars of md5, parsed base-16."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash(text: Column) -> Column:
    """60-bit SimHash over distinct lowercased tokens, as a Column.

    Classic scheme: each token votes +1/-1 per bit of its hash; the sign
    of each bit-sum forms the fingerprint. Expressed with HOFs: fold over
    token hashes accumulating 60 counters, then reassemble bits."""
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(toks, _token_hash60)
    # 2^i masks as a literal array: pow-of-two doubles are exact in IEEE,
    # so the long cast is exact; avoids shiftleft/right whose PySpark
    # wrappers only take literal ints (not lambda-bound Columns)
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)])
    counters = F.aggregate(
        hashes,
        F.array(*[F.lit(0)] * SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(
                    F.lit(-1)
                ),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            counters,
            masks,
            lambda cnt, m: F.when(cnt > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fp) per-row SimHash — a thin frame wrapper over the Column
    variant. Measured note: an explode + 60-conditional-SUM aggregate
    formulation (the DuckDB oracle's shape) was tried and is ~2x SLOWER
    here AND worse at scale — it shuffles every (doc, token) row for
    the groupBy, while the HOF fold is map-local with zero shuffle."""
    return df.select(F.col(id_col), simhash(F.col(text_col)).alias("fp"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs with SimHash hamming distance <= max_hamming.

    Pigeonhole banding: split 60 bits into max_hamming+1 chunks; any pair
    within distance k agrees exactly on >= 1 chunk, so candidates come from
    equi-joining on (chunk_idx, chunk_value) — never all-pairs. Verified
    with bit_count(xor).

    Two measured plan choices (dense planted-dup graph, 271k pairs from
    5k docs at sf0.1):

    * FIRST-AGREEING-BAND dedup instead of ``.distinct()``: a qualifying
      pair agrees on up to n_chunks bands, so the naive band join emits it
      up to 4x and a full-width distinct must shuffle the blown-up
      candidate set. Requiring "no earlier chunk also agrees" (three
      shift-and-compare exprs on the fingerprints already in the row)
      emits each pair exactly once at its first agreeing band — the
      dedup shuffle disappears entirely and stays codegen'd.
    * ``persist`` on the chunk table: a self-join's two aliases are
      separate subplans to Catalyst (no ReusedExchange across the
      join), so the fingerprint fold would otherwise run twice; both
      aliases of a persisted frame share ONE InMemoryRelation. Also
      makes every downstream double-reference (``pairs.union(reversed)``
      in the graph queries) one computation instead of a full pipeline
      re-run. persist, NOT localCheckpoint: cached blocks keep their
      lineage, so an executor loss recomputes instead of failing with a
      missing non-replicated checkpoint block, and ``clearCache``
      releases them between queries.

    PRECONDITION — id uniqueness: input ids are document keys and each
    id must map to one text. An exact re-ingest (duplicate id rows with
    IDENTICAL text) collapses safely at the fingerprint aggregate below
    and cannot inflate pair multiplicity. Duplicate ids carrying
    DIFFERENT texts are a key-integrity bug upstream; this operator
    keeps the max fingerprint and silently drops the others — dedupe or
    re-key such inputs (e.g. key on (id, hash(text))) before calling.

    CACHE CONTRACT: the internal chunk table is persisted and NOT
    unpersisted here — the result is a lazy DataFrame whose plan still
    references it, so unpersisting before the caller materializes would
    defeat the self-join sharing this persist exists for. Callers that
    run many simhash builds in one session should
    ``spark.catalog.clearCache()`` (or unpersist after materializing, as
    q_bfs_levels does) between builds; the bench/oracle harnesses
    already do. r18: the persisted chunk frame also rides on the
    returned DataFrame as ``_m2e_cached_parents`` so a caller that
    consumes the pairs EAGERLY (doc_pagerank's checkpointed power
    iteration) can release it without clearing the whole session cache
    (VERDICT r17 item 7).
    """
    from pyspark import StorageLevel

    from ..sources.registry import widen_partitions

    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    # one row per id even if the source carries duplicate rows (exact
    # re-ingest): deterministic max-collapse on the vertex-sized (id, fp)
    # table — without it a duplicated id row would emit each of its
    # pairs 4x (the old full-width distinct used to hide this)
    fp = (
        simhash_df(widen_partitions(df), id_col, text_col)
        .groupBy(id_col)
        .agg(F.max("fp").alias("fp"))
    )
    mask = (1 << chunk_bits) - 1

    def chunk(col: Column, i: int) -> Column:
        return F.shiftright(col, i * chunk_bits).bitwiseAND(F.lit(mask))

    chunks = fp.select(
        id_col,
        "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"), chunk(F.col("fp"), i).alias("cv")
                )
                for i in range(n_chunks)
            ])
        ).alias("ch"),
    ).select(id_col, "fp", "ch.ci", "ch.cv").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    x, y = chunks.alias("x"), chunks.alias("y")
    # pair emitted only at its FIRST agreeing chunk: for every j < ci the
    # j-th chunks must differ (they're derivable from fp_a/fp_b in-row)
    first_band = F.lit(True)
    for j in range(n_chunks - 1):
        first_band = first_band & (
            (F.col("x.ci") <= j)
            | (chunk(F.col("x.fp"), j) != chunk(F.col("y.fp"), j))
        )
    out = (
        x.join(
            y,
            (F.col("x.ci") == F.col("y.ci"))
            & (F.col("x.cv") == F.col("y.cv"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .filter(first_band)
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("x.fp").bitwiseXOR(F.col("y.fp"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    out._m2e_cached_parents = [chunks]  # see CACHE CONTRACT above
    return out


def cross_doc_span_dedup(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int | None = None,
) -> DataFrame:
    """Cross-document EXACT substring deduplication — the span-surgery
    operator of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (ACL'22): every k-token span occurring more than
    once ANYWHERE in the corpus designates its lowest (doc_id,
    position) occurrence canonical and every OTHER occurrence's k
    token positions are cut from their documents. Overlapping or
    chained duplicated spans merge naturally through position-level
    marking (a run of j >= k duplicated tokens is covered by its
    j - k + 1 constituent k-grams). NOTE the paper's semantics, kept
    here deliberately: spans are removed independently, so a gram's
    canonical copy can itself be destroyed when it overlaps a
    DIFFERENT duplicated gram's non-canonical occurrence — at-least-
    one-copy retention is typical, not guaranteed. Returns
    (id, clean_text, n_tokens, n_removed) for EVERY input document —
    untouched docs pass through with n_removed = 0, fully-duplicated
    copies come back with clean_text = '', NULL/empty text as
    ('', 0, 0).

    This is the cross-corpus complement of block_dedup (within-doc
    repetition, queries_wave12) and the exact-match complement of the
    approximate winnowing/containment family: where MinHash asks "are
    these documents similar?", this asks "which exact byte-spans are
    literal copies?" — the operator the paper shows removes the
    memorization-prone near-verbatim tail that document-level dedup
    misses.

    Distributed shape (the paper uses a single-node suffix array; the
    k-gram anchor reformulation is the standard distributed
    equivalent): ONE corpus tokenize, ONE |tokens|-row k-gram explode
    shuffled by gram (the anchor table — same row count as the
    suffix-array construction would touch), per-gram occurrence lists
    ranked by a window (groups are occurrence counts, small for all but
    boilerplate grams — capped by ``max_occurrences`` below), a
    position-explode bounded by the DUPLICATED volume only, and one
    doc_id shuffle to reassemble. No driver-side state, no collects.

    ``max_occurrences`` (r14 — the SCALE.md skew watch item as code):
    a gram occurring on ~every document (page headers, license blocks,
    templated footers) concentrates its whole occurrence list in ONE
    ranking-window partition — the one skew that can hurt this plan at
    web scale. With the cap set, grams occurring MORE than
    ``max_occurrences`` times are EXEMPTED from surgery (all their
    copies kept): the per-gram count is a partial-aggregated groupBy
    (map-side combine collapses a boilerplate gram's per-partition
    copies before the shuffle), the surviving pathological-gram set is
    small for any sane cap (at most |grams| / max_occurrences distinct
    values) so AQE resolves the anti-join to a broadcast that drops
    their occurrences MAP-SIDE — the ranking window never sees a group
    larger than max_occurrences. (No forced broadcast hint: an
    aggressive cap could make the set arbitrarily large, and AQE's
    shuffled anti-join is the right fallback there.) The default
    ``None`` keeps the paper-faithful semantics (every duplicated gram
    is deduped). Exemption — not
    "dedup without ranking" — is the deliberate semantics: a span on
    half the corpus is boilerplate, and cutting it from every document
    but one is rarely what a curation pipeline wants (Lee et al. §5
    make the same practical observation about common sequences).

    Tokenization is the package-wide canonical token array
    (lm.toks_col ↔ the oracle's _DUCK_TOKS_F twin), so positions are
    bit-comparable with every other text operator.
    """
    from pyspark.sql import Window as W

    from .lm import toks_col

    # NULL text -> empty token array, NOT a NULL one: size(NULL) is -1
    # under Spark's legacy sizeOfNull, which would emit (-1, -1) counts
    # and diverge from the oracle twin's coalesced len()
    t = docs.select(
        F.col(id_col),
        F.coalesce(
            toks_col(text_col), F.array().cast("array<string>")
        ).alias("toks"),
    )
    # k-gram anchors: (id, start-pos, gram). Docs shorter than k emit
    # nothing — Spark's sequence() DESCENDS when stop < start, so the
    # guard filter is load-bearing, not cosmetic.
    g = (
        t.filter(F.size("toks") >= k)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - (k - 1))
            ).alias("p"),
            "toks",
        )
        .select(
            id_col,
            "p",
            F.concat_ws(" ", F.slice("toks", F.col("p"), k)).alias("gram"),
        )
    )
    if max_occurrences is not None:
        # boilerplate-gram cap (see docstring): count with map-side
        # partial aggregation, then anti-join the pathological set
        # away before the ranking window. NO explicit broadcast hint:
        # with a sane cap (hundreds+) the set is tiny and AQE picks
        # the broadcast anti-join on its own (map-side drop, pinned at
        # test scale), while an aggressive cap on a huge corpus can
        # make the set arbitrarily large (bounded only by
        # |grams|/max_occurrences) — a forced broadcast there is a
        # driver OOM, and AQE's shuffled anti-join with skew-split is
        # the correct fallback.
        patho = (
            g.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_gc"))
            .filter(F.col("_gc") > max_occurrences)
            .select("gram")
        )
        g = g.join(patho, "gram", "left_anti")
    # canonical occurrence = rank 1 by (doc_id, pos); every later
    # occurrence marks its k positions for removal. rn > 1 implies the
    # gram occurs more than once, so no separate count is needed.
    wg = W.partitionBy("gram").orderBy(id_col, "p")
    marked = (
        g.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") > 1)
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("p"), F.col("p") + (k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    tp = t.select(
        F.col(id_col), F.posexplode("toks").alias("pos0", "tok")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "tok")
    kept = (
        tp.join(marked, [id_col, "pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("_l")
        )
        .select(
            id_col,
            F.concat_ws(
                " ", F.transform(F.col("_l"), lambda s: s["tok"])
            ).alias("clean_text"),
            F.size("_l").alias("n_kept"),
        )
    )
    base = t.select(F.col(id_col), F.size("toks").alias("n_tokens"))
    return base.join(kept, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )
