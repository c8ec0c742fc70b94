"""DuckDB SQL fragment builders for vector-math oracles.

The similarity/clustering operators (operators/similarity.py) are pure
JVM expression trees with pinned evaluation order: dots and norms are
LEFT FOLDS with a 0.0 init, centroid means go through decimal(27,12)
inputs and a scale-16 HALF_UP average. All of that is replicable in
DuckDB bit for bit:

  * left fold        -> list_reduce(list_prepend(0.0, list_transform(...)))
                        (0.0 + x1 == x1 exactly, so prepending the init
                        reproduces Spark's aggregate() sequence)
  * float -> double  -> CAST(x AS DOUBLE) on both engines (exact widening)
  * decimal mean     -> quantize to DECIMAL(27,12), sum exactly as
                        HUGEINT, divide with HALF_UP at scale 16
                        ((2a + n) // (2n)), then CAST AS DOUBLE / 1e16 —
                        the numerator is < 2^53 for unit-scale data so
                        the division is correctly rounded, matching
                        Python's float(decimal) on the Spark side

Measured parity (sf0.01 embeddings, 64 dims): cosine 0 diffs over
pairwise probes; decimal means 0 diffs. This is what turns the
iterative k-means / SemDeDup / ANN queries from rows-only checks into
full value-hash oracles (r3 verdict task 7).
"""

from __future__ import annotations


def fold_sum(items: str) -> str:
    """Left-fold sum with a 0.0 init over a DOUBLE list expression —
    Spark's F.aggregate(..., lit(0.0), acc + x) sequence."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {items}), "
        f"(acc, x) -> acc + x)"
    )


def dot(a: str, b: str) -> str:
    return fold_sum(
        f"list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
    )


def l2_norm(a: str) -> str:
    return (
        "sqrt("
        + fold_sum(
            f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
        + ")"
    )


def cosine(a: str, b: str) -> str:
    """functions/vectors.cosine_similarity, same tree shape."""
    return f"(({dot(a, b)}) / ({l2_norm(a)} * {l2_norm(b)}))"


def sq_dist(a: str, b: str) -> str:
    """operators/similarity._sq_dist_to: left fold of (x - y)^2."""
    d = f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    return fold_sum(f"list_transform(list_zip({a}, {b}), p -> {d} * {d})")


def dec_mean(x: str) -> str:
    """avg(cast(x as decimal(27,12))) -> float, Spark semantics exactly.

    Returns an aggregate expression over column expression ``x`` (a
    float/double scalar): quantize each input onto the 1e-12 grid, sum
    as HUGEINT (exact), then one HALF_UP division to scale 16 and a
    correctly-rounded /1e16 to double."""
    se12 = f"CAST(SUM(CAST(CAST({x} AS DECIMAL(27,12)) * 1000000000000 AS HUGEINT)) AS HUGEINT)"
    n = "COUNT(*)"
    pos = f"((({se12}) * 10000 * 2 + {n}) // (2 * {n}))"
    neg = f"-(((-({se12})) * 10000 * 2 + {n}) // (2 * {n}))"
    return (
        f"CAST(CASE WHEN {se12} < 0 THEN {neg} ELSE {pos} END AS DOUBLE) "
        f"/ 1e16"
    )


def double_list_lit(values) -> str:
    """A DOUBLE[] literal; repr() round-trips doubles exactly, so the
    parsed value equals the Python float Spark ships through py4j."""
    return "[" + ", ".join(repr(float(v)) for v in values) + "]"


def plane_dot(vec: str, plane) -> str:
    """operators/similarity._signature's per-plane dot: left fold of
    cast(x as double) * h_literal."""
    return fold_sum(
        f"list_transform(list_zip({vec}, {double_list_lit(plane)}), "
        f"p -> CAST(p[1] AS DOUBLE) * p[2])"
    )


def lsh_signature(vec: str, hyperplanes) -> str:
    """Sign-bit bucket id over one table's hyperplanes, packed exactly
    like _signature: bit j set iff <vec, h_j> >= 0."""
    bits = [
        f"(CASE WHEN ({plane_dot(vec, h)}) >= 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j, h in enumerate(hyperplanes)
    ]
    return "(" + " | ".join(bits) + ")"


def _assign_cte(name: str, cents: str, table: str) -> str:
    sqd = sq_dist("e.embedding", "c.cent")
    return (
        f"{name} AS (SELECT vec_id, embedding, cid FROM ("
        f"SELECT e.vec_id, e.embedding, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {sqd}, c.cid) AS rn "
        f"FROM {table} e CROSS JOIN {cents} c) WHERE rn = 1)"
    )


def lloyd_ctes(k: int, iters: int, dim: int, table: str = "embeddings") -> str:
    """The WITH-clause body for a deterministic Lloyd's k-means unroll,
    ending in CTE ``afinal`` = (vec_id, embedding, cid).

    Mirrors operators/similarity.lloyd_centroids + kmeans_assignments:
    ``iters`` full (assign, decimal-mean update) rounds produce the
    final centroids, then ONE more assignment against them — iters+1
    assignments, iters mean updates, exactly the Spark loop. Nearest
    centroid is squared L2 with ties to the LOWEST cid; empty clusters
    keep their previous centroid via the LEFT JOIN coalesce. The caller
    appends the final SELECT over ``afinal``."""
    parts = [
        f"cents0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 "
        f"AS INT) AS cid, embedding AS cent FROM "
        f"(SELECT * FROM {table} ORDER BY vec_id LIMIT {k}))"
    ]
    for i in range(1, iters + 1):
        parts.append(_assign_cte(f"a{i}", f"cents{i - 1}", table))
        parts.append(
            f"m{i} AS (SELECT cid, i AS pos, "
            f"{dec_mean('CAST(a.embedding[i + 1] AS DOUBLE)')} AS m "
            f"FROM a{i} a, LATERAL unnest(range({dim})) AS u(i) "
            f"GROUP BY cid, i)"
        )
        parts.append(
            f"cents{i} AS (SELECT c.cid, coalesce(n.cent, c.cent) AS "
            f"cent FROM cents{i - 1} c LEFT JOIN (SELECT cid, "
            f"list(m ORDER BY pos) AS cent FROM m{i} GROUP BY cid) n "
            f"USING (cid))"
        )
    parts.append(_assign_cte("afinal", f"cents{iters}", table))
    return ",\n".join(parts)
