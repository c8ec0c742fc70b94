"""Skew-mitigation patterns (SURVEY §2.4 / repo charter scale posture).

AQE's skew-join splitting handles join-side skew at runtime; explicit
SALTING is the engine's declared pattern for aggregation hot keys — a
handful of group keys receiving most rows (the lineitem returnflag shape:
3 keys, millions of rows each at 100 TB).

``salted_agg`` runs algebraic aggregates in two phases: phase 1 groups on
(key, salt) so each hot key fans out over ``salt_buckets`` reducers;
phase 2 merges the per-salt partials. Works for any aggregate with a
merge function (count->sum, sum->sum, min->min, max->max). The salt is
derived deterministically from row content (xxhash64), never rand() —
re-runs and retried tasks produce identical partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial aggregate, final merge) per supported algebraic aggregate
_MERGE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over skewed group keys.

    ``aggs`` maps output alias -> (agg_name, column expr), agg_name in
    {count, sum, min, max}. ``salt_from`` columns seed the deterministic
    salt (default: all non-key columns).
    """
    salt_cols = salt_from or [c for c in df.columns if c not in keys]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
    ).alias("__salt")

    phase1_aggs = []
    phase2_aggs = []
    for alias, (name, col) in aggs.items():
        partial, final = _MERGE[name]
        phase1_aggs.append(partial(col).alias(f"__p_{alias}"))
        phase2_aggs.append(final(F.col(f"__p_{alias}")).alias(alias))

    phase1 = df.withColumn("__salt", salt).groupBy(
        *keys, "__salt"
    ).agg(*phase1_aggs)
    return phase1.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resilient equi-join: replicate-broadcast salting.

    A shuffled hash join on a skewed key sends every row of the hot key
    to ONE reducer. Salting splits each fact row into one of
    ``salt_buckets`` sub-keys (deterministic hash of the whole row) and
    REPLICATES each dim row across all buckets, so a hot key's rows
    spread over ``salt_buckets`` reducers. Cost: the dim side shuffles
    ×buckets — which is why the pattern applies when the dim side is
    small-ish but too big (or too skew-prone) to broadcast outright.

    AQE's skew-join handles this automatically for sort-merge joins
    (session.py enables it); this explicit form is for when you must
    pin the strategy — and is plan-contract-tested so the salt columns
    never leak into the output.
    """
    fact_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in facts.columns]),
        F.lit(salt_buckets),
    )
    f = facts.withColumn("__salt", fact_salt)
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return f.join(d, on=[key, "__salt"]).drop("__salt")
