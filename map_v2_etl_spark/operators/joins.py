"""Join operators Spark lacks as built-ins: as-of join and interval/range
join (SURVEY.md §2.3 declared extension surface).

The reference has only the GEOID equi-join (tile-join,
/root/reference/build.sh:189,210); these are the engine's scale-path
additions for event/time-series workloads. Both are compositions of
built-in DataFrame ops — no UDF, no driver loop — so Catalyst/Tungsten
keep whole-stage codegen and AQE applies.

asof_join: the classic union + running-last trick. One shuffle on
(key, ts); no range condition ever reaches a nested-loop join. At 100 TB
the cost is a single sort-shuffle of left+right — the same lower bound a
merge-based as-of would pay.

bucketed_range_join: interval joins expressed as `val BETWEEN lo AND hi`
plan as BroadcastNestedLoopJoin (a cartesian at scale). Bucketing the
value domain turns it into an equi-join on bucket id: the right side
explodes each interval into the buckets it covers (sequence()), the left
hashes into one bucket, and the residual BETWEEN filter runs post-join.
Shuffle volume = rows x avg_interval/bucket_width — tunable, skew-safe
under AQE.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row per key:
    ``direction="backward"`` (default) takes the latest right row with
    ``right.ts <= left.ts`` (pandas ``merge_asof`` / DuckDB ``ASOF
    JOIN`` semantics); ``direction="forward"`` the earliest right row
    with ``right.ts >= left.ts``. Left rows with no match keep nulls;
    ``tolerance`` (seconds) voids matches farther than that.

    SQL-equi-join null semantics: right rows with a NULL key or NULL
    timestamp never match (they are filtered out — Spark windows would
    otherwise group null keys together and sort null timestamps first,
    matching rows the oracle's ``ON l.k = r.k AND l.ts >= r.ts``
    comparison leaves unmatched), and a left row with a NULL timestamp
    keeps null payloads. Ties among right rows with identical
    (key, ts) break deterministically on the packed payload struct.

    Implementation: tag both sides, union, and take the running
    ``last(right_struct, ignorenulls)`` over a window ordered by
    (ts, side, payload) — backward frames preceding..current with right
    sorting first at equal ts; forward frames current..following as a
    running ``first`` with right sorting after left at equal ts, so
    ties match in both directions. Right columns travel inside ONE
    struct: a right row whose payload column is legitimately null must
    still win over an older row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    collisions = [
        c
        for c in right_cols + [f"{right_ts}_right"]
        if c in left.columns
    ]
    if collisions:
        raise ValueError(
            "asof_join output would duplicate column name(s) "
            f"{collisions}: rename or subset right_cols"
        )
    ts = "__asof_ts"
    side = "__asof_side"
    pack = "__asof_pack"

    l_tagged = left.withColumn(ts, F.col(left_ts)).withColumn(side, F.lit(1))
    # right rows with a null key or null ts can never satisfy the
    # equi + range predicates — drop them so the window never picks one
    r_valid = right.filter(F.col(right_ts).isNotNull())
    for c in on:
        r_valid = r_valid.filter(F.col(c).isNotNull())
    r_tagged = r_valid.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        F.struct(
            F.col(f"`{right_ts}`"), *[F.col(f"`{c}`") for c in right_cols]
        ).alias(pack),
    )
    # missing columns null-fill on either side with the other side's types
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(ts), F.col(side), F.col(pack))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        picked = F.last(pack, ignorenulls=True).over(w)
    else:
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(ts), F.desc(side), F.col(pack))
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        picked = F.first(pack, ignorenulls=True).over(w)
    matched = unioned.withColumn(pack, picked).filter(F.col(side) == 1)
    # a NULL left timestamp has no as-of position (SQL comparison is
    # null): keep the left row, void any window pick
    matched = matched.withColumn(
        pack, F.when(F.col(ts).isNotNull(), F.col(pack))
    )

    if tolerance is not None:
        # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike with
        # NO timezone conversion — an NTZ→LTZ cast here would warp the
        # gap across DST transitions in non-UTC sessions (wall-clock
        # 6300s reading as instant 2700s), silently accepting stale
        # matches the oracle's wall-clock interval arithmetic rejects.
        # MICROSECOND, not SECOND: second-level diffs truncate, so a
        # gap of tolerance+0.9s would pass a whole-second check while
        # the oracle's exact interval comparison rejects it.
        gap_us = F.expr(
            f"CAST(timestampdiff(MICROSECOND, "
            f"{pack}.`{right_ts}`, {ts}) AS DOUBLE)"
        )
        signed = gap_us if direction == "backward" else -gap_us
        in_tol = signed <= tolerance * F.lit(1_000_000.0)
        matched = matched.withColumn(
            pack, F.when(in_tol, F.col(pack))
        )

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(
        F.col(f"{pack}.`{right_ts}`").alias(f"{right_ts}_right")
    )
    out_cols += [F.col(f"{pack}.`{c}`").alias(c) for c in right_cols]
    return matched.select(*out_cols)


#: join types bucketed_range_join supports — the exploded right side
#: means unmatched RIGHT bucket copies would surface k times under
#: right/full outer joins (one null-left row per bucket copy)
_RANGE_JOIN_HOW = {
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi",
    "left_anti", "leftanti", "anti",
}


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``left.val BETWEEN right.lo AND right.hi`` via bucket equi-join.

    ``bucket_width`` should be on the order of the typical interval length:
    each right interval lands in ceil(len/width)+1 buckets, each left row
    in exactly one.

    The BETWEEN residual is part of the JOIN CONDITION, not a post-join
    filter: a post-filter would silently turn outer joins into inner ones
    (unmatched left rows carry null lo/hi, BETWEEN evaluates null, filter
    drops them). In the condition, Spark still plans a shuffled hash join
    keyed on the bucket equality with the range as a residual, and LEFT
    outer semantics are preserved. A left row matches each covering
    interval exactly once (its single bucket meets each interval's
    exploded copy at most once), so no post-join dedup is needed.
    RIGHT/FULL outer joins are rejected: each unmatched exploded bucket
    copy of a right interval would emit its own null-left row (k
    duplicates per interval) — use the transposed call instead.
    Inverted intervals (lo > hi) match nothing by definition and are
    filtered before the explode (sequence() would otherwise build a
    DESCENDING bucket array — for a badly inverted row, a huge one).
    """
    if how not in _RANGE_JOIN_HOW:
        raise ValueError(
            f"bucketed_range_join supports {sorted(_RANGE_JOIN_HOW)}; "
            f"got how={how!r} (right/full outer would duplicate "
            "unmatched intervals per bucket copy)"
        )
    if not (math.isfinite(bucket_width) and bucket_width > 0):
        raise ValueError(f"bucket_width must be finite and > 0: {bucket_width}")
    bl, br = "__range_bucket_l", "__range_bucket_r"
    r_exploded = right.filter(
        F.col(right_lo) <= F.col(right_hi)
    ).withColumn(
        br,
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width).cast("long"),
                F.floor(F.col(right_hi) / bucket_width).cast("long"),
            )
        ),
    )
    l_bucketed = left.withColumn(
        bl, F.floor(F.col(left_val) / bucket_width).cast("long")
    )
    # dataframe-qualified references: bare F.col would be ambiguous the
    # moment a name exists on both sides
    cond = (l_bucketed[bl] == r_exploded[br]) & l_bucketed[
        left_val
    ].between(r_exploded[right_lo], r_exploded[right_hi])
    return l_bucketed.join(r_exploded, on=cond, how=how).drop(bl, br)


def hot_cold_split_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    hot_threshold: int,
    hot_max: int = 64,
) -> DataFrame:
    """Inner equi-join that survives a power-law key distribution: keys
    carrying more than ``hot_threshold`` fact rows join against a
    BROADCAST slice of ``dim`` (their rows never shuffle on the key),
    everything else takes the ordinary shuffle join; the legs union.

    Result-identical to ``fact.join(dim, on)`` (pinned by
    tests/test_wave21.py and the skew_split_join oracle) — the split is
    purely physical. The hot-key census is itself skew-immune: a
    partial-aggregated count whose shuffle carries one row per
    (partition, key). The census collect is bounded by ``hot_max``
    (loud failure past it — thousands of hot keys mean the distribution
    needs salting, see skew_salted_agg, not splitting).

    vs AQE skew-join handling (spark.sql.adaptive.skewJoin, ON in this
    engine's sessions): AQE splits oversized SHUFFLE PARTITIONS after
    the map stage — the hot key's rows are still all written and read
    through the shuffle. This operator keeps hot rows out of the
    key-shuffle entirely (they move only through the final union), the
    treatment that matters when ONE key is a double-digit percentage of
    a 100 TB fact table. bench_scale.py measures both on the same
    generated-skew input.
    """
    hot_rows = (
        fact.groupBy(on).agg(F.count("*").alias("c"))
        .filter(F.col("c") > int(hot_threshold))
        .limit(hot_max + 1)
        .collect()
    )
    if len(hot_rows) > hot_max:
        raise ValueError(
            f"hot_cold_split_join: >{hot_max} keys above "
            f"{hot_threshold} rows — salt instead (skew_salted_agg)"
        )
    hot = [r[on] for r in hot_rows]
    if not hot:
        return fact.join(dim, on)
    return (
        fact.filter(~F.col(on).isin(hot))
        .join(dim, on)
        .unionByName(
            fact.filter(F.col(on).isin(hot)).join(
                F.broadcast(dim.filter(F.col(on).isin(hot))), on
            )
        )
    )
