"""Stateful streaming funnel: per-user ordered view→click→purchase
progression computed incrementally with ``applyInPandasWithState``
(SURVEY.md §2.10 custom-stateful surface).

State per user is the multiset of funnel-relevant event timestamps seen
so far (three small sorted lists). Each micro-batch merges its events
and recomputes the strictly-ordered stage reach from scratch — that
recompute is what makes the operator ORDER-ROBUST: a late-arriving
earlier view can lower the first-view anchor and legitimately change
which click counts, which monotone per-stage minima would get wrong.
State stays bounded by the user's funnel-relevant event count (the
general pattern: keep the minimal sufficient statistic; here the stage
semantics genuinely depend on the full timestamp multiset).

Emitted per batch in update mode: the user's current stage flags plus a
monotonically growing ``n_seen`` — the replay's final state per user is
the row with the largest ``n_seen`` (ties impossible: it grows every
time the group fires). Fully replayed, the final states equal the batch
``event_funnel`` query, giving this stateful operator a full value
oracle — the same replay-equals-batch argument the windowed streaming
twins use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("reached_view", T.IntegerType(), False),
        T.StructField("reached_click", T.IntegerType(), False),
        T.StructField("reached_purchase", T.IntegerType(), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("views", T.ArrayType(T.LongType()), False),
        T.StructField("clicks", T.ArrayType(T.LongType()), False),
        T.StructField("purchases", T.ArrayType(T.LongType()), False),
    ]
)


def _stages(views: list, clicks: list, purchases: list) -> tuple[int, int, int]:
    """Strictly-ordered stage reach from the full timestamp multisets —
    the same semantics as plans/queries_wave14.q_event_funnel."""
    if not views:
        return 0, 0, 0
    t1 = min(views)
    later_clicks = [t for t in clicks if t > t1]
    if not later_clicks:
        return 1, 0, 0
    t2 = min(later_clicks)
    later_purch = [t for t in purchases if t > t2]
    if not later_purch:
        return 1, 1, 0
    return 1, 1, 1


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    views, clicks, purchases = (
        state.get if state.exists else ([], [], [])
    )
    views, clicks, purchases = list(views), list(clicks), list(purchases)
    for pdf in pdfs:
        for et, micros in zip(pdf["event_type"], pdf["ts_micros"]):
            if et == "view":
                views.append(int(micros))
            elif et == "click":
                clicks.append(int(micros))
            elif et == "purchase":
                purchases.append(int(micros))
    state.update((views, clicks, purchases))
    v, c, p = _stages(views, clicks, purchases)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "reached_view": [v],
            "reached_click": [c],
            "reached_purchase": [p],
            "n_seen": [len(views) + len(clicks) + len(purchases)],
        }
    )


def running_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel stage flags, updated each micro-batch. Input needs
    (user_id, event_type, ts); event time rides as integer micros so the
    state arrays stay primitive."""
    from pyspark.sql import functions as F

    return (
        events
        # only funnel stages reach state: other event types (signup,
        # error, ...) would fire groups without changing state —
        # emitting duplicate n_seen rows that break the "n_seen grows
        # every time the group fires" tie-impossibility invariant —
        # and needlessly shuffle ~40% extra rows into the stateful op
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_micros"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
