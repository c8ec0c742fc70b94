"""Shared sizing policy for iterative operators (pagerank, connected
components, BFS): partition the per-round state by the ACTUAL item
count, capped at the session's configured shuffle parallelism.

Rationale: iterative algorithms pay scheduler + shuffle-stage overhead
every round; a 5k-row state table over 32 conf partitions runs rounds of
near-empty tasks for nothing, while a billion-row state wants the full
cluster parallelism. ~50k items per partition keeps local graphs on a
handful of tasks and defers to the cluster-tuned conf at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

ITEMS_PER_PARTITION = 50_000


def iteration_partitions(
    spark: SparkSession,
    n_items: int,
    per_partition: int = ITEMS_PER_PARTITION,
    floor: int = 4,
) -> int:
    """Partition count for iterative state: min(conf, max(floor, ⌈n/p⌉))."""
    conf_part = int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return min(conf_part, max(floor, math.ceil(n_items / per_partition)))
