"""Streaming Python Data Source (Spark 4.x) — deterministic replay of a
parquet table as a microbatched stream.

The streaming twin of `sources/pydatasource.py`: the same
`pyspark.sql.datasource` extension surface, but through the STREAMING
contract (`DataSourceStreamReader`) — offsets, per-microbatch partition
planning, executor-side reads, commit. This is the machinery a custom
streaming system connector (an internal queue, a CDC feed, a metrics
socket) plugs into when Kafka's source can't be used; certifying it on
a bounded replay whose ground truth DuckDB can state proves the
offset/partition/read loop end-to-end, not just on paper.

Contract walk-through (what each piece does in a real deployment):

* `initialOffset` → `{"row": 0}` — offsets are arbitrary JSON dicts;
  here a row cursor into the replayed table.
* `latestOffset` — advances the cursor by `batch_rows` per microbatch
  until EOF, then parks (same offset ⇒ Spark plans no further batch and
  `processAllAvailable` returns). A live source would report the real
  tail (e.g. the queue's head sequence number).
* `partitions(start, end)` — the microbatch's row range, split into
  `tasks` equal slices ⇒ each microbatch is read by `tasks` parallel
  executor tasks (the analogue of one task per Kafka partition).
* `read(partition)` — EXECUTOR-side: opens the parquet file, reads the
  row-group(s) covering the slice, yields pyarrow RecordBatches (Arrow
  transfer — same no-per-row-Python discipline as the batch source).
  At replay-cert scale the file has few row groups so a slice may
  decode its covering group and cut; a production feed reads its
  native offset range directly.
* `commit(end)` — where a real source would ack/trim its upstream
  (no-op here: parquet replay is idempotent, the checkpoint owns
  progress).

Determinism: the replay order is the file's row order and the chunk
boundaries are pure arithmetic, so every run produces identical
microbatches — which is what lets the wave-23 query hash-certify a
STREAMING execution against a batch oracle.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _RowRangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int, columns):
        self.path = path
        self.start = start
        self.end = end
        self.columns = columns


class ParquetReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        cols = options.get("columns")
        self.columns = [c.strip() for c in cols.split(",")] if cols else None
        self.batch_rows = int(options.get("batch_rows", "2048"))
        self.tasks = int(options.get("tasks", "4"))
        import pyarrow.parquet as pq

        self.n_rows = pq.ParquetFile(self.path).metadata.num_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    # ------------------------------------------------------------------
    # Restart correctness. The pacing cursor lives in the reader object,
    # which is RECREATED on query restart — a naive cursor restarts at 0
    # and re-plans offsets the checkpoint already committed (measured:
    # a mid-stream stop + restart delivered 14000 rows of a 10000-row
    # replay). The engine never hands the reader its checkpoint, but its
    # own callbacks reveal the committed frontier, which `_floor` tracks:
    #   * commit(end)   — end is committed by definition;
    #   * a BACKWARD plan request (partitions with end <= start) — the
    #     engine only plans a new batch once prior batches are recovered
    #     and committed, so its `start` is a committed frontier that our
    #     reset cursor undershot.
    # latestOffset never returns below the floor, and a forward range's
    # low edge clamps to it. The clamp cannot lose data: floor only ever
    # holds committed offsets, and every legitimate forward range starts
    # at-or-after the committed frontier — only a log entry poisoned by
    # our own pre-floor backward answer can sit below it, and those rows
    # were delivered before the restart. Crash restarts (uncommitted
    # tail in the offset log) replay through explicit ranges that never
    # touch the floor. Test-pinned in tests/test_wave23.py.
    # ------------------------------------------------------------------

    def latestOffset(self) -> dict:
        # one chunk per call ⇒ the replay is a SEQUENCE of microbatches
        # (the property the wave-23 test asserts), not one giant batch
        cur = max(getattr(self, "_cursor", 0), getattr(self, "_floor", 0))
        nxt = min(cur + self.batch_rows, self.n_rows)
        self._cursor = nxt
        return {"row": nxt}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        floor = getattr(self, "_floor", 0)
        if hi <= lo:
            # backward request: the engine's start IS a committed
            # frontier our reset cursor undershot — record it
            self._floor = max(floor, lo)
            return [_RowRangePartition(self.path, lo, lo, self.columns)]
        lo = max(lo, floor)
        if hi <= lo:
            return [_RowRangePartition(self.path, hi, hi, self.columns)]
        # split the microbatch range into `tasks` near-equal slices
        step = max(1, (hi - lo + self.tasks - 1) // self.tasks)
        return [
            _RowRangePartition(
                self.path, s, min(s + step, hi), self.columns
            )
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _RowRangePartition):
        if partition.end <= partition.start:
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        # locate covering row groups by cumulative row counts, decode
        # only those, then cut the exact slice
        first, offset = [], 0
        want_lo, want_hi = partition.start, partition.end
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            if offset + n > want_lo and offset < want_hi:
                first.append((rg, offset))
            offset += n
        for rg, rg_off in first:
            tbl = pf.read_row_group(rg, columns=partition.columns)
            lo = max(0, want_lo - rg_off)
            hi = min(tbl.num_rows, want_hi - rg_off)
            yield from tbl.slice(lo, hi - lo).to_batches()

    def commit(self, end: dict) -> None:
        # record the committed frontier (see the restart-correctness
        # block above); the parquet replay itself needs no acking
        self._floor = max(getattr(self, "_floor", 0), end["row"])


class ParquetReplayDataSource(DataSource):
    """`spark.readStream.format("m2e_parquet_replay")`."""

    @classmethod
    def name(cls) -> str:
        return "m2e_parquet_replay"

    def schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        arrow_schema = pq.ParquetFile(self.options["path"]).schema_arrow
        cols = self.options.get("columns")
        if cols:
            names = [c.strip() for c in cols.split(",")]
            arrow_schema = pa.schema([arrow_schema.field(n) for n in names])
        return from_arrow_schema(arrow_schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return ParquetReplayStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ParquetReplayDataSource)
