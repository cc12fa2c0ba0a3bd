"""``cascade_bus`` — a custom PySpark DataSource modeling the reference's
ingest chain (the "Structured Streaming + custom source connector" path
the north star names).

Reference semantics modeled (file:line):
- **Ring-buffer admission with reject-on-full** — the producer admits a
  publish only when the next ring slot has been drained, otherwise acks
  failure (src/producer/main.rs:25-38 ``CircularBuffer``; :63-82 reject
  branch returns ``response_to_express: 0``). :class:`RingBuffer` keeps
  that exact contract: ``try_push`` returns False instead of blocking.
- **Round-robin partition assignment** — the producer sends event *i* to
  ``clients[i % len]`` (src/producer/main.rs:196). :class:`BusProducer`
  assigns global sequence *i* to partition ``i % num_partitions``.
- **Append-only per-partition log + offset index, offset-tracked reads**
  — the broker appends each event to its log and records its position in
  an 8-byte-per-entry index (src/broker/main.rs:91-98); consumers seek
  ``index[offset] .. index[offset+1]`` (src/broker/main.rs:123-160). Here
  each partition is a JSON-lines log whose line number IS the offset;
  reads are ``[start, end)`` line ranges.

Spark-side design: the connector is a **Python Data Source**
(pyspark.sql.datasource) registered as ``cascade_bus``:

- batch: ``spark.read.format("cascade_bus")`` — one ``InputPartition``
  per bus partition, read in parallel on executors (scales with
  partition count; a 100 TB topic is just more partitions).
- streaming: ``spark.readStream.format("cascade_bus")`` via
  :class:`SimpleDataSourceStreamReader` with per-partition offsets
  ``{partition: next_offset}`` — the Kafka offset contract, so
  micro-batch replay (``readBetweenOffsets``) is deterministic and
  exactly-once composes with checkpointed sinks.

The producer is deliberately a driver-side client (the reference's
producer is a single gRPC process, not a distributed job); the
*read* side is the distributed Spark surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BUS_SCHEMA = (
    "partition INT, offset BIGINT, event_id BIGINT, ts_us BIGINT, "
    "user_id BIGINT, event_type STRING, value DOUBLE"
)
_FIELDS = ["event_id", "ts_us", "user_id", "event_type", "value"]


class RingBuffer:
    """Fixed-capacity admission buffer with reject-on-full.

    Mirrors the reference CircularBuffer (src/producer/main.rs:25-38): a
    slot must be drained (set back to empty) before it can be written
    again; an un-drained slot rejects the publish (main.rs:75-81).
    """

    def __init__(self, capacity: int = 1000):
        self._buf: list = [None] * capacity
        self._write = 0
        self._read = 0

    def try_push(self, item) -> bool:
        if self._buf[self._write] is not None:
            return False  # reject-on-full — caller gets a failed ack
        self._buf[self._write] = item
        self._write = (self._write + 1) % len(self._buf)
        return True

    def drain(self) -> list:
        """The drain task (src/producer/main.rs:86-105): frees slots in
        arrival order and hands the items to the sender."""
        out = []
        while self._buf[self._read] is not None:
            out.append(self._buf[self._read])
            self._buf[self._read] = None
            self._read = (self._read + 1) % len(self._buf)
        return out


class BusProducer:
    """Publishes records through ring-buffer admission into per-partition
    append-only JSON-lines logs with dense per-partition offsets."""

    def __init__(self, topic_dir: str, num_partitions: int = 4, capacity: int = 1000):
        self.topic_dir = topic_dir
        self.num_partitions = num_partitions
        self.ring = RingBuffer(capacity)
        self.rejected = 0
        os.makedirs(topic_dir, exist_ok=True)
        # resume points: global round-robin sequence + per-partition offsets
        self._next_offset = [self._log_len(p) for p in range(num_partitions)]
        self._seq = sum(self._next_offset)

    def _log_path(self, p: int) -> str:
        return os.path.join(self.topic_dir, f"p{p}.jsonl")

    def _log_len(self, p: int) -> int:
        path = self._log_path(p)
        if not os.path.exists(path):
            return 0
        with open(path) as fh:
            return sum(1 for _ in fh)

    def publish(self, records) -> int:
        """Admit records through the ring buffer; returns the accepted
        count (rejects are counted, not retried — the reference acks 0)."""
        accepted = 0
        for rec in records:
            if self.ring.try_push(rec):
                accepted += 1
            else:
                self.rejected += 1
        return accepted

    def flush(self) -> int:
        """Drain the ring and append to the partition logs: global seq i
        → partition i % P (round robin), offset = lines already in that
        partition's log (the broker's index-table position)."""
        batch = self.ring.drain()
        handles = {}
        try:
            for rec in batch:
                p = self._seq % self.num_partitions
                if p not in handles:
                    handles[p] = open(self._log_path(p), "a")
                row = {"offset": self._next_offset[p]}
                row.update(rec)
                handles[p].write(json.dumps(row) + "\n")
                self._next_offset[p] += 1
                self._seq += 1
        finally:
            for fh in handles.values():
                fh.close()
        return len(batch)

    def publish_all(self, records, chunk: int | None = None) -> int:
        """Producer main loop: publish in admission-sized chunks with a
        flush (drain) between — every record lands exactly once unless
        the caller overruns a chunk (then rejects are honest)."""
        records = list(records)
        chunk = chunk or len(self.ring._buf)
        total = 0
        for i in range(0, len(records), chunk):
            total += self.publish(records[i : i + chunk])
            self.flush()
        return total


def _read_log(topic_dir: str, p: int, start: int, end: int | None):
    """Yield schema-ordered tuples for lines [start, end) of partition
    p's log — the broker's index[offset]..index[offset+1] seek."""
    path = os.path.join(topic_dir, f"p{p}.jsonl")
    if not os.path.exists(path):
        return
    with open(path) as fh:
        for i, line in enumerate(fh):
            if i < start:
                continue
            if end is not None and i >= end:
                break
            rec = json.loads(line)
            yield (p, rec["offset"]) + tuple(rec[f] for f in _FIELDS)


def _num_partitions(topic_dir: str) -> int:
    return sum(
        1 for f in os.listdir(topic_dir) if f.startswith("p") and f.endswith(".jsonl")
    )


def _log_lens(topic_dir: str) -> dict[str, int]:
    out = {}
    for p in range(_num_partitions(topic_dir)):
        path = os.path.join(topic_dir, f"p{p}.jsonl")
        n = 0
        if os.path.exists(path):
            with open(path) as fh:
                n = sum(1 for _ in fh)
        out[str(p)] = n
    return out


class BusBatchReader(DataSourceReader):
    def __init__(self, options):
        self.topic_dir = options["path"]

    def partitions(self):
        return [InputPartition(p) for p in range(_num_partitions(self.topic_dir))]

    def read(self, partition):
        yield from _read_log(self.topic_dir, partition.value, 0, None)


class BusStreamReader(SimpleDataSourceStreamReader):
    """Per-partition offset-tracked micro-batch reads. ``maxRecordsPerBatch``
    caps each micro-batch (admission control on the consume side), so a
    backlog drains over several batches instead of one giant one."""

    def __init__(self, options):
        self.topic_dir = options["path"]
        self.max_per_batch = int(options.get("maxrecordsperbatch", 0)) or None

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in range(_num_partitions(self.topic_dir))}

    def read(self, start: dict):
        ends = _log_lens(self.topic_dir)
        end = {}
        per_part = None
        if self.max_per_batch:
            per_part = max(1, self.max_per_batch // max(1, len(ends)))
        for p, avail in ends.items():
            lo = start.get(p, 0)
            end[p] = min(avail, lo + per_part) if per_part else avail
        # iter(list), not a bare generator or list: the prefetch wrapper
        # copy.copy()s the cached iterator and next()s empty batches
        return iter(self.readBetweenOffsets(start, end)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # materialized list, not a generator — the simple-reader wrapper
        # prefetches on the driver and pickles the batch to executors
        return [
            row
            for p in sorted(end, key=int)
            for row in _read_log(self.topic_dir, int(p), start.get(p, 0), end[p])
        ]


class CascadeBusDataSource(DataSource):
    """spark.dataSource.register(CascadeBusDataSource) →
    spark.read/readStream.format("cascade_bus").option("path", topic_dir)."""

    @classmethod
    def name(cls) -> str:
        return "cascade_bus"

    def schema(self) -> str:
        return BUS_SCHEMA

    def reader(self, schema) -> BusBatchReader:
        return BusBatchReader(self.options)

    def simpleStreamReader(self, schema) -> BusStreamReader:
        return BusStreamReader(self.options)


def register_bus(spark) -> None:
    spark.dataSource.register(CascadeBusDataSource)


_TOPIC_CACHE: dict = {}


def stage_bus_topic(spark, sf_dir: str, num_partitions: int = 4) -> str:
    """Publish the events fixture through the producer (ring buffer +
    round robin) into a cached topic dir, in event_id order so the
    round-robin assignment is deterministic and oracle-checkable."""
    import tempfile

    from pyspark.sql import functions as F

    from cascade_spark.tables import load

    key = (sf_dir, num_partitions)
    if key in _TOPIC_CACHE:
        return _TOPIC_CACHE[key]
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
    )
    topic_dir = os.path.join(tempfile.mkdtemp(prefix="cascade_bus_"), "events")
    producer = BusProducer(topic_dir, num_partitions=num_partitions)
    pdf = ev.toPandas()  # columns: event_id, ts_us, user_id, event_type, value
    rows = (
        {
            "event_id": int(a),
            "ts_us": int(b),
            "user_id": int(c),
            "event_type": d,
            "value": float(e),
        }
        for a, b, c, d, e in pdf.itertuples(index=False, name=None)
    )
    producer.publish_all(rows)
    assert producer.rejected == 0
    _TOPIC_CACHE[key] = topic_dir
    return topic_dir


# ---------------------------------------------------------------------------
# Declared queries

from pyspark.sql import functions as F  # noqa: E402

from cascade_spark.plans.registry import register  # noqa: E402


@register(
    "bus_source_roundtrip",
    "sources",
    doc="Custom-connector round trip: events published through the "
    "ring-buffer producer (round-robin across 4 bus partitions, dense "
    "per-partition offsets) and read back with "
    "spark.readStream.format('cascade_bus') — per-partition counts, "
    "offset ranges and an exact bigint checksum, hash-checked against "
    "an oracle that recomputes the round-robin assignment relationally.",
    oracle="""
WITH seq AS (
    SELECT event_id,
           ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS i
    FROM events
),
assigned AS (
    SELECT CAST(i % 4 AS INT) AS partition,
           i // 4 AS off,
           event_id
    FROM seq
)
SELECT partition,
       COUNT(*) AS n_events,
       CAST(MIN(off) AS BIGINT) AS min_offset,
       CAST(MAX(off) AS BIGINT) AS max_offset,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM assigned
GROUP BY partition
ORDER BY partition
""",
)
def bus_source_roundtrip(spark, sf_dir):
    from cascade_spark.streaming.pipeline import run_to_memory

    topic = stage_bus_topic(spark, sf_dir)
    register_bus(spark)
    stream = spark.readStream.format("cascade_bus").option("path", topic).load()
    batch = run_to_memory(stream, "append")
    return (
        batch.groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("offset").cast("long").alias("min_offset"),
            F.max("offset").cast("long").alias("max_offset"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
        )
        .orderBy("partition")
    )


@register(
    "bus_source_batch_scan",
    "sources",
    doc="Batch read of the same bus topic via "
    "spark.read.format('cascade_bus') — one InputPartition per bus "
    "partition, read in parallel on executors; full event rows joined "
    "back (partition/offset/payload), hash-checked.",
    oracle="""
WITH seq AS (
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
           ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS i
    FROM events
)
SELECT CAST(i % 4 AS INT) AS partition,
       i // 4 AS "offset",
       event_id, ts_us, user_id, event_type, value
FROM seq
ORDER BY event_id
""",
)
def bus_source_batch_scan(spark, sf_dir):
    topic = stage_bus_topic(spark, sf_dir)
    register_bus(spark)
    return (
        spark.read.format("cascade_bus")
        .option("path", topic)
        .load()
        .orderBy("event_id")
    )
