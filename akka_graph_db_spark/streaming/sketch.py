"""Mergeable sketches over Structured Streaming micro-batches.

A count-min sketch is a MERGEABLE summary: counters add, so the sketch
of a union is the cell-wise sum of per-part sketches. That makes it the
fixed-memory streaming frequency answer at 100 TB/day ingest — each
micro-batch contributes an O(batch) aggregation, the accumulated state
is ≤ depth×width rows regardless of how much data has flowed through,
and the merged sketch is BIT-IDENTICAL to the batch sketch of the same
rows (the stream≡batch oracle property; the hash draw is pinned to the
repo's md5 family, see functions/search.py cms_sketch).

No reference file:line — sanctioned LLM-pipeline extension surface
(SURVEY.md §2.9); the streaming plumbing mirrors streaming/fold.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from akka_graph_db_spark.functions.search import cms_sketch


@dataclass
class StreamingCMS:
    """Accumulates a count-min sketch across micro-batches; attach
    ``step`` to ``writeStream.foreachBatch`` or use :meth:`run`.

    Every step materializes the MERGED sketch (localCheckpoint) — unlike
    the graph fold's snapshot this is cheap by design: the state is at
    most depth×width rows whatever the stream volume, so per-batch
    materialization is O(sketch), bounds lineage, and never re-reads an
    expired micro-batch frame.
    """

    term_col: str = "term"
    width: int = 1024
    depth: int = 4
    sketch: DataFrame | None = field(default=None, repr=False)
    batches_applied: int = 0

    def step(self, batch: DataFrame, batch_id: int) -> None:
        part = cms_sketch(
            batch, term_col=self.term_col, width=self.width, depth=self.depth
        )
        merged = (
            part
            if self.sketch is None
            else self.sketch.unionByName(part)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        self.sketch = merged.localCheckpoint(eager=True)
        self.batches_applied += 1

    def run(self, term_stream: DataFrame, checkpoint_dir: str) -> DataFrame:
        """Consume an entire available stream (Trigger.AvailableNow) and
        return the accumulated sketch frame (row, bucket, cnt)."""
        q = (
            term_stream.writeStream.foreachBatch(self.step)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark = term_stream.sparkSession
        if self.sketch is None:
            return spark.createDataFrame(
                [], "row int, bucket bigint, cnt bigint"
            )
        return self.sketch


@dataclass
class StreamingHLL:
    """HyperLogLog registers accumulated across micro-batches: registers
    merge by per-bucket MAX, so — like the CMS — the streamed sketch is
    bit-identical to the batch sketch of the same rows, and the state is
    at most 2**p rows regardless of stream volume. The fixed-memory
    streaming COUNT DISTINCT (CMS answers "how often", HLL "how many
    distinct")."""

    value_col: str
    p: int = 10
    sketch: DataFrame | None = field(default=None, repr=False)
    batches_applied: int = 0

    def step(self, batch: DataFrame, batch_id: int) -> None:
        from akka_graph_db_spark.functions.search import hll_sketch

        part = hll_sketch(batch, self.value_col, p=self.p)
        merged = (
            part
            if self.sketch is None
            else self.sketch.unionByName(part)
            .groupBy("bucket")
            .agg(F.max("register").cast("int").alias("register"))
        )
        self.sketch = merged.localCheckpoint(eager=True)
        self.batches_applied += 1

    def run(self, value_stream: DataFrame, checkpoint_dir: str) -> DataFrame:
        """Consume an entire available stream (Trigger.AvailableNow) and
        return the accumulated register frame (bucket, register)."""
        q = (
            value_stream.writeStream.foreachBatch(self.step)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark = value_stream.sparkSession
        if self.sketch is None:
            return spark.createDataFrame([], "bucket bigint, register int")
        return self.sketch


@dataclass
class StreamingHistogram:
    """Fixed-width histogram accumulated across micro-batches: bin
    counts ADD, so the merged histogram is bit-identical to the batch
    histogram of the same rows (same stream≡batch property as the CMS;
    the binning is an exact IEEE division when ``bin_width`` is a power
    of two). State is one row per OCCUPIED bin — value-range-bounded,
    not volume-bounded — the streaming distribution monitor."""

    value_col: str
    bin_width: float = 8.0
    sketch: DataFrame | None = field(default=None, repr=False)
    batches_applied: int = 0

    def step(self, batch: DataFrame, batch_id: int) -> None:
        from akka_graph_db_spark.functions.profile import (
            fixed_bin_histogram,
        )

        part = fixed_bin_histogram(
            batch, self.value_col, bin_width=self.bin_width
        )
        merged = (
            part
            if self.sketch is None
            else self.sketch.unionByName(part)
            .groupBy("bin")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
        self.sketch = merged.localCheckpoint(eager=True)
        self.batches_applied += 1

    def run(self, value_stream: DataFrame, checkpoint_dir: str) -> DataFrame:
        """Consume an entire available stream (Trigger.AvailableNow) and
        return the accumulated histogram frame (bin, cnt)."""
        q = (
            value_stream.writeStream.foreachBatch(self.step)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark = value_stream.sparkSession
        if self.sketch is None:
            return spark.createDataFrame([], "bin bigint, cnt bigint")
        return self.sketch
