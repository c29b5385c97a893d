"""Per-partition lineage & metrics records (north_rule requirement).

``lineage_records(df, stage)`` evaluates ``df`` once per partition inside a
``mapInPandas`` pass and emits one record per physical partition:
(stage, partition_id, rows, wall_ms, bytes_estimate). The StageRunner
appends these to ``<root>/_lineage`` at every commit, giving an auditable
who-processed-what trail per stage per partition — the debugging surface a
1000-executor run needs when one partition straggles or loses rows.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = ("stage string, partition_id int, rows long, wall_ms long, "
           "bytes_estimate long")


def lineage_records(df: DataFrame, stage: str) -> DataFrame:
    """One row per partition of ``df`` with row count + per-partition wall
    time. Runs over the partition's Arrow batches (no row-Python)."""
    tagged = df.withColumn("_pid", F.spark_partition_id())

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.time()
        rows = 0
        nbytes = 0
        pid = -1
        for pdf in batches:
            rows += len(pdf)
            nbytes += int(pdf.memory_usage(deep=False).sum())
            if len(pdf):
                pid = int(pdf["_pid"].iloc[0])
        yield pd.DataFrame([{
            "stage": stage, "partition_id": pid, "rows": rows,
            "wall_ms": int((time.time() - t0) * 1000),
            "bytes_estimate": nbytes,
        }])

    return tagged.mapInPandas(per_partition, schema=_SCHEMA)
