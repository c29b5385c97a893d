"""Scalable global sequential ids / prefix sums (no single-partition window).

The reference assigns global sequential labels by walking zones in ascending
order with a running counter (``icluster`` terrain_tools.py:777-780,
``maxc`` :1147-1148, ``cleanup_hillslopes`` terrain_tools.f90:1604-1650).
The naive Spark translation is ``Window.orderBy(key)`` with no partitionBy —
Spark itself warns ("No Partition Defined ... moving all data to a single
partition"), and at the builder's own 4096^2 run that window carried 3M HRU
ids through one reducer; at 100x it is THE bottleneck stage.

Both helpers here use the classic two-level plan instead:

1. ``repartitionByRange(key)`` — a real range shuffle, all executors;
2. per-partition rank/cumsum via a window PARTITIONED by
   ``spark_partition_id()`` (parallel);
3. per-partition totals collected to the driver — O(#shuffle-partitions)
   scalars, never O(rows) — prefix-summed, and rejoined as a broadcast map.

Output depends only on the GLOBAL key order, not on where the sampled range
boundaries fall, so results are deterministic and bit-identical to the
single-partition window they replace (asserted by the golden label tests).

Caller contract: the key must be UNIQUE per row for ``seq_ids`` (use it on
DISTINCT id tables); ``exclusive_prefix_sum`` tolerates duplicate keys only
if the caller doesn't care how ties split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _partitioned(df: DataFrame, order_cols: list[str]) -> DataFrame:
    d = (df.repartitionByRange(*order_cols)
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    return d


def _offsets_map(d: DataFrame, size_col) -> F.Column:
    """Collect per-partition totals (O(#partitions) rows), exclusive
    prefix-sum them driver-side, return a literal pid->offset map."""
    rows = sorted(d.groupBy("_pid").agg(size_col.alias("_n")).collect(),
                  key=lambda r: r["_pid"])
    items: list[F.Column] = []
    acc = 0
    for r in rows:
        items += [F.lit(r["_pid"]), F.lit(acc)]
        acc += r["_n"] or 0
    if not items:
        items = [F.lit(0), F.lit(0)]
    return F.element_at(F.create_map(*items), F.col("_pid"))


def seq_ids(df: DataFrame, order_cols: list[str], out_col: str,
            start: int = 0) -> DataFrame:
    """Add ``out_col`` = start, start+1, ... assigned in ascending
    ``order_cols`` order (keys must be unique). Equals
    ``row_number().over(Window.orderBy(*order_cols)) + start - 1`` without
    the single-partition window."""
    d = _partitioned(df, order_cols)
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    d = d.withColumn("_rn", F.row_number().over(w))
    off = _offsets_map(d, F.count(F.lit(1)))
    return (d.withColumn(out_col, (off + F.col("_rn") - 1 + start).cast("long"))
            .drop("_pid", "_rn"))


def exclusive_prefix_sum(df: DataFrame, order_cols: list[str], val_col: str,
                         out_col: str) -> DataFrame:
    """Add ``out_col`` = sum of ``val_col`` over all rows strictly before
    this one in ascending ``order_cols`` order (first row gets 0).

    ``val_col`` is an INTEGER weight (the contract — all call sites pass
    counts/byte sizes); it is cast to long before both the per-partition
    window sum and the cross-partition offset totals, so the two legs
    accumulate in the same integer domain and the result is exact. A
    fractional column would be truncated per-row by the cast — pass a
    pre-rounded column if that ever matters."""
    d = _partitioned(df, order_cols)
    v = F.col(val_col).cast("long")
    w = (Window.partitionBy("_pid")
         .orderBy(*[F.col(c).asc() for c in order_cols])
         .rowsBetween(Window.unboundedPreceding, -1))
    d = d.withColumn("_local", F.coalesce(F.sum(v).over(w), F.lit(0)))
    off = _offsets_map(d, F.sum(v))
    return (d.withColumn(out_col, (off + F.col("_local")).cast("long"))
            .drop("_pid", "_local"))
