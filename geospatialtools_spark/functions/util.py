"""Small shared helpers for the function library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_to_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the session's cores before a CPU-heavy
    per-row stage (Arrow UDF or wide Catalyst expression).

    A small parquet table arrives as 1-few partitions, so the expensive
    per-row stage would run on one thread while the rest idle; round-robin
    repartition of a small input costs ~nothing. A production-scale table
    already has >= defaultParallelism partitions and passes through
    untouched — no shuffle added at 10^12 rows.
    """
    try:
        p = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < p:
            return df.repartition(p)
    except Exception:
        pass
    return df
