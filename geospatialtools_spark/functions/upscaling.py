"""Time-series block averaging (reference ``src/upscaling_tools.f90:1-13``,
wrapper ``libraries/upscaling_tools.py``).

The Fortran kernel averages ``nt_in`` samples into ``nt_out`` blocks of
``dt = nt_in/nt_out`` (integer division; trailing remainder samples are
DROPPED — block i covers samples [i*dt, (i+1)*dt)). The Spark form is a
single groupBy on the block index — partial aggregation makes it one
narrow-shuffle pass at any length; the streaming twin is a tumbling
processing-window mean (streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_average(series: DataFrame, nt_in: int, nt_out: int,
                 t_col: str = "t", v_col: str = "value") -> DataFrame:
    """(t, value) -> (block, avg) for blocks 0..nt_out-1.

    Matches the Fortran semantics exactly: dt = nt_in // nt_out, samples at
    t >= nt_out*dt are excluded, mean over each block of dt samples.
    """
    dt = nt_in // nt_out
    return (
        series
        .filter(F.col(t_col) < nt_out * dt)
        .groupBy(F.floor(F.col(t_col) / dt).cast("long").alias("block"))
        .agg(F.avg(v_col).alias("avg_value"))
    )


def datetime2gradstime(ts):
    """``netcdf_tools.py:10-15`` / ``grads_tools.py:23-28``: '%HZ%d%b%Y'
    (e.g. '00Z01Jan2000') as a Catalyst expression."""
    from pyspark.sql import functions as F
    return F.date_format(ts, "HH'Z'ddMMMyyyy")


def gradstime2datetime(s):
    """``grads_tools.py:30-35`` / ``netcdf_tools.py:17-22`` inverse parse:
    '%HZ%d%b%Y' -> timestamp, as a Catalyst expression (round-trips with
    ``datetime2gradstime``; minutes/seconds zero, like the reference's
    strptime)."""
    from pyspark.sql import functions as F
    return F.to_timestamp(s, "HH'Z'ddMMMyyyy")


def _gradstime_py(date) -> str:
    """Driver-side twin of ``datetime2gradstime`` ('%HZ%d%b%Y',
    grads_tools.py:23-28) for sidecar writers."""
    return date.strftime("%HZ%d%b%Y")
