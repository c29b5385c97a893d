"""Sources/sinks round-trip + predicate-pushdown plan checks (S1-S10,
SURVEY.md §4.1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatialtools_spark import fixtures
from geospatialtools_spark.grid import cells_df, collect_dense
from geospatialtools_spark.sources import raster_io as RIO


@pytest.fixture(scope="module")
def raster_path(spark, grid32, tmp_path_factory):
    meta, dem, mask = grid32
    cells = cells_df(spark, meta, dem=dem.astype(np.float64))
    path = str(tmp_path_factory.mktemp("raster") / "dem")
    RIO.write_raster(cells, meta, path)
    return path


def test_raster_roundtrip(spark, grid32, raster_path):
    meta, dem, _ = grid32
    df, meta2 = RIO.read_raster(spark, raster_path)
    assert meta2.nx == meta.nx and meta2.resx == meta.resx
    got = collect_dense(meta2, df, "dem")
    assert np.array_equal(got, dem.astype(np.float32))


def test_subarea_read_and_pruning(spark, grid32, raster_path):
    meta, dem, _ = grid32
    sub, _ = RIO.read_subarea(spark, raster_path, ixmin=5, iymin=9, nx=7, ny=6)
    pdf = sub.toPandas()
    assert len(pdf) == 7 * 6
    assert pdf["i"].min() == 9 and pdf["i"].max() == 14
    # window entirely in tile (0, 0) -> partition pruning must drop the
    # other 3 tile partitions; the i/j range must reach the scan
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert ("PartitionFilters" in plan) or ("partition" in plan.lower())


def test_time_grid_partitioning(spark, tmp_path):
    df = spark.range(300).select(
        (F.col("id") % 3).alias("t"), (F.col("id") / 30).cast("int").alias("i"),
        (F.col("id") % 30).alias("j"), F.rand(7).alias("value"))
    path = str(tmp_path / "tg")
    RIO.write_time_grid(df, path)
    back = spark.read.parquet(path)
    assert back.count() == 300
    one = back.where(F.col("t") == 1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == 100
    assert "t=1" in plan or "PartitionFilters" in plan


def test_with_coords(spark, grid32):
    meta, dem, _ = grid32
    cells = cells_df(spark, meta, dem=dem.astype(np.float64)).limit(10)
    out = RIO.with_coords(cells, meta).toPandas()
    for _, r in out.iterrows():
        assert abs(r["lat"] - (meta.miny + (r["i"] + 0.5) * meta.resy)) < 1e-12
        assert abs(r["lon"] - (meta.minx + (r["j"] + 0.5) * meta.resx)) < 1e-12


def test_zone_table_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], "zone long, prop double")
    path = str(tmp_path / "zones")
    RIO.write_zone_table(df, path)
    back = RIO.read_zone_table(spark, path).orderBy("zone").collect()
    assert [(r["zone"], r["prop"]) for r in back] == [(1, 2.5), (2, 3.5)]
