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


def test_ctl_writers(tmp_path):
    """S9: ctl sidecars byte-match the reference's format strings
    (netcdf_tools.py:133-160)."""
    import datetime

    from geospatialtools_spark.sources import raster_io as R
    idate = datetime.datetime(2004, 3, 1, 6)
    p1 = str(tmp_path / "a.ctl")
    R.update_control_file("nc", idate, 24, "1hr", "out_%y4%m2.nc", p1)
    want = ("dset out_%y4%m2.nc\noptions template\ndtype netcdf\n"
            "tdef t 24 linear 06Z01Mar2004 1hr\n")
    assert open(p1).read() == want

    p2 = str(tmp_path / "b.ctl")
    dims = {"undef": -9999.0, "nlon": 10, "minlon": -30.0,
            "nlat": 8, "minlat": 10.0, "res": 0.25}
    R.update_control_file_binary("bin_all", idate, dims, 4, "1dy",
                                 "out.bin", p2, ["tas", "prec"])
    body = open(p2).read()
    assert body.startswith("dset out.bin\ntitle out.bin\nundef -9999.000000\n")
    assert "xdef 10 linear -30.000000 0.250000\n" in body
    assert "ydef 8 linear 10.000000 0.250000\n" in body
    assert "tdef 4 linear 06Z01Mar2004 1dy\n" in body
    assert body.endswith("vars 2\ntas 0 99 tas\nprec 0 99 prec\nendvars\n")
