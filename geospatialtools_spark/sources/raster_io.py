"""Raster/cell-table IO (S1/S2/S3/S6/S7/S8/S10).

- ``write_raster`` / ``read_raster``: the engine's GeoTIFF equivalent — a
  parquet cell table partitioned by (tile_i, tile_j) plus a JSON sidecar
  carrying the full geotransform metadata (gdal_tools.raster_data fields,
  gdal_tools.py:60-115). Partitioning by tile means any windowed or stencil
  read prunes to the touched tiles via partition pruning — the distributed
  form of ``read_raster_subarea`` (gdal_tools.py:130-147).
- ``read_subarea``: S3 — expressed as filters so Catalyst pushes (i, j)
  min/max into the scan AND prunes (tile_i, tile_j) partitions.
- ``write_time_grid``: S8 NetCDF writer analog — (t, i, j, value) partitioned
  by t; lat/lon coordinate variables are derivable columns (affine from the
  metadata), not stored (netcdf_tools.py:72-131 stores them because NetCDF
  must; parquet need not).
- ``write_zone_table`` / ``read_zone_table``: S10 — the pickle property-bag
  sinks (terrain_tools.py:667,1152,1177,1311) as plain parquet tables.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import GridMeta


def write_raster(cells: DataFrame, meta: GridMeta, path: str,
                 mode: str = "overwrite") -> None:
    """Cell table + metadata sidecar; partitioned by tile for pruning."""
    out = cells
    if "tile_i" not in cells.columns:
        t = meta.tile
        out = (cells.withColumn("tile_i", (F.col("i") / t).cast("int"))
               .withColumn("tile_j", (F.col("j") / t).cast("int")))
    out.write.mode(mode).partitionBy("tile_i", "tile_j").parquet(path)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(asdict(meta), f)


def read_raster(spark: SparkSession, path: str) -> tuple[DataFrame, GridMeta]:
    with open(os.path.join(path, "_meta.json")) as f:
        meta = GridMeta(**json.load(f))
    return spark.read.parquet(path), meta


def read_subarea(spark: SparkSession, path: str, ixmin: int, iymin: int,
                 nx: int, ny: int) -> tuple[DataFrame, GridMeta]:
    """S3 windowed read: the WHERE reaches the scan as PushedFilters and the
    (tile_i, tile_j) predicate prunes partitions — check with
    ``df.explain('formatted')`` (SURVEY.md §4.1)."""
    df, meta = read_raster(spark, path)
    t = meta.tile
    out = df.where(
        F.col("i").between(iymin, iymin + ny - 1)
        & F.col("j").between(ixmin, ixmin + nx - 1)
        & F.col("tile_i").between(iymin // t, (iymin + ny - 1) // t)
        & F.col("tile_j").between(ixmin // t, (ixmin + nx - 1) // t))
    return out, meta


def write_time_grid(df: DataFrame, path: str, t_col: str = "t",
                    mode: str = "overwrite") -> None:
    """S8: (t, i, j, value) partitioned by time — each time slice is one
    prunable partition, the parquet analog of the NetCDF unlimited dim."""
    df.write.mode(mode).partitionBy(t_col).parquet(path)


def with_coords(df: DataFrame, meta: GridMeta) -> DataFrame:
    """Derive the lat/lon coordinate variables (cell centers) from the
    affine metadata (gdal_tools.py:19-20 semantics)."""
    return (df.withColumn("lat", meta.miny + (F.col("i") + 0.5) * meta.resy)
            .withColumn("lon", meta.minx + (F.col("j") + 0.5) * meta.resx))


def write_zone_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def read_zone_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def update_control_file(kind: str, idate, nt: int, tstep: str,
                        file_template: str, ctl_file: str) -> None:
    """S9 GrADS ctl sidecar for a netCDF template
    (``netcdf_tools.py:133-141 Update_Control_File``) — byte-identical text
    (same format strings); ``idate`` is a datetime."""
    if kind == "nc":
        from ..functions.upscaling import _gradstime_py
        with open(ctl_file, "w") as fp:
            fp.write("dset %s\n" % file_template)
            fp.write("options template\n")
            fp.write("dtype netcdf\n")
            fp.write("tdef t %d linear %s %s\n"
                     % (nt, _gradstime_py(idate), tstep))


def update_control_file_binary(kind: str, idate, dims: dict, nt: int,
                               tstep: str, file_template: str,
                               ctl_file: str, variables: list[str]) -> None:
    """S9 GrADS ctl sidecar for flat binary output
    (``netcdf_tools.py:143-160 Update_Control_File_Binary``)."""
    if kind == "bin_all":
        from ..functions.upscaling import _gradstime_py
        with open(ctl_file, "w") as fp:
            fp.write("dset %s\n" % file_template)
            fp.write("title %s\n" % file_template)
            fp.write("undef %f\n" % dims["undef"])
            fp.write("xdef %d linear %f %f\n"
                     % (dims["nlon"], dims["minlon"], dims["res"]))
            fp.write("ydef %d linear %f %f\n"
                     % (dims["nlat"], dims["minlat"], dims["res"]))
            fp.write("zdef 1 levels 0\n")
            fp.write("tdef %d linear %s %s\n"
                     % (nt, _gradstime_py(idate), tstep))
            fp.write("vars %d\n" % len(variables))
            for var in variables:
                fp.write("%s 0 99 %s\n" % (var, var))
            fp.write("endvars\n")
