"""Grid data model: dense numpy raster <-> long-form Spark cell table.

The reference's central structure is a dense 2-D float32 array with
geotransform metadata (``gdal_tools.py:60-115`` ``raster_data``). The engine's
equivalent is a long-form DataFrame of cells ``(tile_i, tile_j, i, j, value)``
partitioned into fixed TILE x TILE blocks; metadata travels as a small
broadcastable :class:`GridMeta`.

Conventions (match the reference exactly):

- ``i`` indexes the FIRST array axis, ``j`` the second, both 0-based here
  (the Fortran kernels are 1-based; the oracle handles the shift).
- NULL is the ``-9999.0`` sentinel at golden-file boundaries
  (``terrain_tools.py:58``); inside Spark we keep the sentinel in value
  columns so float equality semantics match the reference bit-for-bit.
- Affine cell lookup for a point follows ``gdal_tools.py:19-20``:
  ``icol = round((x - (x0 + res/2)) / res)`` — i.e. nearest cell *center*.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

UNDEF = -9999.0
TILE = 64  # default tile edge for stencil partitioning (tests); tune per SF


@dataclass(frozen=True)
class GridMeta:
    """Geotransform metadata (``gdal_tools.py:90-100``, ``:211-233``)."""

    nx: int  # number of rows (first axis, i)
    ny: int  # number of cols (second axis, j)
    minx: float = 0.0  # x (lon) of the j=0 cell *edge*
    miny: float = 0.0  # y (lat) of the i=0 cell *edge*
    resx: float = 1.0
    resy: float = 1.0
    nodata: float = UNDEF
    projection: str = "EPSG:4326"
    tile: int = TILE

    @property
    def maxx(self) -> float:
        return self.minx + self.ny * self.resx

    @property
    def maxy(self) -> float:
        return self.miny + self.nx * self.resy

    def cell_center_xy(self, i: np.ndarray, j: np.ndarray):
        """(x, y) of cell centers; x runs along j, y along i."""
        x = self.minx + (np.asarray(j) + 0.5) * self.resx
        y = self.miny + (np.asarray(i) + 0.5) * self.resy
        return x, y

    def point_to_ij(self, x: np.ndarray, y: np.ndarray):
        """Nearest-cell-center lookup, the ``gdal_tools.py:19-20`` rule.

        Returns float arrays; out-of-range values are NOT clipped — callers
        replicate the reference's out-of-bounds -> -9999 behaviour
        (``gdal_tools.py:29-30``). Uses np.round (banker's rounding), same as
        the reference's ``np.round``.
        """
        j = np.round((np.asarray(x, dtype=np.float64) - (self.minx + self.resx / 2)) / self.resx)
        i = np.round((np.asarray(y, dtype=np.float64) - (self.miny + self.resy / 2)) / self.resy)
        return i, j

    def as_dict(self) -> dict:
        return {
            "nx": self.nx, "ny": self.ny, "minx": self.minx, "miny": self.miny,
            "maxx": self.maxx, "maxy": self.maxy, "resx": self.resx,
            "resy": self.resy, "nodata": self.nodata,
            "projection": self.projection, "tile": self.tile,
        }


def dense_to_pdf(meta: GridMeta, **grids: np.ndarray) -> pd.DataFrame:
    """Dense 2-D arrays -> long-form pandas frame (one row per cell).

    Every grid must be shape (nx, ny). Adds (tile_i, tile_j, i, j).
    """
    nx, ny = meta.nx, meta.ny
    ii, jj = np.meshgrid(np.arange(nx, dtype=np.int32), np.arange(ny, dtype=np.int32), indexing="ij")
    data = {
        "tile_i": (ii // meta.tile).ravel().astype(np.int32),
        "tile_j": (jj // meta.tile).ravel().astype(np.int32),
        "i": ii.ravel(),
        "j": jj.ravel(),
    }
    for name, g in grids.items():
        g = np.asarray(g)
        if g.shape != (nx, ny):
            raise ValueError(f"grid {name!r} shape {g.shape} != ({nx}, {ny})")
        data[name] = g.ravel()
    return pd.DataFrame(data)


def pdf_to_dense(meta: GridMeta, pdf: pd.DataFrame, col: str, fill: float = UNDEF,
                 dtype=np.float32) -> np.ndarray:
    """Long-form frame -> dense (nx, ny) array; missing cells get ``fill``."""
    out = np.full((meta.nx, meta.ny), fill, dtype=dtype)
    out[pdf["i"].to_numpy(np.int64), pdf["j"].to_numpy(np.int64)] = pdf[col].to_numpy()
    return out


def cells_df(spark, meta: GridMeta, **grids: np.ndarray):
    """Dense arrays -> Spark cell DataFrame, repartitioned by tile.

    Partitioning by (tile_i, tile_j) co-locates each stencil block; at scale
    the cell table is written bucketed/partitioned by these keys so stencil
    stages shuffle only halo rows.
    """
    pdf = dense_to_pdf(meta, **grids)
    df = spark.createDataFrame(pdf)
    return df.repartition("tile_i", "tile_j")


def collect_dense(meta: GridMeta, df, col: str, fill: float = UNDEF, dtype=np.float32) -> np.ndarray:
    """Spark cell DataFrame -> dense array (driver-side; test/golden use only)."""
    pdf = df.select("i", "j", col).toPandas()
    return pdf_to_dense(meta, pdf, col, fill=fill, dtype=dtype)
