"""Numpy oracle for polygon rasterization (``gdal_tools.shapefile2raster``,
gdal_tools.py:170-192).

``gdal_rasterize -init -9999 -a <field>`` burns a cell iff its CENTER is
inside the polygon, features burned in table order so overlapping polygons
are last-wins. The reference shells out to GDAL; GDAL is absent here, so
this dense-grid implementation (cell-center even-odd PIP, feature order
preserved) is the golden authority the Spark rasterize operator must match
bit-for-bit (SURVEY.md §5.2 item 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geometry import points_in_rings, rings_bbox, wkb_to_rings
from ..grid import UNDEF, GridMeta


def rasterize(meta: GridMeta, polygons: pd.DataFrame) -> np.ndarray:
    """Burn ``attr`` of each polygon (in polygon_id order) onto the grid."""
    out = np.full((meta.nx, meta.ny), UNDEF, dtype=np.float32)
    ii, jj = np.meshgrid(np.arange(meta.nx), np.arange(meta.ny), indexing="ij")
    cx, cy = meta.cell_center_xy(ii.ravel(), jj.ravel())
    order = polygons.sort_values("polygon_id")
    for _, row in order.iterrows():
        rings = wkb_to_rings(row["wkb"])
        x0, y0, x1, y1 = rings_bbox(rings)
        # bbox prefilter (cheap, exactness unaffected)
        cand = (cx >= x0) & (cx <= x1) & (cy >= y0) & (cy <= y1)
        if not cand.any():
            continue
        inside = points_in_rings(cx[cand], cy[cand], rings)
        flat = np.where(cand)[0][inside]
        out[ii.ravel()[flat], jj.ravel()[flat]] = np.float32(row["attr"])
    return out


def extract_point_data(meta: GridMeta, grid: np.ndarray, lats, lons, undef: float = UNDEF):
    """Nearest-cell point sampling (gdal_tools.py:9-34): affine rounding,
    out-of-bounds -> undef."""
    i, j = meta.point_to_ij(np.asarray(lons), np.asarray(lats))
    # NB: the reference computes ilon from lons (x) and ilat from lats (y);
    # in our grid x runs along j and y along i, handled by point_to_ij.
    i = i.astype(np.int64)
    j = j.astype(np.int64)
    oob = (i < 0) | (i >= meta.nx) | (j < 0) | (j >= meta.ny)
    vals = np.full(i.shape, undef, dtype=np.float64)
    ok = ~oob
    vals[ok] = grid[i[ok], j[ok]]
    return vals
