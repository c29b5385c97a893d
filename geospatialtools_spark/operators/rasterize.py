"""Flagship spatial join: polygon rasterization / PIP burn (SURVEY.md §7.1).

Replaces ``gdal_tools.shapefile2raster`` (gdal_tools.py:170-192, two GDAL
subprocesses) with one distributed job:

    polygons --bbox--> covering (tile_i, tile_j) keys --explode+join-->
    per-tile cogroup with the cell table --> vectorized even-odd PIP on cell
    CENTERS (gdal_rasterize rule) --> last-feature-wins burn

The polygon side replicates one row per covered tile (bounded, since bboxes
are clipped to the grid); the cell side never moves — it is already
partitioned by tile. Exactness is gated on the numpy rasterize oracle
(oracle/rasterize.py) bit-for-bit.

Skew note (north_rule): a continent-sized polygon covering many tiles
replicates once per tile — that IS the salting (work proportional to covered
area, spread across partitions); tiny hot tiles with many polygons are split
further by AQE skew-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geometry import points_in_rings, rings_bbox, wkb_to_rings
from ..grid import UNDEF, GridMeta

F32_UNDEF = float(np.float32(UNDEF))


def _parse_wkb_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """(polygon_id, attr, wkb, ...) batch -> parsed flat ring-coordinate
    frame (coords, roff, bbox). SINGLE source of the parse used by both the
    distributed (tile-cogroup) and driver-side (broadcast) paths — the two
    kernels are asserted bit-equal in tests, so they must share this."""
    coords, roffs, boxes = [], [], []
    for w in pdf["wkb"]:
        rings = wkb_to_rings(bytes(w))
        boxes.append(rings_bbox(rings))
        off = np.zeros(len(rings) + 1, dtype=np.int32)
        np.cumsum([len(r) for r in rings], out=off[1:])
        roffs.append(off)
        coords.append(np.concatenate([r.ravel() for r in rings]))
    out = pdf[["polygon_id", "attr"]].copy()
    out["coords"] = coords
    out["roff"] = roffs
    b = np.array(boxes) if boxes else np.zeros((0, 4))
    out["x0"], out["y0"], out["x1"], out["y1"] = (
        b[:, 0], b[:, 1], b[:, 2], b[:, 3])
    return out


def polygons_to_tiles(polygons: DataFrame, meta: GridMeta) -> DataFrame:
    """(polygon_id, attr, wkb) -> one row per covered tile, with the WKB
    parsed ONCE here (before the tile explode) into flat ring-coordinate
    arrays. A polygon covering T tiles is replicated T times, so parsing
    after the explode would re-decode every polygon once per covered tile
    and Python-loop per row; downstream kernels instead reslice the parsed
    float64 coords (same bytes as the WKB payload — no extra shuffle
    volume, identical coordinate values)."""
    t = meta.tile

    def parse_udf(it):
        for pdf in it:
            yield _parse_wkb_pdf(pdf)

    with_box = polygons.mapInPandas(
        parse_udf,
        schema="polygon_id long, attr double, coords array<double>, "
               "roff array<int>, x0 double, y0 double, x1 double, y1 double",
    )
    # bbox -> covered tile index ranges (cell centers only: a polygon can only
    # burn a cell whose center lies within its bbox)
    ti0 = F.greatest(F.lit(0), F.floor(((F.col("y0") - meta.miny) / meta.resy - 0.5) / t)).cast("int")
    ti1 = F.least(F.lit((meta.nx - 1) // t),
                  F.floor(((F.col("y1") - meta.miny) / meta.resy - 0.5 + 1) / t)).cast("int")
    tj0 = F.greatest(F.lit(0), F.floor(((F.col("x0") - meta.minx) / meta.resx - 0.5) / t)).cast("int")
    tj1 = F.least(F.lit((meta.ny - 1) // t),
                  F.floor(((F.col("x1") - meta.minx) / meta.resx - 0.5 + 1) / t)).cast("int")
    return (
        with_box
        .withColumn("tile_i", F.explode(F.sequence(ti0, ti1)))
        .withColumn("tile_j", F.explode(F.sequence(tj0, tj1)))
        .filter((F.col("tile_i") >= 0) & (F.col("tile_j") >= 0))
        .select("tile_i", "tile_j", "polygon_id", "attr", "coords", "roff",
                "x0", "y0", "x1", "y1")
    )


MAX_BROADCAST_POLY_BYTES = 64 << 20  # WKB payload cap for the broadcast path


def _broadcastable(polygons: DataFrame, max_polys: int) -> bool:
    """ONE agg action deciding the strategy: the polygon side broadcasts
    only when BOTH its row count and its total WKB payload are small — a
    few continent-sized multipolygons can carry GBs of vertices, which must
    take the distributed tile-cogroup path even at tiny row counts."""
    if not max_polys:
        return False
    est = polygons.agg(F.count("*").alias("n"),
                       F.sum(F.length("wkb")).alias("b")).first()
    return (est["n"] or 0) <= max_polys and (est["b"] or 0) <= MAX_BROADCAST_POLY_BYTES


def _parse_polygons_pdf(polygons: DataFrame) -> pd.DataFrame:
    """Driver-side parse of a SMALL polygon table (guarded by
    _broadcastable) into the same columns the distributed parse_udf emits
    (broadcast path — the polygon side is the dimension, exactly like
    choosing a broadcast join over a shuffle join)."""
    return _parse_wkb_pdf(polygons.select("polygon_id", "attr", "wkb").toPandas())


def _iter_parsed(poly_pdf: pd.DataFrame, xmin, xmax, ymin, ymax):
    """Yield (row_idx, rings) in ascending polygon_id for the polygons whose
    bbox intersects [xmin,xmax]x[ymin,ymax] — one vectorized precheck across
    the whole batch, ring arrays resliced from the pre-parsed flat coords
    (no WKB decode, no pandas iterrows)."""
    order = np.argsort(poly_pdf["polygon_id"].to_numpy(), kind="stable")
    x0s = poly_pdf["x0"].to_numpy(np.float64)[order]
    y0s = poly_pdf["y0"].to_numpy(np.float64)[order]
    x1s = poly_pdf["x1"].to_numpy(np.float64)[order]
    y1s = poly_pdf["y1"].to_numpy(np.float64)[order]
    hit = (x0s <= xmax) & (x1s >= xmin) & (y0s <= ymax) & (y1s >= ymin)
    coords_col = poly_pdf["coords"].to_numpy()
    roff_col = poly_pdf["roff"].to_numpy()
    for k in np.flatnonzero(hit):
        idx = order[k]
        c = np.asarray(coords_col[idx], dtype=np.float64)
        off = np.asarray(roff_col[idx], dtype=np.int64)
        rings = [c[2 * a:2 * b].reshape(-1, 2)
                 for a, b in zip(off[:-1], off[1:])]
        yield idx, rings, (x0s[k], y0s[k], x1s[k], y1s[k])


def _burn_batch(poly_pdf: pd.DataFrame, cell_pdf: pd.DataFrame,
                meta: GridMeta) -> np.ndarray:
    """Burn a polygon batch onto one cell batch (cell-center rule, ascending
    polygon_id = last wins): vectorized bbox precheck, pre-parsed rings."""
    ii = cell_pdf["i"].to_numpy(np.int64)
    jj = cell_pdf["j"].to_numpy(np.int64)
    cx = meta.minx + (jj + 0.5) * meta.resx
    cy = meta.miny + (ii + 0.5) * meta.resy
    burned = np.full(len(ii), UNDEF, dtype=np.float64)
    if len(poly_pdf) and len(ii):
        attrs = poly_pdf["attr"].to_numpy(np.float64)
        for idx, rings, (x0, y0, x1, y1) in _iter_parsed(
                poly_pdf, cx.min(), cx.max(), cy.min(), cy.max()):
            cand = (cx >= x0) & (cx <= x1) & (cy >= y0) & (cy <= y1)
            if not cand.any():
                continue
            inside = points_in_rings(cx[cand], cy[cand], rings)
            sel = np.where(cand)[0][inside]
            burned[sel] = np.float32(attrs[idx])
    return burned


def rasterize(cells: DataFrame, polygons: DataFrame, meta: GridMeta,
              attr_name: str = "attr",
              max_broadcast_polys: int = 10000) -> DataFrame:
    """Burn polygon attrs onto the cell table (cell-center rule, last wins).

    Returns (tile_i, tile_j, i, j, attr) for every cell; uncovered cells get
    -9999 (``gdal_rasterize -init -9999``, gdal_tools.py:189).

    Strategy (the broadcast-vs-shuffle join choice): when the polygon side
    is small (<= max_broadcast_polys), it is parsed driver-side and closed
    over a mapInPandas — the CELL TABLE NEVER SHUFFLES (zero-exchange plan,
    like a broadcast join; at 10^12 cells this is the only sane plan for a
    dimension-sized polygon set). Larger polygon sets take the tile-cogroup
    path: polygons replicate once per covered tile (that replication IS the
    salting) and cells still only shuffle by their own tile key. Both paths
    are bit-identical (same kernel; equality asserted in tests).
    """
    schema = f"tile_i int, tile_j int, i int, j int, {attr_name} double"

    if _broadcastable(polygons, max_broadcast_polys):
        parsed = _parse_polygons_pdf(polygons)

        def kern_b(batches):
            for cell_pdf in batches:
                yield pd.DataFrame({
                    "tile_i": cell_pdf["tile_i"].to_numpy(np.int32),
                    "tile_j": cell_pdf["tile_j"].to_numpy(np.int32),
                    "i": cell_pdf["i"].to_numpy(np.int32),
                    "j": cell_pdf["j"].to_numpy(np.int32),
                    attr_name: _burn_batch(parsed, cell_pdf, meta),
                })

        return cells.select("tile_i", "tile_j", "i", "j") \
            .mapInPandas(kern_b, schema=schema)

    ptiles = polygons_to_tiles(polygons, meta)

    def kern(key, cell_pdf: pd.DataFrame, poly_pdf: pd.DataFrame) -> pd.DataFrame:
        ti, tj = key
        return pd.DataFrame({
            "tile_i": np.full(len(cell_pdf), ti, np.int32),
            "tile_j": np.full(len(cell_pdf), tj, np.int32),
            "i": cell_pdf["i"].to_numpy(np.int32),
            "j": cell_pdf["j"].to_numpy(np.int32),
            attr_name: _burn_batch(poly_pdf, cell_pdf, meta),
        })

    return (
        cells.select("tile_i", "tile_j", "i", "j").groupBy("tile_i", "tile_j")
        .cogroup(ptiles.groupBy("tile_i", "tile_j"))
        .applyInPandas(kern, schema=schema)
    )


def _pip_batch(poly_pdf: pd.DataFrame, px: np.ndarray, py: np.ndarray):
    """Winning (polygon_id, attr) per point — ascending polygon_id (last
    wins), vectorized bbox precheck, pre-parsed rings."""
    pid = np.full(len(px), -1, dtype=np.int64)
    attr = np.full(len(px), np.nan)
    if len(poly_pdf) and len(px):
        pids = poly_pdf["polygon_id"].to_numpy(np.int64)
        attrs = poly_pdf["attr"].to_numpy(np.float64)
        for idx, rings, (x0, y0, x1, y1) in _iter_parsed(
                poly_pdf, px.min(), px.max(), py.min(), py.max()):
            cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
            if not cand.any():
                continue
            inside = points_in_rings(px[cand], py[cand], rings)
            sel = np.where(cand)[0][inside]
            pid[sel] = pids[idx]
            attr[sel] = attrs[idx]
    return pid, attr


def pip_join(points: DataFrame, polygons: DataFrame, meta: GridMeta,
             lat_col="lat", lon_col="lon", how: str = "left",
             max_broadcast_polys: int = 10000) -> DataFrame:
    """J2 at point granularity: attach the winning polygon to each point.

    Small polygon sets (<= max_broadcast_polys) are parsed driver-side and
    closed over a mapInPandas — the POINT TABLE NEVER SHUFFLES (broadcast
    join analog). Larger sets: points bucketed by the (tile_i, tile_j) grid
    keys and cogrouped with the tile-covered polygon table. Both paths run
    the same exact even-odd PIP kernel; last polygon (max polygon_id) wins,
    like the raster burn.
    """
    in_cols = [f for f in points.columns]
    schema = ", ".join(f"{f} {points.schema[f].dataType.simpleString()}" for f in in_cols)
    schema += ", polygon_id long, attr double"

    if _broadcastable(polygons, max_broadcast_polys):
        parsed = _parse_polygons_pdf(polygons)

        def kern_b(batches):
            for pts_pdf in batches:
                pid, attr = _pip_batch(parsed,
                                       pts_pdf[lon_col].to_numpy(np.float64),
                                       pts_pdf[lat_col].to_numpy(np.float64))
                out = pts_pdf[in_cols].copy()
                out["polygon_id"] = pid
                out["attr"] = attr
                yield out

        joined = points.mapInPandas(kern_b, schema=schema)
    else:
        t = meta.tile
        pts = points.withColumn(
            "tile_i", F.floor((F.col(lat_col) - meta.miny) / meta.resy / t).cast("int")
        ).withColumn(
            "tile_j", F.floor((F.col(lon_col) - meta.minx) / meta.resx / t).cast("int")
        )
        ptiles = polygons_to_tiles(polygons, meta)

        def kern(key, pts_pdf: pd.DataFrame, poly_pdf: pd.DataFrame) -> pd.DataFrame:
            pid, attr = _pip_batch(poly_pdf,
                                   pts_pdf[lon_col].to_numpy(np.float64),
                                   pts_pdf[lat_col].to_numpy(np.float64))
            out = pts_pdf[in_cols].copy()
            out["polygon_id"] = pid
            out["attr"] = attr
            return out

        joined = (pts.groupBy("tile_i", "tile_j")
                  .cogroup(ptiles.groupBy("tile_i", "tile_j"))
                  .applyInPandas(kern, schema=schema))
    out = joined.withColumn("polygon_id",
                            F.when(F.col("polygon_id") < 0, F.lit(None)).otherwise(F.col("polygon_id")))
    if how == "inner":
        out = out.filter(F.col("polygon_id").isNotNull())
    return out
