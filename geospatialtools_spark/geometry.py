"""Vector geometry in pure numpy: WKB polygons + exact point-in-polygon.

The reference performs rasterization by shelling out to ``gdal_rasterize``
(``gdal_tools.py:186-190``), which burns a cell iff the cell *center* is
inside the polygon, later features overwriting earlier ones (last-wins).
This module supplies the exact-geometry half of the engine's distributed
equivalent: cell-index equi-join prefilter (``cellindex.py``) + vectorized
even-odd PIP refinement inside a pandas UDF.

Everything is numpy-vectorized over points; the per-edge loop is over the
polygon's (few) vertices, never over points.
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Encode a polygon (outer ring + holes) as little-endian WKB.

    Each ring is an (n, 2) array of (x, y); closure is enforced on encode.
    """
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def wkb_to_rings(wkb: bytes) -> list[np.ndarray]:
    """Decode WKB Polygon / MultiPolygon into a flat list of rings."""
    rings: list[np.ndarray] = []
    pos = 0

    def read_polygon(pos: int) -> int:
        (nrings,) = struct.unpack_from("<I", wkb, pos)
        pos += 4
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", wkb, pos)
            pos += 4
            ring = np.frombuffer(wkb, dtype="<f8", count=2 * npts, offset=pos).reshape(npts, 2)
            rings.append(ring.astype(np.float64))
            pos += 16 * npts
        return pos

    byte_order, geom_type = struct.unpack_from("<BI", wkb, pos)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    pos += 5
    if geom_type == _WKB_POLYGON:
        read_polygon(pos)
    elif geom_type == _WKB_MULTIPOLYGON:
        (nparts,) = struct.unpack_from("<I", wkb, pos)
        pos += 4
        for _ in range(nparts):
            pos += 5  # inner byte order + type
            pos = read_polygon(pos)
    else:
        raise ValueError(f"unsupported WKB geometry type {geom_type}")
    return rings


def rings_bbox(rings: list[np.ndarray]):
    pts = np.vstack(rings)
    return pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd (crossing-number) PIP test, vectorized over points.

    Edge rule: a point is inside iff a ray to +x crosses an odd number of
    edges, with the standard half-open convention (an edge from (x1,y1) to
    (x2,y2) is crossed iff ``(y1 > py) != (y2 > py)``), which makes shared
    edges between adjacent polygons assign each center to exactly one side —
    the behaviour gdal_rasterize's scanline fill exhibits on the reference's
    masks (deterministic, no double-burn on shared borders).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        for k in range(len(x1)):
            cond = (y1[k] > py) != (y2[k] > py)
            if not (y2[k] - y1[k]) == 0.0:
                xint = (x2[k] - x1[k]) * (py - y1[k]) / (y2[k] - y1[k]) + x1[k]
                inside ^= cond & (px < xint)
    return inside


def haversine_np(lat0, lat1, lon0, lon1):
    """Great-circle distance, R=6372800 m (``terrain_tools.py:14-23``)."""
    R = 6372800.0
    dlat = np.deg2rad(np.asarray(lat1) - np.asarray(lat0))
    dlon = np.deg2rad(np.asarray(lon1) - np.asarray(lon0))
    lat1r = np.deg2rad(lat1)
    lat0r = np.deg2rad(lat0)
    a = np.sin(dlat / 2) ** 2 + np.cos(lat0r) * np.cos(lat1r) * np.sin(dlon / 2) ** 2
    return R * 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))
