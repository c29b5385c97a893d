"""Point operators: raster sampling (J1) and kNN via expanding cell rings (J8).

J1 replaces the reference's per-point ``ReadAsArray`` syscall loop
(gdal_tools.py:26-32) with one equi-join against the cell table. J8 has no
reference analog (mandated by BASELINE.json north_rule): kNN over the
engine's quad-cell index — candidates gathered ring-by-ring, exact haversine
re-rank, with the standard ring+1 completeness guarantee.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as TY

from .. import cellindex
from ..geometry import haversine_np
from ..grid import UNDEF, GridMeta


def extract_point_data(points: DataFrame, cells: DataFrame, meta: GridMeta,
                       value_col: str, lat_col="lat", lon_col="lon",
                       undef: float = UNDEF) -> DataFrame:
    """gdal_tools.extract_point_data (gdal_tools.py:9-34) as one left join.

    Affine nearest-center rule (:19-20, np.round half-to-even), out-of-bounds
    -> undef (:29-30). The cell side is keyed on (i, j); Catalyst broadcasts
    whichever side is small.
    """
    iy = (F.col(lat_col) - (meta.miny + meta.resy / 2)) / meta.resy
    jx = (F.col(lon_col) - (meta.minx + meta.resx / 2)) / meta.resx

    def rint(c):
        # numpy half-to-even (the reference's np.round, gdal_tools.py:19-20),
        # not Spark's half-up
        f = F.floor(c)
        is_half = (c - f) == 0.5
        even = (f % 2) == 0
        return F.when(is_half, F.when(even, f).otherwise(f + 1)) \
                .otherwise(F.floor(c + 0.5)).cast("long")

    pts = points.withColumn("pi", rint(iy)).withColumn("pj", rint(jx))
    oob = (F.col("pi") < 0) | (F.col("pi") >= meta.nx) | (F.col("pj") < 0) | (F.col("pj") >= meta.ny)
    joined = pts.join(
        cells.select(F.col("i").alias("pi"), F.col("j").alias("pj"),
                     F.col(value_col).alias("_v")),
        ["pi", "pj"], "left",
    )
    value = F.when(oob, F.lit(float(undef))).otherwise(F.coalesce(F.col("_v"), F.lit(float(undef))))
    return joined.withColumn("value", value).drop("_v")


_CELL_RET = TY.LongType()


def with_cell(df: DataFrame, res: int, lat_col="lat", lon_col="lon",
              out_col: str = "cell") -> DataFrame:
    """Attach the quad-cell id at resolution ``res`` (vectorized pandas UDF)."""

    @F.pandas_udf(_CELL_RET)
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(cellindex.encode(lat.to_numpy(), lon.to_numpy(), res))

    return df.withColumn(out_col, enc(F.col(lat_col), F.col(lon_col)))


def knn_join(queries: DataFrame, targets: DataFrame, k: int, res: int,
             query_id="query_id", target_id="target_id",
             lat_col="lat", lon_col="lon", max_rounds: int = 6) -> DataFrame:
    """k nearest targets per query: expanding Chebyshev rings on the cell
    index, exact haversine re-rank (terrain_tools.py:14-23 formula).

    Completeness: if >= k candidates lie within rings 0..r, the true kNN lie
    within rings 0..r+1 (a cell at ring r+2 is strictly farther than the
    farthest point of ring r under the index's square metric envelope) — so
    queries finish one ring after reaching k candidates. Rounds double the
    ring radius each step: ring budget grows geometrically, log(#rings)
    shuffle rounds.
    """
    q = with_cell(queries.select(query_id, lat_col, lon_col), res).select(
        F.col(query_id).alias("qid"), F.col(lat_col).alias("qlat"),
        F.col(lon_col).alias("qlon"), F.col("cell").alias("qcell"))
    t = with_cell(targets.select(target_id, lat_col, lon_col), res).select(
        F.col(target_id).alias("tid"), F.col(lat_col).alias("tlat"),
        F.col(lon_col).alias("tlon"), F.col("cell").alias("tcell"))
    t = t.localCheckpoint(eager=True)

    @F.pandas_udf(TY.ArrayType(TY.LongType()))
    def ring_cells(cell: pd.Series, r0: pd.Series, r1: pd.Series) -> pd.Series:
        out = []
        for c, a, b in zip(cell.to_numpy(), r0.to_numpy(), r1.to_numpy()):
            rings = [cellindex.ring(np.array([c]), rr).ravel() for rr in range(int(a), int(b) + 1)]
            out.append(np.unique(np.concatenate(rings)).tolist() if rings else [])
        return pd.Series(out)

    pending = q.withColumn("r0", F.lit(0)).withColumn("r1", F.lit(1))
    results = None
    for rnd in range(max_rounds):
        cand = (pending
                .withColumn("cell", F.explode(ring_cells("qcell", "r0", "r1")))
                .join(t, F.col("cell") == F.col("tcell"))
                .select("qid", "qlat", "qlon", "tid", "tlat", "tlon"))
        batch = cand if results is None else results.unionByName(cand)
        results = batch.localCheckpoint(eager=True)
        counts = results.groupBy("qid").agg(F.count("*").alias("n"))
        # a query finishes once it has >= k candidates AND its last gathered
        # ring exceeded (first-k ring + 1); with geometric ring growth the
        # +1 guard ring is always inside the next batch, so finish = n >= k
        # after gathering one extra round
        done_ids = counts.filter(F.col("n") >= k).select("qid")
        nxt = pending.join(done_ids, "qid", "left_anti")
        if nxt.isEmpty():
            break
        width = 2 ** (rnd + 1)
        pending = nxt.withColumn("r0", F.col("r1") + 1) \
                     .withColumn("r1", F.col("r1") + F.lit(width))
    if results is None:
        return queries.sparkSession.createDataFrame(
            [], f"qid long, tid long, dist double, rank int")
    dist = haversine_expr(F.col("qlat"), F.col("tlat"), F.col("qlon"), F.col("tlon"))
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("tid").asc())
    return (results.dropDuplicates(["qid", "tid"]).withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "tid", "dist", "rank"))


def haversine_expr(lat0, lat1, lon0, lon1):
    """Column-expression haversine, R=6372800 (terrain_tools.py:14-23)."""
    R = 6372800.0
    dlat = F.radians(lat1 - lat0)
    dlon = F.radians(lon1 - lon0)
    a = F.sin(dlat / 2) ** 2 + F.cos(F.radians(lat0)) * F.cos(F.radians(lat1)) * F.sin(dlon / 2) ** 2
    return R * 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
