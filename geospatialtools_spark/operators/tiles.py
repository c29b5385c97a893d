"""Elevation-tile creators (SURVEY.md §2.10 M7): HAND binning into tiles per
hillslope / basin-cluster, with the reference's exact edge rules, sequential
global numbering, and dense cleanup relabel.

Distribution: every creator is per-zone-independent -> grouped-map kernels
keyed by the zone, plus one window cumsum for the reference's sequential
global ids (its ``count`` variable walking zones in ascending order) and a
final dense relabel (A5 ``cleanup_hillslopes``, terrain_tools.f90:1604-1650)
as rank expressions. Normalizations that cross the whole zone (per-basin max
HAND, cluster-mean max relief) are window aggregations (W3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNDEF = -9999.0


def dense_relabel(df: DataFrame, col: str, out_col: str | None = None,
                  start: int = 1) -> DataFrame:
    """A5 ``cleanup_hillslopes``: drop empty ids, relabel to start..K in
    ascending id order (terrain_tools.f90:1604-1650; the Python wrappers add
    +1, terrain_tools.py:888-890)."""
    out_col = out_col or col
    from .seq import seq_ids
    distinct = df.select(F.col(col).alias("_old")).filter(F.col("_old") != UNDEF).distinct()
    relabel = seq_ids(distinct, ["_old"], "_new", start=start)
    return (df.join(F.broadcast(relabel), df[col] == relabel["_old"], "left")
            .withColumn(out_col, F.coalesce(F.col("_new"), F.lit(int(UNDEF))).cast("long"))
            .drop("_old", "_new"))


def create_hillslope_tiles(cells: DataFrame, nbins: dict[int, int],
                           hillslope_col: str = "hillslopes",
                           hand_col: str = "hand") -> DataFrame:
    """M7 ``create_hillslope_tiles`` (terrain_tools.py:861-890).

    Per hillslope h: percent-rank transform of HAND (argsort -> linspace,
    ties broken by scan order, :873-875), equal-width histogram into
    nbins[h] bins over [0, 1], edge cells fall to the UPPER bin (the
    reference's loop re-assigns ``>=`` edges last-wins, :879-882), then the
    global dense cleanup. Returns (i, j, tile).
    """
    base = cells.filter(F.col(hillslope_col) != UNDEF)
    masked = base.filter(F.col(hand_col) != UNDEF)
    w = Window.partitionBy(hillslope_col).orderBy(hand_col, "i", "j")
    n = Window.partitionBy(hillslope_col)
    # tmp = (rank-1)/(count-1), exactly linspace(0,1,size)[argsort-position]
    tmp = ((F.row_number().over(w) - 1) /
           F.when(F.count("*").over(n) > 1, F.count("*").over(n) - 1).otherwise(F.lit(1)))
    nb_map = F.create_map(*[F.lit(x) for kv in nbins.items() for x in kv])
    nb = nb_map[F.col(hillslope_col).cast("int")]
    bin_idx = F.least(F.floor(tmp * nb), nb - 1).cast("long")
    # reference semantics (:867,884): cells outside the mask (or hillslopes
    # without a bin count) KEEP their hillslope id in the cluster map and
    # take part in the dense cleanup
    binned = masked.withColumn(
        "tile_raw", F.when(nb.isNotNull(), bin_idx + 1)
                     .otherwise(F.col(hillslope_col)))
    rest = (base.filter(F.col(hand_col) == UNDEF)
            .withColumn("tile_raw", F.col(hillslope_col).cast("long")))
    tiled = binned.select("i", "j", "tile_raw").unionByName(
        rest.select("i", "j", "tile_raw"))
    return dense_relabel(tiled, "tile_raw", "tile").select("i", "j", "tile")


def create_hillslope_tiles_updated(cells: DataFrame, hp: DataFrame,
                                   hillslope_col: str = "hillslopes",
                                   hand_col: str = "hand") -> DataFrame:
    """M7 ``create_hillslope_tiles_updated`` (terrain_tools.py:892-953).

    J9 broadcast lookup of per-hillslope relief (:895-899) normalizes HAND,
    clamps at 1 (:907-909); new_hand = relief * normalized; per hillslope
    the relief axis splits at nhand = relief*linspace(0,1,2*nbins+1)[0::2]
    with first bin ``<= nhand[1]``, middle ``(nhand[i], nhand[i+1]]``, last
    ``> nhand[nbins-1]`` (:936-946); then dense cleanup. Returns
    (i, j, tile, new_hand).

    ``hp`` needs (hid, relief, nbins).
    """
    look = hp.select(F.col("hid").alias(hillslope_col),
                     F.col("relief").alias("_relief"),
                     F.col("nbins").alias("_nb"))
    src = (cells.filter((F.col(hillslope_col) != UNDEF) & (F.col(hand_col) != UNDEF))
           .join(F.broadcast(look), hillslope_col))
    nrel = F.least(F.col(hand_col) / F.col("_relief"), F.lit(1.0))
    new_hand = F.col("_relief") * nrel
    # bin k (0-based) <=> new_hand in (relief*k/nb, relief*(k+1)/nb], first
    # bin absorbs everything below, last everything above
    u = nrel * F.col("_nb")
    bin_idx = F.greatest(F.lit(0), F.least(F.ceil(u) - 1, F.col("_nb") - 1)).cast("long")
    tiled = src.withColumn("tile_raw", bin_idx + 1).withColumn("new_hand", new_hand)
    out = dense_relabel(tiled.select("i", "j", "tile_raw", "new_hand"),
                        "tile_raw", "tile")
    return out.select("i", "j", "tile", "new_hand")


def create_basin_tiles(cells: DataFrame, dh: float,
                       cluster_col: str = "basin_cluster",
                       basin_col: str = "basins",
                       hand_col: str = "hand") -> DataFrame:
    """M7 ``create_basin_tiles`` (terrain_tools.py:955-1021).

    Per basin: normalize HAND by the basin max (W3 window, :973-983,
    nan->0); per basin-cluster: rescale by the cluster-mean max relief
    (:985-989), curate -9999 to the cluster max (:993-995), power-law edges
    ``linspace(0, max^(1/2.5), nbins+1)**2.5`` with nbins = ceil(max/dh)
    (:997-1002), first bin closed, later bins (lo, hi] (:1010-1012);
    SEQUENTIAL global tile ids over non-empty bins in (cluster, bin)
    ascending order (:1013-1018). Returns (i, j, tile, tile_position,
    new_hand = per-tile mean scaled HAND).

    The per-cluster binning runs densely in a grouped kernel (clusters
    contain whole basins, so the normalization is self-contained); the
    global numbering is a window cumsum over per-cluster non-empty-bin
    counts — no driver loop.
    """
    src = cells.filter((F.col(cluster_col) != UNDEF) & (F.col(basin_col) != UNDEF))
    wb = Window.partitionBy(basin_col)
    db = F.max(F.when(F.col(hand_col) != UNDEF, F.col(hand_col))).over(wb)
    normed = F.when(F.col(hand_col) == UNDEF, F.lit(UNDEF)) \
        .otherwise(F.coalesce(F.nanvl(F.col(hand_col) / db, F.lit(0.0)), F.lit(0.0)))
    staged = src.select(
        "i", "j", F.col(cluster_col).alias("ubc"),
        normed.alias("nhand"),
        F.coalesce(db, F.lit(0.0)).alias("maxhand"))  # all-undef basin -> 0

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        hand = pdf["nhand"].to_numpy(np.float64).copy()
        # cluster-average max relief rescale (:985-989)
        val = float(np.mean(pdf["maxhand"].to_numpy(np.float64)))
        ok = hand != UNDEF
        hand[ok] = val * hand[ok]
        mx = np.max(hand[ok]) if ok.any() else 0.0
        hand[~ok] = mx
        nbins = max(int(np.ceil(mx / dh)), 1)
        pedges = 2.5
        edges = np.linspace(0.0, mx ** (1.0 / pedges), nbins + 1) ** pedges
        local = np.zeros(len(hand), dtype=np.int64)
        for b in range(nbins):
            if b == 0:
                m2 = (hand >= edges[b]) & (hand <= edges[b + 1])
            else:
                m2 = (hand > edges[b]) & (hand <= edges[b + 1])
            local[m2] = b
        return pd.DataFrame({
            "i": pdf["i"], "j": pdf["j"], "ubc": pdf["ubc"],
            "local_bin": local, "scaled_hand": hand,
        })

    binned = (staged.groupBy("ubc")
              .applyInPandas(kern, schema="i int, j int, ubc long, "
                                          "local_bin long, scaled_hand double"))
    # sequential ids over NON-EMPTY (cluster, bin) pairs in ascending order
    # (two-level seq_ids, operators/seq.py — no single-partition window)
    from .seq import seq_ids
    occupied = binned.select("ubc", "local_bin").distinct()
    wclu = Window.partitionBy("ubc").orderBy("local_bin")
    numbering = (seq_ids(occupied, ["ubc", "local_bin"], "tile", start=0)
                 .withColumn("tile_position", F.row_number().over(wclu) - 1))
    out = binned.join(F.broadcast(numbering), ["ubc", "local_bin"])
    wt = Window.partitionBy("tile")
    return (out.withColumn("new_hand", F.avg("scaled_hand").over(wt))
            .select("i", "j", F.col("tile").cast("long"),
                    F.col("tile_position").cast("long"), "new_hand"))
