"""Golden-twin SQL for the terrain gate entries.

The four terrain gate queries run the DISTRIBUTED chain (G1 fill -> G3 D8
-> G4 acc -> G6-G8 channels -> G9 basins -> G11/G12 HAND/MFD) on the 48x48
fixture DEM. Their DuckDB twins cannot recompute that chain in SQL (the
fixture has seeded numpy noise and the operators are iterative), so the
twin VALUES are computed HERE by the independent single-node numpy
reference oracle (``geospatialtools_spark/oracle/terrain.py`` — the same
authority the golden pytest suite checks bit-for-bit against the
reference Fortran semantics, planchon_2001.f90 / terrain_tools.f90).

The comparison the gate then performs is real and two-sided: Spark's
distributed tile-iterative implementation vs the reference's sequential
whole-grid recursion, value-hashed per row. DuckDB is only the transport
for the reference side's rows.

Float policy: aggregate columns are rounded exactly the way the Spark
query rounds (HALF_UP at the same scale, via Decimal on the shortest
repr — the same algorithm Spark's ``round`` applies to doubles) and
emitted with ``repr``, so both engines parse the identical double.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

_MEMO: dict = {}


def _sround(x: float, scale: int) -> float:
    q = Decimal("1." + "0" * scale) if scale else Decimal("1")
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _golden_tables() -> dict[str, pd.DataFrame]:
    """Numpy reference chain on the 48x48 gate fixture -> the four
    aggregate tables the gate queries emit. Memoized (one fixture)."""
    if "tables" in _MEMO:
        return _MEMO["tables"]
    from ..fixtures import make_dem
    from . import terrain as T

    meta, dem, mask = make_dem(nx=48, ny=48, tile=48)
    res = 30.0
    th, bth = res * res * 20, res * res * 5
    filled = T.planchon_fill(dem, res)
    area, fdir = T.d8_acc(filled, mask, res)
    channels, _wob, _topo = T.calculate_channels_wocean_wprop(area, th, bth, fdir, mask)
    basins = T.delineate_basins(channels, mask, fdir)
    hand = T.calculate_depth2channel(channels, mask.copy(), fdir, filled, leak=False)
    mfd = T.mfd_acc(filled, res, 1.0)
    hand_mfd = T.depth2channel_mfd(channels, mask, filled, res)

    land = mask > 0
    out: dict[str, pd.DataFrame] = {}

    # terrain_fill_acc: accumulation-area decade histogram + total fill lift
    lift = _sround(np.sum(filled.astype(np.float64)[land] - dem.astype(np.float64)[land]), 2)
    a = area[land].astype(np.float64)
    dec = np.floor(np.log10(np.where(a > 0, a, np.nan)))
    vals, cnts = np.unique(dec[~np.isnan(dec)], return_counts=True)
    out["terrain_fill_acc"] = pd.DataFrame({
        "area_decade": vals.astype(np.int64), "n_cells": cnts.astype(np.int64),
        "fill_lift_total": lift})

    # terrain_channels: per-segment counts + mean accumulation area
    cmask = channels > 0
    t = (pd.DataFrame({"segment": channels[cmask].astype(np.int64),
                       "area": area[cmask].astype(np.float64)})
         .groupby("segment")
         .agg(n_cells=("area", "size"), mean_area=("area", "mean")).reset_index())
    t["mean_area"] = t["mean_area"].map(lambda x: _sround(x, 2))
    out["terrain_channels"] = t

    # terrain_mfd: per-HAND-band counts of MFD accumulation area
    hm = hand_mfd.astype(np.float64)
    band = np.where(hm == -9999, -1, np.minimum(np.floor(hm / 10), 9)).astype(np.int64)
    t = (pd.DataFrame({"hand_band": band.ravel(),
                       "mfd_area": mfd.astype(np.float64).ravel()})
         .groupby("hand_band")
         .agg(n_cells=("mfd_area", "size"), mean_mfd_area=("mfd_area", "mean"))
         .reset_index())
    t["mean_mfd_area"] = t["mean_mfd_area"].map(lambda x: _sround(x, 2))
    out["terrain_mfd"] = t

    # terrain_pipeline: per-basin counts + mean HAND over defined cells
    bmask = basins > 0
    t = pd.DataFrame({"basin": basins[bmask].astype(np.int64),
                      "hand": hand.astype(np.float64)[bmask]})

    def _mean_hand(g: pd.Series):
        v = g[g > -9999]
        return _sround(v.mean(), 4) if len(v) else None

    t = (t.groupby("basin")
         .agg(n_cells=("hand", "size"), mean_hand=("hand", _mean_hand))
         .reset_index())
    out["terrain_pipeline"] = t
    _MEMO["tables"] = out
    return out


_HEADER = ("-- golden twin: rows computed by the independent numpy reference\n"
           "-- oracle (geospatialtools_spark/oracle/terrain.py) on the same\n"
           "-- 48x48 fixture; DuckDB transports the reference side's values.\n")


def _values_sql(pdf: pd.DataFrame, types: dict[str, str]) -> str:
    def lit(v, ty):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "NULL"
        return repr(float(v)) if ty == "DOUBLE" else str(int(v))

    cols = list(pdf.columns)
    rows = ", ".join(
        "(" + ", ".join(lit(r[c], types[c]) for c in cols) + ")"
        for _, r in pdf.iterrows())
    sel = ", ".join(f"CAST({c} AS {types[c]}) AS {c}" for c in cols)
    return (f"{_HEADER}SELECT {sel} FROM (VALUES {rows}) "
            f"AS t({', '.join(cols)})")


def terrain_twin_sql() -> dict[str, str]:
    tabs = _golden_tables()
    types = {
        "terrain_fill_acc": {"area_decade": "BIGINT", "n_cells": "BIGINT",
                             "fill_lift_total": "DOUBLE"},
        "terrain_channels": {"segment": "BIGINT", "n_cells": "BIGINT",
                             "mean_area": "DOUBLE"},
        "terrain_mfd": {"hand_band": "BIGINT", "n_cells": "BIGINT",
                        "mean_mfd_area": "DOUBLE"},
        "terrain_pipeline": {"basin": "BIGINT", "n_cells": "BIGINT",
                             "mean_hand": "DOUBLE"},
    }
    return {k: _values_sql(tabs[k], types[k]) for k in types}
