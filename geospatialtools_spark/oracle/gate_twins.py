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


def _zone_arrays() -> dict:
    """The 32x32 zone fixture chain (same arrays __spark_entry__'s
    _terrain_zone_cells feeds Spark), computed by the numpy reference
    oracle. Memoized."""
    if "zone" in _MEMO:
        return _MEMO["zone"]
    from ..fixtures import make_covariates, make_dem
    from . import terrain as T

    meta, dem, mask = make_dem(nx=32, ny=32, tile=16)
    res = 30.0
    filled = T.planchon_fill(dem, res)
    area, fdir = T.d8_acc(filled, mask, res)
    slope, _aspect = T.slope_aspect(filled, np.full_like(dem, res), np.full_like(dem, res))
    ch, _wob, _topo = T.calculate_channels_wocean_wprop(
        area, res * res * 20, res * res * 5, fdir, mask)
    basins = T.delineate_basins(ch, mask, fdir)
    hand = T.calculate_depth2channel(ch, mask.copy(), fdir, filled, leak=False)
    hs = T.delineate_hillslopes(ch, area, fdir, mask)
    cov = make_covariates(meta, dem, mask)
    z = {"meta": meta, "dem": filled.astype(np.float64), "mask": mask,
         "basins": basins.astype(np.int64), "hillslopes": hs.astype(np.int64),
         "hand": hand.astype(np.float64), "slope": slope.astype(np.float64),
         "tas": cov["tas"].astype(np.float64), "prec": cov["prec"].astype(np.float64)}
    _MEMO["zone"] = z
    return z


def _tiles_percell(ntiles: int):
    """Serial replica of create_tiles_kmeans (M2, terrain_tools.py:727-787)
    over the zone fixture: per-basin min-max normalize -> k-means (the
    shared deterministic math kernel, fed in the reference's (i, j) scan
    order) -> global offsets in ascending basin order -> dense relabel.
    A DISTRIBUTION twin: the math kernel is shared with the Spark operator,
    so what this checks is the distributed orchestration — group routing,
    per-basin offsets, the dense relabel, and the final counts.
    Returns (ii, jj, tile) for the basins>0 cells in (i, j) order."""
    from ..operators.clustering import fit_kmeans_fixed, predict_kmeans

    z = _zone_arrays()
    b = z["basins"]
    sel = b > 0
    ii, jj = np.nonzero(sel)  # row-major == ascending (i, j)
    zone = b[sel]
    X_all = np.stack([z["tas"][sel], z["prec"][sel], z["hand"][sel]], axis=1)
    raw = np.empty(zone.size, dtype=np.int64)
    off = 0
    for zb in np.unique(zone):
        m = zone == zb
        X = X_all[m].astype(np.float64).copy()
        for c in range(X.shape[1]):
            lo, hi = X[:, c].min(), X[:, c].max()
            X[:, c] = (X[:, c] - lo) / (hi - lo) if hi > lo else 0.0
        nc = min(ntiles, X.shape[0])
        if nc > 1:
            labels = predict_kmeans(X, fit_kmeans_fixed(X, nc))
        else:
            labels = np.zeros(X.shape[0], dtype=np.int64)
        raw[m] = labels + off
        off += int(labels.max()) + 1
    uniq = np.unique(raw)
    dense = {int(v): k for k, v in enumerate(uniq)}
    tile = np.array([dense[int(v)] for v in raw], dtype=np.int64)
    return ii, jj, tile


def _tiles_kmeans_table() -> pd.DataFrame:
    _, _, tile = _tiles_percell(3)
    return (pd.DataFrame({"tile": tile})
            .groupby("tile").size().rename("n_cells").reset_index())


def _reduce_basins_table() -> pd.DataFrame:
    """Independent reimplementation of the A9 merge loop
    (terrain_tools.py:293-338 semantics, written against the reference —
    NOT the operators/clustering.py code): repeatedly merge one of the 10
    smallest basins into its downstream neighbor, choosing the merge that
    minimizes the area standard deviation (the candidate row itself stays
    in the std computation, and on std ties the first candidate in
    smallest-area order whose std equals the minimum wins — both reference
    quirks). Input mirrors the gate query: per-basin cell counts * 900 as
    area, downstream pointer = next basin id cyclically, last -> outlet."""
    z = _zone_arrays()
    b = z["basins"]
    ids = np.unique(b[b > 0])
    counts = {int(v): int((b == v).sum()) for v in ids}
    n = ids.size
    goal = max(2, n // 2)
    basins = [{"id": int(v), "nid": int(ids[(k + 1) % n]), "area": counts[int(v)] * 900.0}
              for k, v in enumerate(ids)]
    basins[-1]["nid"] = -9998
    final = {e["id"]: e["id"] for e in basins}
    while len(basins) > goal:
        order = sorted(range(len(basins)), key=lambda k: (basins[k]["area"], k))[:10]
        stds, valid = [], []
        for k in order:
            merged = [e["area"] + (basins[k]["area"] if e["id"] == basins[k]["nid"] else 0.0)
                      for e in basins]
            stds.append(float(np.std(np.array(merged))))
            valid.append(basins[k]["nid"] >= 0)
        if not any(valid):
            break
        best = min(s for s, v in zip(stds, valid) if v)
        k = order[stds.index(best)]  # first in smallest-area order == reference
        victim = basins[k]
        for e in basins:
            if e["id"] == victim["nid"]:
                e["area"] += victim["area"]
        for kk, v in final.items():
            if v == victim["id"]:
                final[kk] = victim["nid"]
        for e in basins:
            if e["nid"] == victim["id"]:
                e["nid"] = victim["nid"]
        basins.pop(k)
    survivors = sorted(set(final.values()))
    dense = {s: k + 1 for k, s in enumerate(survivors)}
    return pd.DataFrame({"old_basin": list(final.keys()),
                         "new_basin": [dense[v] for v in final.values()]})


def _hillslope_geo_raw() -> pd.DataFrame:
    """The shared geometry kernel (zones.hillslope_geo_kernel) run per
    hillslope on the driver in ascending-hid order — unrounded."""
    if "hgeo" in _MEMO:
        return _MEMO["hgeo"]
    from ..operators.zones import hillslope_geo_kernel

    z = _zone_arrays()
    hs, hand, slope = z["hillslopes"], z["hand"], z["slope"]
    sel = (hs > 0) & (hand != -9999.0) & (slope != -9999.0)
    ii, jj = np.nonzero(sel)
    pdf = pd.DataFrame({"i": ii, "j": jj, "hillslopes": hs[sel],
                        "hand": hand[sel], "slope": slope[sel]})
    geo = pd.concat([hillslope_geo_kernel(g, 30.0)
                     for _, g in pdf.groupby("hillslopes", sort=True)],
                    ignore_index=True)
    _MEMO["hgeo"] = geo
    return geo


def _hillslope_props_table() -> pd.DataFrame:
    """Serial twin of the hillslope_props gate entry: the shared geometry
    kernel per hillslope, joined with an INDEPENDENT numpy implementation
    of the bbox-window covariate means (full bounding box, -9999-masked —
    terrain_tools.py:634-639)."""
    z = _zone_arrays()
    hs = z["hillslopes"]
    geo = _hillslope_geo_raw().copy()

    def bbox_mean(grid: np.ndarray, hid: int) -> float:
        w = hs == hid
        i0, i1 = np.nonzero(w.any(axis=1))[0][[0, -1]]
        j0, j1 = np.nonzero(w.any(axis=0))[0][[0, -1]]
        v = grid[i0:i1 + 1, j0:j1 + 1]
        v = v[v != -9999.0]
        return float(v.mean()) if v.size else -9999.0

    geo["dem"] = [ _sround(bbox_mean(z["dem"], h), 6) for h in geo["hid"]]
    geo["slope_mean"] = [_sround(bbox_mean(z["slope"], h), 6) for h in geo["hid"]]
    for c in ("width_slope", "relief_a", "relief_b"):
        geo[c] = geo[c].map(lambda x: _sround(x, 6))
    for c in ("length", "area", "relief"):
        geo[c] = geo[c].map(lambda x: _sround(x, 4))
    return geo[["hid", "dem", "slope_mean", "width_slope", "relief_a",
                "relief_b", "length", "area", "relief"]]


def _hru_props_table() -> pd.DataFrame:
    """Serial twin of the hru_props gate entry (A3 chain,
    terrain_tools.py:1023-1313): serial tiles (k=2) -> serial create_hrus
    (global-stat normalize + the shared M1 k-means kernel per
    (hillslope, tile) group in ascending group order, offsets =
    max(local)+1 cumsum, dense 1-based relabel) -> per-HRU stage-1
    reductions in (hru, i, j) scan order -> the hillslope association
    stage (frelief_inv segments, width/area fractions, Pelletier lowland
    defaults) against the unrounded serial hillslope geometry table."""
    from ..operators.clustering import cluster_data
    from ..operators.zones import frelief_inv, fwidth

    z = _zone_arrays()
    ii, jj, tile = _tiles_percell(2)
    hs = z["hillslopes"][ii, jj]
    m = (hs > 0) & (tile >= 0)
    df = pd.DataFrame({
        "i": ii[m], "j": jj[m], "hs": hs[m], "tl": tile[m],
        "hand": z["hand"][ii, jj][m], "slope": z["slope"][ii, jj][m],
        "tas": z["tas"][ii, jj][m], "prec": z["prec"][ii, jj][m],
    }).reset_index(drop=True)

    # create_hrus: global covariate stats (min/max exact across engines;
    # the mean only matters for -9999 imputation, absent on these cells)
    stats = {}
    for name in ("tas", "prec"):
        v = df[name].to_numpy(np.float64)
        v = v[v != -9999.0]
        stats[name] = (v.mean(), v.min(), v.max())
    raw = np.empty(len(df), dtype=np.int64)
    off = 0
    for _, g in df.groupby(["hs", "tl"], sort=True):
        X = g[["tas", "prec"]].to_numpy(np.float64).copy()
        for c, name in enumerate(("tas", "prec")):
            mean_v, lo, hi = stats[name]
            col = X[:, c]
            col[col == -9999.0] = mean_v
            X[:, c] = (col - lo) / (hi - lo) if hi > lo else np.zeros_like(col)
        labels = cluster_data(X, 2).astype(np.int64)
        raw[g.index.to_numpy()] = labels + off
        off += int(labels.max()) + 1
    uniq = np.unique(raw)
    df["hru"] = np.searchsorted(uniq, raw) + 1  # dense_rank, 1-based

    # hru_properties stage 1, rows in (hru, i, j) order
    df = df.sort_values(["hru", "i", "j"], kind="stable")
    rows = []
    for hru, g in df.groupby("hru", sort=True):
        rows.append({
            "hru": int(hru),
            "hillslope_id": int(np.mean(g["hs"].to_numpy(np.float64))),
            "tile_id": int(np.mean(g["tl"].to_numpy(np.float64))),
            "area": float(900.0 * len(g)),
            "hillslope_slope": float(np.mean(g["slope"].to_numpy(np.float64))),
        })
    base = pd.DataFrame(rows)

    # hillslope cell fractions + fsum over hillslopes present in hp
    counts = df.groupby("hs").size()
    tot = float(len(df))
    cellfrac = {int(h): float(n) / tot for h, n in counts.items() if h > 0}
    geo = _hillslope_geo_raw().set_index("hid")
    fsum = sum(f for h, f in sorted(cellfrac.items()) if h in geo.index)

    # association stage (zones.hru_properties assoc), per hillslope
    out_rows = []
    for hid, g in base.groupby("hillslope_id", sort=True):
        if hid not in geo.index:
            for _, r in g.iterrows():
                out_rows.append({**r, "soil_depth": 0.0, "frac": 0.0})
            continue
        hp = geo.loc[hid]
        tids, idx = np.unique(g["tile_id"].to_numpy(np.int64), return_inverse=True)
        areas_all = g["area"].to_numpy(np.float64)
        nrelief = np.linspace(0, 1, 2 * tids.size + 1)[0::2]
        a, b = float(hp["relief_a"]), float(hp["relief_b"])
        length = float(hp["length"]) * (frelief_inv(nrelief[1:], a, b)
                                        - frelief_inv(nrelief[:-1], a, b))
        pos_v = frelief_inv(nrelief, a, b)
        p0 = float(hp["width_slope"])
        width = (fwidth(pos_v[1:], p0) + fwidth(pos_v[:-1], p0)) / 2
        frac_seg = (width * length) / np.sum(width * length)
        tile_area_sums = np.zeros(tids.size)
        np.add.at(tile_area_sums, idx, areas_all)
        hfrac_rows = frac_seg[idx] * areas_all / tile_area_sums[idx]
        hfrac = (cellfrac.get(int(hid), 0.0) / fsum) if fsum else 0.0
        frac = hfrac * hfrac_rows
        # Pelletier lowland defaults (no Pelletier rasters in the fixture)
        for k, (_, r) in enumerate(g.iterrows()):
            out_rows.append({**r, "soil_depth": 2.0, "frac": float(frac[k])})
    out = pd.DataFrame(out_rows)
    out["hillslope_slope"] = out["hillslope_slope"].map(lambda x: _sround(x, 6))
    out["soil_depth"] = out["soil_depth"].map(lambda x: _sround(x, 4))
    out["frac"] = out["frac"].map(lambda x: _sround(x, 8))
    return out[["hru", "hillslope_id", "tile_id", "area",
                "hillslope_slope", "soil_depth", "frac"]]


def _nd_hist_table() -> pd.DataFrame:
    """A7 create_nd_histogram (terrain_tools.py:789-859) on the zone
    fixture, full per-cell expected labels from the numpy reference oracle.
    Covariate arrays are COPIED: the oracle's 'p'-type percentile transform
    mutates them in place (reference quirk) and _zone_arrays is shared by
    the other zone twins."""
    from . import terrain as T
    z = _zone_arrays()
    covs = [{"name": "tas", "data": z["tas"].copy(), "nbins": 3, "type": "p"},
            {"name": "prec", "data": z["prec"].copy(), "nbins": 2, "type": "n"}]
    hrus = T.create_nd_histogram(z["hillslopes"].astype(np.float64), covs)
    ii, jj = np.nonzero(hrus != T.IUNDEF)
    return pd.DataFrame({"i": ii.astype(np.int64), "j": jj.astype(np.int64),
                         "hru": hrus[ii, jj].astype(np.int64)})


def zone_twin_sql() -> dict[str, str]:
    return {
        "nd_hist_hrus": _values_sql(
            _nd_hist_table(),
            {"i": "BIGINT", "j": "BIGINT", "hru": "BIGINT"}),
        "tiles_kmeans": _values_sql(
            _tiles_kmeans_table(),
            {"tile": "BIGINT", "n_cells": "BIGINT"}),
        "reduce_basins": _values_sql(
            _reduce_basins_table(),
            {"old_basin": "BIGINT", "new_basin": "BIGINT"}),
        "hillslope_props": _values_sql(
            _hillslope_props_table(),
            {"hid": "BIGINT", "dem": "DOUBLE", "slope_mean": "DOUBLE",
             "width_slope": "DOUBLE", "relief_a": "DOUBLE",
             "relief_b": "DOUBLE", "length": "DOUBLE", "area": "DOUBLE",
             "relief": "DOUBLE"}),
        "hru_props": _values_sql(
            _hru_props_table(),
            {"hru": "BIGINT", "hillslope_id": "BIGINT", "tile_id": "BIGINT",
             "area": "DOUBLE", "hillslope_slope": "DOUBLE",
             "soil_depth": "DOUBLE", "frac": "DOUBLE"}),
    }


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
