"""Zone property tables (SURVEY.md §2.4 A1-A4, J6) — the reference's
pickle-dumped dict-of-arrays become plain DataFrames.

Heavy per-zone numerics (A2's bin geometry + curve fits) run inside
``applyInPandas`` keyed by zone — zones are independent, so this is the
embarrassingly-parallel shape; outputs are flat columns plus array columns
for the ragged per-zone arrays (position/d2c/width), exactly the reference's
property bag. scipy is absent from this environment, so ``curve_fit`` of the
relief shape is replaced by a deterministic bounded grid+Gauss-Newton least
squares over the same [1,5]^2 box (same model, same fallback to [1,1]).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNDEF = -9999.0


# ------------------------------------------------- scalar shape fns (§2.8)

def frelief(x, a, b):
    """terrain_tools.py:42-43: 1-(1-x^a)^b."""
    return 1.0 - (1.0 - x ** a) ** b


def frelief_inv(x, a, b):
    """terrain_tools.py:45-46."""
    return (1.0 - (1.0 - x) ** (1.0 / b)) ** (1.0 / a)


def fwidth(x, a):
    """terrain_tools.py:48-49: 1 + a*x."""
    return 1.0 + a * x


def fit_frelief(x: np.ndarray, y: np.ndarray,
                bounds=(1.0, 5.0), grid: int = 21) -> tuple[float, float]:
    """Deterministic bounded least-squares fit of frelief (replaces
    scipy.optimize.curve_fit at terrain_tools.py:615, bounds [1,5]^2):
    coarse grid scan then Gauss-Newton refinement projected to the box.
    Any numerical failure falls back to (1, 1) like the reference's
    except-branch (:616-617)."""
    try:
        lo, hi = bounds
        gs = np.linspace(lo, hi, grid)
        best, best_sse = (1.0, 1.0), np.inf
        for a in gs:
            for b in gs:
                r = frelief(x, a, b) - y
                sse = float(np.dot(r, r))
                if sse < best_sse:
                    best_sse, best = sse, (float(a), float(b))
        a, b = best
        for _ in range(25):  # Gauss-Newton
            u = np.clip(x, 1e-12, 1.0)
            inner = np.clip(1.0 - u ** a, 1e-12, 1.0)
            f = 1.0 - inner ** b
            r = f - y
            # d f / d a = b * inner^(b-1) * u^a * ln(u)
            dfda = b * inner ** (b - 1.0) * (u ** a) * np.log(u)
            dfdb = -(inner ** b) * np.log(inner)
            J = np.stack([dfda, dfdb], axis=1)
            JTJ = J.T @ J + 1e-9 * np.eye(2)
            step = np.linalg.solve(JTJ, J.T @ r)
            a = float(np.clip(a - step[0], lo, hi))
            b = float(np.clip(b - step[1], lo, hi))
            if np.linalg.norm(step) < 1e-10:
                break
        return a, b
    except Exception:
        return 1.0, 1.0


# ----------------------------------------------------------------------- A1

def basin_properties(cells: DataFrame, zone_col: str = "basins",
                     covariate_cols: list[str] | None = None) -> DataFrame:
    """A1 ``calculate_basin_properties_updated`` (terrain_tools.py:340-392):
    per-basin means of every covariate ignoring -9999, plus area = res^2 *
    count (res^2 carried in an 'area' column if present). Single hash agg."""
    covariate_cols = covariate_cols or [
        c for c in cells.columns if c not in ("i", "j", "tile_i", "tile_j", zone_col)]
    aggs = [F.count("*").alias("n_cells")]
    for c in covariate_cols:
        aggs.append(F.avg(F.when(F.col(c) != UNDEF, F.col(c))).alias(f"mean_{c}"))
    return (cells.filter(F.col(zone_col) > 0)
            .groupBy(F.col(zone_col).alias("basin")).agg(*aggs))


# ----------------------------------------------------------------------- A4

def channel_properties(cells: DataFrame, res: float,
                       channel_col: str = "channels",
                       slope_col: str = "slope") -> DataFrame:
    """A4 ``calculate_channel_properties`` (terrain_tools.py:1634-1664):
    per-channel mean slope + length = count*res, constant manning/width/
    bankfull placeholders (:1652-1656)."""
    return (cells.filter(F.col(channel_col) > 0)
            .groupBy(F.col(channel_col).alias("channel"))
            .agg(F.avg(F.when(F.col(slope_col) != UNDEF, F.col(slope_col))).alias("slope"),
                 (F.count("*") * res).alias("length"))
            .withColumn("manning", F.lit(0.03))
            .withColumn("width", F.lit(1.0))
            .withColumn("bankfull", F.lit(1.0)))


# ----------------------------------------------------------------------- A2

_HP_GEO_SCHEMA = (
    "hid long, width_intercept double, width_slope double,"
    " relief_a double, relief_b double, length double, area double,"
    " relief double, position_array array<double>, d2c_array array<double>,"
    " width_array array<double>"
)

_HP_MEAN_COLS = ["latitude", "longitude", "dem", "aspect", "tas", "prec",
                 "slope"]
_HP_PELLETIER = ["uhrt", "uhst", "lt_uvt", "ul_mask"]


def _bbox_window_means(cells: DataFrame, src: DataFrame, hillslope_col: str,
                       mean_cols: list[str], tile: int | None = None) -> DataFrame:
    """Per-hillslope covariate means over the hillslope's full BOUNDING-BOX
    window — including other hillslopes' and unlabeled cells — masked only
    against -9999, exactly like the reference's
    ``tmp[var][imin:imax+1, jmin:jmax+1]`` slices (terrain_tools.py:634-639).

    x/y_aspect reproduce the reference quirk of applying sin/cos BEFORE the
    -9999 mask (:398-400): undef-aspect cells leak sin(-9999)/cos(-9999)
    into the means, because the mask tests the TRIG value against -9999.

    Join strategy: each bbox explodes to the cells of a BUCKET grid sized to
    the observed bbox extent (side = next pow2 of the mean bbox side,
    clamped to [8, 8192]); cells key into their own bucket straight from
    (i, j), and the join is a bucket equi-join + exact range filter. Join
    output is Σ bbox areas rounded up to bucket granularity — independent
    of the STORAGE tile size, which is the trap this replaces: joining on
    (tile_i, tile_j) costs O(#zones × tile_area) when bboxes are much
    smaller than a tile (measured 12× superlinear at 4096²/512: 750k
    hillslope bboxes × 262k-cell tiles ≈ 2·10¹¹ pre-filter rows). Deriving
    buckets from (i, j) also works on filtered/non-dense cell tables — no
    tile inference, nothing to validate. The bbox side is broadcast when
    its estimated exploded size is small; above that the join shuffles on
    the bucket key (the 100 TB shape: both sides hash-partition on bucket).
    ``tile``, when given, only caps the bucket side.
    """
    bbox = (src.groupBy(F.col(hillslope_col).alias("hid"))
            .agg(F.min("i").alias("i0"), F.max("i").alias("i1"),
                 F.min("j").alias("j0"), F.max("j").alias("j1")))
    in_box = ((F.col("i") >= F.col("i0")) & (F.col("i") <= F.col("i1"))
              & (F.col("j") >= F.col("j0")) & (F.col("j") <= F.col("j1")))
    # aspect is needed even when not a requested mean (x/y_aspect aggs)
    want = ["i", "j"] + [c for c in dict.fromkeys([*mean_cols, "aspect"])
                         if c in cells.columns]
    st = bbox.agg(
        F.count("*").alias("n"),
        F.avg(F.col("i1") - F.col("i0") + 1).alias("si"),
        F.avg(F.col("j1") - F.col("j0") + 1).alias("sj")).collect()[0]
    n_box = int(st["n"] or 0)
    side = max(float(st["si"] or 1.0), float(st["sj"] or 1.0), 1.0)
    b = 1 << max(3, int(np.ceil(np.log2(side))))
    b = min(b, 8192, int(tile) if tile else 8192)
    covered = bbox.withColumn(
        "bi", F.explode(F.sequence((F.col("i0") / b).cast("int"),
                                   (F.col("i1") / b).cast("int")))
    ).withColumn(
        "bj", F.explode(F.sequence((F.col("j0") / b).cast("int"),
                                   (F.col("j1") / b).cast("int"))))
    est = n_box * (float(st["si"] or 1.0) / b + 2) * (float(st["sj"] or 1.0) / b + 2)
    right = F.broadcast(covered) if est <= 2_000_000 else covered
    joined = (cells.select((F.col("i") / b).cast("int").alias("bi"),
                           (F.col("j") / b).cast("int").alias("bj"), *want)
              .join(right, ["bi", "bj"])
              .filter(in_box))
    aggs = []
    for c in mean_cols:
        out_name = "slope_mean" if c == "slope" else c
        if c not in cells.columns:
            aggs.append(F.lit(float(UNDEF)).alias(out_name))
            continue
        aggs.append(F.coalesce(
            F.avg(F.when(F.col(c) != UNDEF, F.col(c))),
            F.lit(float(UNDEF))).alias(out_name))
    if "aspect" in cells.columns:
        for out_name, trig in (("x_aspect", F.sin), ("y_aspect", F.cos)):
            v = trig(F.col("aspect"))
            aggs.append(F.coalesce(F.avg(F.when(v != UNDEF, v)),
                                   F.lit(float(UNDEF))).alias(out_name))
    else:
        aggs += [F.lit(float(UNDEF)).alias("x_aspect"),
                 F.lit(float(UNDEF)).alias("y_aspect")]
    return joined.groupBy("hid").agg(*aggs)


def hillslope_geo_kernel(pdf: pd.DataFrame, res: float,
                         hillslope_col: str = "hillslopes") -> pd.DataFrame:
    """One hillslope's bin geometry + width/relief fits
    (terrain_tools.py:437-617) — the shared numpy kernel: the distributed
    operator runs it per group via grouped_map, and the serial golden twin
    (oracle/gate_twins.py) runs it per hillslope on the driver. Rows are
    sorted to (i, j) scan order first — the reference's boolean-mask order
    — so every float reduction is bit-deterministic regardless of Arrow
    arrival order."""
    pdf = pdf.sort_values(["i", "j"], kind="stable")
    uh = int(pdf[hillslope_col].iloc[0])
    sd2c = pdf["hand"].to_numpy(np.float64)
    sslope = pdf["slope"].to_numpy(np.float64)
    m = np.ones(len(pdf), dtype=bool)

    nc = min(25, int(np.ceil(m.sum() * res ** 2 / 8100.0)))
    nc = min(nc, np.unique(sd2c[m]).size)
    if nc > 1:
        tmp_sorted = np.sort(sd2c[m])
        stride = int(np.ceil(float(tmp_sorted.size) / (nc + 1)))
        bin_edges = tmp_sorted[np.arange(0, tmp_sorted.size, stride)]
        cls = np.digitize(sd2c[m], bin_edges)
    else:
        cls = np.ones(m.sum(), dtype=np.int64)

    slope_b, d2c_b, area_b = [], [], []
    for cl in np.unique(cls):
        m1 = cls == cl
        if not m1.any():
            continue
        slope_b.append(np.mean(sslope[m1]))
        d2c_b.append(np.mean(sd2c[m1]))
        area_b.append(res ** 2 * np.sum(m1))
    order = np.argsort(d2c_b, kind="stable")
    s = np.array(slope_b)[order]
    d2c = np.array(d2c_b)[order]
    area = np.array(area_b)[order]
    s[s == 0] = 1e-4

    length, slopes, hand, position = [], [], [], []
    r = pos = 0.0
    for k in range(d2c.size):
        if k == 0:
            l = d2c[k] / s[k]
            slp = s[k]
            hand.append(l * slp / 2)
            r = l * slp
            pos = l / 2
        else:
            slp = (s[k] + s[k - 1]) / 2
            l = (d2c[k] - r) / slp
            hand.append(r + l * slp / 2)
            r = r + l * slp
            pos = pos + l / 2
        slopes.append(slp)
        position.append(pos)
        length.append(l)
    length = np.array(length)
    slopes = np.array(slopes)
    position = np.array(position)
    hand = np.array(hand)
    if (np.min(length) == 0.0) or (np.max(hand) == 0.0):
        hand = np.array([0.5, 1.5])
        length = np.array([10.0, 10.0])
        slopes = np.array([0.1, 0.1])
        position = np.array([5.0, 15.0])
        area = np.array([900.0, 900.0])

    width = area / length
    position_e = np.array([0.0, *position, length[-1] / 2])
    w = np.array([width[0], *width, width[-1]])
    d2c_e = np.array([0.0, *hand, hand[-1]])
    relief = d2c_e[-1]
    position_e = position_e / np.sum(length)
    d2c_n = d2c_e / relief

    if d2c_n.size == 3:
        fw = [0.0, 1.0]
        fr = (1.0, 1.0)
    else:
        weights = np.cos(np.linspace(-np.pi / 4, np.pi / 4, position_e.size - 2))
        weights = weights / np.sum(weights)
        tmp = w / np.max(w)
        w[tmp > 100] = 100 * tmp[tmp > 100]
        z = np.polyfit(position_e[1:-1], w[1:-1], 1, w=weights)
        fw = [z[0] / z[1], 1.0]
        fw[0] = min(fw[0], 99.0)
        fw[0] = max(fw[0], -0.99)
        if d2c_n[1:-1].size > 10:
            fr = fit_frelief(position_e[1:-1], d2c_n[1:-1])
        else:
            fr = (1.0, 1.0)

    return pd.DataFrame([{
        "hid": uh,
        "width_intercept": fw[1], "width_slope": fw[0],
        "relief_a": fr[0], "relief_b": fr[1],
        "length": float(np.sum(length)), "area": float(np.sum(area)),
        "relief": float(relief),
        "position_array": position_e.tolist(),
        "d2c_array": d2c_n.tolist(),
        "width_array": w.tolist(),
    }])



def hillslope_properties(cells: DataFrame, res: float,
                         hillslope_col: str = "hillslopes",
                         covariates: list[str] | None = None,
                         tile: int | None = None) -> DataFrame:
    """A2 ``calculate_hillslope_properties_updated``
    (terrain_tools.py:394-668) as a grouped-map kernel — the reference's
    biggest function, run verbatim-in-semantics per hillslope:

    - covariate means over the hillslope's full BBOX window ignoring -9999
      (:634-639, see _bbox_window_means — includes neighboring hillslopes'
      cells, reproduced deliberately), aspect to cartesian (:398-400),
      Pelletier covariates (uhrt/uhst/lt_uvt/ul_mask, :403-406) carried
      through when present so hru_properties can take the upland branch
    - HAND equal-frequency binning, nc = min(25, area/8100, #distinct) (:437-444)
    - per-bin mean slope / mean d2c / area, sorted by d2c (:455-470)
    - trapezoid walk -> per-bin length, position, mid-HAND (:477-516)
    - QC fallback to the canonical 2-bin hillslope (:513-518 semantics:
      zero length or zero relief)
    - width = area/length; weighted linear width fit (np.polyfit, cosine
      weights, :589-599), slope clamped to [-0.99, 99] (:600-601)
    - relief curve frelief fit over [1,5]^2, fallback [1,1] (:611-617)
    """
    if covariates is None:
        covariates = [c for c in (*_HP_MEAN_COLS, *_HP_PELLETIER)
                      if c in cells.columns]
    need = ["i", "j", hillslope_col, "hand", "slope"]
    # undefined-HAND cells cannot enter the bin geometry (the reference's
    # rasters carry valid HAND on every hillslope cell; ours may not at the
    # ocean boundary)
    src = cells.filter((F.col(hillslope_col) > 0)
                       & (F.col("hand") != UNDEF)
                       & (F.col("slope") != UNDEF)).select(*need)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        return hillslope_geo_kernel(pdf, res, hillslope_col)
    from .grouped import grouped_map
    geo = grouped_map(src, [hillslope_col], kern, schema=_HP_GEO_SCHEMA)
    mean_cols = list(dict.fromkeys(
        [*_HP_MEAN_COLS, *[c for c in covariates if c in cells.columns]]))
    means = _bbox_window_means(
        cells, cells.filter(F.col(hillslope_col) > 0), hillslope_col,
        mean_cols, tile=tile)
    out = geo.join(means, "hid", "left")
    # hillslopes filtered out of `means` (none, normally) keep UNDEF
    fill_cols = (["slope_mean" if c == "slope" else c for c in mean_cols]
                 + ["x_aspect", "y_aspect"]
                 + [c for c in _HP_PELLETIER if c not in mean_cols])
    for c in fill_cols:
        if c in out.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(float(UNDEF))))
        else:
            out = out.withColumn(c, F.lit(float(UNDEF)))
    return out


# ----------------------------------------------------------------------- A3

def hru_properties(cells: DataFrame, hp: DataFrame, res: float,
                   hillslope_col: str = "hillslopes",
                   tile_col: str = "tile", hru_col: str = "hru",
                   hand_col: str = "hand",
                   slope_col: str = "slope") -> DataFrame:
    """A3 ``calculate_hru_properties_updated`` (terrain_tools.py:1181-1313).

    Stage 1 (distributed): per-HRU area/slope + 10-bin HAND histogram ->
    ECDF arrays, -9999 HAND mean-imputed (:1216-1229), inside applyInPandas.
    Stage 2 (distributed): hillslope geometric association — normalized
    relief segments via frelief_inv, per-segment length/hand/width,
    hillslope & overall fractions, and the Pelletier-2016 upland/lowland
    soil-depth rule (:1294-1307) — as a grouped map over hillslope keys with
    the (small) hillslope property table broadcast-joined in; cell-count
    fractions stay a DataFrame (count agg -> broadcast join), and the driver
    touches exactly one scalar (fsum, the fraction mass covered by hp). At
    continental scale (10^6+ hillslopes) nothing per-hillslope collects to
    the driver.
    """
    # callers typically pass an unmaterialized multi-way join; it is scanned
    # three times below (per-HRU stage, hillslope counts, base join) —
    # materialize once (maps to reading the committed table at production)
    cells = cells.localCheckpoint(eager=True)
    src = cells.filter(F.col(hru_col) > 0).select(
        "i", "j", hru_col, hillslope_col, tile_col, hand_col, slope_col)

    _base_schema = ("hru long, hillslope_id long, tile_id long, area double, "
                    "hillslope_slope double, hand_ecdf array<double>, "
                    "hand_bedges array<double>")

    # stage 1 runs as ONE numpy pass per partition (sort by hru, slice per
    # group): with 10^5+ HRUs, per-group pandas machinery (groupby slices +
    # one-row DataFrames) costs 10x the actual numerics
    def stage1(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if not len(pdf):
            return
        # (hru, i, j) scan order: per-group float means become
        # bit-deterministic regardless of Arrow arrival order (and match
        # the serial golden twin in oracle/gate_twins.py)
        order = np.lexsort((pdf["j"].to_numpy(), pdf["i"].to_numpy(),
                            pdf[hru_col].to_numpy()))
        hru = pdf[hru_col].to_numpy(np.int64)[order]
        hand = pdf[hand_col].to_numpy(np.float64)[order]
        slope = pdf[slope_col].to_numpy(np.float64)[order]
        hsv = pdf[hillslope_col].to_numpy(np.float64)[order]
        tlv = pdf[tile_col].to_numpy(np.float64)[order]
        uh, starts = np.unique(hru, return_index=True)
        ends = np.append(starts[1:], hru.size)
        out = {"hru": [], "hillslope_id": [], "tile_id": [], "area": [],
               "hillslope_slope": [], "hand_ecdf": [], "hand_bedges": []}
        for g in range(uh.size):
            s, e = starts[g], ends[g]
            h = hand[s:e].copy()
            ok = h != UNDEF
            h[~ok] = np.mean(h[ok]) if ok.any() else 0.0
            hist, bedges = np.histogram(h, bins=10)
            ecdf = np.cumsum(hist).astype(np.float64)
            ecdf = ecdf / ecdf[-1]
            out["hru"].append(int(uh[g]))
            out["hillslope_id"].append(int(np.mean(hsv[s:e])))
            out["tile_id"].append(int(np.mean(tlv[s:e])))
            out["area"].append(float(res ** 2 * (e - s)))
            out["hillslope_slope"].append(float(np.mean(slope[s:e])))
            out["hand_ecdf"].append(np.append(np.zeros(1), ecdf).tolist())
            out["hand_bedges"].append(bedges.tolist())
        yield pd.DataFrame(out)

    base = src.repartition(hru_col).mapInPandas(stage1, schema=_base_schema)

    # hillslope fractions of total cell count (:1184-1190) — stays a
    # DataFrame end-to-end (one count agg / total-scalar crossJoin /
    # broadcast join); 10^6+ hillslopes never pass through the driver. The
    # ONLY driver-side value is fsum, a single scalar.
    hs_counts = cells.groupBy(F.col(hillslope_col).alias("hillslope_id")) \
                     .agg(F.count("*").alias("_n"))
    tot = hs_counts.agg(F.sum("_n").alias("_tot"))
    hs_frac = (hs_counts.filter(F.col("hillslope_id") > 0)
               .crossJoin(F.broadcast(tot))
               .select("hillslope_id",
                       (F.col("_n") / F.col("_tot")).alias("_hp_cellfrac")))
    fsum = (hs_frac.join(hp.select(F.col("hid").alias("hillslope_id")),
                         "hillslope_id", "left_semi")
            .agg(F.sum("_hp_cellfrac")).first()[0]) or 0.0

    hp_cols = ["relief_a", "relief_b", "relief", "length", "width_slope"]
    hp_opt = [c for c in ("ul_mask", "lt_uvt", "uhst", "uhrt") if c in hp.columns]
    hp_side = hp.select(F.col("hid").alias("hillslope_id"),
                        *[F.col(c).alias(f"_hp_{c}") for c in hp_cols + hp_opt])
    joined = (base.join(F.broadcast(hp_side), "hillslope_id", "left")
              .join(F.broadcast(hs_frac), "hillslope_id", "left"))

    out_cols = ["hillslope_length", "hillslope_hand", "hillslope_position",
                "hillslope_width", "hillslope_frac", "soil_depth",
                "depth_to_bedrock", "frac"]

    def pell(pdf: pd.DataFrame, name: str, default: float) -> float:
        """Pelletier covariate with lowland-constant fallback when the
        column is absent or carries -9999 (no Pelletier rasters supplied)."""
        col = f"_hp_{name}"
        if col not in pdf:
            return default
        v = float(pdf[col].iloc[0])
        return default if (np.isnan(v) or v == UNDEF) else v

    ordered = ["hru", "hillslope_id", "tile_id", "area", "hillslope_slope",
               "hand_ecdf", "hand_bedges"] + out_cols

    def assoc(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        for c in out_cols:
            out[c] = np.zeros(len(out))
        if pd.isna(pdf["_hp_relief_a"].iloc[0]):  # hillslope absent from hp
            return out[ordered]
        tids, idx = np.unique(pdf["tile_id"].to_numpy(np.int64), return_inverse=True)
        areas_all = pdf["area"].to_numpy(np.float64)
        nrelief = np.linspace(0, 1, 2 * tids.size + 1)[0::2]
        a, b = float(pdf["_hp_relief_a"].iloc[0]), float(pdf["_hp_relief_b"].iloc[0])
        hlen, relief = float(pdf["_hp_length"].iloc[0]), float(pdf["_hp_relief"].iloc[0])
        length = hlen * (frelief_inv(nrelief[1:], a, b)
                         - frelief_inv(nrelief[:-1], a, b))
        hand = relief * (nrelief[:-1] + nrelief[1:]) / 2
        pos_v = frelief_inv(nrelief, a, b)
        p0 = float(pdf["_hp_width_slope"].iloc[0])
        width = (fwidth(pos_v[1:], p0) + fwidth(pos_v[:-1], p0)) / 2
        frac = (width * length) / np.sum(width * length)
        positions = np.linspace(0, 1, 2 * tids.size + 1)[1::2]
        out["hillslope_length"] = length[idx]
        out["hillslope_hand"] = hand[idx]
        out["hillslope_position"] = positions[idx]
        out["hillslope_width"] = width[idx]
        tile_area_sums = np.zeros(tids.size)
        np.add.at(tile_area_sums, idx, areas_all)
        hfrac_rows = frac[idx] * areas_all / tile_area_sums[idx]
        out["hillslope_frac"] = hfrac_rows
        cf = pdf["_hp_cellfrac"].iloc[0]
        cf = 0.0 if pd.isna(cf) else float(cf)
        hfrac = (cf / fsum) if fsum else 0.0
        out["frac"] = hfrac * hfrac_rows
        # Pelletier 2016 upland/lowland rule (:1294-1307)
        ul = pell(pdf, "ul_mask", 2.0)
        lt_uvt = pell(pdf, "lt_uvt", 4.0)
        if ul >= 1.5:  # lowland
            soil = 2.0
            sed = max(lt_uvt - soil, 0.0)
            soil_depth = soil * np.ones(tids.size)
            dtb = (soil + sed) * np.ones(tids.size)
        else:  # upland
            soil_depth = np.linspace(2.0, pell(pdf, "uhst", 2.0), tids.size)
            dtb = np.linspace(lt_uvt, pell(pdf, "uhrt", 4.0), tids.size)
        out["soil_depth"] = soil_depth[idx]
        out["depth_to_bedrock"] = dtb[idx]
        return out[ordered]

    out_schema = (_base_schema + ", hillslope_length double, hillslope_hand double,"
                  " hillslope_position double, hillslope_width double,"
                  " hillslope_frac double, soil_depth double,"
                  " depth_to_bedrock double, frac double")
    from .grouped import grouped_map
    return grouped_map(joined, ["hillslope_id"], assoc, schema=out_schema)


# ----------------------------------------------------------------------- A7

def create_nd_histogram(cells: DataFrame, covs: list[dict],
                        hillslope_col: str = "hillslope") -> DataFrame:
    """A7 N-D histogram HRU builder, operator form (terrain_tools.py:
    789-859; the trailing ``cleanup_hillslopes`` dense relabel,
    terrain_tools.f90:1604-1650, nets to identity on the already-dense
    global ids, and the reference's +1/-1 pair cancels).

    ``cells``: (i, j, <hillslope_col>, covariate columns). ``covs``:
    ORDERED list of ``{"col", "nbins", "type"}`` — the reference iterates a
    py2 dict; covariate order is made explicit here. 'p'-type covariates
    are percentile-transformed per hillslope (``tmp[argsort] =
    linspace(0,1,n)``) before binning, exactly like the reference.

    Returns (hillslope, i, j, hru) for valid cells (hillslope and every
    covariate != -9999): global hru ids 1..K assigned to NON-EMPTY bins in
    (ascending hillslope, C-order flat bin) order — the reference's global
    ``icluster`` scan. Exact-edge cells resolve to the upper bin, which is
    both np.histogramdd's count bin and the reference's
    last-matching-bounds overwrite winner.

    Plan shape: hillslopes are independent (per-hillslope percentiles and
    min/max), so the cell pass is ONE grouped map keyed by hillslope (the
    same applyInPandas shape as A2/A3); the kernel re-sorts its group by
    (i, j) so the value sequence — and therefore np.argsort's permutation,
    even under ties — matches the reference's C-order ``data[mask]``
    extraction bit-for-bit. The global id table is one window over the
    DISTINCT (hillslope, bin) rows (#hillslopes x prod(nbins) at most, tiny
    next to the cell table) broadcast-joined back, so cells shuffle exactly
    once, on the hillslope key the semantics force."""
    from pyspark.sql.window import Window

    names = [c["col"] for c in covs]
    nbins = [int(c["nbins"]) for c in covs]
    kinds = [c["type"] for c in covs]
    valid = cells.filter(F.col(hillslope_col) != UNDEF)
    for n in names:
        valid = valid.filter(F.col(n) != UNDEF)
    hty = dict(cells.dtypes)[hillslope_col]

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["i", "j"], kind="stable")
        flat = np.zeros(len(pdf), dtype=np.int64)
        for n, nb, kind in zip(names, nbins, kinds):
            x = pdf[n].to_numpy(np.float64).copy()
            if kind == "p":
                order = np.argsort(x)
                x[order] = np.linspace(0, 1, x.size)
            smin, smax = float(np.min(x)), float(np.max(x))
            if smin == smax:        # histogramdd's degenerate-range rule
                smin, smax = smin - 0.5, smax + 0.5
            edges = np.linspace(smin, smax, nb + 1)
            k = np.searchsorted(edges, x, side="right") - 1
            k[x == edges[-1]] = nb - 1   # rightmost bin closed
            flat = flat * nb + k
        return pd.DataFrame({
            hillslope_col: pdf[hillslope_col].to_numpy(),
            "i": pdf["i"].to_numpy(np.int64),
            "j": pdf["j"].to_numpy(np.int64),
            "bin": flat})

    binned = (valid.select(hillslope_col, "i", "j", *names)
              .groupBy(hillslope_col)
              .applyInPandas(kern, schema=f"{hillslope_col} {hty}, "
                                          "i long, j long, bin long"))
    # two-level seq_ids (operators/seq.py): the distinct bin table is
    # bounded by #hillslopes x prod(nbins) — small today, but at 100x it is
    # exactly the 3M-row relabel that must not cross one reducer
    from .seq import seq_ids
    ids = seq_ids(binned.select(hillslope_col, "bin").distinct(),
                  [hillslope_col, "bin"], "hru", start=1)
    return (binned.join(F.broadcast(ids), [hillslope_col, "bin"], "inner")
            .drop("bin"))


# ----------------------------------------------------------------------- J6

def polygon_adjacency(cells: DataFrame, polygon_col: str = "polygon",
                      cluster_col: str | None = None) -> dict[str, DataFrame]:
    """J6 ``compute_polygon_info`` (terrain_tools.f90:1804-1857, wrapper
    terrain_tools.py:1590-1632): 4-neighbor shifted self-joins emit
    (polygon, polygon) contact pairs + per-polygon centroids; optional
    (cluster, cluster) contact pairs when a cluster map is supplied.

    Pure DataFrame: one shuffle per axis shift (Catalyst merges them), one
    groupBy for centroids — no stencil kernel needed for 1-cell adjacency.
    """
    p = cells.filter(F.col(polygon_col) > 0).select(
        "i", "j", F.col(polygon_col).alias("pid"),
        *([F.col(cluster_col).alias("cid")] if cluster_col else []))
    edges = None
    for di, dj in ((0, 1), (1, 0)):
        shifted = p.select((F.col("i") + di).alias("i"), (F.col("j") + dj).alias("j"),
                           F.col("pid").alias("pid2"),
                           *([F.col("cid").alias("cid2")] if cluster_col else []))
        e = (p.join(shifted, ["i", "j"])
             .filter(F.col("pid") != F.col("pid2")))
        edges = e if edges is None else edges.unionByName(e)
    pairs = (edges.select(F.least("pid", "pid2").alias("pid_a"),
                          F.greatest("pid", "pid2").alias("pid_b")).distinct())
    centroids = p.groupBy("pid").agg(
        F.avg("i").alias("ci"), F.avg("j").alias("cj"),
        F.count("*").alias("n_cells"))
    out = {"edges": pairs, "centroids": centroids}
    if cluster_col:
        out["cluster_edges"] = (edges
                                .filter(F.col("cid") != F.col("cid2"))
                                .select(F.least("cid", "cid2").alias("cid_a"),
                                        F.greatest("cid", "cid2").alias("cid_b"))
                                .distinct())
    return out


def curate_hru_properties(hru_props: pd.DataFrame, hp: pd.DataFrame) -> pd.DataFrame:
    """M7 ``curate_hru_properties`` (terrain_tools.py:1524-1579) — driver-side
    (both tables are per-zone summaries, tiny by construction).

    Per hillslope: rebuild tile geometry from the fitted hillslope shape —
    equal-length segments (:1539), linear width line 1 -> rwidth (:1540-1541),
    area-fraction correction ``sqrt(f1/f0)`` on length and width (:1551-1553),
    positions = cumsum - first/2 (:1554), elevations = slope * position
    (:1555), per-HRU top/bottom widths split by intra-tile area fractions
    (:1559-1568). Requires hru_props columns (hillslope_id, tile_id, area,
    depth2channel) and hp columns (hid, length, rwidth, slope).
    Adds/overwrites hillslope_length, slope, depth2channel,
    hillslope_position, width_top, width_bottom, wspec.
    """
    out = hru_props.copy()
    for col in ["hillslope_length", "slope", "depth2channel",
                "hillslope_position", "width_top", "width_bottom", "wspec"]:
        if col not in out:
            out[col] = 0.0
    out["wspec"] = 0.0
    for _, hrow in hp.iterrows():
        hid = int(hrow["hid"])
        m = (out["hillslope_id"] == hid).to_numpy()
        if not m.any():
            continue
        d2c, idx = np.unique(out.loc[m, "depth2channel"].to_numpy(),
                             return_inverse=True)
        n = d2c.size
        hlength = hrow["length"] / n * np.ones(n)
        width = np.linspace(1.0, hrow["rwidth"], n + 1)
        w0 = (width[1:] + width[:-1]) / 2
        f0 = hlength * w0 / np.sum(hlength * w0)
        tids_all = out.loc[m, "tile_id"].to_numpy()
        areas = out.loc[m, "area"].to_numpy()
        f1 = []
        for tid in np.unique(tids_all):
            m1 = tids_all == tid
            f1.append(np.sum(areas[m1] / np.sum(areas)))
        f1 = np.array(f1)
        r = np.sqrt(f1 / f0)
        hlength = r * hlength
        w1 = r * w0
        hpos = np.cumsum(hlength) - hlength[0] / 2
        helev = hrow["slope"] * hpos
        slope = hrow["slope"] * np.ones(n)
        twidth = w1 / w0 * width[1:]
        bwidth = w1 / w0 * width[:-1]
        utids = np.unique(tids_all)
        t1, b1 = [], []
        for it in range(utids.size):
            m1 = tids_all == utids[it]
            f = areas[m1] / np.sum(areas[m1])
            t1 += list(twidth[it] * f)
            b1 += list(bwidth[it] * f)
        wspec = (np.array(t1) + np.array(b1)) / 2
        out.loc[m, "hillslope_length"] = hlength[idx]
        out.loc[m, "slope"] = slope[idx]
        out.loc[m, "depth2channel"] = helev[idx]
        out.loc[m, "hillslope_position"] = hpos[idx]
        out.loc[m, "width_top"] = twidth[idx]
        out.loc[m, "width_bottom"] = bwidth[idx]
        out.loc[m, "wspec"] = wspec
    return out
