"""Bit-for-bit golden parity: Spark terrain operators vs the numpy oracle
(BASELINE.json north_star correctness gate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatialtools_spark.grid import cells_df, collect_dense
from geospatialtools_spark.oracle import terrain as T
from geospatialtools_spark.operators import terrain as ST
from tests.conftest import BTH, RES, TH


@pytest.fixture(scope="module")
def base_cells(spark, grid32, golden32):
    meta, dem, mask = grid32
    cells = cells_df(
        spark, meta,
        dem=golden32["filled"].astype(np.float64),
        rawdem=dem.astype(np.float64),
        mask=mask.astype(np.int64),
        dx=np.full(dem.shape, RES), dy=np.full(dem.shape, RES),
    ).localCheckpoint()
    return cells


@pytest.fixture(scope="module")
def fdir_df(base_cells, grid32):
    meta, _, _ = grid32
    return ST.d8_flow_direction(base_cells, meta, RES).localCheckpoint()


@pytest.fixture(scope="module")
def full_df(base_cells, fdir_df, grid32, spark, golden32):
    meta, dem, mask = grid32
    acc = ST.flow_accumulation(fdir_df, meta, RES,
                               mask_df=base_cells.select("i", "j", "mask"))
    full = (fdir_df.join(base_cells.select("i", "j", "mask", "dem"), ["i", "j"])
            .join(acc.select("i", "j", "area"), ["i", "j"])).localCheckpoint()
    return full


def test_planchon(spark, grid32, golden32):
    meta, dem, mask = grid32
    cells = cells_df(spark, meta, dem=dem.astype(np.float64))
    filled = ST.planchon_fill(cells, meta, RES)
    got = collect_dense(meta, filled, "demns")
    assert np.array_equal(got, golden32["filled"])


def test_slope_aspect(base_cells, grid32, golden32):
    meta, _, _ = grid32
    out = ST.slope_aspect(base_cells, meta)
    assert np.array_equal(collect_dense(meta, out, "slope"), golden32["slope"])
    assert np.array_equal(collect_dense(meta, out, "aspect"), golden32["aspect"])


def test_fdir(fdir_df, grid32, golden32):
    meta, _, _ = grid32
    fi = collect_dense(meta, fdir_df, "fi", fill=-9999, dtype=np.int32)
    fj = collect_dense(meta, fdir_df, "fj", fill=-9999, dtype=np.int32)
    assert np.array_equal(fi, golden32["fdir"][:, :, 0])
    assert np.array_equal(fj, golden32["fdir"][:, :, 1])


def test_accumulation(full_df, grid32, golden32):
    meta, _, _ = grid32
    area = collect_dense(meta, full_df, "area")
    assert np.array_equal(area, golden32["area"])


def test_channels_and_topology(full_df, grid32, golden32):
    meta, _, _ = grid32
    chdf, topodf = ST.channel_segments(full_df, meta, TH, BTH)
    ch = collect_dense(meta, chdf, "channels", fill=-9999, dtype=np.int64)
    wob = collect_dense(meta, chdf, "channels_wob", fill=-9999, dtype=np.int64)
    assert np.array_equal(ch, golden32["channels"])
    assert np.array_equal(wob, golden32["channels_wob"])
    got = {r["cid"]: r["downstream"] for r in topodf.collect()}
    want = {k + 1: int(v) for k, v in enumerate(golden32["topology"]) if v != -9999}
    assert got == want


@pytest.fixture(scope="module")
def with_channels(full_df, spark, grid32, golden32):
    meta, _, _ = grid32
    chdf = cells_df(spark, meta, channels=golden32["channels"])
    return full_df.join(chdf.select("i", "j", "channels"), ["i", "j"]).localCheckpoint()


def test_basins(with_channels, grid32, golden32):
    meta, _, _ = grid32
    out = ST.delineate_basins(with_channels, meta)
    got = collect_dense(meta, out, "basins", fill=-9999, dtype=np.int64)
    assert np.array_equal(got, golden32["basins"])


def test_hand(with_channels, grid32, golden32):
    meta, _, _ = grid32
    out = ST.depth2channel(with_channels, meta)
    got = collect_dense(meta, out, "hand")
    assert np.array_equal(got, golden32["hand"])


def test_hillslopes(with_channels, grid32, golden32):
    meta, _, _ = grid32
    out = ST.delineate_hillslopes(with_channels, meta)
    got = collect_dense(meta, out, "hillslopes", fill=-9999, dtype=np.int64)
    assert np.array_equal(got, golden32["hillslopes"])


def test_rasterize_paths_match_oracle(spark, grid32):
    """S11/J2 flagship burn: BOTH strategies (broadcast mapInPandas and
    tile-cogroup) bit-equal to the numpy rasterize oracle, and pip_join's
    two paths agree row-for-row."""
    from geospatialtools_spark import fixtures
    from geospatialtools_spark.operators import rasterize as OR
    from geospatialtools_spark.oracle import rasterize as R
    meta, dem, mask = grid32
    polys_pdf = fixtures.make_polygons(meta)
    want = R.rasterize(meta, polys_pdf).astype(np.float64)
    cells = cells_df(spark, meta, dem=dem.astype(np.float64))
    polys = spark.createDataFrame(polys_pdf)
    for mbp in (10000, 0):  # broadcast path / cogroup path
        out = OR.rasterize(cells, polys, meta, max_broadcast_polys=mbp)
        got = collect_dense(meta, out, "attr", fill=-9999, dtype=np.float64)
        assert np.array_equal(got, want), f"max_broadcast_polys={mbp}"
        if mbp:  # broadcast path adds ZERO exchanges over its input plan
            plan = out._jdf.queryExecution().executedPlan().toString()
            base = (cells.select("tile_i", "tile_j", "i", "j")
                    ._jdf.queryExecution().executedPlan().toString())
            assert plan.count("Exchange") == base.count("Exchange"), plan
    # pip_join path equality on cell-center points
    import pandas as pd
    ii, jj = np.meshgrid(np.arange(meta.nx), np.arange(meta.ny), indexing="ij")
    cx, cy = meta.cell_center_xy(ii.ravel(), jj.ravel())
    pts = spark.createDataFrame(pd.DataFrame(
        {"pt_id": np.arange(cx.size), "lat": cy, "lon": cx}))
    a = (OR.pip_join(pts, polys, meta).toPandas()
         .sort_values("pt_id").reset_index(drop=True))
    b = (OR.pip_join(pts, polys, meta, max_broadcast_polys=0).toPandas()
         .sort_values("pt_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_polygonize(spark, grid32):
    from geospatialtools_spark import fixtures
    from geospatialtools_spark.oracle import rasterize as R
    meta, dem, mask = grid32
    burned = R.rasterize(meta, fixtures.make_polygons(meta))
    want = T.polygonize(burned)
    cells = cells_df(spark, meta, value=burned.astype(np.float64))
    got_df = ST.polygonize(cells, meta, "value")
    got = collect_dense(meta, got_df, "polygon", fill=-9999, dtype=np.float64)
    assert np.array_equal(got, want)


def test_gap_fill(spark, grid32, golden32):
    meta, dem, mask = grid32
    ch = golden32["channels"]
    rng = np.random.RandomState(0)
    hrus = rng.randint(1, 5, size=ch.shape).astype(np.int64)
    hrus[mask == 0] = -9999
    want = T.gap_fill_hrus(hrus, ch)
    cells = cells_df(spark, meta, hru=hrus, channels=ch)
    out = ST.gap_fill_hrus(cells, meta)
    got = collect_dense(meta, out, "hru_filled", fill=-9999, dtype=np.int64)
    assert np.array_equal(got, want)


def test_prescribed_fdir_accumulation(spark, grid32, golden32):
    """G4: accumulation with an ArcGIS-prescribed fdir (F6 pathway).

    Codes derive from the golden D8 fdir (guaranteed acyclic) so the
    ArcGIS-code round-trip (terrain_tools.py:1666-1697) and the prescribed
    accumulation (terrain_tools.f90:253-301) are both exercised exactly.
    """
    meta, dem, mask = grid32
    g = golden32["fdir"]
    code_of = {(0, 1): 1, (1, 1): 2, (1, 0): 4, (1, -1): 8,
               (0, -1): 16, (-1, -1): 32, (-1, 0): 64, (-1, 1): 128}
    codes = np.zeros(dem.shape, dtype=np.int32)
    for i in range(meta.nx):
        for j in range(meta.ny):
            fi, fj = int(g[i, j, 0]), int(g[i, j, 1])
            if fi != -9999:
                codes[i, j] = code_of.get((fi - i, fj - j), 0)
    fdir = T.transform_arcgis_fdir(codes)
    want = T.d8_acc_pfdir(golden32["filled"], mask, RES, fdir)
    cells = cells_df(spark, meta,
                     fi=fdir[:, :, 0].astype(np.int64), fj=fdir[:, :, 1].astype(np.int64))
    acc = ST.flow_accumulation(cells, meta, RES,
                               mask_df=cells_df(spark, meta, mask=mask.astype(np.int64))
                               .select("i", "j", "mask"))
    got = collect_dense(meta, acc, "area")
    assert np.array_equal(got, want)


def test_mfd_accumulation(spark, grid32, golden32):
    """G5c distributed MFD == oracle bit-for-bit (float32)."""
    meta, dem, mask = grid32
    cells = cells_df(spark, meta, dem=golden32["filled"].astype(np.float64))
    out = ST.mfd_accumulation(cells, meta, RES, p=1.0)
    got = collect_dense(meta, out, "mfd_area")
    assert np.array_equal(got, golden32["mfd"])


def test_acc_neighbors(spark, grid32, golden32):
    """G5b one-step inflow sum == oracle bit-for-bit."""
    meta, dem, mask = grid32
    rng = np.random.RandomState(9)
    var = rng.rand(meta.nx, meta.ny).astype(np.float32).astype(np.float64)
    cells = cells_df(spark, meta, dem=golden32["filled"].astype(np.float64),
                     v=var)
    out = ST.acc_neighbors(cells, meta, RES, "v")
    got = collect_dense(meta, out, "inflow_sum")
    want = T.d8_acc_neighbors(golden32["filled"], RES, var)
    assert np.array_equal(got, want)


def test_seeded_accumulation(spark, fdir_df, grid32, golden32):
    """G5 seeded counts: acc(v) = #seeds upstream (incl. v)."""
    meta, dem, mask = grid32
    rng = np.random.RandomState(5)
    seeds = (rng.rand(meta.nx, meta.ny) < 0.1).astype(np.int64)
    sdf = cells_df(spark, meta, seed=seeds)
    fdir_seeded = fdir_df.join(sdf.select("i", "j", "seed"), ["i", "j"])
    out = ST.flow_accumulation(fdir_seeded, meta, RES, base_col="seed")
    got = collect_dense(meta, out, "acc", fill=0, dtype=np.int64)
    # numpy oracle: push seed counts down the fdir graph topologically
    fdir = golden32["fdir"]
    want = T._upstream_counts(fdir) * 0  # shape
    # brute-force: follow each seed's path
    want = seeds.copy()
    for i in range(meta.nx):
        for j in range(meta.ny):
            if not seeds[i, j]:
                continue
            ci, cj = i, j
            for _ in range(meta.nx * meta.ny):
                fi, fj = int(fdir[ci, cj, 0]), int(fdir[ci, cj, 1])
                if fi == -9999 or not (0 <= fi < meta.nx and 0 <= fj < meta.ny):
                    break
                want[fi, fj] += 1
                ci, cj = fi, fj
    m = golden32["fdir"][:, :, 0] != -9999
    assert np.array_equal(got[m], want[m])


def test_depth2channel_mfd(spark, grid32, golden32):
    """G12 distributed MFD HAND == new oracle bit-for-bit."""
    meta, dem, mask = grid32
    want = T.depth2channel_mfd(golden32["channels"], mask, golden32["filled"], RES)
    cells = cells_df(spark, meta, dem=golden32["filled"].astype(np.float64),
                     channels=golden32["channels"].astype(np.int64),
                     mask=mask.astype(np.int64))
    out = ST.depth2channel_mfd(cells, meta, RES)
    got = collect_dense(meta, out, "hand_mfd")
    assert np.array_equal(got, want)


def test_remove_pits_simple(spark, grid32):
    """G2: pit-free under the oracle's slope criterion; close to the serial
    oracle (raise-order effects bounded by one minslope step)."""
    meta, dem, mask = grid32
    want = T.remove_pits_simple(dem, RES)
    cells = cells_df(spark, meta, dem=dem.astype(np.float64))
    out = ST.remove_pits_simple(cells, meta, RES)
    got = collect_dense(meta, out, "demns")
    d32 = dem.astype(np.float32)
    valid = d32 != np.float32(-9999)
    assert (got[valid] >= d32[valid]).all()          # only raised
    assert np.allclose(got[valid], want[valid], atol=5 * 0.01 * RES)
    # oracle pit criterion holds everywhere on the result
    for i in range(1, meta.nx - 1):
        for j in range(1, meta.ny - 1):
            if got[i, j] == np.float32(-9999):
                continue
            slopes = []
            for (k, l) in T.P8:
                length = T.DIAG * np.float32(RES) if (k + l) in (-2, 0, 2) else np.float32(RES)
                slopes.append((got[i, j] - got[i + k, j + l]) / length)
            assert max(slopes) > 0, (i, j)
