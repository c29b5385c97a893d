"""Property/invariant tests of the numpy oracle itself (SURVEY.md §5.2 #4)."""

import numpy as np

from geospatialtools_spark import fixtures
from geospatialtools_spark.oracle import terrain as T
from geospatialtools_spark.oracle import rasterize as R

RES = 30.0


def test_planchon_monotone_and_drains(grid32):
    meta, dem, mask = grid32
    w = T.planchon_fill(dem, RES)
    live = dem != -9999
    assert np.all(w[live] >= dem[live])
    assert np.all(w[~live] == -9999)
    # every filled interior cell has a strictly-lower (by eps) neighbor path:
    # no cell except borders/undef-adjacent should be a pit
    fdir = T.d8_fdir(w, RES)
    interior = np.zeros_like(live)
    interior[1:-1, 1:-1] = True
    for (k, l) in T.P8:
        interior[1:-1, 1:-1] &= live[1 + k:dem.shape[0] - 1 + k, 1 + l:dem.shape[1] - 1 + l]
    pit = interior & live & (fdir[:, :, 0] == -9999)
    assert pit.sum() == 0


def test_accumulation_conservation(golden32, grid32):
    meta, dem, mask = grid32
    area, fdir = golden32["area"], golden32["fdir"]
    # counts: every cell contributes exactly 1 to each cell on its downstream
    # path including itself -> total count == sum over cells of path length;
    # weaker invariant: every defined area >= res^2 and multiples of res^2
    a = area[area != -9999]
    assert np.all(a >= np.float32(RES) ** 2)
    q = a / np.float32(RES) ** 2
    assert np.allclose(q, np.round(q))


def test_basins_constant_along_paths(golden32, grid32):
    meta, dem, mask = grid32
    basins, fdir, ch = golden32["basins"], golden32["fdir"], golden32["channels"]
    nx, ny = basins.shape
    for i in range(nx):
        for j in range(ny):
            if basins[i, j] > 0 and ch[i, j] <= 0:
                fi, fj = fdir[i, j]
                if 0 <= fi < nx and 0 <= fj < ny and ch[fi, fj] <= 0 and basins[fi, fj] > 0:
                    assert basins[i, j] == basins[fi, fj]


def test_hand_nonnegative(golden32):
    hand = golden32["hand"]
    h = hand[hand != -9999]
    assert np.all(h >= 0)


def test_hillslope_relabel_dense(golden32):
    hs = golden32["hillslopes"]
    ids = np.unique(hs[hs > 0])
    assert ids.min() >= 1
    # cleanup produced dense 0..K-1 then 0 means unlabeled; positive ids dense
    allids = np.unique(hs[hs >= 0])
    assert np.array_equal(allids, np.arange(allids.size))


def test_channels_topology_acyclic(golden32):
    topo = golden32["topology"]
    valid = {k + 1: int(v) for k, v in enumerate(topo) if v != -9999}
    for start in valid:
        seen, c = set(), start
        while c in valid and valid[c] != -1:
            assert c not in seen
            seen.add(c)
            c = valid[c]


def test_mfd_vs_d8_mass(golden32, grid32):
    meta, dem, mask = grid32
    mfd = golden32["mfd"]
    assert np.isfinite(mfd).all()
    assert np.all(mfd >= np.float32(RES) ** 2 * np.float32(0.99))


def test_rasterize_last_wins_and_center_rule(grid32):
    meta, dem, mask = grid32
    polys = fixtures.make_polygons(meta)
    burned = R.rasterize(meta, polys)
    # overlapping pair: polygon 5 burns after 4 -> overlap belongs to 5
    assert (burned == 15.0).sum() > 0
    # adjacent pair shares an edge: no cell may carry both attrs; total burn
    # of the two boxes equals sum of the half-open assignments
    assert ((burned == 12.0) & (burned == 13.0)).sum() == 0


def test_point_extraction_out_of_bounds(grid32):
    meta, dem, mask = grid32
    pts = fixtures.make_points(meta, n=200)
    vals = R.extract_point_data(meta, dem, pts["lat"].to_numpy(), pts["lon"].to_numpy())
    i, j = meta.point_to_ij(pts["lon"].to_numpy(), pts["lat"].to_numpy())
    oob = (i < 0) | (i >= meta.nx) | (j < 0) | (j >= meta.ny)
    assert np.all(vals[oob] == -9999)
    assert oob.sum() > 0


def test_time_average_blocks():
    s = fixtures.make_series(720)
    out = T.time_average(s, 30)
    assert out.shape == (30,)
    assert np.allclose(out[0], s[:24].sum() / 24)


def test_gap_fill_mode(golden32, grid32):
    meta, dem, mask = grid32
    ch = golden32["channels"]
    rng = np.random.RandomState(0)
    hrus = rng.randint(1, 5, size=ch.shape).astype(np.int64)
    hrus[mask == 0] = -9999
    out = T.gap_fill_hrus(hrus, ch)
    real = (ch > 0) & (ch < 999999)
    assert np.array_equal(out[~real], hrus[~real])


def test_hillslopes_walk_fast_equals_oracle():
    """The vectorized event-aggregation walk (operators/terrain.py:
    _hillslopes_walk_fast) must reproduce the sequential recursion
    bit-for-bit on every seed of a non-trivial grid."""
    import numpy as np

    from geospatialtools_spark import fixtures
    from geospatialtools_spark.operators.terrain import _hillslopes_walk_fast
    from geospatialtools_spark.oracle import terrain as OT

    for nx in (64, 96):
        meta, dem, mask = fixtures.make_dem(nx=nx, ny=nx, tile=nx // 2)
        res = 30.0
        filled = OT.planchon_fill(dem, res)
        area, fdir = OT.d8_acc(filled, mask, res)
        ch, _wob, _topo = OT.calculate_channels_wocean_wprop(
            area, res * res * 20, res * res * 5, fdir, mask)
        chp = np.where(ch > 0, ch, 0)
        a = area.astype(np.float32).copy()
        a[(mask <= 0) | (chp > 0)] = np.float32(-9999.0)
        n_seeds = 0
        while True:
            if a.max() == np.float32(-9999.0) or n_seeds >= 8:
                break
            seed = OT._argmax2d_fortran(a)
            lab_o, vis, n_o = OT.hillslopes_walk_single_seed(chp, fdir, mask, seed)
            lab_f, _, n_f = _hillslopes_walk_fast(chp, fdir, mask, seed)
            assert n_o == n_f, (nx, seed)
            assert np.array_equal(lab_o, lab_f), (nx, seed)
            a[vis] = np.float32(-9999.0)
            a[seed] = np.float32(-9999.0)
            n_seeds += 1
        assert n_seeds > 0


def test_channels_walk_iterative_equals_recursive():
    """The engine's channel walk runs on an explicit stack (a 10^6-cell
    network would blow any recursion limit). Parity proof: a test-local
    copy of the original recursive walk (the Fortran transcription,
    terrain_tools.f90:1172-1241) must produce identical labels, topology,
    and id counts on random DEM-derived networks — including the by-ref
    cid / locally-copied cid_org mutation quirks."""
    import sys

    from geospatialtools_spark import fixtures
    from geospatialtools_spark.oracle import terrain as OT

    def walk_recursive(area, fdir, cmask, seed, basin_threshold,
                       init_label=0, wprop=False):
        sys.setrecursionlimit(max(sys.getrecursionlimit(), 10 ** 6))
        nx, ny = area.shape
        channels = np.full((nx, ny), init_label, dtype=np.int64)
        topo = {}
        state = {"hcid": 0}
        bt = np.float32(basin_threshold)

        def upstream(i, j):
            out = []
            for (k, l) in OT.P8:
                inew, jnew = i + k, j + l
                if not (0 <= inew < nx and 0 <= jnew < ny):
                    continue
                if fdir[inew, jnew, 0] == i and fdir[inew, jnew, 1] == j:
                    out.append((inew, jnew))
            return out

        def walk(i, j, cid_box):
            cid_org_box = [cid_box[0]]
            count = 0
            for (inew, jnew) in upstream(i, j):
                if cmask[inew, jnew] == 1 and area[inew, jnew] >= bt:
                    count += 1
            if count <= 1:
                for (inew, jnew) in upstream(i, j):
                    if cmask[inew, jnew] == 1:
                        cmask[inew, jnew] = 0
                        channels[inew, jnew] = channels[i, j]
                        walk(inew, jnew, cid_box)
            else:
                for (inew, jnew) in upstream(i, j):
                    if cmask[inew, jnew] == 1:
                        if area[inew, jnew] >= bt:
                            state["hcid"] += 1
                            cid_box[0] = state["hcid"]
                            cmask[inew, jnew] = 0
                            channels[inew, jnew] = cid_box[0]
                            if wprop:
                                topo[cid_box[0]] = cid_org_box[0]
                            walk(inew, jnew, cid_box)
                        else:
                            cmask[inew, jnew] = 0
                            channels[inew, jnew] = cid_org_box[0]
                            walk(inew, jnew, cid_org_box)

        state["hcid"] += 1
        cid = state["hcid"]
        i, j = seed
        if cmask[i, j] == 1 and area[i, j] >= bt:
            channels[i, j] = cid
            if wprop:
                topo[cid] = -1
        cmask[i, j] = 0
        walk(i, j, [cid])
        return channels, topo, state["hcid"]

    res = 30.0
    for nx, seed_cap in ((64, 6), (96, 6)):
        meta, dem, mask = fixtures.make_dem(nx=nx, ny=nx, tile=nx // 2)
        filled = OT.planchon_fill(dem, res)
        area, fdir = OT.d8_acc(filled, mask, res)
        a = area.astype(np.float32).copy()
        cm_i = (a > np.float32(res * res * 20)).astype(np.int32)
        n = 0
        while cm_i.max() > 0 and n < seed_cap:
            am = np.where(cm_i == 1, a, np.float32(0.0))
            seed = OT._argmax2d_fortran(am)
            cm_r = cm_i.copy()
            for wprop in (True, False):
                got = OT.channels_walk_single_seed(
                    area, fdir, cm_i.copy() if wprop else cm_i, seed,
                    res * res * 5, init_label=0, wprop=wprop)
                want = walk_recursive(
                    area, fdir, cm_r.copy() if wprop else cm_r, seed,
                    res * res * 5, init_label=0, wprop=wprop)
                assert np.array_equal(got[0], want[0]), (nx, seed, wprop)
                assert got[1] == want[1], (nx, seed, wprop)
                assert got[2] == want[2], (nx, seed, wprop)
            assert np.array_equal(cm_i, cm_r)  # same consumption
            n += 1
        assert n > 0
