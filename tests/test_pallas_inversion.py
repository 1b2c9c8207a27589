"""Pallas inversion kernel: CPU interpreter-mode equivalence tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xsarsea_tpu.models import get_model
from xsarsea_tpu.ops.pallas_inversion import (
    bucket_by_band,
    nearest_index_sorted,
)
from xsarsea_tpu.windspeed.inversion import InversionTables, invert_pixels

from _parity import assert_equal_modulo_pi_ties


def test_nearest_index_matches_argmin():
    grid = np.linspace(16.0, 66.0, 51)
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.uniform(10, 70, 500),
        grid[:5] + 0.5,          # exact midpoints: tie -> lower index
        np.array([np.nan, 15.0, 67.0]),
    ])
    got = np.asarray(nearest_index_sorted(jnp.asarray(grid), jnp.asarray(vals)))
    for v, g in zip(vals, got):
        if np.isnan(v):
            assert g == 0
        else:
            assert g == np.argmin(np.abs(grid - v)), (v, g)


def test_nearest_index_traced_grid_descending():
    """A TRACED grid argument (e.g. the grid passed through jit as an
    operand) must still handle descending order (review finding: the
    concrete-only detection left searchsorted running on a descending
    array, returning garbage indices)."""
    import jax

    asc = np.sort(np.concatenate([np.linspace(16.0, 66.0, 37),
                                  [20.1, 33.7, 50.2]]))  # non-uniform
    desc = asc[::-1].copy()
    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.uniform(10, 70, 300), [np.nan]])

    f = jax.jit(lambda g, v: nearest_index_sorted(g, v))
    for grid in (asc, desc):
        got = np.asarray(f(jnp.asarray(grid), jnp.asarray(vals)))
        for v, g in zip(vals, got):
            if np.isnan(v):
                assert g == 0
            else:
                assert g == np.argmin(np.abs(grid - v)), (grid[0], v, g)


def test_bucket_by_band_structure():
    rng = np.random.default_rng(1)
    n, n_bands, block = 1000, 7, 64
    band = jnp.asarray(rng.integers(0, n_bands, size=n), dtype=jnp.int32)
    perm, band_of_block = bucket_by_band(band, n_bands=n_bands, block=block)
    perm = np.asarray(perm)
    bob = np.asarray(band_of_block)
    band_np = np.asarray(band)

    # every real pixel appears exactly once
    real = perm[perm >= 0]
    assert sorted(real.tolist()) == list(range(n))
    # every pixel lies in a block of its own band
    for b in range(len(bob)):
        blk = perm[b * block:(b + 1) * block]
        for p in blk[blk >= 0]:
            assert band_np[p] == bob[b]


@pytest.mark.parametrize("seed,kwargs", [
    # two LUT resolutions -> different coarse strides and slab clipping
    (0, dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)),
    (1, dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)),
    (0, dict(inc_step=1.0, wspd_step=0.2, phi_step=2.5)),
])
def test_pallas_matches_exact_mode(seed, kwargs):
    """Interpreter-mode kernel result == exact XLA path (same f32 tables)."""
    lut_co = get_model("gmf_cmod5n").to_lut(units="dB", **kwargs)
    lut_cr = get_model("gmf_s1_v2").to_lut(units="dB", **kwargs)
    tables = InversionTables(lut_co, lut_cr, dtype=jnp.float32)

    rng = np.random.default_rng(seed)
    n = 300
    inc = rng.uniform(17.0, 60.0, n)
    speed = rng.uniform(1.0, 28.0, n)
    direc = rng.uniform(-np.pi, np.pi, n)
    s0_co_db = 10 * np.log10(
        np.asarray(get_model("gmf_cmod5n")(inc, speed, np.abs(np.rad2deg(direc)),
                                           broadcast=True)) + 1e-15)
    s0_cr_db = 10 * np.log10(
        np.asarray(get_model("gmf_s1_v2")(inc, speed, broadcast=True)) + 1e-15)
    anc = (speed + rng.normal(0, 2, n)).clip(0.3) * np.exp(1j * direc)
    dsig_cr = rng.uniform(0.1, 1.0, n)
    # NaN pixels
    inc[0] = np.nan
    s0_co_db[1] = np.nan
    anc[2] = np.nan
    s0_cr_db[3] = np.nan

    co_e, dual_e = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr, anc,
                                 mode="exact")
    co_p, dual_p = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr, anc,
                                 mode="pallas_interpret")

    # identical NaN masks
    np.testing.assert_array_equal(np.isnan(np.abs(co_e)), np.isnan(np.abs(co_p)))
    np.testing.assert_array_equal(np.isnan(np.abs(dual_e)), np.isnan(np.abs(dual_p)))
    m = ~np.isnan(np.abs(co_e))
    # f32 rounding differs slightly between the two paths ((l-s)/d vs l/d-s/d),
    # which can flip near-tie argmins on rare pixels; speeds must agree tightly
    sp_diff = np.abs(np.abs(co_e[m]) - np.abs(co_p[m]))
    assert np.mean(sp_diff > 1e-6) < 0.02
    assert np.sqrt(np.mean(sp_diff ** 2)) < 1e-3
    md = ~np.isnan(np.abs(dual_e))
    sd = np.abs(np.abs(dual_e[md]) - np.abs(dual_p[md]))
    assert np.sqrt(np.mean(sd ** 2)) < 1e-3


def test_pallas_fast_mode_close_to_exact():
    """'pallas_fast' is a deprecated alias of 'pallas' (round 5): it
    must warn and return EXACT results (the historical <=1-wspd-step
    relaxation no longer exists)."""
    kwargs = dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    lut_co = get_model("gmf_cmod5n").to_lut(units="dB", **kwargs)
    lut_cr = get_model("gmf_s1_v2").to_lut(units="dB", **kwargs)
    tables = InversionTables(lut_co, lut_cr, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    n = 400
    inc = rng.uniform(17.0, 60.0, n)
    speed = rng.uniform(1.0, 28.0, n)
    direc = rng.uniform(-np.pi, np.pi, n)
    s0_co_db = 10 * np.log10(
        np.asarray(get_model("gmf_cmod5n")(inc, speed, np.abs(np.rad2deg(direc)),
                                           broadcast=True)) + 1e-15)
    s0_cr_db = 10 * np.log10(
        np.asarray(get_model("gmf_s1_v2")(inc, speed, broadcast=True)) + 1e-15)
    anc = (speed + rng.normal(0, 2, n)).clip(0.3) * np.exp(1j * direc)
    dsig_cr = rng.uniform(0.1, 1.0, n)

    co_e, dual_e = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr, anc,
                                 mode="pallas_interpret")
    with pytest.warns(DeprecationWarning, match="pallas_fast"):
        co_f, dual_f = invert_pixels(tables, inc, s0_co_db, s0_cr_db,
                                     dsig_cr, anc,
                                     mode="pallas_fast_interpret")
    for got, ref in ((co_f, co_e), (dual_f, dual_e)):
        np.testing.assert_array_equal(got, ref)


def test_pallas_nonuniform_incidence_grid():
    """NcLut-style non-uniform incidence axes route through the sorted
    nearest-index path; kernels must still match the exact mode."""
    kwargs = dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    lut_co = get_model("gmf_cmod5n").to_lut(units="dB", **kwargs)
    lut_cr = get_model("gmf_s1_v2").to_lut(units="dB", **kwargs)

    def warp_inc(lut):
        # monotone non-uniform warp of the incidence coordinate
        inc = np.asarray(lut.coords["incidence"], np.float64)
        t = (inc - inc[0]) / (inc[-1] - inc[0])
        warped = inc[0] + (inc[-1] - inc[0]) * (t + 0.15 * t * (1 - t))
        coords = dict(lut.coords)
        coords["incidence"] = warped
        from xsarsea_tpu.dimarray import DimArray

        return DimArray(lut.data, dims=lut.dims, coords=coords,
                        attrs=lut.attrs)

    tables = InversionTables(warp_inc(lut_co), warp_inc(lut_cr),
                             dtype=jnp.float32)

    rng = np.random.default_rng(9)
    n = 300
    inc = rng.uniform(17.0, 60.0, n)
    s0_co_db = rng.uniform(-30.0, 0.0, n)
    s0_cr_db = rng.uniform(-40.0, -20.0, n)
    anc = rng.uniform(1, 25, n) * np.exp(1j * rng.uniform(-np.pi, np.pi, n))
    dsig_cr = rng.uniform(0.1, 1.0, n)
    inc[0] = np.nan

    co_e, dual_e = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr, anc,
                                 mode="exact")
    co_p, dual_p = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr, anc,
                                 mode="pallas_interpret")
    for got, ref in ((co_p, co_e), (dual_p, dual_e)):
        assert_equal_modulo_pi_ties(got, ref)


def test_pallas_differing_crosspol_incidence_grid():
    """When the crosspol LUT has a DIFFERENT incidence axis than copol,
    stage 3 falls back to its own bucketing — result still equals exact."""
    kwargs = dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    lut_co = get_model("gmf_cmod5n").to_lut(units="dB", **kwargs)
    lut_cr = get_model("gmf_s1_v2").to_lut(units="dB", inc_step=0.7,
                                           wspd_step=0.5, phi_step=5.0)
    assert not np.array_equal(np.asarray(lut_co.coords["incidence"]),
                              np.asarray(lut_cr.coords["incidence"]))
    tables = InversionTables(lut_co, lut_cr, dtype=jnp.float32)

    rng = np.random.default_rng(13)
    n = 300
    inc = rng.uniform(17.0, 60.0, n)
    s0_co_db = rng.uniform(-30.0, 0.0, n)
    s0_cr_db = rng.uniform(-40.0, -20.0, n)
    anc = rng.uniform(1, 25, n) * np.exp(1j * rng.uniform(-np.pi, np.pi, n))
    dsig_cr = rng.uniform(0.1, 1.0, n)
    s0_cr_db[3] = np.nan

    co_e, dual_e = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr,
                                 anc, mode="exact")
    co_p, dual_p = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr,
                                 anc, mode="pallas_interpret")
    for got, ref in ((co_p, co_e), (dual_p, dual_e)):
        m = ~np.isnan(np.abs(ref))
        np.testing.assert_array_equal(np.isnan(np.abs(got)), ~m)
        np.testing.assert_array_equal(got[m], ref[m])


def test_near_uniform_fit_accepts_f32_cast_grids():
    """f32-cast linspace/arange coords (ulp step jitter) MUST take the
    fast path — the exact-step check silently demoted the whole TPU
    pipeline to binary search (round-3 stage profiling found ~75 ns/px)."""
    from xsarsea_tpu.ops.pallas_inversion import near_uniform_fit

    g64 = np.arange(16.0, 66.0 + 0.1, 0.1)
    g32 = g64.astype(np.float32).astype(np.float64)
    assert near_uniform_fit(g64) is not None
    assert near_uniform_fit(g32) is not None, "f32 ulp jitter rejected"
    # genuinely non-uniform grid is rejected
    bent = g64.copy()
    bent[10] += 0.06  # > 0.4 * step
    assert near_uniform_fit(bent) is None
    assert near_uniform_fit(np.array([3.0])) is None
    assert near_uniform_fit(np.array([1.0, 1.0])) is None


def test_nearest_index_true_grid_compare():
    """nearest_index_sorted matches np.argmin(|grid - v|) on the TRUE
    grid values — first-minimum tie rule included — on both the
    near-uniform fast path and the binary-search fallback."""
    from xsarsea_tpu.ops.pallas_inversion import nearest_index_sorted

    rng = np.random.default_rng(11)
    for grid in (
        np.arange(16.0, 66.0 + 0.1, 0.1).astype(np.float32),  # fast path
        np.sort(rng.uniform(16.0, 66.0, 73)).astype(np.float32),  # search
        np.arange(66.0, 15.9, -0.1).astype(np.float32),  # descending fast
        np.sort(rng.uniform(16.0, 66.0, 73))[::-1].copy().astype(
            np.float32),  # descending binary search
    ):
        vals = rng.uniform(14.0, 68.0, 4096).astype(np.float32)
        # exact midpoints (engineered ties -> lower index must win)
        mids = ((grid[:-1] + grid[1:]) / 2).astype(np.float32)
        vals = np.concatenate([vals, mids, grid.copy(), [np.nan]])
        got = np.asarray(nearest_index_sorted(jnp.asarray(grid),
                                              jnp.asarray(vals)))
        exp = np.argmin(np.abs(grid[None, :] - vals[:, None]), axis=1)
        exp[np.isnan(vals)] = 0
        np.testing.assert_array_equal(got, exp)


def test_pallas_phi_disambiguation_degenerate_ancillary():
    """Ancillary direction exactly 180 deg (plain real NEGATIVE
    ancillary_wind, e.g. quantized direction data) makes the reference's
    d1<=d2 angular comparison an exact fp tie broken only by
    wrap-rounding noise. The fused pallas postprocess must replicate
    _disambiguate_phi's exact op sequence — an algebraic shortcut
    (keep iff anc_im*sin(phi) >= 0) flipped ~15% of such pixels to the
    conjugate wind (round-4 review finding)."""
    lut_co = get_model("gmf_cmod5n").to_lut(
        units="dB", inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    tables = InversionTables(lut_co, None, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    n = 2048
    inc = rng.uniform(17.0, 60.0, n)
    speed = rng.uniform(1.0, 28.0, n)
    direc = rng.uniform(0.0, 360.0, n)
    s0_co_db = 10 * np.log10(
        np.asarray(get_model("gmf_cmod5n")(inc, speed, direc,
                                           broadcast=True)) + 1e-15)
    # direction exactly 180 deg: anc_im == +0.0; sprinkle -0.0 and
    # exactly-0-deg pixels too (all make anc_im*sin(phi) == +-0.0)
    anc = -(speed + rng.normal(0, 2, n)).clip(0.3) + 0.0j
    anc[::7] = np.conj(anc[::7])      # imag = -0.0
    anc[::11] = -anc[::11]            # direction exactly 0 deg

    nanv = np.full(n, np.nan)
    co_e, _ = invert_pixels(tables, inc, s0_co_db, nanv, nanv, anc,
                            mode="exact")
    co_p, _ = invert_pixels(tables, inc, s0_co_db, nanv, nanv, anc,
                            mode="pallas_interpret")
    assert_equal_modulo_pi_ties(co_p, co_e)
    # the imaginary sign (the disambiguation outcome) must agree
    # wherever the solution phi is not itself a degenerate pi-tie
    m = ~np.isnan(np.abs(co_e)) & (np.abs(np.asarray(co_e).imag) > 1e-4)
    np.testing.assert_array_equal(np.sign(np.asarray(co_p)[m].imag),
                                  np.sign(np.asarray(co_e)[m].imag))


def test_pallas_copol_only_tables():
    """Copol-only tables (has_cr=False) compile a structurally different
    pallas program (no crosspol stage); it must match the exact path and
    keep the canonical 7-operand call signature (crosspol operands are
    never-read dummies). Guards the bench's BASELINE config #2 path."""
    kwargs = dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    lut_co = get_model("gmf_cmod5n").to_lut(units="dB", **kwargs)
    tables = InversionTables(lut_co, None, dtype=jnp.float32)
    assert not tables.has_cr

    rng = np.random.default_rng(7)
    n = 300
    inc = rng.uniform(17.0, 50.0, n)
    speed = rng.uniform(1.0, 28.0, n)
    direc = rng.uniform(-np.pi, np.pi, n)
    s0_co_db = 10 * np.log10(
        np.asarray(get_model("gmf_cmod5n")(inc, speed,
                                           np.abs(np.rad2deg(direc)),
                                           broadcast=True)) + 1e-15)
    anc = (speed + rng.normal(0, 2, n)).clip(0.3) * np.exp(1j * direc)
    nanv = np.full(n, np.nan)
    s0_co_db[1] = np.nan  # NaN sigma0 pixel must stay NaN

    co_e, dual_e = invert_pixels(tables, inc, s0_co_db, nanv, nanv, anc,
                                 mode="exact")
    co_p, dual_p = invert_pixels(tables, inc, s0_co_db, nanv, nanv, anc,
                                 mode="pallas_interpret")
    assert np.isnan(np.abs(np.asarray(dual_p))).all()
    assert_equal_modulo_pi_ties(co_p, co_e)


def test_pallas_coarse_splits3_matches_exact():
    """_COARSE_SPLITS=3 (exact bf16 K-expansion) must stay within the
    same contract as the production 2-term split: pallas == exact path.
    Guards the sweep's (splits=3, margin=8) candidate configs."""
    import xsarsea_tpu.windspeed.inversion as inv

    kwargs = dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    lut_co = get_model("gmf_cmod5n").to_lut(units="dB", **kwargs)
    lut_cr = get_model("gmf_s1_v2").to_lut(units="dB", **kwargs)
    tables = InversionTables(lut_co, lut_cr, dtype=jnp.float32)

    rng = np.random.default_rng(11)
    n = 300
    inc = rng.uniform(17.0, 50.0, n)
    speed = rng.uniform(1.0, 28.0, n)
    direc = rng.uniform(-np.pi, np.pi, n)
    s0_co_db = 10 * np.log10(
        np.asarray(get_model("gmf_cmod5n")(inc, speed,
                                           np.abs(np.rad2deg(direc)),
                                           broadcast=True)) + 1e-15)
    s0_cr_db = 10 * np.log10(
        np.asarray(get_model("gmf_s1_v2")(inc, speed,
                                          broadcast=True)) + 1e-15)
    anc = (speed + rng.normal(0, 2, n)).clip(0.3) * np.exp(1j * direc)
    dsig_cr = np.full(n, 0.3)

    co_e, dual_e = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr,
                                 anc, mode="exact")
    base = (inv._COARSE_SPLITS, inv._FAST_MARGIN)
    try:
        inv._COARSE_SPLITS, inv._FAST_MARGIN = 3, 8
        co_p, dual_p = invert_pixels(tables, inc, s0_co_db, s0_cr_db,
                                     dsig_cr, anc, mode="pallas_interpret")
    finally:
        inv._COARSE_SPLITS, inv._FAST_MARGIN = base
    assert_equal_modulo_pi_ties(co_p, co_e)
    assert_equal_modulo_pi_ties(dual_p, dual_e)


def test_pallas_cache_key_includes_sweep_knobs():
    """Mutating the sweepable module knobs must never be served a stale
    compiled closure through the public path (review finding: the cache
    key ignored _COARSE_SPLITS/_FAST_MARGIN)."""
    import xsarsea_tpu.windspeed.inversion as inv

    kwargs = dict(inc_step=1.0, wspd_step=1.0, phi_step=10.0)
    t = inv.prepare_tables("gmf_cmod5n", "gmf_s1_v2", dtype=jnp.float32,
                           **kwargs)
    fn1 = inv._get_invert_fn(t, 8192, mode="pallas_interpret", dsig_co=0.1)
    base = (inv._COARSE_SPLITS, inv._FAST_MARGIN)
    try:
        inv._COARSE_SPLITS, inv._FAST_MARGIN = 3, 8
        fn2 = inv._get_invert_fn(t, 8192, mode="pallas_interpret",
                                 dsig_co=0.1)
    finally:
        inv._COARSE_SPLITS, inv._FAST_MARGIN = base
    assert fn1 is not fn2
    # restored knobs hit the original entry again
    fn3 = inv._get_invert_fn(t, 8192, mode="pallas_interpret", dsig_co=0.1)
    assert fn3 is fn1


def test_pack2_slab_layout_bit_equal():
    """The pack-2 lane layout (two wspd rows per lane-row, see
    build_direct_arrays_packed) must be BIT-identical to the plain
    layout: same fp op sequence, only the index decode differs."""
    from xsarsea_tpu.ops.pallas_inversion import (
        SLAB_BLOCK, WGROUP, build_crosspol_arrays, build_decode_arrays,
        build_direct_arrays, build_direct_arrays_packed,
        slab_refine_fused_pallas)

    rng = np.random.default_rng(7)
    I, W, P = 5, 90, 181  # production-like odd P (-> 384-lane pack)
    lut = rng.uniform(-35, 0, (I, W, P)).astype(np.float32)
    wspd = np.linspace(0.2, 50, W).astype(np.float32)
    phir = np.deg2rad(np.linspace(0, 180, P)).astype(np.float32)
    u = (wspd[:, None] * np.cos(phir)[None, :]).astype(np.float32)
    v = (wspd[:, None] * np.sin(phir)[None, :]).astype(np.float32)
    crlut = rng.uniform(-40, -20, (I, 60)).astype(np.float32)
    crw = np.linspace(3, 80, 60).astype(np.float32)

    up = build_direct_arrays(lut, u, v)
    pk = build_direct_arrays_packed(lut, u, v)
    assert pk is not None
    lut_pk, u_pk, v_pk, wp_rows_pk, off = pk
    assert off == P and lut_pk.shape[2] == 384
    cr_pad, cr_wh = build_crosspol_arrays(crlut, crw)

    margin = 16
    slab_rows = WGROUP + 2 * margin
    nb = 5
    sband = rng.integers(0, I, nb).astype(np.int32)
    hi = (min(up[0].shape[1], wp_rows_pk) - slab_rows) // 16 * 16
    srow0 = (rng.integers(0, hi // 16 + 1, nb) * 16).astype(np.int32)
    n = nb * SLAB_BLOCK
    feats = np.stack([
        rng.uniform(-30, -5, n), rng.uniform(-25, 25, n),
        rng.uniform(0, 25, n), np.full(n, 10.0),
        rng.uniform(-38, -22, n), np.full(n, 0.6),
        np.zeros(n), np.zeros(n)], 1).astype(np.float32)
    feats[3] = np.nan  # one all-NaN pixel row
    vm = jnp.ones(nb, jnp.int32)

    wh_u, pr_u = build_decode_arrays(wspd, phir, up[0].shape[1],
                                     up[0].shape[2])
    wh_p, pr_p = build_decode_arrays(wspd, phir, wp_rows_pk,
                                     lut_pk.shape[2], lane_off=off)
    args = (jnp.asarray(feats), jnp.asarray(sband), jnp.asarray(srow0), P)
    out_u = slab_refine_fused_pallas(
        *(jnp.asarray(x) for x in (*up, wh_u, pr_u, cr_pad, cr_wh)), *args,
        n_rows=slab_rows, has_cr=True, interpret=True, valid_mask=vm)
    out_p = slab_refine_fused_pallas(
        *(jnp.asarray(x) for x in (lut_pk, u_pk, v_pk, wh_p, pr_p,
                                   cr_pad, cr_wh)), *args,
        n_rows=slab_rows, has_cr=True, interpret=True, valid_mask=vm,
        lane_off=off)
    np.testing.assert_array_equal(np.asarray(out_u), np.asarray(out_p))

    # the PRODUCTION unroll (rows_per_iter = full packed sweep, 24 at
    # margin 16 — see inversion.py slab_rpi) must be bit-equal to the
    # default rpi=8: identical per-row fp op sequence, only the
    # fori_loop trip count differs. Covers the config the TPU path
    # actually runs (review finding: it was never CI-tested).
    rpi_prod = slab_rows // 2
    assert rpi_prod % 8 == 0 and rpi_prod <= 24
    out_p24 = slab_refine_fused_pallas(
        *(jnp.asarray(x) for x in (lut_pk, u_pk, v_pk, wh_p, pr_p,
                                   cr_pad, cr_wh)), *args,
        n_rows=slab_rows, has_cr=True, interpret=True, valid_mask=vm,
        lane_off=off, rows_per_iter=rpi_prod)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_p24))

    # copol-only production shape: the dummy (1,1,128) crosspol LUT with
    # real band ids > 0 must not index past the dummy's single block
    # (review finding: OOB block fetch when has_cr=False)
    assert int(np.asarray(sband).max()) > 0
    dum_cr = jnp.zeros((1, 1, 128), jnp.float32)
    dum_wh = jnp.zeros((1, 128), jnp.float32)
    out_co = slab_refine_fused_pallas(
        *(jnp.asarray(x) for x in (lut_pk, u_pk, v_pk, wh_p, pr_p)),
        dum_cr, dum_wh, *args, n_rows=slab_rows, has_cr=False,
        interpret=True, valid_mask=vm, lane_off=off,
        rows_per_iter=rpi_prod)
    np.testing.assert_array_equal(np.asarray(out_co)[:, 0],
                                  np.asarray(out_p24)[:, 0])
    np.testing.assert_array_equal(np.asarray(out_co)[:, 1],
                                  np.asarray(out_p24)[:, 1])

    # the plain (flat-index-returning) kernel must agree too
    from xsarsea_tpu.ops.pallas_inversion import slab_refine_pallas
    f4 = jnp.asarray(feats[:, :4])
    flat_u = slab_refine_pallas(
        *(jnp.asarray(x) for x in up), f4, jnp.asarray(sband),
        jnp.asarray(srow0), P, n_rows=slab_rows, interpret=True,
        valid_mask=vm)
    flat_p = slab_refine_pallas(
        *(jnp.asarray(x) for x in (lut_pk, u_pk, v_pk)), f4,
        jnp.asarray(sband), jnp.asarray(srow0), P, n_rows=slab_rows,
        interpret=True, valid_mask=vm, lane_off=off)
    np.testing.assert_array_equal(np.asarray(flat_u), np.asarray(flat_p))


def test_random_scene_flips_are_near_ties():
    """The parity boundary of mode='pallas' (README): the coarse
    expanded-form MXU pass carries ~1e-2 of absolute f32 rounding and
    the slab refine re-searches only ±SLAB_MARGIN wspd rows around its
    winner, so a pixel whose exact cost surface holds a COMPETING
    minimum further away with a gap under that rounding can return the
    near-tie candidate instead of the exact argmin. This happens only
    for sigma0 off the GMF manifold (reference boundary: the numba
    kernel windspeed.py:183-282 computes direct-form cost everywhere,
    so it has no such regime — but it also has no 500x-faster mode).

    This test pins the invariant that makes the mode safe: EVERY
    flipped pixel's returned wspd row is NEAR-OPTIMAL in the exact
    direct-form f32 cost — a flip picks between statistically
    indistinguishable answers, never a wrong basin. Two populations:

    - 16Ki uniformly random out-of-manifold pixels (flip rate must stay
      under 1%; observed ~0.03%, all 1-row ulp ties);
    - synthesized adversarial pixels sitting ON a basin boundary: s0 is
      bisected to the f32 tie point of two per-row minima >= 24 wspd
      rows apart that jointly hold the global minimum (found by
      scanning s0 for jumps in the global argmin row), i.e. the exact
      regime the slab margin cannot recover.

    Uses a 51-band incidence grid (interpret-mode cost is band-count
    dominated) at full 0.1 m/s wspd resolution.
    """
    from xsarsea_tpu.windspeed.inversion import prepare_tables

    tables = prepare_tables("gmf_cmod5n", "gmf_s1_v2", dtype=jnp.float32,
                            inc_step=1.0)
    lut = np.asarray(tables.co_lut, np.float32)    # (I, W, P)
    U = np.asarray(tables.co_u, np.float32)        # (W, P)
    V = np.asarray(tables.co_v, np.float32)
    ginc = np.asarray(tables.co_inc, np.float32)
    gw = np.asarray(tables.co_wspd, np.float32)
    dsig = np.float32(0.1)                          # invert_pixels default

    def rowmin(jw, L, r, s):
        return float(np.min(jw[r] + ((L[r] - np.float32(s)) / dsig) ** 2))

    # --- population 2: basin-boundary pixels
    rng = np.random.default_rng(3)
    adv = []       # (band, s0_db, ma, mz, r1, r2)
    for _ in range(60):
        ii = int(rng.integers(0, lut.shape[0]))
        spd = rng.uniform(3, 15)
        ang = rng.uniform(-np.pi, np.pi)
        ma = np.float32(spd * np.cos(ang))
        mz = np.float32(abs(spd * np.sin(ang)))    # positive: == |mz|
        jw = ((U - ma) / np.float32(2)) ** 2 + ((V - mz) / np.float32(2)) ** 2
        L = lut[ii]
        svals = np.linspace(-42.0, 2.0, 221, dtype=np.float32)
        js = jw[:, :, None] + ((L[:, :, None] - svals[None, None, :])
                               / dsig) ** 2
        rows = js.min(axis=1).argmin(axis=0)       # global argmin row per s
        jumps = np.nonzero(np.abs(np.diff(rows.astype(int))) >= 24)[0]
        for k in jumps[:1]:
            lo, hi = float(svals[k]), float(svals[k + 1])
            r1, r2 = int(rows[k]), int(rows[k + 1])
            f = lambda s: rowmin(jw, L, r1, s) - rowmin(jw, L, r2, s)
            flo = f(lo)
            for _ in range(60):
                mid = (lo + hi) / 2
                if (f(mid) > 0) == (flo > 0):
                    lo = mid
                else:
                    hi = mid
            s = np.float32((lo + hi) / 2)
            if abs(rowmin(jw, L, r1, s) - rowmin(jw, L, r2, s)) <= 2e-3:
                adv.append((ii, float(s), float(ma), float(mz), r1, r2))
    assert len(adv) >= 4  # the generator must actually produce the regime

    # --- population 1: random out-of-manifold scene
    n = 1 << 14
    inc = rng.uniform(17.0, 49.0, n).astype(np.float32)
    s0co = rng.uniform(-40.0, 0.0, n).astype(np.float32)
    s0cr = rng.uniform(-45.0, -15.0, n).astype(np.float32)
    anc = (rng.uniform(2, 18, n) * np.exp(
        1j * rng.uniform(-np.pi, np.pi, n))).astype(np.complex64)

    n_adv = len(adv)
    inc = np.concatenate([inc, [ginc[a[0]] for a in adv]]).astype(np.float32)
    s0co = np.concatenate([s0co, [a[1] for a in adv]]).astype(np.float32)
    s0cr = np.concatenate([s0cr, np.full(n_adv, -30.0)]).astype(np.float32)
    anc = np.concatenate([anc, [complex(a[2], a[3]) for a in adv]]
                         ).astype(np.complex64)
    dsig_cr = np.full(n + n_adv, 0.1, np.float32)

    co_e, _ = invert_pixels(tables, inc, s0co, s0cr, dsig_cr, anc,
                            mode="exact")
    co_p, _ = invert_pixels(tables, inc, s0co, s0cr, dsig_cr, anc,
                            mode="pallas_interpret")
    sp_e = np.abs(np.asarray(co_e))
    sp_p = np.abs(np.asarray(co_p))
    assert not np.isnan(sp_e).any() and not np.isnan(sp_p).any()

    flips = np.abs(sp_e - sp_p) > 1e-3
    assert flips[:n].mean() < 0.01  # random-scene flip rate stays rare

    # near-optimality of EVERY flip (both modes' answers)
    for i in np.nonzero(flips)[0]:
        ii = int(np.abs(ginc - inc[i]).argmin())
        ma = np.float32(anc[i].real)
        mz = np.float32(abs(anc[i].imag)) if tables.phi_180 \
            else np.float32(anc[i].imag)
        jw = ((U - ma) / np.float32(2)) ** 2 + ((V - mz) / np.float32(2)) ** 2
        L = lut[ii]
        jmin = float(np.min(jw + ((L - s0co[i]) / dsig) ** 2))
        for sp in (sp_e[i], sp_p[i]):
            r = int(np.abs(gw - sp).argmin())
            gap = rowmin(jw, L, r, s0co[i]) - jmin
            assert gap <= max(5e-3, 2e-3 * jmin), (i, sp, gap, jmin)

    # every adversarial pixel's answer (flipped or not) must be
    # near-optimal too — note a third row between the two tied basins
    # can also sit within the tie band and is an equally valid answer
    for k, (ii, s, ma, mz, r1, r2) in enumerate(adv):
        i = n + k
        jw = ((U - np.float32(ma)) / np.float32(2)) ** 2 \
            + ((V - np.float32(mz)) / np.float32(2)) ** 2
        L = lut[ii]
        jmin = float(np.min(jw + ((L - np.float32(s)) / dsig) ** 2))
        for sp in (sp_e[i], sp_p[i]):
            r = int(np.abs(gw - sp).argmin())
            gap = rowmin(jw, L, r, s) - jmin
            assert gap <= max(5e-3, 2e-3 * jmin), (k, r, r1, r2, gap, jmin)


def test_bucket_by_value_matches_nearest_index():
    """bucket_by_value's band assignment is bit-identical to
    nearest_index_sorted for every non-NaN value — including values
    inside the ulp neighbourhood of every band midpoint, where the f32
    decision boundary actually lives (round-5 fused nearest+bucket)."""
    from xsarsea_tpu.ops.pallas_inversion import (_f32_sort_key_np,
                                                  band_boundaries_f32,
                                                  bucket_by_value)

    grids = [
        np.arange(16.0, 66.0 + 0.1, 0.1).astype(np.float32),
        # genuinely non-uniform (nearest_index_sorted binary-searches):
        # covers the +-inf first-min rule on that path too
        np.sort(np.concatenate([
            np.array([16.0, 17.0, 19.5, 25.0, 40.0, 66.0], np.float32),
            np.random.default_rng(2).uniform(
                16.5, 65.0, 40).astype(np.float32)])),
    ]
    for grid in grids:
        n_bands = grid.shape[0]
        bounds = band_boundaries_f32(grid)
        assert bounds is not None and bounds.shape == (n_bands - 1,)

        rng = np.random.default_rng(11)
        vals = [rng.uniform(10.0, 70.0, 4096).astype(np.float32)]
        # dense ulp sweep around every midpoint (the adversarial region)
        mids = ((grid[:-1].astype(np.float64) + grid[1:]) / 2
                ).astype(np.float32)
        for k in range(-3, 4):
            stepped = mids.view(np.int32) + k  # positive f32: bit arith
            vals.append(stepped.view(np.float32))
        vals.append(np.array([np.nan, np.inf, -np.inf, 0.0, 100.0],
                             np.float32))
        v = np.concatenate(vals)

        block = 64
        perm, band_of_block = bucket_by_value(
            jnp.asarray(v), jnp.asarray(_f32_sort_key_np(bounds)),
            n_bands=n_bands, block=block)
        perm = np.asarray(perm)
        band_of_block = np.asarray(band_of_block)
        # recover each pixel's assigned band from its slot's block
        got = np.full(v.shape[0], -1, np.int64)
        slots = np.nonzero(perm >= 0)[0]
        got[perm[slots]] = band_of_block[slots // block]
        assert (got >= 0).all()  # every pixel placed exactly once

        expect = np.asarray(nearest_index_sorted(jnp.asarray(grid),
                                                 jnp.asarray(v)))
        m = ~np.isnan(v)
        np.testing.assert_array_equal(got[m], expect[m])
        # +-inf follows np.argmin's first-min over all-inf distances
        assert (got[np.isinf(v)] == 0).all()
        # NaN pixels land in the last band (NaN-guarded downstream)
        assert (got[~m] == n_bands - 1).all()
