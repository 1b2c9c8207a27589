"""Stage-level timing of the fused pallas inversion pipeline (TPU).

Rebuilds the production pipeline of
``xsarsea_tpu.windspeed.inversion._make_pallas_invert_fn`` as separately
jitted stages and times each with a data-dependent readback drain, at the headline
benchmark's 8.4 Mpx scale with the high-resolution cmod5n + s1_v2 LUTs.
The breakdown feeds docs/DESIGN.md (VERDICT r2 item 4).

Run manually: PYTHONPATH=/root/repo python scripts/bench_stages.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import inversion as inv
from xsarsea_tpu.ops.pallas_inversion import (
    CR_BLOCK, DEFAULT_BLOCK, SLAB_BLOCK, SLAB_MARGIN, WGROUP,
    bucket_by_band, build_crosspol_arrays, build_decode_arrays,
    build_direct_arrays, copol_group_argmin_pallas, nearest_index_sorted,
    slab_refine_fused_pallas,
)

N = 1 << 23
REPS = 3


def timed(name, fn, *args):
    from bench import drain  # data-dependent readback: block_until_ready
    # can return early on the dev-tunnel plugin (see bench.drain)

    out = fn(*args)
    drain(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    drain(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:8.1f} ms   {dt / N * 1e9:6.1f} ns/px")
    return out, dt


def main():
    rng = np.random.default_rng(0)
    inc_np = rng.uniform(18.0, 47.0, N)
    wspd_np = rng.uniform(0.5, 45.0, N)
    phi_np = rng.uniform(0.0, 360.0, N)
    m_co = get_model("gmf_cmod5n")
    m_cr = get_model("gmf_s1_v2")
    tables = inv.prepare_tables(m_co, m_cr, dtype=jnp.float32)
    s0_co_db = 10 * np.log10(
        np.asarray(m_co(inc_np, wspd_np, phi_np, broadcast=True)) + 1e-15)
    s0_cr_db = 10 * np.log10(
        np.asarray(m_cr(inc_np, wspd_np, broadcast=True)) + 1e-15)
    anc = (wspd_np + rng.normal(0, 1.5, N)).clip(0.2) * np.exp(
        1j * np.deg2rad(phi_np))

    dsig_co = 0.1
    block = DEFAULT_BLOCK
    dw, margin = inv._COARSE_DW, inv._FAST_MARGIN
    step_w = float(np.median(np.diff(np.asarray(tables.co_wspd, np.float64))))
    step_p = float(np.median(np.diff(np.asarray(tables.co_phi, np.float64))))
    g4_dev, lut_shift, n_groups, gsize = inv._build_g4_grouped(
        tables, dsig_co, stride_w=max(1, round(dw / step_w)),
        stride_p=max(1, round(inv._COARSE_DPHI / step_p)),
        splits=inv._COARSE_SPLITS)
    slab_rows = WGROUP + 2 * margin
    # pack-2 lane layout when it saves lanes, mirroring production
    # (_make_pallas_invert_fn); falls back to the plain layout otherwise
    from xsarsea_tpu.ops.pallas_inversion import build_direct_arrays_packed
    lane_off = None
    _direct = None
    if margin % 16 == 0 and WGROUP % 16 == 0:
        _pk = build_direct_arrays_packed(
            np.asarray(tables.co_lut, np.float32),
            np.asarray(tables.co_u, np.float32),
            np.asarray(tables.co_v, np.float32))
        if _pk is not None:
            _direct, _wp_true, lane_off = _pk[:3], _pk[3], _pk[4]
    if _direct is None:
        _direct = build_direct_arrays(
            np.asarray(tables.co_lut, np.float32),
            np.asarray(tables.co_u, np.float32),
            np.asarray(tables.co_v, np.float32))
    lut_pad, u_pad, v_pad = (jnp.asarray(a) for a in _direct)
    # production full-unroll setting (_make_pallas_invert_fn): packed
    # sweeps of <= 24 rows unroll fully, others keep the rpi=8 default
    slab_rpi = 8
    if lane_off is not None and (slab_rows // 2) % 8 == 0 \
            and slab_rows // 2 <= 24:
        slab_rpi = slab_rows // 2
    cr_pad_np, cr_whalf_np = build_crosspol_arrays(
        np.asarray(tables.cr_lut, np.float32),
        np.asarray(tables.cr_wspd, np.float32))
    cr_pad, cr_whalf = jnp.asarray(cr_pad_np), jnp.asarray(cr_whalf_np)
    n_inc = g4_dev.shape[0]
    n_wspd = tables.co_wspd.shape[0]
    n_phi = tables.co_phir.shape[0]
    n_wgroups = (n_wspd + WGROUP - 1) // WGROUP
    wp_rows = _wp_true if lane_off is not None else lut_pad.shape[1]
    inv_dsig = 1.0 / dsig_co
    co_inc = jnp.asarray(np.asarray(tables.co_inc, np.float64), jnp.float32)
    co_wspd_d = jnp.asarray(tables.co_wspd)
    co_phir_d = jnp.asarray(tables.co_phir)
    cr_wspd_d = jnp.asarray(tables.cr_wspd)

    inc = jnp.asarray(inc_np, jnp.float32)
    s0co = jnp.asarray(s0_co_db, jnp.float32)
    s0cr = jnp.asarray(s0_cr_db, jnp.float32)
    dsig_cr = jnp.full((N,), 0.1, jnp.float32)
    anc_re = jnp.asarray(anc.real, jnp.float32)
    anc_im = jnp.asarray(anc.imag, jnp.float32)

    print(f"pixels {N} | LUT (I,W,P)=({n_inc},{n_wspd},{n_phi}) | "
          f"g4 {g4_dev.nbytes / 1e6:.0f} MB | lut_pad {lut_pad.nbytes / 1e6:.0f} MB | "
          f"slab_rows {slab_rows}")

    # --- stage 1a: fused nearest+bucket (production path: the nearest
    # lookup folds into the bucket sort via exact band boundaries);
    # grids that fail band_boundaries_f32's preconditions fall back to
    # nearest+bucket_by_band exactly like production (inversion.py)
    from xsarsea_tpu.ops.pallas_inversion import (_f32_sort_key_np,
                                                  band_boundaries_f32,
                                                  bucket_by_band,
                                                  bucket_by_value)

    bounds = band_boundaries_f32(np.asarray(tables.co_inc, np.float32))
    if bounds is not None:
        bkeys = jnp.asarray(_f32_sort_key_np(bounds))

        @jax.jit
        def s1_bucket(inc):
            return bucket_by_value(inc, bkeys, n_bands=n_inc, block=block)
    else:
        @jax.jit
        def s1_bucket(inc):
            i_inc = nearest_index_sorted(co_inc, inc)
            return bucket_by_band(i_inc, n_bands=n_inc, block=block)

    (perm, band_of_block), t_b1 = timed("1a bucket by incidence", s1_bucket, inc)

    # --- stage 1b: feature build + gather into bucket order (+ slot-space
    # per-band centering, same as the production pipeline)
    shift_dev = jnp.asarray(np.asarray(lut_shift, np.float32))

    @jax.jit
    def s1_feats(perm, band_of_block, s0co, anc_re, anc_im):
        valid = perm >= 0
        pidx = jnp.clip(perm, 0)
        pix1 = jnp.stack([
            s0co * inv_dsig * (-2.0),
            anc_re * (-1.0), jnp.abs(anc_im) * (-1.0),
            jnp.ones_like(s0co)], axis=1)
        feats = jnp.where(valid[:, None], pix1[pidx], jnp.nan)
        shift_blk = shift_dev[band_of_block]
        return feats.reshape(-1, block, 4).at[:, :, 0].add(
            2.0 * shift_blk[:, None]).reshape(-1, 4)

    (feats,), t_f1 = timed("1b features + gather", lambda *a: (s1_feats(*a),),
                           perm, band_of_block, s0co, anc_re, anc_im)

    # --- stage 1c: expanded-form MXU group argmin
    @jax.jit
    def s1_kernel(g4, feats, band_of_block):
        return copol_group_argmin_pallas(
            g4, feats, band_of_block, n_groups=n_wgroups, gsize=gsize,
            block=block).reshape(-1)

    (gstar,), t_k1 = timed("1c MXU group-argmin kernel",
                           lambda *a: (s1_kernel(*a),), g4_dev, feats,
                           band_of_block)

    # --- stage 2a: rebucket by (band, group) in stage-1 SLOT space —
    # the PRODUCTION stage body (inv._rebucket_slot), not a copy
    @jax.jit
    def s2_bucket(perm, gstar, band_of_block):
        return inv._rebucket_slot(
            perm, gstar, band_of_block, n_inc=n_inc, n_wgroups=n_wgroups,
            block=block, slab_block=SLAB_BLOCK)

    (perm2, key_of_block), t_b2 = timed("2a rebucket (slot-space key)",
                                        s2_bucket, perm, gstar,
                                        band_of_block)

    # --- stage 2b: fused slab refine + in-kernel decode + crosspol
    # (the production kernel; see slab_refine_fused_pallas)
    w_half_d, phi_row_d = (jnp.asarray(a) for a in build_decode_arrays(
        tables.co_wspd, tables.co_phir, wp_rows, int(lut_pad.shape[2]),
        lane_off=lane_off))

    @jax.jit
    def s2_kernel(lut_pad, u_pad, v_pad, w_half, phi_row, cr_pad, cr_whalf,
                  perm2, key_of_block, s0co, s0cr, dsig_cr, anc_re, anc_im):
        valid2 = perm2 >= 0
        pidx2 = jnp.clip(perm2, 0)
        zero = jnp.zeros((N,), jnp.float32)
        pix2 = jnp.stack([
            s0co, anc_re * 0.5, jnp.abs(anc_im) * 0.5,
            jnp.full((N,), np.float32(1.0 / dsig_co)),
            s0cr, dsig_cr, zero, zero], axis=1)
        feats2 = jnp.where(valid2[:, None], pix2[pidx2], jnp.nan)
        sband = key_of_block // n_wgroups
        srow0 = jnp.clip((key_of_block % n_wgroups) * WGROUP - margin,
                         0, wp_rows - slab_rows)
        vmask2 = (perm2.reshape(-1, SLAB_BLOCK) >= 0).any(axis=1)
        return slab_refine_fused_pallas(
            lut_pad, u_pad, v_pad, w_half, phi_row, cr_pad, cr_whalf,
            feats2, sband, srow0, n_phi, block=SLAB_BLOCK,
            n_rows=slab_rows, has_cr=True,
            valid_mask=vmask2.astype(jnp.int32), lane_off=lane_off,
            rows_per_iter=slab_rpi)

    (vals_r,), t_k2 = timed("2b fused slab+decode+crosspol",
                            lambda *a: (s2_kernel(*a),),
                            lut_pad, u_pad, v_pad, w_half_d, phi_row_d,
                            cr_pad, cr_whalf, perm2, key_of_block,
                            s0co, s0cr, dsig_cr, anc_re, anc_im)

    # --- stage 3: pixel order WITHOUT any scatter/gather (production
    # tail): one sort keyed by pixel id CARRIES the kernel's result
    # channels as f32 payloads — 6.5 ns/px vs 16.0 for sort+row-gather
    # and ~10 for the old random i32 scatter alone
    @jax.jit
    def s3_unscatter(perm2, vals_r):
        valid2 = perm2 >= 0
        key = jnp.where(valid2, perm2, jnp.int32(N))
        _, w, p, d = jax.lax.sort(
            (key, vals_r[:, 0, :].reshape(-1), vals_r[:, 1, :].reshape(-1),
             vals_r[:, 2, :].reshape(-1)), is_stable=False, num_keys=1)
        return jnp.stack([w[:N], p[:N], d[:N]], axis=1)

    (vals,), t_k3 = timed("3  inverse-perm gather to pixel order",
                          lambda *a: (s3_unscatter(*a),), perm2, vals_r)

    # --- stage 4: the PRODUCTION postprocess body
    # (inv._postprocess_vectorized), not a copy
    @jax.jit
    def s4_post(vals, inc, s0co, s0cr, dsig_cr, anc_re, anc_im):
        phir_sol = vals[:, 1]
        return inv._postprocess_vectorized(
            inc, s0co, s0cr, dsig_cr, anc_re, anc_im,
            vals[:, 0], jnp.cos(phir_sol), jnp.sin(phir_sol), phir_sol,
            vals[:, 2], phi_180=True, has_cr=True)

    _, t_p = timed("4  postprocess vectorized", s4_post, vals,
                   inc, s0co, s0cr, dsig_cr, anc_re, anc_im)

    total = t_b1 + t_f1 + t_k1 + t_b2 + t_k2 + t_k3 + t_p
    print(f"{'sum of stages':34s} {total * 1e3:8.1f} ms   "
          f"{total / N * 1e9:6.1f} ns/px  -> {N / total / 1e6:.2f} Mpx/s")

    # fused production pipeline for comparison
    fn = inv._get_invert_fn(tables, 8192, mode="pallas", dsig_co=dsig_co)
    args = (inc, s0co, s0cr, dsig_cr, anc_re, anc_im,
            jnp.asarray(0.1, jnp.float32))
    _, t_full = timed("fused production pipeline", lambda: (fn(*args),))
    timed("1a bucket (re-measure)", s1_bucket, inc)


if __name__ == "__main__":
    main()
