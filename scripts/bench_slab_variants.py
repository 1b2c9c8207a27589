"""Microbenchmark of slab-refine kernel loop-unroll variants (TPU).

The slab refine is ~45% of the fused-pipeline budget. ``rows_per_iter``
partially unrolls its row loop (the per-row fp op sequence is identical
across settings, so outputs must be bit-equal); this script times each
setting at the headline 8.4 Mpx scale and asserts bit equality against
the default.

Run manually: PYTHONPATH=/root/repo python scripts/bench_slab_variants.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import inversion as inv
from xsarsea_tpu.ops.pallas_inversion import (
    DEFAULT_BLOCK, SLAB_BLOCK, WGROUP,
    bucket_by_band, build_direct_arrays, copol_group_argmin_pallas,
    nearest_index_sorted, slab_refine_pallas,
)

N = 1 << 23
REPS = 3


def timed(name, fn, *args):
    from bench import drain

    out = fn(*args)
    drain(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    drain(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:34s} {dt * 1e3:8.1f} ms   {dt / N * 1e9:6.1f} ns/px",
          flush=True)
    return out, dt


def main():
    rng = np.random.default_rng(0)
    inc_np = rng.uniform(18.0, 47.0, N)
    wspd_np = rng.uniform(0.5, 45.0, N)
    phi_np = rng.uniform(0.0, 360.0, N)
    m_co = get_model("gmf_cmod5n")
    tables = inv.prepare_tables(m_co, None, dtype=jnp.float32)
    s0_co_db = 10 * np.log10(
        np.asarray(m_co(inc_np, wspd_np, phi_np, broadcast=True)) + 1e-15)
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
    lut_pad, u_pad, v_pad = (jnp.asarray(a) for a in build_direct_arrays(
        np.asarray(tables.co_lut, np.float32),
        np.asarray(tables.co_u, np.float32),
        np.asarray(tables.co_v, np.float32)))
    n_inc = g4_dev.shape[0]
    n_wspd = tables.co_wspd.shape[0]
    n_phi = tables.co_phir.shape[0]
    n_wgroups = (n_wspd + WGROUP - 1) // WGROUP
    wp_rows = lut_pad.shape[1]
    inv_dsig = 1.0 / dsig_co
    co_inc = jnp.asarray(np.asarray(tables.co_inc, np.float64), jnp.float32)

    inc = jnp.asarray(inc_np, jnp.float32)
    s0co = jnp.asarray(s0_co_db, jnp.float32)
    anc_re = jnp.asarray(anc.real, jnp.float32)
    anc_im = jnp.asarray(anc.imag, jnp.float32)

    print(f"pixels {N} | slab_rows {slab_rows} | Pp {lut_pad.shape[2]}",
          flush=True)

    @jax.jit
    def prep(inc, s0co, anc_re, anc_im):
        i_inc = nearest_index_sorted(co_inc, inc)
        perm, band_of_block = bucket_by_band(i_inc, n_bands=n_inc, block=block)
        valid = perm >= 0
        pidx = jnp.clip(perm, 0)
        pix1 = jnp.stack([
            s0co * inv_dsig * (-2.0),
            anc_re * (-1.0), jnp.abs(anc_im) * (-1.0),
            jnp.ones_like(s0co)], axis=1)
        feats = jnp.where(valid[:, None], pix1[pidx], jnp.nan)
        shift_blk = jnp.asarray(np.asarray(lut_shift, np.float32))[band_of_block]
        feats = feats.reshape(-1, block, 4).at[:, :, 0].add(
            2.0 * shift_blk[:, None]).reshape(-1, 4)
        gstar = copol_group_argmin_pallas(
            g4_dev, feats, band_of_block, n_groups=n_wgroups, gsize=gsize,
            block=block).reshape(-1)
        band_slot = jnp.broadcast_to(
            band_of_block[:, None], (band_of_block.shape[0], block)
        ).reshape(-1)
        key_slot = jnp.where(valid, band_slot * n_wgroups + gstar,
                             jnp.int32(n_inc * n_wgroups))
        perm2, key_of_block = bucket_by_band(
            key_slot, n_bands=n_inc * n_wgroups, block=SLAB_BLOCK,
            values=perm)
        valid2 = perm2 >= 0
        pidx2 = jnp.clip(perm2, 0)
        pix2 = jnp.stack([
            s0co, anc_re * 0.5, jnp.abs(anc_im) * 0.5,
            jnp.full((N,), np.float32(1.0 / dsig_co))], axis=1)
        feats2 = jnp.where(valid2[:, None], pix2[pidx2], jnp.nan)
        sband = key_of_block // n_wgroups
        srow0 = jnp.clip((key_of_block % n_wgroups) * WGROUP - margin,
                         0, wp_rows - slab_rows)
        vmask2 = (perm2.reshape(-1, SLAB_BLOCK) >= 0).any(
            axis=1).astype(jnp.int32)
        return feats2, sband, srow0, vmask2

    feats2, sband, srow0, vmask2 = jax.block_until_ready(
        prep(inc, s0co, anc_re, anc_im))

    outs = {}
    for rpi in (8, 16, 24, 48):
        if slab_rows % rpi:
            continue
        fn = jax.jit(lambda f, sb, sr, vm, _rpi=rpi: slab_refine_pallas(
            lut_pad, u_pad, v_pad, f, sb, sr, n_phi,
            block=SLAB_BLOCK, n_rows=slab_rows, valid_mask=vm,
            rows_per_iter=_rpi))
        try:
            (out, _) = timed(f"slab rows_per_iter={rpi}", fn,
                             feats2, sband, srow0, vmask2)
        except Exception as e:  # noqa: BLE001 — e.g. VMEM overflow at 48
            print(f"slab rows_per_iter={rpi}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        outs[rpi] = np.asarray(out)

    base = outs.get(8)
    if base is None:
        print("no rows_per_iter=8 baseline — skipping bit-equality checks")
        return
    for rpi, o in outs.items():
        # compare only real (non-dropped) slots: all-padding blocks are
        # skipped and their outputs undefined
        mask = np.asarray(vmask2, bool)
        eq = np.array_equal(o[mask], base[mask])
        print(f"rows_per_iter={rpi} bit-equal vs 8: {eq}", flush=True)

    # --- pack-2 lane layout (the production default at margin 16):
    # same sweep, half the iterations on 1.5x lanes; rpi=24 (full
    # unroll of the packed loop) measured 56.3 -> 36.9 ns/px for the
    # fused kernel and is the production setting
    from xsarsea_tpu.ops.pallas_inversion import build_direct_arrays_packed
    if margin % 16:
        print("margin not 16-aligned — skipping pack-2 variants")
        return
    pk = build_direct_arrays_packed(
        np.asarray(tables.co_lut, np.float32),
        np.asarray(tables.co_u, np.float32),
        np.asarray(tables.co_v, np.float32))
    if pk is None:
        print("pack-2 saves nothing at this phi grid — skipping")
        return
    lut_pk, u_pk, v_pk = (jnp.asarray(a) for a in pk[:3])
    wp_pk, off = pk[3], pk[4]
    # rebuild srow0 against the packed build's row count
    srow0_pk = jnp.clip(srow0, 0, wp_pk - slab_rows)
    for rpi in (8, 16, 24):
        if (slab_rows // 2) % rpi:
            continue
        fn = jax.jit(lambda f, sb, sr, vm, _rpi=rpi: slab_refine_pallas(
            lut_pk, u_pk, v_pk, f, sb, sr, n_phi,
            block=SLAB_BLOCK, n_rows=slab_rows, valid_mask=vm,
            rows_per_iter=_rpi, lane_off=off))
        (out, _) = timed(f"slab pack2 rows_per_iter={rpi}", fn,
                         feats2, sband, srow0_pk, vmask2)
        mask = np.asarray(vmask2, bool)
        eq = np.array_equal(np.asarray(out)[mask], base[mask])
        print(f"pack2 rpi={rpi} bit-equal vs plain: {eq}", flush=True)


if __name__ == "__main__":
    main()
