"""Cost-form experiment for the slab-refine sweep (TPU).

The slab sweep evaluates, per (pixel, lane-row), the direct-form cost

    j = ((lr - s0) * inv_dsig)**2 + (ur - ma/2)**2 + (vr - mz/2)**2

which is 12 VPU ops per row (3 subs, 4 muls, 2 adds, cmp, min, where).
Two algebraic rewrites trade rounding for ops:

- ``prescaled`` (11 ops): fold the per-pixel ``inv_dsig`` into the LUT
  once at table prep (``lr' = lr * inv_dsig`` rounded f32) and the
  pixel feature (``s0' = s0 * inv_dsig``); the sweep drops one mul.
  Only valid when dsig_co is a scalar (the production default 0.1).
- ``expanded_uv`` (7-10 ops depending on FMA fusion): additionally
  expand the wind-prior terms against a precomputed row operand
  ``kr = ur**2 + vr**2`` (f32) and exactly-negated-doubled rows
  ``u2r = -2*ur, v2r = -2*vr``:

      j = (lr' - s0')**2 + kr + u2r*(ma/2) + v2r*(mz/2)

  dropping the per-pixel constant ``(ma/2)**2 + (mz/2)**2`` (constant
  across rows for a pixel, so the exact argmin is unchanged; fp
  near-ties CAN flip). One extra operand row streams per 8-row block.

Both rewrites change f32 rounding vs the shipped kernel, so this
script measures BOTH speed and argmin flips at the headline 8.4 Mpx
scale, and adjudicates every flip against the float64 direct-form cost
(is the flipped winner actually better, worse, or an exact f64 tie?).

Run manually:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_slab_forms.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import inversion as inv
from xsarsea_tpu.ops.pallas_inversion import (
    DEFAULT_BLOCK, SLAB_BLOCK, WGROUP, _BIG_IDX,
    _slab_sweep, bucket_by_band, build_direct_arrays_packed,
    copol_group_argmin_pallas, nearest_index_sorted,
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


def _form_kernel(sband_ref, srow0_ref, vmask_ref, feats_ref, lut_ref,
                 u_ref, v_ref, k_ref, out_ref, *, block, pp, n_phi_true,
                 n_rows, rows_per_iter, lane_off, form):
    b = pl.program_id(0)

    @pl.when(vmask_ref[b] > 0)
    def _run():
        if form == "direct":
            # the shipped baseline IS the shared production sweep —
            # importing it guarantees the flip accounting below compares
            # the experiment forms against the exact shipped fp sequence
            m, _row, _lane, flat = _slab_sweep(
                srow0_ref[b], feats_ref, lut_ref, u_ref, v_ref,
                block=block, pp=pp, n_phi_true=n_phi_true, n_rows=n_rows,
                rows_per_iter=rows_per_iter, lane_off=lane_off)
            gmin = jnp.min(m, axis=1, keepdims=True)
            best = jnp.min(jnp.where(m == gmin, flat, _BIG_IDX), axis=1)
            out_ref[...] = best.reshape(1, 1, block)
            return

        r0s = pl.multiple_of(srow0_ref[b] // 2, 8)
        n_sweep = n_rows // 2

        def col(i):
            return jnp.broadcast_to(
                feats_ref[0, i, :].reshape(block, 1), (block, pp))

        s0 = col(0)
        ma2 = col(1)
        mz2 = col(2)

        def body(k, carry):
            m, a = carry
            for sub in range(rows_per_iter // 8):
                base = k * rows_per_iter + sub * 8
                lr8 = lut_ref[0, pl.ds(r0s + base, 8), :]
                ur8 = u_ref[pl.ds(r0s + base, 8), :]
                vr8 = v_ref[pl.ds(r0s + base, 8), :]
                if form == "expanded_uv":
                    kr8 = k_ref[pl.ds(r0s + base, 8), :]
                for i in range(8):
                    lr = lax.slice_in_dim(lr8, i, i + 1, axis=0)
                    ur = lax.slice_in_dim(ur8, i, i + 1, axis=0)
                    vr = lax.slice_in_dim(vr8, i, i + 1, axis=0)
                    if form == "prescaled":
                        j = (lr - s0) ** 2 + (ur - ma2) ** 2 \
                            + (vr - mz2) ** 2
                    else:  # expanded_uv
                        kr = lax.slice_in_dim(kr8, i, i + 1, axis=0)
                        t = lr - s0
                        j = t * t + kr + ur * ma2 + vr * mz2
                    better = j < m
                    m = jnp.minimum(m, j)
                    a = jnp.where(better, r0s + base + i, a)
            return m, a

        init_a = (_BIG_IDX // n_phi_true) & ~1
        init_a //= 2
        m, a = lax.fori_loop(0, n_sweep // rows_per_iter, body, (
            jnp.full((block, pp), jnp.inf, dtype=jnp.float32),
            jnp.full((block, pp), init_a, dtype=jnp.int32),
        ))
        lane = lax.broadcasted_iota(jnp.int32, (block, pp), 1)
        hi = (lane >= lane_off).astype(jnp.int32)
        flat = (a * 2 + hi) * n_phi_true + (lane - lane_off * hi)
        gmin = jnp.min(m, axis=1, keepdims=True)
        best = jnp.min(jnp.where(m == gmin, flat, _BIG_IDX), axis=1)
        out_ref[...] = best.reshape(1, 1, block)


def run_form(form, lut_pk, u_pk, v_pk, k_pk, feats, sband, srow0, vmask,
             n_phi_true, n_rows, rows_per_iter, lane_off,
             block=SLAB_BLOCK):
    n_blocks = sband.shape[0]
    pp = lut_pk.shape[2]
    feats = feats.reshape(n_blocks, block, 4).transpose(0, 2, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 4, block), lambda b, sb, sr, vm: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lut_pk.shape[1], pp),
                         lambda b, sb, sr, vm: (sb[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_pk.shape[0], pp), lambda b, sb, sr, vm: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_pk.shape[0], pp), lambda b, sb, sr, vm: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pk.shape[0], pp), lambda b, sb, sr, vm: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block), lambda b, sb, sr, vm: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_form_kernel, block=block, pp=pp,
                     n_phi_true=n_phi_true, n_rows=n_rows,
                     rows_per_iter=rows_per_iter, lane_off=lane_off,
                     form=form)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.int32),
    )(sband, srow0, vmask, feats, lut_pk, u_pk, v_pk, k_pk
      ).reshape(n_blocks, block)


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
    assert margin % 16 == 0 and WGROUP % 16 == 0

    lut_np = np.asarray(tables.co_lut, np.float32)
    u_np = np.asarray(tables.co_u, np.float32)
    v_np = np.asarray(tables.co_v, np.float32)
    pk = build_direct_arrays_packed(lut_np, u_np, v_np)
    assert pk is not None
    lut_pk_np, u_pk_np, v_pk_np, wp_rows, lane_off = pk
    inv_dsig = np.float32(1.0 / dsig_co)

    # prescaled LUT (f32 mul; pad values stay huge / overflow to inf,
    # which the sweep treats identically to the pad sentinel)
    luts_pk_np = lut_pk_np * inv_dsig
    # expanded-uv operands: kr = ur^2 + vr^2 (f32), u2 = -2*ur (exact)
    k_pk_np = u_pk_np * u_pk_np + v_pk_np * v_pk_np
    u2_pk_np = -2.0 * u_pk_np
    v2_pk_np = -2.0 * v_pk_np
    dummy_k = np.zeros((8, lut_pk_np.shape[2]), np.float32)

    n_inc = g4_dev.shape[0]
    n_wspd = tables.co_wspd.shape[0]
    n_phi = tables.co_phir.shape[0]
    n_wgroups = (n_wspd + WGROUP - 1) // WGROUP
    co_inc = jnp.asarray(np.asarray(tables.co_inc, np.float64), jnp.float32)
    n_sweep = slab_rows // 2
    rpi = n_sweep if n_sweep % 8 == 0 and n_sweep <= 24 else 8

    inc = jnp.asarray(inc_np, jnp.float32)
    s0co = jnp.asarray(s0_co_db, jnp.float32)
    anc_re = jnp.asarray(anc.real, jnp.float32)
    anc_im = jnp.asarray(anc.imag, jnp.float32)

    print(f"pixels {N} | slab_rows {slab_rows} | rpi {rpi} "
          f"| Pp {lut_pk_np.shape[2]}", flush=True)

    @jax.jit
    def prep(inc, s0co, anc_re, anc_im):
        i_inc = nearest_index_sorted(co_inc, inc)
        perm, band_of_block = bucket_by_band(i_inc, n_bands=n_inc,
                                             block=block)
        valid = perm >= 0
        pidx = jnp.clip(perm, 0)
        pix1 = jnp.stack([
            s0co * inv_dsig * (-2.0),
            anc_re * (-1.0), jnp.abs(anc_im) * (-1.0),
            jnp.ones_like(s0co)], axis=1)
        feats = jnp.where(valid[:, None], pix1[pidx], jnp.nan)
        shift_blk = jnp.asarray(np.asarray(lut_shift, np.float32))[
            band_of_block]
        feats = feats.reshape(-1, block, 4).at[:, :, 0].add(
            2.0 * shift_blk[:, None]).reshape(-1, 4)
        gstar = copol_group_argmin_pallas(
            g4_dev, feats, band_of_block, n_groups=n_wgroups, gsize=gsize,
            block=block).reshape(-1)
        perm2, key_of_block = inv._rebucket_slot(
            perm, gstar, band_of_block, n_inc=n_inc, n_wgroups=n_wgroups,
            block=block, slab_block=SLAB_BLOCK)
        valid2 = perm2 >= 0
        pidx2 = jnp.clip(perm2, 0)
        sband = key_of_block // n_wgroups
        srow0 = jnp.clip((key_of_block % n_wgroups) * WGROUP - margin,
                         0, wp_rows - slab_rows)
        vmask2 = (perm2.reshape(-1, SLAB_BLOCK) >= 0).any(
            axis=1).astype(jnp.int32)
        base = [s0co, anc_re * 0.5, jnp.abs(anc_im) * 0.5,
                jnp.full((N,), inv_dsig)]
        pre = [s0co * inv_dsig, anc_re * 0.5, jnp.abs(anc_im) * 0.5,
               jnp.ones((N,), jnp.float32)]
        fA = jnp.where(valid2[:, None], jnp.stack(base, axis=1)[pidx2],
                       jnp.nan)
        fB = jnp.where(valid2[:, None], jnp.stack(pre, axis=1)[pidx2],
                       jnp.nan)
        return fA, fB, sband, srow0, vmask2, perm2

    fA, fB, sband, srow0, vmask2, perm2 = jax.block_until_ready(
        prep(inc, s0co, anc_re, anc_im))

    configs = [
        ("direct", jnp.asarray(lut_pk_np), jnp.asarray(u_pk_np),
         jnp.asarray(v_pk_np), jnp.asarray(dummy_k), fA),
        ("prescaled", jnp.asarray(luts_pk_np), jnp.asarray(u_pk_np),
         jnp.asarray(v_pk_np), jnp.asarray(dummy_k), fB),
        ("expanded_uv", jnp.asarray(luts_pk_np), jnp.asarray(u2_pk_np),
         jnp.asarray(v2_pk_np), jnp.asarray(k_pk_np), fB),
    ]
    outs = {}
    for form, lut_d, u_d, v_d, k_d, f_d in configs:
        fn = jax.jit(lambda f, sb, sr, vm, _l=lut_d, _u=u_d, _v=v_d,
                     _k=k_d, _form=form: run_form(
                         _form, _l, _u, _v, _k, f, sb, sr, vm,
                         n_phi, slab_rows, rpi, lane_off))
        out, _ = timed(f"slab form={form}", fn, f_d, sband, srow0, vmask2)
        outs[form] = np.asarray(out).reshape(-1)

    # --- flip accounting vs the shipped direct form, adjudicated in f64
    mask = (np.asarray(perm2).reshape(-1) >= 0)
    baseline = outs["direct"]
    lut64 = np.asarray(tables.co_lut, np.float64)
    u64 = np.asarray(tables.co_u, np.float64)
    v64 = np.asarray(tables.co_v, np.float64)
    sband_px = np.repeat(np.asarray(sband), SLAB_BLOCK)
    pix = np.asarray(perm2).reshape(-1)
    s0_px = np.where(mask, s0_co_db[np.clip(pix, 0, None)], np.nan)
    ma_px = np.where(mask, anc.real[np.clip(pix, 0, None)], np.nan)
    mz_px = np.where(mask, np.abs(anc.imag[np.clip(pix, 0, None)]), np.nan)

    def j64(flat, sel):
        w_i = flat[sel] // n_phi
        p_i = flat[sel] % n_phi
        b_i = sband_px[sel]
        return (((lut64[b_i, w_i, p_i] - s0_px[sel]) / dsig_co) ** 2
                + ((u64[w_i, p_i] - ma_px[sel]) / 2.0) ** 2
                + ((v64[w_i, p_i] - mz_px[sel]) / 2.0) ** 2)

    for form in ("prescaled", "expanded_uv"):
        o = outs[form]
        flips = mask & (o != baseline) & (baseline < _BIG_IDX) \
            & (o < _BIG_IDX)
        nf = int(flips.sum())
        line = f"{form}: flips vs direct = {nf} / {int(mask.sum())}"
        if nf:
            sel = np.nonzero(flips)[0]
            jb = j64(baseline, sel)
            jo = j64(o, sel)
            line += (f" | f64 says flip better {int((jo < jb).sum())}, "
                     f"worse {int((jo > jb).sum())}, "
                     f"tie {int((jo == jb).sum())}"
                     f" | max |dJ| {np.abs(jo - jb).max():.3e}")
            w_b = np.asarray(tables.co_wspd, np.float64)[
                baseline[sel] // n_phi]
            w_o = np.asarray(tables.co_wspd, np.float64)[o[sel] // n_phi]
            line += f" | max |dwspd| {np.abs(w_o - w_b).max():.3f} m/s"
        print(line, flush=True)


if __name__ == "__main__":
    main()
