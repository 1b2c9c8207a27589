"""Stage-level profiling of the pallas inversion path on the live backend.

Times each stage of _make_pallas_invert_fn's invert_flat separately:
  A. nearest_inc + bucket_by_band (stage-1 sort)
  B. feature build + gather + copol_argmin_pallas (MXU coarse pass)
  C. second bucket_by_band (stage-2 sort)
  D. slab_refine_pallas
  E. chunked postprocess (lax.map over _postprocess_pixel)
Not a test; run manually: python scripts/profile_inversion.py [n_log2]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial as _partial

from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import prepare_tables
from xsarsea_tpu.windspeed import inversion as inv
from xsarsea_tpu.ops.pallas_inversion import (
    DEFAULT_BLOCK, SLAB_BLOCK, WGROUP,
    bucket_by_band, build_direct_arrays, copol_group_argmin_pallas,
    nearest_index_uniform, slab_refine_pallas,
)

n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
rng = np.random.default_rng(0)
inc = rng.uniform(18.0, 47.0, n)
wspd = rng.uniform(0.5, 45.0, n)
phi = rng.uniform(0.0, 360.0, n)
m_co = get_model("gmf_cmod5n")
m_cr = get_model("gmf_s1_v2")
tables = prepare_tables(m_co, m_cr, dtype=jnp.float32)
s0_co_db = 10 * np.log10(np.asarray(m_co(inc, wspd, phi, broadcast=True)) + 1e-15)
s0_cr_db = 10 * np.log10(np.asarray(m_cr(inc, wspd, broadcast=True)) + 1e-15)
anc = (wspd + rng.normal(0, 1.5, n)).clip(0.2) * np.exp(1j * np.deg2rad(phi))
dsig_cr = np.full(n, 0.1)

dev = [jnp.asarray(np.ascontiguousarray(a, np.float32)) for a in
       (inc, s0_co_db, s0_cr_db, dsig_cr, anc.real, anc.imag)]
d_inc, d_s0co, d_s0cr, d_dsigcr, d_are, d_aim = dev

# --- replicate the fn construction (coarse mode) ----------------------------
dsig_co_val = 0.1
block = DEFAULT_BLOCK
step_w = float(np.median(np.diff(np.asarray(tables.co_wspd, np.float64))))
step_p = float(np.median(np.diff(np.asarray(tables.co_phi, np.float64))))
g4_dev, lut_shift, n_groups_g4, gsize = inv._build_g4_grouped(
    tables, dsig_co_val,
    stride_w=max(1, round(inv._COARSE_DW / step_w)),
    stride_p=max(1, round(inv._COARSE_DPHI / step_p)))
margin = inv._FAST_MARGIN
slab_rows = WGROUP + 2 * margin
lut_shift = float(lut_shift)
lut_pad, u_pad, v_pad = (jnp.asarray(a) for a in build_direct_arrays(
    np.asarray(tables.co_lut, np.float32),
    np.asarray(tables.co_u, np.float32),
    np.asarray(tables.co_v, np.float32)))
n_inc = g4_dev.shape[0]
n_wspd = np.asarray(tables.co_wspd).shape[0]
n_phi = np.asarray(tables.co_phir).shape[0]
n_wgroups = (n_wspd + WGROUP - 1) // WGROUP
wp_rows = lut_pad.shape[1]
inv_dsig = 1.0 / dsig_co_val
inc_np = np.asarray(tables.co_inc, dtype=np.float64)
nearest_inc = _partial(nearest_index_uniform, inc_np[0],
                       (inc_np[-1] - inc_np[0]) / (len(inc_np) - 1), len(inc_np))
tbl = tables.to_device_slim()
print(f"n={n} n_inc={n_inc} n_wspd={n_wspd} n_phi={n_phi} "
      f"g4 {g4_dev.shape} lut_pad {lut_pad.shape}")


@jax.jit
def stageA(inc):
    i_inc = nearest_inc(inc)
    perm, band_of_block = bucket_by_band(i_inc, n_bands=n_inc, block=block)
    return i_inc, perm, band_of_block


@jax.jit
def stageB(perm, band_of_block, s0_co_db, anc_re, mz):
    valid = perm >= 0
    pidx = jnp.clip(perm, 0)
    f32 = jnp.float32
    pix1 = jnp.stack([
        (s0_co_db.astype(f32) * inv_dsig - lut_shift) * (-2.0),
        anc_re.astype(f32) * (-1.0),
        mz.astype(f32) * (-1.0),
        jnp.ones_like(s0_co_db, dtype=f32),
    ], axis=1)
    feats = jnp.where(valid[:, None], pix1[pidx], jnp.nan)
    args = copol_group_argmin_pallas(g4_dev, feats, band_of_block,
                                     n_groups=n_wgroups, gsize=gsize, block=block)
    return args.reshape(-1)


@jax.jit
def stageB2(perm, args, i_inc):
    nloc = i_inc.shape[0]
    valid = perm >= 0
    g0 = jnp.zeros((nloc,), jnp.int32).at[
        jnp.where(valid, perm, nloc)].set(args, mode="drop")
    key = i_inc * n_wgroups + g0
    return key


@jax.jit
def stageC(key):
    return bucket_by_band(key, n_bands=n_inc * n_wgroups, block=SLAB_BLOCK)


@jax.jit
def stageD(lut_pad, u_pad, v_pad, perm2, key_of_block, s0_co_db, anc_re, mz, dsig_co):
    valid2 = perm2 >= 0
    pidx2 = jnp.clip(perm2, 0)
    f32 = jnp.float32
    pix2 = jnp.stack([
        s0_co_db.astype(f32),
        anc_re.astype(f32) * 0.5,
        mz.astype(f32) * 0.5,
        jnp.broadcast_to((1.0 / dsig_co).astype(f32), s0_co_db.shape),
    ], axis=1)
    feats2 = jnp.where(valid2[:, None], pix2[pidx2], jnp.nan)
    sband = key_of_block // n_wgroups
    srow0 = jnp.clip((key_of_block % n_wgroups) * WGROUP - margin,
                     0, wp_rows - slab_rows)
    flat_r = slab_refine_pallas(
        lut_pad, u_pad, v_pad, feats2, sband, srow0, n_phi,
        block=SLAB_BLOCK, n_rows=slab_rows).reshape(-1)
    return flat_r


@jax.jit
def stageD2(perm2, flat_r, nshape):
    nloc = nshape.shape[0]
    valid2 = perm2 >= 0
    flat = jnp.zeros((nloc,), jnp.int32).at[
        jnp.where(valid2, perm2, nloc)].set(flat_r, mode="drop")
    flat = jnp.clip(flat, 0, n_wspd * n_phi - 1)
    return flat // n_phi, flat % n_phi


chunk_size = 8192


@jax.jit
def stageE(tbl, inc, s0, s0cr, dsigcr, are, aim, iw, ip):
    nloc = inc.shape[0]

    def one_pixel(inc_p, s0_p, s0cr_p, dsigcr_p, are_p, aim_p, iw_p, ip_p):
        wspd_co = tbl.co_wspd[iw_p]
        phi_co = inv._disambiguate_phi(tbl, tbl.co_phir[ip_p], are_p, aim_p)
        return inv._postprocess_pixel(tbl, inc_p, s0_p, s0cr_p, dsigcr_p,
                                      are_p, aim_p, wspd_co, phi_co)

    pad = (-nloc) % chunk_size
    farrs = [jnp.pad(a, (0, pad), constant_values=np.nan)
             for a in (inc, s0, s0cr, dsigcr, are, aim)]
    iarrs = [jnp.pad(a, (0, pad)) for a in (iw, ip)]
    arrs = [a.reshape(-1, chunk_size) for a in farrs + iarrs]
    post = jax.vmap(one_pixel)
    out = jax.lax.map(lambda xs: post(*xs), tuple(arrs))
    return tuple(o.reshape(-1)[:nloc] for o in out)


def bench(name, f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:12s} {dt*1e3:9.1f} ms   {n/dt/1e6:8.2f} Mpx/s")
    return out


mz = jnp.abs(d_aim) if tables.phi_180 else d_aim
i_inc, perm, band_of_block = bench("A bucket1", stageA, d_inc)
args_ = bench("B argmin", stageB, perm, band_of_block, d_s0co, d_are, mz)
key = bench("B2 scatter", stageB2, perm, args_, i_inc)
perm2, key_of_block = bench("C bucket2", stageC, key)
dsig_dev = jnp.asarray(0.1, jnp.float32)
flat_r = bench("D refine", stageD, lut_pad, u_pad, v_pad, perm2, key_of_block, d_s0co, d_are, mz, dsig_dev)
iw, ip = bench("D2 scatter", stageD2, perm2, flat_r, d_inc)
out = bench("E postproc", stageE, tbl, d_inc, d_s0co, d_s0cr, d_dsigcr,
            d_are, d_aim, iw, ip)

# full path for comparison
fn = inv._get_invert_fn(tables, 8192, mode="pallas", dsig_co=0.1)
full_args = dev + [dsig_dev]
bench("FULL", fn, *full_args)
