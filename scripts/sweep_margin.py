"""Sweep the coarse-pass phi spacing vs slab-refine margin tradeoff (TPU).

The slab refine dominates the pipeline (~70% of ns/px) and its cost is
linear in slab rows (WGROUP + 2*margin). The margin exists to absorb the
coarse pass's wspd-group drift, which is driven mainly by the coarse
*phi* subsampling — so a finer coarse phi grid (costlier stage 1) may buy
a much smaller margin (cheaper stage 2). This sweep measures, per
(dphi, dw, margin) config: flips vs the trusted full-grid 'pallas_exact'
path on random pixels, and steady-state throughput.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_margin.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import xsarsea_tpu.windspeed.inversion as inv
from xsarsea_tpu.models import get_model

N = 1 << 22  # 4M px


def main():
    rng = np.random.default_rng(7)
    inc = rng.uniform(17.0, 49.0, N)
    wspd = rng.uniform(0.3, 48.0, N)
    phi = rng.uniform(0.0, 360.0, N)
    m_co = get_model("gmf_cmod5n")
    m_cr = get_model("gmf_s1_v2")
    tables = inv.prepare_tables(m_co, m_cr, dtype=jnp.float32)
    co_fn = jax.jit(m_co._gmf_fn)
    cr_fn = jax.jit(m_cr._gmf_fn)
    s0_co_db = 10 * np.log10(np.asarray(co_fn(inc, wspd, np.abs(
        ((phi + 180) % 360) - 180))) + 1e-15)
    s0_cr_db = 10 * np.log10(np.asarray(cr_fn(inc, wspd)) + 1e-15)
    anc = (wspd + rng.normal(0, 1.5, N)).clip(0.2) * np.exp(
        1j * np.deg2rad(phi))
    dev = [jnp.asarray(np.ascontiguousarray(a, np.float32)) for a in
           (inc, s0_co_db, s0_cr_db, np.full(N, 0.1), anc.real, anc.imag)]
    dsig = jnp.asarray(0.1, jnp.float32)

    from bench import drain  # honest sync: block_until_ready can return
    # early on the dev-tunnel plugin (see bench.drain)

    def run(fn, reps=2):
        out = fn(*dev, dsig)
        drain(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*dev, dsig)
        drain(out)
        return out, N * reps / (time.time() - t0) / 1e6

    # ground truth: full-grid expanded pass + slab refine
    ref_fn = inv._make_pallas_invert_fn(tables, 0.1, coarse=False)
    (rc_re, rc_im, rd_re, rd_im), ref_rate = run(ref_fn)
    ref_co = np.asarray(rc_re) + 1j * np.asarray(rc_im)
    ref_du = np.asarray(rd_re) + 1j * np.asarray(rd_im)
    print(f"pallas_exact reference: {ref_rate:.2f} Mpx/s")

    base = (inv._COARSE_DW, inv._COARSE_DPHI, inv._FAST_MARGIN,
            inv._COARSE_SPLITS)
    configs = [
        (0.2, 8.0, 24, 2),   # round-2 production default
        (0.2, 4.0, 16, 2),   # round-3/4 production default
        (0.2, 4.0, 8, 2),    # round-3/4 pallas_fast
        # exact 3-term bf16 split (no expanded-form drift beyond f32):
        # does the extra MXU precision buy a slim margin cleanly?
        (0.2, 4.0, 8, 3),
        (0.2, 4.0, 16, 3),
        # FULL-resolution coarse phi: the margin-8 flips above are driven
        # by coarse-phi drift (a wrong-phi sample favors a distant wspd
        # group). dphi=2 removes phi subsampling entirely; dw=0.4 keeps
        # the coarse-grid entry count equal to the (0.2, 4.0) default.
        (0.4, 2.0, 8, 2),
        (0.4, 2.0, 8, 3),
        (0.2, 2.0, 8, 3),
        (0.8, 2.0, 8, 3),
        # cheap-coarse default candidates: halve/quarter the coarse grid
        # and keep the full margin-16 slab (the 0-flip guarantee rides
        # the margin; the coarse pass only has to land within it)
        (0.8, 2.0, 16, 3),
        (1.6, 2.0, 16, 3),
        (0.8, 4.0, 16, 3),
        (1.6, 4.0, 16, 3),
        (0.8, 8.0, 16, 3),
        (1.6, 4.0, 8, 3),
        # post-pack-2 turbo candidates: the full-unroll slab kernel made
        # the refine much cheaper, so dphi=2 no longer pays for margin 8
        # (measured pallas_fast 8.28 < default 9.93 on the r4 kernel) —
        # keep the default's cheap coarse grid and slim only the margin
        (0.8, 4.0, 8, 3),
        (1.6, 8.0, 16, 3),
    ]
    only = os.environ.get("SWEEP_ONLY")  # e.g. "5,6,7,8": config indices
    if only:
        keep = {int(i) for i in only.split(",")}
        configs = [c for i, c in enumerate(configs) if i in keep]
    for dw, dphi, margin, splits in configs:
        (inv._COARSE_DW, inv._COARSE_DPHI, inv._FAST_MARGIN,
         inv._COARSE_SPLITS) = dw, dphi, margin, splits
        try:
            fn = inv._make_pallas_invert_fn(tables, 0.1)
            (c_re, c_im, d_re, d_im), rate = run(fn)
            co = np.asarray(c_re) + 1j * np.asarray(c_im)
            du = np.asarray(d_re) + 1j * np.asarray(d_im)
            flips_co = int(np.sum(~((co == ref_co) | (np.isnan(co.real)
                                                      & np.isnan(ref_co.real)))))
            flips_du = int(np.sum(~((du == ref_du) | (np.isnan(du.real)
                                                      & np.isnan(ref_du.real)))))
            dev_sp = float(np.nanmax(np.abs(np.abs(du) - np.abs(ref_du))))
            dev_co = float(np.nanmax(np.abs(np.abs(co) - np.abs(ref_co))))
            print(f"dw={dw} dphi={dphi} margin={margin} splits={splits}: "
                  f"{rate:.2f} Mpx/s, "
                  f"flips co={flips_co} dual={flips_du} "
                  f"({(flips_co + flips_du) / (2 * N):.1e}), "
                  f"max|dspeed| co={dev_co:.3f} dual={dev_sp:.3f} m/s")
        finally:
            (inv._COARSE_DW, inv._COARSE_DPHI, inv._FAST_MARGIN,
             inv._COARSE_SPLITS) = base


if __name__ == "__main__":
    main()
