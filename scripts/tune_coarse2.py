"""Sweep coarse-pass (phi stride, MXU precision) against pallas_exact.

Metric: mismatch rate of the final complex wind vs mode='pallas_exact'
on a noisy 4M-pixel random scene, plus device-resident stage-B-inclusive
full-path time. Baseline (dphi=8, HIGHEST): co 2.7e-5 / dual 1.8e-5.
Run manually: PYTHONPATH=/root/repo python scripts/tune_coarse2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import prepare_tables
from xsarsea_tpu.windspeed import inversion as inv

n = 1 << 22
rng = np.random.default_rng(5)
inc = rng.uniform(18.0, 47.0, n)
wspd = rng.uniform(0.5, 45.0, n)
phi = rng.uniform(0.0, 360.0, n)
m_co = get_model("gmf_cmod5n")
m_cr = get_model("gmf_s1_v2")
tables = prepare_tables(m_co, m_cr, dtype=jnp.float32)
s0co = 10 * np.log10(np.asarray(m_co(inc, wspd, phi, broadcast=True)) + 1e-15)
s0co = s0co + rng.normal(0, 0.3, n)
s0cr = 10 * np.log10(np.asarray(m_cr(inc, wspd, broadcast=True)) + 1e-15)
anc = (wspd + rng.normal(0, 1.5, n)).clip(0.2) * np.exp(1j * np.deg2rad(phi))
dsig_cr = np.full(n, 0.1)

co_e, dual_e = inv.invert_pixels(tables, inc, s0co, s0cr, dsig_cr, anc,
                                 mode="pallas_exact")

dev = [jnp.asarray(np.ascontiguousarray(a, np.float32)) for a in
       (inc, s0co, s0cr, dsig_cr, anc.real, anc.imag)]
dev.append(jnp.asarray(0.1, jnp.float32))

for dphi, prec in [(8.0, lax.Precision.HIGHEST), (12.0, lax.Precision.HIGHEST),
                   (16.0, lax.Precision.HIGHEST), (12.0, lax.Precision.DEFAULT)]:
    inv._invert_fn_cache.clear()
    inv._COARSE_DPHI = dphi
    inv._COARSE_PRECISION = prec
    co_p, dual_p = inv.invert_pixels(tables, inc, s0co, s0cr, dsig_cr, anc,
                                     mode="pallas")
    fn = inv._get_invert_fn(tables, 8192, mode="pallas", dsig_co=0.1)
    out = fn(*dev)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = fn(*dev)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    print(f"dphi={dphi:5.1f} prec={str(prec).split('.')[-1]:8s} "
          f"mismatch co={np.mean(co_p != co_e):.2e} "
          f"dual={np.mean(dual_p != dual_e):.2e}  "
          f"full {dt*1e3:6.0f} ms  {n/dt/1e6:5.2f} Mpx/s")
