"""Per-stage budget of the streaks histogram core (BASELINE config #4).

Decomposes ``streaks_histogram_core`` — R2 cascade, Scharr local
gradients, stacked window extraction, masked median sort, one-hot
broadcast-reduce histogram — into separately jitted stages and times
each with the bench's honest data-dependent drain. The stage sum
exceeds the fused pipeline (XLA fuses across these boundaries); the
ranking is what matters. The retired forms (per-channel extraction,
scatter-add histogram) are timed alongside for the record.

Run from the repo root: ``python scripts/bench_streaks_stages.py``.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _synthetic_tile, drain
from xsarsea_tpu.gradients import (_extract_windows, _histogram_windows,
                                   _lg_arrays, _streaks_lg,
                                   streaks_histogram_core)
from xsarsea_tpu.ops.conv2d import r2_reduce


def timeit(label, fn, *args, reps=3, px=None):
    out = fn(*args)
    drain(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    dt = (time.time() - t0) / reps
    rate = f"  {px / dt / 1e6:8.1f} Mpx/s" if px else ""
    print(f"{label:42s} {dt * 1e3:9.2f} ms{rate}")
    return out


def main():
    ny, nx = 4096, 4096
    img = _synthetic_tile(ny, nx, seed=1)
    win = 40
    n_lg = ny // 4
    centers = np.arange(win // 2, n_lg - win // 2, win, dtype=np.int32)
    bins = np.linspace(-np.pi / 2, np.pi / 2, 73)
    bins = ((bins[1:] + bins[:-1]) / 2).astype(np.float32)

    img_d = jnp.asarray(img)
    cl = jnp.asarray(centers)
    bins_d = jnp.asarray(bins)
    px = ny * nx

    print(f"input {ny}x{nx} | win {win} | {len(centers)}^2 windows")

    # full fused pipeline
    fn = jax.jit(lambda im, a, b, bd: streaks_histogram_core(
        im, a, b, win, bd))
    timeit("FUSED streaks_histogram_core", fn, img_d, cl, cl, bins_d, px=px)

    # stage A: first R2 (input -> 2x grid) + sqrt
    r2a = jax.jit(lambda x: jnp.sqrt(r2_reduce(x)))
    ampl = timeit("A  r2_reduce(img) + sqrt", r2a, img_d, px=px)

    # stage B: local-gradients cascade on the 2x grid
    lgb = jax.jit(_lg_arrays)
    lg = timeit("B  _lg_arrays (scharr + 3x r2)", lgb, ampl, px=px)
    g2_abs, g2_angle, c = lg[3], lg[4], lg[5]

    # A+B fused (what _streaks_lg compiles to)
    slg = jax.jit(_streaks_lg)
    timeit("A+B _streaks_lg fused", slg, img_d, px=px)

    # stage C: stacked window extraction (production: all 3 channels on
    # one (3, w, w) slice per window)
    def wins(a, b, q):
        w3 = _extract_windows(jnp.stack([a, b, q]), cl, cl, win, win)
        return w3[:, 0, :], w3[:, 1, :], w3[:, 2, :]

    wjit = jax.jit(wins)
    aw, gw, qw = timeit("C  _extract_windows stacked x3", wjit, g2_abs,
                        g2_angle, c, px=px)

    # retired form: three per-channel extraction passes
    def wins_sep(a, b, q):
        pad = win
        return (_extract_windows(a, cl, cl, pad, win),
                _extract_windows(b, cl, cl, pad, win),
                _extract_windows(q, cl, cl, pad, win))
    timeit("C' per-channel extraction x3 (retired)", jax.jit(wins_sep),
           g2_abs, g2_angle, c, px=px)

    # stage D: histogram (median sort + one-hot broadcast-reduce)
    hjit = jax.jit(lambda a, b, q: _histogram_windows(a, b, q, bins_d))
    timeit("D  _histogram_windows (sort+reduce)", hjit, aw, gw, qw, px=px)

    # D split: the masked median sort alone
    sjit = jax.jit(lambda a: jnp.sort(
        jnp.where((~jnp.isnan(a)) & (a > 0), a, jnp.inf), axis=1))
    timeit("D1 masked sort alone", sjit, aw, px=px)

    # D split: everything but the sort (median replaced by a cheap mean)
    def hist_nosort(a, b, q):
        n_angles = bins_d.shape[0]
        nwin, wpix = a.shape
        mask1 = (~jnp.isnan(a)) & (a > 0)
        med = jnp.nanmean(jnp.where(mask1, a, jnp.nan), axis=1)
        step = bins_d[1] - bins_d[0]
        k = jnp.round((b - bins_d[0]) / step)
        r = a / (a + med[:, None])
        w = r * q
        mask2 = mask1 & (~jnp.isnan(k)) & (~jnp.isnan(w))
        wm = jnp.where(mask2, w, 0.0)
        ki = jnp.clip(k, 0, n_angles - 1).astype(jnp.int32)
        flat_idx = (jnp.arange(nwin, dtype=jnp.int32)[:, None] * n_angles
                    + ki).reshape(-1)
        hist = jnp.zeros((nwin * n_angles,), wm.dtype).at[flat_idx].add(
            wm.reshape(-1))
        return hist.reshape(nwin, n_angles), mask1.sum(axis=1) / wpix
    timeit("D2 histogram w/ mean stand-in (no sort)",
           jax.jit(hist_nosort), aw, gw, qw, px=px)

    # D split: broadcast-reduce alone (production histogram form)
    def bred(b, q):
        n_angles = bins_d.shape[0]
        k = jnp.round((b - bins_d[0]) / (bins_d[1] - bins_d[0]))
        ki = jnp.clip(k, 0, n_angles - 1).astype(jnp.int32)
        wm = jnp.where(jnp.isnan(q), 0.0, q)
        oh = ki[:, :, None] == jnp.arange(n_angles, dtype=jnp.int32)
        return jnp.sum(jnp.where(oh, wm[:, :, None],
                                 jnp.zeros_like(wm)[..., None]), axis=1)
    timeit("D3 one-hot broadcast-reduce alone", jax.jit(bred), gw, qw,
           px=px)

    # retired form: flat scatter-add (TPU scatters ~10 ns/element)
    def scat(b, q):
        n_angles = bins_d.shape[0]
        nwin = b.shape[0]
        k = jnp.round((b - bins_d[0]) / (bins_d[1] - bins_d[0]))
        ki = jnp.clip(k, 0, n_angles - 1).astype(jnp.int32)
        wm = jnp.where(jnp.isnan(q), 0.0, q)
        flat_idx = (jnp.arange(nwin, dtype=jnp.int32)[:, None] * n_angles
                    + ki).reshape(-1)
        return jnp.zeros((nwin * n_angles,), wm.dtype).at[flat_idx].add(
            wm.reshape(-1))
    timeit("D3' scatter-add (retired)", jax.jit(scat), gw, qw, px=px)

    # D alt: one-hot matmul histogram (MXU) instead of scatter-add
    def onehot_hist(b, q):
        n_angles = bins_d.shape[0]
        k = jnp.round((b - bins_d[0]) / (bins_d[1] - bins_d[0]))
        ki = jnp.clip(k, 0, n_angles - 1).astype(jnp.int32)
        wm = jnp.where(jnp.isnan(q), 0.0, q)
        oh = jax.nn.one_hot(ki, n_angles, dtype=wm.dtype)  # (nwin, wpix, A)
        return jnp.einsum("nw,nwa->na", wm, oh)
    timeit("D4 one-hot matmul hist alone", jax.jit(onehot_hist), gw, qw,
           px=px)


if __name__ == "__main__":
    main()
