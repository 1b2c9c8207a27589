"""Microbenchmark: packed row-gather cost vs source-table size (TPU).

Stage 3 of the fused inversion pipeline un-permutes results with ONE
packed (n, 4) f32 row gather from an n-row table (~14 ns/px of the
22.3 ns/px stage). An alternative shape emits one packed i32 index per
pixel instead (scatter-invert + (n,) i32 gather) and decodes values in
pixel order from the SMALL (n_wspd*n_phi, 4) decode table — worth it
only if gathers from a cache-resident table are much cheaper than from
an n-row HBM table. This measures exactly that tradeoff.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gather_sizes.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 23
REPS = 5


def timed(name, fn, *args):
    from bench import drain

    out = fn(*args)
    drain(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    drain(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt * 1e3:8.1f} ms   {dt / N * 1e9:6.1f} ns/px",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    idx_big = jnp.asarray(rng.permutation(N).astype(np.int32))
    big4 = jnp.asarray(rng.standard_normal((N, 4)).astype(np.float32))
    small_rows = 481 * 181  # the (wspd, phi) decode-table size
    small4 = jnp.asarray(
        rng.standard_normal((small_rows, 4)).astype(np.float32))
    idx_small = jnp.asarray(
        rng.integers(0, small_rows, N).astype(np.int32))
    vals_i32 = jnp.asarray(rng.integers(0, 1 << 26, N).astype(np.int32))

    timed("(n,4) f32 row gather, big table (n rows)",
          jax.jit(lambda t, i: t[i]), big4, idx_big)
    timed("(n,4) f32 row gather, small table (87k)",
          jax.jit(lambda t, i: t[i]), small4, idx_small)
    timed("(n,) i32 gather, big table",
          jax.jit(lambda t, i: t[i]), vals_i32, idx_big)
    timed("(n,) i32 scatter (inverse-perm build)",
          jax.jit(lambda i: jnp.zeros((N,), jnp.int32).at[i].set(
              jnp.arange(N, dtype=jnp.int32), mode="drop")), idx_big)
    # the full candidate stage-3 alternative: scatter-invert + 1-wide
    # gather + small-table decode gather
    timed("alt stage 3: scatter + i32 gather + decode",
          jax.jit(lambda i, v, t: t[jnp.clip(
              v[jnp.zeros((N,), jnp.int32).at[i].set(
                  jnp.arange(N, dtype=jnp.int32), mode="drop")],
              0, small_rows - 1)]),
          idx_big, jnp.asarray(idx_small), small4)
    # the shipped stage 3: scatter-invert + (n,4) big-table gather
    timed("shipped stage 3: scatter + (n,4) gather",
          jax.jit(lambda i, t: t[jnp.zeros((N,), jnp.int32).at[i].set(
              jnp.arange(N, dtype=jnp.int32), mode="drop")]),
          idx_big, big4)


if __name__ == "__main__":
    main()
