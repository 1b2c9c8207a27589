"""Micro-benchmark stage-B kernel variants in isolation (TPU).

Isolates the per-step cost components of the coarse group-argmin kernel:
matmul precision, group-min reduction formulation, pixel block size.
Run manually: PYTHONPATH=/root/repo python scripts/bench_kernel_variants.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_INC = 501
N_TILES = 4
TILE = 2048
GSIZE = 256
GPT = TILE // GSIZE
N_GROUPS = 32

rng = np.random.default_rng(0)
g4 = jnp.asarray(rng.normal(size=(N_INC, N_TILES, 4, TILE)).astype(np.float32))


def make_variant(block, reduction, precision):
    n_blocks = (1 << 23) // block

    def kernel(band_ref, feats_ref, g4_ref, out_ref, gmin_scr):
        t = pl.program_id(1)
        j = lax.dot_general(
            g4_ref[0, 0], feats_ref[0], (((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

        if reduction == "reshape":
            gm = jnp.min(j.reshape(GPT, GSIZE, block), axis=1)
            gmin_scr[pl.ds(t * GPT, GPT), :] = gm
        elif reduction == "static_slices":
            for k in range(GPT):
                gmin_scr[t * GPT + k, :] = jnp.min(
                    j[k * GSIZE:(k + 1) * GSIZE], axis=0)
        elif reduction == "flat_min":
            gmin_scr[pl.ds(t * GPT, 1), :] = jnp.min(j, axis=0, keepdims=True)
        elif reduction == "none":
            gmin_scr[pl.ds(t * GPT, GPT), :] = j[:GPT]

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            scr = gmin_scr[:]
            tmin = jnp.min(scr, axis=0, keepdims=True)
            gidx = lax.broadcasted_iota(jnp.int32, scr.shape, 0)
            best = jnp.min(jnp.where(scr == tmin, gidx, 2**30),
                           axis=0, keepdims=True)
            out_ref[0, :] = jnp.clip(best, 0, N_GROUPS - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, N_TILES),
        in_specs=[
            pl.BlockSpec((1, 4, block), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, TILE), lambda b, t, s: (s[b], t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block), lambda b, t, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N_TILES * GPT, block), jnp.float32)],
    )

    @jax.jit
    def run(band_of_block, feats):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, 1, block), jnp.int32),
        )(band_of_block, feats, g4)

    n = n_blocks * block
    feats = jnp.asarray(rng.normal(size=(n_blocks, 4, block)).astype(np.float32))
    bob = jnp.asarray(np.sort(rng.integers(0, N_INC, n_blocks)).astype(np.int32))
    return run, bob, feats, n


def bench(name, block, reduction, precision, reps=3):
    run, bob, feats, n = make_variant(block, reduction, precision)
    out = run(bob, feats)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = run(bob, feats)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.1f} ms  {n/dt/1e6:7.2f} Mpx/s")


H = lax.Precision.HIGHEST
D = lax.Precision.DEFAULT
bench("block=256 reshape HIGHEST (current)", 256, "reshape", H)
bench("block=256 static_slices HIGHEST", 256, "static_slices", H)
bench("block=256 flat_min HIGHEST", 256, "flat_min", H)
bench("block=256 none HIGHEST", 256, "none", H)
bench("block=256 none DEFAULT", 256, "none", D)
bench("block=512 reshape HIGHEST", 512, "reshape", H)
bench("block=1024 reshape HIGHEST", 1024, "reshape", H)
bench("block=1024 static_slices HIGHEST", 1024, "static_slices", H)
bench("block=1024 none DEFAULT", 1024, "none", D)
