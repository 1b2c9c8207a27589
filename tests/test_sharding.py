"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xsarsea_tpu.models import get_model
from xsarsea_tpu.parallel import make_mesh, sharded_invert_pixels
from xsarsea_tpu.windspeed import prepare_tables
from xsarsea_tpu.windspeed.inversion import invert_pixels


def make_pixels(n=700, seed=0):
    rng = np.random.default_rng(seed)
    inc = rng.uniform(19.0, 45.0, n)
    speed = rng.uniform(1.5, 25.0, n)
    direc = rng.uniform(-np.pi, np.pi, n)
    co_fn = get_model("gmf_cmod5n")._gmf_fn
    cr_fn = get_model("gmf_s1_v2")._gmf_fn
    s0_co_db = 10 * np.log10(
        np.asarray(co_fn(inc, speed, np.abs(np.rad2deg(direc)))) + 1e-15)
    s0_cr_db = 10 * np.log10(np.asarray(cr_fn(inc, speed)) + 1e-15)
    anc = (speed + rng.normal(0, 2, n)).clip(0.3) * np.exp(1j * direc)
    dsig_cr = rng.uniform(0.1, 1.0, n)
    inc[0] = np.nan
    s0_co_db[1] = np.nan
    anc[2] = np.nan
    return inc, s0_co_db, s0_cr_db, dsig_cr, anc


@pytest.fixture(scope="module")
def tables():
    kwargs = dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    return prepare_tables("gmf_cmod5n", "gmf_s1_v2", dtype=jnp.float64, **kwargs)


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2), (2, 4)])
def test_sharded_inversion_matches_single_device(tables, n_data, n_model):
    inc, s0_co_db, s0_cr_db, dsig_cr, anc = make_pixels()
    mesh = make_mesh(n_data=n_data, n_model=n_model)

    co_ref, dual_ref = invert_pixels(tables, inc, s0_co_db, s0_cr_db, dsig_cr,
                                     anc, mode="exact")
    co_sh, dual_sh = sharded_invert_pixels(tables, inc, s0_co_db, s0_cr_db,
                                           dsig_cr, anc, mesh=mesh)

    for got, ref in ((co_sh, co_ref), (dual_sh, dual_ref)):
        nan_g, nan_r = np.isnan(np.abs(got)), np.isnan(np.abs(ref))
        np.testing.assert_array_equal(nan_g, nan_r)
        m = ~nan_r
        np.testing.assert_allclose(got[m].real, ref[m].real, atol=1e-9)
        np.testing.assert_allclose(got[m].imag, ref[m].imag, atol=1e-9)


def test_sharded_conv_halo_exchange():
    """Spatially-sharded convolution: XLA SPMD inserts the halo exchange."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xsarsea_tpu.ops.conv2d import r2_reduce

    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(0)
    img = rng.uniform(0.1, 1.0, size=(256, 96))

    ref = np.asarray(r2_reduce(jnp.asarray(img)))

    sharding = NamedSharding(mesh, P("data", None))
    img_sh = jax.device_put(jnp.asarray(img), sharding)
    out = jax.jit(r2_reduce)(img_sh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-13)


def test_invert_scenes_batch(tables):
    """Multi-scene batch: matches per-scene single-device inversion."""
    from xsarsea_tpu.parallel import invert_scenes

    mesh = make_mesh(n_data=4, n_model=2)
    scenes = []
    for seed, (h, w) in enumerate([(20, 30), (16, 25)]):
        inc, s0_co, s0_cr, dsig_cr, anc = make_pixels(h * w, seed=seed)
        scenes.append(dict(
            inc=inc.reshape(h, w), sigma0_co_db=s0_co.reshape(h, w),
            sigma0_cr_db=s0_cr.reshape(h, w), dsig_cr=dsig_cr.reshape(h, w),
            ancillary_wind=anc.reshape(h, w)))

    outs = invert_scenes(tables, scenes, mesh, chunk_size=64)
    assert len(outs) == 2
    for scene, (co, dual) in zip(scenes, outs):
        n = scene["inc"].size
        co_ref, dual_ref = invert_pixels(
            tables, scene["inc"].reshape(-1), scene["sigma0_co_db"].reshape(-1),
            scene["sigma0_cr_db"].reshape(-1), scene["dsig_cr"].reshape(-1),
            scene["ancillary_wind"].reshape(-1), mode="exact")
        assert co.shape == scene["inc"].shape
        m = ~np.isnan(np.abs(co_ref))
        np.testing.assert_allclose(co.reshape(-1)[m], co_ref[m], atol=1e-9)
        np.testing.assert_allclose(dual.reshape(-1)[m], dual_ref[m], atol=1e-9)
