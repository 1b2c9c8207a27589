"""Interop against REAL xarray + dask (VERDICT r3 item 5).

The rest of the suite exercises the duck-typed interop layer against the
hand-written protocol stub (``_xr_stub``); this module runs the same
public entry points on genuine ``xr.DataArray(dask.array)`` inputs —
chunked ``invert_from_model``, ``Gradients2D``, ``sigma0_detrend`` — and
asserts the outputs equal the eager numpy-path results (the reference's
own triple-dispatch contract, reference test_xsarsea.py:109-143,
windspeed.py:333-367).

Skipped automatically where xarray/dask are not installed; one CI matrix
cell installs them (ci.yaml ``real-xarray: 1``).
"""

import numpy as np
import pytest

xr = pytest.importorskip("xarray")
da_mod = pytest.importorskip("dask.array")

from xsarsea_tpu import sigma0_detrend
from xsarsea_tpu.dimarray import DimArray, is_chunked
from xsarsea_tpu.gradients import Gradients2D
from xsarsea_tpu.interop import is_dataarray_like, to_dimarray
from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import invert_from_model

KW = dict(inc_step=0.4, wspd_step=0.4, phi_step=2.5)


def _scene(H=64, W=80, seed=0):
    rng = np.random.default_rng(seed)
    inc = np.linspace(19.0, 45.0, W)[None, :].repeat(H, 0)
    speed = rng.uniform(2.0, 24.0, (H, W))
    direc = rng.uniform(-np.pi, np.pi, (H, W))
    co_fn = get_model("gmf_cmod5n")._gmf_fn
    cr_fn = get_model("gmf_s1_v2")._gmf_fn
    s0_co = np.array(co_fn(inc, speed, np.abs(np.rad2deg(direc))))
    s0_cr = np.array(cr_fn(inc, speed))
    anc = speed * np.exp(1j * direc)
    # a NaN patch: the lazy and eager paths must agree on missing data
    s0_co[3:5, 7:9] = np.nan
    return inc, s0_co, s0_cr, anc


def _xda(data, chunks=None, name=None):
    h, w = data.shape
    arr = da_mod.from_array(data, chunks=chunks) if chunks else data
    return xr.DataArray(
        arr, dims=("line", "sample"),
        coords={"line": np.arange(h, dtype=float),
                "sample": np.arange(w, dtype=float)},
        name=name)


def test_protocol_detection_on_real_objects():
    """is_chunked on real dask, is_dataarray_like/to_dimarray on real
    xarray — the protocol assumptions the whole interop layer keys on."""
    d = da_mod.ones((8, 4), chunks=(2, 4))
    assert is_chunked(d)
    assert not is_chunked(np.ones((8, 4)))

    xa = _xda(np.ones((8, 4)), name="s0")
    assert is_dataarray_like(xa)
    dim = to_dimarray(xa)
    assert isinstance(dim, DimArray)
    assert dim.dims == ("line", "sample")

    # dask-backed DataArray keeps its lazy array through to_dimarray
    xa_l = _xda(np.ones((8, 4)), chunks=(2, 4))
    dim_l = to_dimarray(xa_l)
    assert is_chunked(dim_l.data)


def test_invert_chunked_dataarray_matches_eager():
    """Dual-pol inversion on xr.DataArray(dask) inputs: streams without
    materializing up front, returns xr.DataArrays equal to the eager
    numpy-path results."""
    inc, s0_co, s0_cr, anc = _scene()
    co_ref, dual_ref = invert_from_model(
        inc, s0_co, s0_cr, ancillary_wind=anc, dsig_cr=0.1,
        model=("gmf_cmod5n", "gmf_s1_v2"), mode="exact", **KW)

    chunks = (16, s0_co.shape[1])
    co_x, dual_x = invert_from_model(
        _xda(inc, chunks), _xda(s0_co, chunks, name="sigma0"),
        _xda(s0_cr, chunks), ancillary_wind=_xda(anc, chunks),
        dsig_cr=0.1, model=("gmf_cmod5n", "gmf_s1_v2"), mode="exact",
        piece_size=1024, **KW)

    assert isinstance(co_x, xr.DataArray)
    assert isinstance(dual_x, xr.DataArray)
    assert co_x.dims == ("line", "sample")
    np.testing.assert_array_equal(np.asarray(co_x.values),
                                  np.asarray(co_ref))
    np.testing.assert_array_equal(np.asarray(dual_x.values),
                                  np.asarray(dual_ref))


def test_gradients2d_chunked_dataarray_matches_eager():
    """Gradients2D on a dask-backed DataArray takes the banded
    out-of-core path and matches the in-memory result."""
    rng = np.random.default_rng(3)
    ny, nx = 256, 224
    y, x = np.mgrid[0:ny, 0:nx]
    img = np.abs(1.0 + 0.5 * np.sin(0.3 * (x + 0.5 * y))
                 + 0.1 * rng.normal(size=(ny, nx))) + 0.01

    h_ref = Gradients2D(img, window_size=64, window_step=1)._histogram_native

    g = Gradients2D(_xda(img, chunks=(32, nx), name="sigma0"),
                    window_size=64, window_step=1)
    h_x = g.histogram
    assert isinstance(h_x, xr.Dataset)
    np.testing.assert_allclose(
        np.asarray(h_x["weight"].values),
        np.asarray(h_ref["weight"].data), rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(h_x["used_ratio"].values),
        np.asarray(h_ref["used_ratio"].data), rtol=1e-10, atol=1e-14)


def test_detrend_chunked_dataarray_matches_eager():
    inc, s0_co, _, _ = _scene()
    ref = sigma0_detrend(np.abs(s0_co) + 1e-3, inc)

    chunks = (16, s0_co.shape[1])
    out = sigma0_detrend(_xda(np.abs(s0_co) + 1e-3, chunks, name="sigma0"),
                         _xda(inc, chunks))
    assert isinstance(out, xr.DataArray)
    np.testing.assert_allclose(np.asarray(out.values), np.asarray(ref),
                               rtol=1e-12, atol=0)


def test_lazy_all_nan_ancillary_rejected_real_dask():
    """The lazy-ancillary validation (advisor r3) must fire on a real
    all-NaN dask array, not just the duck-typed stub."""
    H, W = 16, 8
    inc = np.full((H, W), 30.0)
    s0 = np.full((H, W), 0.01)
    anc = da_mod.full((H, W), np.nan + 0j, chunks=(4, W))
    with pytest.raises(ValueError, match="ancillary_wind"):
        invert_from_model(
            _xda(inc, (4, W)), _xda(s0, (4, W), name="sigma0"),
            ancillary_wind=xr.DataArray(
                anc, dims=("line", "sample"),
                coords={"line": np.arange(H, dtype=float),
                        "sample": np.arange(W, dtype=float)}),
            model="gmf_cmod5n", mode="exact", **KW)


def test_multipol_chunked_gradients_real_dask():
    """3-D (pol, line, sample) dask-backed DataArray streams through
    Gradients via virtual per-pol lazy views."""
    from xsarsea_tpu.gradients import Gradients

    rng = np.random.default_rng(7)
    ny, nx = 192, 160
    y, x = np.mgrid[0:ny, 0:nx]
    base = np.abs(1.0 + 0.5 * np.sin(0.3 * (x + 0.5 * y))
                  + 0.1 * rng.normal(size=(ny, nx))) + 0.01
    img3 = np.stack([base, 0.25 * base])
    coords = {"pol": np.array(["VV", "VH"]),
              "line": np.arange(ny, dtype=float),
              "sample": np.arange(nx, dtype=float)}

    eager = Gradients(
        xr.DataArray(img3, dims=("pol", "line", "sample"), coords=coords),
        windows_sizes=[48], downscales_factors=[1]).histogram
    lazy = Gradients(
        xr.DataArray(da_mod.from_array(img3, chunks=(1, 32, nx)),
                     dims=("pol", "line", "sample"), coords=coords),
        windows_sizes=[48], downscales_factors=[1]).histogram

    assert isinstance(lazy, xr.Dataset)
    np.testing.assert_allclose(np.asarray(lazy["weight"].values),
                               np.asarray(eager["weight"].values),
                               rtol=1e-10, atol=1e-300)
