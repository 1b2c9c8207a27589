"""xarray adapter tests: DataArrays in → DataArrays out at every public
entry point (reference surface parity: windspeed.py:17-124, detrend.py:66).

Uses the protocol stub in _xr_stub (same duck-typed surface as
xarray.DataArray); the adapters are fully duck-typed so real xarray
behaves identically.
"""

import numpy as np
import pytest

from _xr_stub import DataArray, Dataset

from xsarsea_tpu import sigma0_detrend
from xsarsea_tpu.interop import (
    is_dataarray_like, to_dataarray, to_dimarray)
from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import (
    get_dsig, invert_from_model, nesz_flattening)


def _scene(H=32, W=48, seed=0):
    rng = np.random.default_rng(seed)
    inc = np.linspace(19.0, 45.0, W)[None, :].repeat(H, 0)
    speed = rng.uniform(2.0, 24.0, (H, W))
    direc = rng.uniform(-np.pi, np.pi, (H, W))
    co_fn = get_model("gmf_cmod5n")._gmf_fn
    cr_fn = get_model("gmf_s1_v2")._gmf_fn
    s0_co = np.array(co_fn(inc, speed, np.abs(np.rad2deg(direc))))
    s0_cr = np.array(cr_fn(inc, speed))
    anc = speed * np.exp(1j * direc)
    return inc, s0_co, s0_cr, anc, speed


def _da(data, name=None, **attrs):
    h, w = np.shape(data)[:2]
    return DataArray(
        data, dims=("line", "sample"),
        coords={"line": np.arange(h, dtype=float),
                "sample": np.arange(w, dtype=float)},
        name=name, attrs=attrs)


def test_detection_and_conversion():
    da = _da(np.zeros((4, 5)), name="x", units="1")
    assert is_dataarray_like(da)
    assert not is_dataarray_like(np.zeros((4, 5)))
    dim = to_dimarray(da)
    assert isinstance(dim, DimArray)
    assert not is_dataarray_like(dim)
    assert dim.dims == ("line", "sample") and dim.attrs["units"] == "1"
    back = to_dataarray(dim, DataArray)
    assert isinstance(back, DataArray)
    assert back.dims == ("line", "sample")
    np.testing.assert_array_equal(back.coords["line"], np.arange(4.0))
    assert back.attrs["units"] == "1"


def test_invert_from_model_dataarrays_roundtrip():
    inc, s0_co, s0_cr, anc, speed = _scene()
    wco, wdual = invert_from_model(
        _da(inc), _da(s0_co, name="sigma0"), _da(s0_cr),
        ancillary_wind=_da(anc), dsig_cr=0.1,
        model=("gmf_cmod5n", "gmf_s1_v2"))
    for out in (wco, wdual):
        assert isinstance(out, DataArray)
        assert out.dims == ("line", "sample")
        assert out.shape == s0_co.shape
        assert "model" in out.attrs and "comment" in out.attrs
    rms = np.sqrt(np.nanmean((np.abs(wdual.values) - speed) ** 2))
    assert rms < 0.5
    # numpy in -> numpy out is untouched by the adapter
    wco2, _ = invert_from_model(
        inc, s0_co, s0_cr, ancillary_wind=anc, dsig_cr=0.1,
        model=("gmf_cmod5n", "gmf_s1_v2"))
    assert isinstance(wco2, np.ndarray)
    np.testing.assert_allclose(np.asarray(wco.values), wco2, equal_nan=True)


def test_detrend_dataarray_roundtrip():
    inc, s0_co, _, _, _ = _scene()
    out = sigma0_detrend(_da(np.abs(s0_co), name="sigma0", units="linear"),
                         _da(inc))
    assert isinstance(out, DataArray)
    assert out.dims == ("line", "sample")
    assert "detrended with model" in out.attrs["comment"]
    ref = sigma0_detrend(np.abs(s0_co), inc)
    np.testing.assert_allclose(out.values, np.asarray(ref), rtol=1e-6)


def test_dsig_and_nesz_dataarray_roundtrip():
    inc, _, s0_cr, _, _ = _scene()
    nesz = np.full_like(s0_cr, 1e-3)
    ds = get_dsig("gmf_s1_v2", _da(inc), _da(s0_cr), _da(nesz))
    assert isinstance(ds, DataArray) and ds.dims == ("line", "sample")
    ds_np = get_dsig("gmf_s1_v2", inc, s0_cr, nesz)
    np.testing.assert_allclose(ds.values, np.asarray(ds_np), rtol=1e-6)

    noise = np.abs(np.random.default_rng(1).normal(1e-3, 1e-4, inc.shape))
    flat = nesz_flattening(_da(noise), _da(inc))
    assert isinstance(flat, DataArray)
    flat_np = nesz_flattening(noise, inc)
    np.testing.assert_allclose(flat.values, np.asarray(flat_np), rtol=1e-6)


def test_gradients_dataarray_in_dataset_out():
    from xsarsea_tpu.gradients import Gradients, Gradients2D

    rng = np.random.default_rng(2)
    img = rng.uniform(0.01, 1.0, (128, 128))
    da = _da(img, name="sigma0")

    g2 = Gradients2D(da, window_size=32, window_step=1)
    h2 = g2.histogram
    assert isinstance(h2, Dataset)
    assert "weight" in h2 and "used_ratio" in h2
    assert h2["weight"].dims == ("line", "sample", "angles")

    g = Gradients(da, windows_sizes=[32], downscales_factors=[1])
    h = g.histogram
    assert isinstance(h, Dataset)
    assert h["weight"].dims[-1] == "angles"

    # native containers keep native outputs
    from xsarsea_tpu.dimarray import DimDataset

    g_native = Gradients2D(to_dimarray(da), window_size=32, window_step=1)
    assert isinstance(g_native.histogram, DimDataset)
    np.testing.assert_allclose(
        np.asarray(g_native.histogram["weight"].data),
        np.asarray(h2["weight"].values))


def test_aux_coords_restored_from_template():
    """2-D auxiliary coords (lat/lon rasters) dropped by the DimArray
    round trip are re-attached to outputs from the input template."""
    inc, s0_co, _, _, _ = _scene(16, 20)
    lat = np.linspace(40.0, 41.0, 16)[:, None].repeat(20, 1)
    da = _da(np.abs(s0_co), name="sigma0")
    da.coords["lat"] = lat
    out = sigma0_detrend(da, _da(inc))
    assert "lat" in out.coords
    np.testing.assert_array_equal(np.asarray(out.coords["lat"]), lat)


def test_to_dataarray_keeps_chunked_payload_lazy():
    """to_dataarray must pass a chunked payload through UNMATERIALIZED
    (review finding: np.asarray at the boundary computed scene-sized
    arrays where the reference returns lazy dask DataArrays)."""
    from test_streaming import LazyRows

    base = np.arange(12.0).reshape(4, 3)
    pulls = []

    def get(i, j):
        pulls.append((i, j))
        return base[i:j]

    lazy = LazyRows(get, base.shape, dtype=base.dtype)
    arr = DimArray(lazy, dims=("line", "sample"),
                   coords={"line": np.arange(4.0),
                           "sample": np.arange(3.0)})
    out = to_dataarray(arr, DataArray)
    assert not isinstance(out.data, np.ndarray)   # still the duck array
    assert pulls == []                            # nothing materialized
    np.testing.assert_array_equal(np.asarray(out.values), base)


def test_invert_chunked_dataarray_stub():
    """A DataArray wrapping a chunked (dask-like) array must stream
    through the lazy path — .data stays lazy through to_dimarray, output
    DataArrays equal the eager results (reference windspeed.py:345-367;
    the real-xarray twin lives in test_real_xarray_dask.py)."""
    from test_streaming import LazyRows

    inc, s0_co, s0_cr, anc, _ = _scene()
    KW = dict(inc_step=0.4, wspd_step=0.4, phi_step=2.5)
    co_ref, dual_ref = invert_from_model(
        inc, s0_co, s0_cr, ancillary_wind=anc, dsig_cr=0.1,
        model=("gmf_cmod5n", "gmf_s1_v2"), mode="exact", **KW)

    lz = lambda a: LazyRows(lambda i, j: a[i:j], a.shape, dtype=a.dtype)
    co_x, dual_x = invert_from_model(
        _da(lz(inc)), _da(lz(s0_co), name="sigma0"), _da(lz(s0_cr)),
        ancillary_wind=_da(lz(anc)), dsig_cr=0.1,
        model=("gmf_cmod5n", "gmf_s1_v2"), mode="exact", piece_size=1024,
        **KW)
    assert isinstance(co_x, DataArray)
    assert co_x.dims == ("line", "sample")
    np.testing.assert_array_equal(np.asarray(co_x.values), np.asarray(co_ref))
    np.testing.assert_array_equal(np.asarray(dual_x.values),
                                  np.asarray(dual_ref))
