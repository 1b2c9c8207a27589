"""Detrend and direction-convention parity vs the reference code."""

import sys
import types

import numpy as np
import pytest

from xsarsea_tpu import (
    dir_meteo_to_oceano,
    dir_meteo_to_sample,
    dir_oceano_to_meteo,
    dir_sample_to_meteo,
    dir_to_180,
    dir_to_360,
    sigma0_detrend,
)
from xsarsea_tpu.dimarray import DimArray
from reference_runner import REF_SRC, _ensure_pkg, _exec_file, load_ref_gmfs

rng = np.random.default_rng(0)


_ref_detrend_cache = None


def load_ref_detrend():
    """Load the reference detrend.py (direction helpers are pure numpy)."""
    global _ref_detrend_cache
    if _ref_detrend_cache is None:
        saved = {k: sys.modules.get(k)
                 for k in ("xarray", "xsarsea.utils", "xsarsea.windspeed.models")}
        xr_stub = types.ModuleType("xarray")
        utils_stub = types.ModuleType("xsarsea.utils")
        utils_stub.timing = lambda logger=None: (lambda f: f)
        utils_stub.logger = types.SimpleNamespace(info=lambda *a, **k: None)
        models_stub = types.ModuleType("xsarsea.windspeed.models")
        models_stub.get_model = lambda name: None
        _ensure_pkg("xsarsea")
        _ensure_pkg("xsarsea.windspeed")
        sys.modules["xarray"] = xr_stub
        sys.modules["xsarsea.utils"] = utils_stub
        sys.modules["xsarsea.windspeed.models"] = models_stub
        try:
            _ref_detrend_cache = _exec_file(
                f"{REF_SRC}/detrend.py", "xsarsea_ref_detrend")
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v
    return _ref_detrend_cache


@pytest.mark.parametrize("fn_name", [
    "dir_meteo_to_sample", "dir_sample_to_meteo",
    "dir_meteo_to_oceano", "dir_oceano_to_meteo",
    "dir_to_180", "dir_to_360",
])
def test_direction_conversions_match_reference(fn_name):
    ref = load_ref_detrend()
    ours = {
        "dir_meteo_to_sample": dir_meteo_to_sample,
        "dir_sample_to_meteo": dir_sample_to_meteo,
        "dir_meteo_to_oceano": dir_meteo_to_oceano,
        "dir_oceano_to_meteo": dir_oceano_to_meteo,
        "dir_to_180": dir_to_180,
        "dir_to_360": dir_to_360,
    }[fn_name]
    ref_fn = getattr(ref, fn_name)

    angles = rng.uniform(-720.0, 720.0, 200)
    if fn_name in ("dir_meteo_to_sample", "dir_sample_to_meteo"):
        heading = rng.uniform(-180.0, 360.0, 200)
        np.testing.assert_allclose(
            np.asarray(ours(angles, heading)), np.asarray(ref_fn(angles, heading)),
            rtol=0, atol=1e-10)
    else:
        np.testing.assert_allclose(
            np.asarray(ours(angles)), np.asarray(ref_fn(angles)),
            rtol=0, atol=1e-10)


def test_sigma0_detrend_matches_reference_algorithm():
    """Parity with the reference detrend math (detrend.py:55-64), with the
    GMF sample evaluated by the reference's own cmod5n scalar function."""
    gmfs = load_ref_gmfs()
    h, w = 40, 120
    inc = np.linspace(19.0, 46.0, w)[None, :].repeat(h, 0)
    sigma0 = rng.uniform(1e-3, 0.5, (h, w))
    sigma0[3, 5] = np.nan

    # reference algorithm in f64: GMF on first line at (10 m/s, 45 deg)
    gmf_row = np.array([gmfs["gmf_cmod5n"](i, 10.0, 45.0) for i in inc[0]])
    ratio = gmf_row / np.nanmean(gmf_row)
    expected = sigma0 / ratio[None, :]

    got = sigma0_detrend(
        DimArray(sigma0, dims=("line", "sample")),
        DimArray(inc, dims=("line", "sample")),
    )
    np.testing.assert_allclose(np.asarray(got.data), expected,
                               rtol=1e-6, atol=1e-12)
    assert np.isnan(np.asarray(got.data)[3, 5])
