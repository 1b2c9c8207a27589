"""Model registry, LUT normalization, serialization round-trips."""

import numpy as np
import pytest

from xsarsea_tpu.models import (
    Cmod7Model,
    GmfModel,
    NcLutModel,
    available_models,
    get_model,
    register_cmod7,
    register_nc_luts,
    register_pickle_luts,
)
from reference_runner import ref_gmf_grid


def test_builtin_models_registered():
    idx = available_models().index
    for name in ["gmf_cmod5", "gmf_cmod5n", "gmf_cmodifr2", "gmf_rs2_v2", "gmf_s1_v2"]:
        assert name in idx


def test_alias_resolution():
    table = available_models()
    # gmf_cmod5n (priority 3) owns the 'cmod5n' alias
    assert get_model("cmod5n") is get_model("gmf_cmod5n")
    assert table.loc["gmf_cmod5n", "alias"] == "cmod5n"


def test_lut_generation_low_and_high():
    model = get_model("gmf_cmod5n")
    lut_lo = model.to_lut(units="dB", resolution="low")
    assert lut_lo.dims == ("incidence", "wspd", "phi")
    # low res grid: inc step 1.0 over [16, 66] -> 51
    assert lut_lo.sizes["incidence"] == 51
    assert lut_lo.sizes["wspd"] == 250  # [0.2, 50] step 0.2 -> 250
    assert lut_lo.sizes["phi"] == 73  # [0, 180] step 2.5 -> 73

    lut_hi = model.to_lut(units="dB")  # default: high, interped from low
    assert lut_hi.sizes["incidence"] == 501
    assert lut_hi.sizes["wspd"] == 499
    assert lut_hi.sizes["phi"] == 181


def test_low_res_lut_matches_reference_values():
    """The low-res analytic grid must match the reference evaluation."""
    model = get_model("gmf_cmod5n")
    lut = model.to_lut(units="linear", resolution="low")
    inc = lut.coords["incidence"][::10]
    wspd = lut.coords["wspd"][::25]
    phi = lut.coords["phi"][::9]
    sub = np.asarray(lut.sel(incidence=inc).sel(wspd=wspd).sel(phi=phi))
    expected = ref_gmf_grid("gmf_cmod5n", inc, wspd, phi)
    np.testing.assert_allclose(sub, expected, rtol=1e-10)


def test_high_res_lut_is_interped_from_low():
    """Default high-res LUT = linear interp of the low-res grid (parity with
    the reference default pipeline gmfs.py:353 + models.py:142-167)."""
    model = get_model("gmf_cmod5n")
    lut_lo = model.to_lut(units="dB", resolution="low")
    lut_hi = model.to_lut(units="dB")
    # at a point midway between two low-res wspd nodes, high-res must equal
    # the average of the nodes (linear interp), not the analytic value
    # interp happens in the model's native (linear) units, then dB conversion
    wspd_lo = lut_lo.coords["wspd"]
    mid = (wspd_lo[10] + wspd_lo[11]) / 2
    hi_val = lut_hi.sel(incidence=30.0).sel(phi=90.0).interp(wspd=[mid]).values[0]
    lo_pair = lut_lo.sel(incidence=30.0).sel(phi=90.0).isel(wspd=slice(10, 12)).values
    expected = 10.0 * np.log10((10.0 ** (lo_pair / 10.0)).mean())
    np.testing.assert_allclose(hi_val, expected, rtol=1e-9)


def test_netcdf_roundtrip(tmp_path):
    model = get_model("gmf_rs2_v2")
    path = tmp_path / "nc_lut_gmf_rs2_v2.nc"
    model.to_netcdf(str(path))

    register_nc_luts(str(tmp_path))
    reloaded = get_model("nc_lut_gmf_rs2_v2")
    assert isinstance(reloaded, NcLutModel)
    assert reloaded.pol == "VH"
    assert reloaded.units == "dB"

    # to_netcdf stores crosspol at explicit high res (analytic grid), so
    # compare against the same explicit-resolution LUT
    lut_orig = model.to_lut(units="dB", resolution="high")
    lut_back = reloaded.to_lut(units="dB")
    assert lut_back.dims == lut_orig.dims
    np.testing.assert_allclose(np.asarray(lut_back), np.asarray(lut_orig), rtol=1e-6, atol=1e-9)


def test_lut_model_call_scalar_and_1d(tmp_path):
    model = get_model("gmf_s1_v2")
    path = tmp_path / "nc_lut_gmf_s1_v2.nc"
    model.to_netcdf(str(path))
    register_nc_luts(str(tmp_path))
    lm = get_model("nc_lut_gmf_s1_v2")

    scalar = lm(35.0, 15.0)
    assert np.isscalar(scalar)
    direct = float(np.asarray(model(35.0, 15.0)))
    # LUT path goes linear->dB->interp->back; tolerance accordingly
    np.testing.assert_allclose(10 ** (scalar / 10.0), direct, rtol=1e-3)

    arr = lm(np.array([20.0, 30.0]), np.array([5.0, 10.0, 15.0]))
    assert arr.dims == ("incidence", "wspd")
    assert arr.shape == (2, 3)

    with pytest.raises(NotImplementedError):
        lm(np.zeros((2, 2)), np.zeros((2, 2)))


def test_cmod7_reader(tmp_path):
    """Synthesize a KNMI-format binary table and validate the reader."""
    m, n, p = 250, 73, 51
    rng = np.random.default_rng(1)
    table = rng.uniform(1e-4, 1e-1, size=(m, n, p)).astype(np.float32)
    flat = np.concatenate([
        np.array([0.0], dtype=np.float32),
        table.reshape(-1, order="F"),
        np.array([0.0], dtype=np.float32),
    ])
    cmod7_dir = tmp_path / "cmod7"
    cmod7_dir.mkdir()
    flat.astype("<f4").tofile(cmod7_dir / "gmf_cmod7_vv.dat_little_endian")

    register_cmod7(str(cmod7_dir))
    model = get_model("gmf_cmod7")
    assert isinstance(model, Cmod7Model)
    lut = model.to_lut(units="linear", resolution="low")
    assert lut.dims == ("incidence", "wspd", "phi")
    assert lut.shape == (p, m, n)
    # spot check: lut[incidence i, wspd j, phi k] == table[j, k, i]
    np.testing.assert_allclose(np.asarray(lut)[5, 10, 20], table[10, 20, 5], rtol=1e-6)
    # cmod7 has priority 1 -> owns the 'cmod7' alias
    assert get_model("cmod7") is model


def test_pickle_lut_reader(tmp_path):
    import pickle

    lut_dir = tmp_path / "GMF_testpkl"
    lut_dir.mkdir()
    inc = np.arange(17.0, 51.0, 1.0)
    wspd = np.arange(3.0, 40.0, 0.5)
    sigma_db = np.random.default_rng(2).uniform(-30, -5, size=(len(wspd), len(inc)))
    # reference stores sigma.npy transposed (pickle_luts.py:27)
    np.save(lut_dir / "sigma.npy", sigma_db.T)
    with open(lut_dir / "incidence_angle.pkl", "wb") as f:
        pickle.dump(inc, f)
    with open(lut_dir / "wind_speed.pkl", "wb") as f:
        pickle.dump(wspd, f)

    register_pickle_luts(str(lut_dir))
    model = get_model("sarwing_lut__testpkl")
    assert model.pol == "VH"
    lut = model.to_lut(units="dB", resolution="high")
    assert lut.dims == ("incidence", "wspd")
    got = lut.sel(incidence=20.0).sel(wspd=5.0).item()
    expected = sigma_db[np.where(wspd == 5.0)[0][0], np.where(inc == 20.0)[0][0]]
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_lut_cache():
    model = get_model("gmf_cmod5n")
    a = model.to_lut(units="dB")
    b = model.to_lut(units="dB")
    # cache hit: same payload, but a FRESH container so mutating one
    # caller's attrs can never corrupt another's (round-1 advisor fix)
    assert a.data is b.data
    assert a is not b and a.attrs == b.attrs
