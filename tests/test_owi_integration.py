"""Real-scene integration path: OWI file -> NESZ flattening -> dsig ->
dual-pol inversion, mirroring the reference flagship test
(/root/reference/test/test_xsarsea.py:81-143) on a synthesized OWI HDF5
(no network in this environment)."""

import numpy as np
import pytest

from xsarsea_tpu import dir_meteo_to_sample, read_sarwing_owi
from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import invert_from_model, nesz_flattening


@pytest.fixture(scope="module")
def owi_file(tmp_path_factory):
    """Synthesize a small sarwing-OWI-like HDF5 scene with physical fields."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(5)
    ny, nx = 40, 50
    inc = np.linspace(30.0, 42.0, nx)[None, :].repeat(ny, axis=0)
    speed = rng.uniform(3.0, 22.0, (ny, nx))
    wdir_meteo = rng.uniform(0.0, 360.0, (ny, nx))   # meteo convention
    heading = np.full((ny, nx), 347.0)

    # forward-model sigma0 from the true wind (antenna-relative phi)
    phi = np.rad2deg(
        np.asarray(dir_meteo_to_sample(wdir_meteo, heading), dtype=np.float64))
    co_fn = get_model("gmf_cmod5n")._gmf_fn
    cr_fn = get_model("gmf_s1_v2")._gmf_fn
    nrcs = np.array(co_fn(inc, speed, np.abs(phi)))
    nrcs_cr = np.array(cr_fn(inc, speed))
    nrcs *= rng.uniform(0.97, 1.03, nrcs.shape)
    nrcs_cr *= rng.uniform(0.97, 1.03, nrcs_cr.shape)
    # noise floor rising with incidence, with a few NaNs (reference
    # nesz rows contain missing samples)
    nesz_cr = 10.0 ** ((-31.0 + 0.12 * (inc - 30.0)
                        + rng.normal(0, 0.15, inc.shape)) / 10.0)
    nesz_cr[3, 7] = np.nan
    # land mask patch
    nrcs[5:9, 5:9] = np.nan

    path = tmp_path_factory.mktemp("owi") / "s1a-iw-owi-synthetic.nc"
    with h5py.File(path, "w") as f:
        f.create_dataset("owiIncidenceAngle", data=inc)
        f.create_dataset("owiNrcs", data=nrcs)
        f.create_dataset("owiNrcs_cross", data=nrcs_cr)
        f.create_dataset("owiNesz_cross", data=nesz_cr)
        f.create_dataset("owiEcmwfWindSpeed",
                         data=np.clip(speed + rng.normal(0, 1.0, speed.shape),
                                      0.3, None))
        f.create_dataset("owiEcmwfWindDirection",
                         data=wdir_meteo + rng.normal(0, 10.0, speed.shape))
        f.create_dataset("owiHeading", data=heading)
        # excluded calibration constants (read_sarwing_owi drops these)
        f.create_dataset("owiCalConstObsi", data=np.zeros((2, 3)))
        # merged-in group, like the reference owiInversionTables_UV
        g = f.create_group("owiInversionTables_UV")
        g.create_dataset("owiWindSpeed_Tab_dualpol_2steps",
                         data=rng.uniform(0, 25, (ny, nx)))
    return str(path), speed


def test_owi_read_compose_invert(owi_file):
    path, true_speed = owi_file
    ds = read_sarwing_owi(path)

    # reader contract (reference detrend.py:71-93)
    assert "owiCalConstObsi" not in ds
    assert "owiWindSpeed_Tab_dualpol_2steps" in ds  # group merged in
    for k in ("owiIncidenceAngle", "owiNrcs", "owiNrcs_cross",
              "owiNesz_cross"):
        # container is an xr.Dataset when xarray is installed, a dict of
        # DimArrays otherwise — assert the shared protocol, not the class
        assert tuple(ds[k].dims) == ("line", "sample")
        assert np.asarray(ds[k].data).ndim == 2

    # ancillary wind in antenna convention (test_xsarsea.py:87-88)
    anc = np.asarray(ds["owiEcmwfWindSpeed"].data) * np.exp(
        1j * np.asarray(dir_meteo_to_sample(
            ds["owiEcmwfWindDirection"].data, ds["owiHeading"].data)))

    # NESZ flattening + dsig (test_xsarsea.py:97-99)
    nesz_flat = nesz_flattening(ds["owiNesz_cross"], ds["owiIncidenceAngle"])
    assert isinstance(nesz_flat, DimArray)
    dsig_cr = (1.25 / (np.asarray(ds["owiNrcs_cross"].data)
                       / np.asarray(nesz_flat.data))) ** 4.0

    wind_co, wind_dual = invert_from_model(
        ds["owiIncidenceAngle"],
        ds["owiNrcs"],
        ds["owiNrcs_cross"],
        ancillary_wind=DimArray(anc, dims=("line", "sample"),
                                coords=ds["owiNrcs"].coords),
        dsig_cr=DimArray(dsig_cr, dims=("line", "sample"),
                         coords=ds["owiNrcs"].coords),
        model=("gmf_cmod5n", "gmf_s1_v2"),
    )

    # container/dtype/attrs contract (test_xsarsea.py:109-143)
    for out in (wind_co, wind_dual):
        assert isinstance(out, DimArray)
        assert out.dims == ("line", "sample")
        assert np.asarray(out.data).dtype.kind == "c"
        assert "model" in out.attrs and "comment" in out.attrs
    assert "gmf_s1_v2" in wind_dual.attrs["model"]

    co_speed = np.abs(np.asarray(wind_co.data))
    dual_speed = np.abs(np.asarray(wind_dual.data))
    # land pixels: NaN copol propagates to NaN copol wind
    assert np.isnan(co_speed[6, 6])
    # crosspol fills in over land -> dual is finite there
    assert np.isfinite(dual_speed[6, 6])
    # retrieval quality: dual wind close to the forward-model truth
    m = np.isfinite(dual_speed)
    rms = np.sqrt(np.mean((dual_speed[m] - true_speed[m]) ** 2))
    assert rms < 1.0, f"dual-pol retrieval RMS {rms}"


def test_owi_reader_returns_dataset_with_xarray(owi_file, monkeypatch):
    """With xarray importable, read_sarwing_owi returns an xr.Dataset
    (reference detrend.py:71-93 parity); dict fallback otherwise."""
    import sys
    import types

    import _xr_stub

    stub = types.ModuleType("xarray")
    stub.DataArray = _xr_stub.DataArray
    stub.Dataset = _xr_stub.Dataset
    monkeypatch.setitem(sys.modules, "xarray", stub)

    path, _ = owi_file
    ds = read_sarwing_owi(path)
    assert isinstance(ds, _xr_stub.Dataset)
    assert "owiNrcs" in ds and "owiWindSpeed_Tab_dualpol_2steps" in ds
    assert ds["owiNrcs"].dims == ("line", "sample")
    assert "owiCalConstObsi" not in ds
