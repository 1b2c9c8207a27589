"""Create HH LUTs from a VV model and a polarization ratio.

Counterpart of the reference ``docs/examples/create_hh_lut.ipynb``:
HH backscatter GMFs are built by dividing a VV model by a polarization
ratio PR(incidence, wspd) (Zhang) or PR(incidence, phi) (Mouche). This
framework ships both as registered analytic HH models
(``gmf_cmod5n_pr_zhangA`` / ``gmf_cmod5n_pr_mouche1``); this example
also shows the notebook's LUT-file workflow — derive an HH LUT from any
VV LUT, export it to netCDF, and register it back as a LUT model — and
inverts HH sigma0 with the result.
"""

import os
import tempfile

import numpy as np

from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.models import get_model, register_nc_luts
from xsarsea_tpu.models.gmfs_impl import _pr_mouche1
from xsarsea_tpu.windspeed import invert_from_model


def main():
    # 1. the built-in analytic HH models (PR applied inside the GMF)
    for name in ("gmf_cmod5n_pr_zhangA", "gmf_cmod5n_pr_mouche1"):
        m = get_model(name)
        s0_hh = float(np.asarray(m(35.0, 10.0, 45.0)))
        print(f"{name} (pol={m.pol}): sigma0(35deg, 10m/s, 45deg) "
              f"= {s0_hh:.5f} lin")

    # 2. the notebook's file workflow: VV LUT / PR -> HH LUT -> netCDF ->
    #    registered LUT model (reference create_gmfHH)
    from xsarsea_tpu.io.lut_io import write_lut

    kwargs = dict(inc_step=0.5, wspd_step=0.5, phi_step=5.0)
    lut_vv = get_model("gmf_cmod5n").to_lut(units="linear", **kwargs)
    inc = np.asarray(lut_vv.coords["incidence"])
    phi = np.asarray(lut_vv.coords["phi"])
    # Mouche PR depends on (incidence, phi): broadcast over the LUT grid
    pr = np.asarray(_pr_mouche1(inc[:, None], phi[None, :]))  # (inc, phi)
    hh = np.asarray(lut_vv.data) / pr[:, None, :]
    hh_db = 10.0 * np.log10(hh + 1e-15)
    lut_hh = DimArray(hh_db, dims=lut_vv.dims, coords=lut_vv.coords,
                      name="sigma0_gmf")

    d = tempfile.mkdtemp(prefix="hh_lut_")
    path = os.path.join(d, "nc_lut_cmod5n_hh_mouche1.nc")
    write_lut(path, lut_hh, {
        "units": "dB", "pol": "HH", "model": "cmod5n_hh_mouche1",
        "resolution": "high",
        "inc_range": np.array([inc[0], inc[-1]]),
        "wspd_range": np.asarray(lut_vv.coords["wspd"])[[0, -1]],
        "phi_range": np.array([phi[0], phi[-1]]),
        "inc_step": 0.5, "wspd_step": 0.5, "phi_step": 5.0,
    })
    register_nc_luts(d)
    m_hh = get_model("nc_lut_cmod5n_hh_mouche1")
    print(f"registered {m_hh.name} (pol={m_hh.pol}) from {path}")

    # 3. invert HH sigma0 with the derived LUT
    ny, nx = 48, 64
    rng = np.random.default_rng(0)
    inc2 = np.linspace(20.0, 44.0, nx)[None, :].repeat(ny, 0)
    wspd = rng.uniform(3.0, 22.0, (ny, nx))
    direc = rng.uniform(-180.0, 180.0, (ny, nx))
    s0_hh = np.asarray(get_model("gmf_cmod5n_pr_mouche1")(
        inc2, wspd, np.abs(direc)))
    anc = wspd * np.exp(1j * np.deg2rad(direc))
    wind = invert_from_model(inc2, s0_hh, ancillary_wind=anc,
                             model=m_hh, mode="exact", **kwargs)
    rms = np.sqrt(np.nanmean((np.abs(wind) - wspd) ** 2))
    print(f"HH inversion through the derived LUT: RMS vs truth "
          f"{rms:.2f} m/s")
    assert rms < 1.0


if __name__ == "__main__":
    main()
