"""GMF registry tour + custom model registration (gmfs_and_luts example).

Counterpart of the reference ``docs/examples/gmfs_and_luts.ipynb`` and
``create_hh_lut.ipynb``: list models, evaluate analytic GMFs, generate
LUTs on device, register a user GMF (a jnp-traceable scalar function),
build an HH LUT from a VV GMF with a polarization ratio, and round-trip
a LUT through netCDF.
"""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from xsarsea_tpu.models import available_models, get_model
from xsarsea_tpu.models.gmf import GmfModel
from xsarsea_tpu.models.nc_lut import register_nc_luts


def main():
    print(available_models()[["alias", "pol"]].to_string())

    m = get_model("cmod5n")
    print("\ncmod5n(35, 15, 90) =", float(np.asarray(m(35.0, 15.0, 90.0))))

    lut = m.to_lut(units="dB")  # high-res LUT, generated on device
    print("high-res LUT:", lut.dims, lut.shape)

    # --- user GMF: any jnp-traceable scalar function registers like a builtin
    def gmf_demo(inc, wspd, phi=None):
        a = 1e-3 * (1.0 + 0.02 * (35.0 - inc))
        return a * wspd ** 1.4

    GmfModel.register_function(gmf_demo, "gmf_demo_vh", pol="VH",
                               units="linear", defer=False)
    demo = get_model("gmf_demo_vh")
    print("\nregistered:", demo.name, demo.pol,
          "-> sigma0(30,10) =", float(np.asarray(demo(30.0, 10.0))))

    # --- HH LUT from a VV GMF via the Zhang-A polarization ratio
    hh = get_model("gmf_cmod5n_pr_zhangA")
    lut_hh = hh.to_lut(units="dB", resolution="low")
    print("\nHH LUT (cmod5n x ZhangA PR):", lut_hh.dims, lut_hh.shape)

    # --- netCDF round-trip: export, register, reload
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nc_lut_gmf_demo_vh.nc")
        demo.to_netcdf(path)
        register_nc_luts(d)
        reloaded = get_model("nc_lut_gmf_demo_vh")
        # crosspol models are STORED at high resolution (copol at low,
        # like the reference). Comparing at the low-res grid is a true
        # round-trip check: its nodes are a subset of the stored grid
        # (nested steps), so the reload side's interpolation degenerates
        # to exact node selection and only dB<->linear conversion rounds
        a = np.asarray(reloaded.to_lut(units="linear",
                                       resolution="low").data)
        b = np.asarray(demo.to_lut(units="linear", resolution="low").data)
        print("netCDF round-trip (shared grid nodes) max |rel err|:",
              float(np.nanmax(np.abs(a - b) / np.abs(b))))
        # at full resolution the reloaded side IS the stored direct
        # high-res evaluation, while the DEFAULT to_lut() of an analytic
        # model generates its native low grid and interpolates up
        # (reference default semantics, models.py:108-167) — so this
        # figure is the default path's RESOLUTION interp error, not a
        # serialization error; steepest at the low-wspd end where
        # sigma0 curves fastest
        ah = np.asarray(reloaded.to_lut(units="linear").data)
        bh = np.asarray(demo.to_lut(units="linear").data)
        print("default (interp) vs stored direct high-res eval "
              "max |rel err|:",
              float(np.nanmax(np.abs(ah - bh) / np.abs(bh))))


if __name__ == "__main__":
    main()
