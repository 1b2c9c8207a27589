"""Sigma0 detrending for 'nice display' (xsarsea.ipynb example).

Counterpart of the reference ``docs/examples/xsarsea.ipynb``: divide out
the incidence-angle trend predicted by a GMF at (10 m/s, 45 deg), leaving
the surface roughness signal.
"""

import numpy as np

from xsarsea_tpu import sigma0_detrend
from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.models import get_model


def main():
    h, w = 256, 1024
    inc = np.linspace(19.0, 46.0, w)[None, :].repeat(h, 0)
    m = get_model("gmf_cmod5n")
    trend = np.asarray(m(inc[0], np.array([10.0]), np.array([45.0]))).squeeze()
    rng = np.random.default_rng(0)
    roughness = 1.0 + 0.3 * np.sin(np.linspace(0, 40 * np.pi, w))[None, :]
    sigma0 = trend[None, :] * roughness * rng.gamma(60.0, 1 / 60.0, (h, w))

    da = DimArray(sigma0, dims=("line", "sample"))
    inc_da = DimArray(inc, dims=("line", "sample"))
    detrended = sigma0_detrend(da, inc_da)

    prof_raw = np.nanmean(sigma0, axis=0)
    prof_det = np.nanmean(np.asarray(detrended.data), axis=0)
    # the detrended profile should be flat across incidence (trend removed)
    slope_raw = np.polyfit(inc[0], prof_raw / prof_raw.mean(), 1)[0]
    slope_det = np.polyfit(inc[0], prof_det / prof_det.mean(), 1)[0]
    print(f"normalized incidence slope: raw {slope_raw:+.4f}/deg -> "
          f"detrended {slope_det:+.4f}/deg")
    assert abs(slope_det) < abs(slope_raw) / 5


if __name__ == "__main__":
    main()
