"""Wind-streak direction from multi-scale gradients (streaks example).

Counterpart of the reference ``docs/examples/streaks.ipynb``: build a
sigma0 image with oriented streaks, run the Koch-2004 multi-scale
gradient histogram pipeline, smooth circularly, and read the dominant
direction off the histogram peak (180-degree ambiguous).
"""

import numpy as np

from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.gradients import Gradients, circ_smooth


def streak_image(h, w, angle_deg, seed=0):
    """Random field with streak iso-lines at `angle_deg` from the sample
    (x) axis; the local gradients then point at angle_deg + 90."""
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (h, w))
    a = np.deg2rad(angle_deg)
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    t = yy * np.cos(a) - xx * np.sin(a)  # coordinate across the streaks
    streaks = np.sin(2 * np.pi * t / 18.0)
    img = 0.08 * np.exp(0.35 * streaks + 0.12 * base)
    return img


def main():
    truth = 25.0  # streak direction, degrees
    img = streak_image(512, 512, truth)
    da = DimArray(img[None], dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV"]),
                          "line": np.arange(512), "sample": np.arange(512)})

    g = Gradients(da, windows_sizes=[160], downscales_factors=[1, 2])
    hist = g.histogram
    w = hist["weight"].mean(dim=["downscale_factor", "window_size", "pol"])
    w = circ_smooth(w)

    angles = np.asarray(hist["angles"].data if "angles" in hist.variables
                        else w.coords["angles"])
    mean_w = np.asarray(w.data).mean(axis=(0, 1))
    # gradients are perpendicular to the streaks: rotate 90 deg
    peak = np.rad2deg(angles[int(np.argmax(mean_w))]) + 90.0
    err = (peak - truth + 90.0) % 180.0 - 90.0
    print(f"streak direction: truth {truth:.0f} deg, retrieved "
          f"{peak:.1f} deg (err {err:+.1f} deg, 180-deg ambiguous)")
    assert abs(err) < 7.5


if __name__ == "__main__":
    main()
