"""Out-of-core processing: invert and analyze a scene straight from disk.

The reference runs dask-chunked DataArrays chunk-by-chunk
(windspeed.py:345-367, gradients.py:649-667); here the same out-of-core
behavior works for ANY chunked/lazy array protocol (dask, zarr, h5py,
np.memmap): ``invert_from_model`` streams 4M-px pieces with per-piece
host prep, and ``Gradients2D.histogram`` streams row bands with stencil
halos. Host memory stays O(piece/band) + outputs regardless of scene
size — `scripts/demo_full_scene.py` runs this at 10^8 px.
"""

import os
import tempfile

import numpy as np

from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.gradients import Gradients2D
from xsarsea_tpu.models import get_model
from xsarsea_tpu.windspeed import invert_from_model


def main():
    ny, nx = 384, 320
    rng = np.random.default_rng(0)
    inc = np.linspace(19.0, 46.0, nx)[None, :].repeat(ny, 0)
    wspd = rng.uniform(2.0, 25.0, (ny, nx))
    phi = rng.uniform(-180.0, 180.0, (ny, nx))
    co = get_model("gmf_cmod5n")
    cr = get_model("gmf_s1_v2")
    s0_co = np.asarray(co(inc, wspd, np.abs(phi)))
    s0_cr = np.asarray(cr(inc, wspd))
    anc = wspd * np.exp(1j * np.deg2rad(phi))

    # write the scene to disk; memory-map it back (a zarr store or a
    # dask-backed DataArray works the same — anything with .chunks or
    # numpy row slicing streams)
    d = tempfile.mkdtemp(prefix="ooc_scene_")
    for name, arr in (("inc", inc), ("s0_co", s0_co), ("s0_cr", s0_cr),
                      ("anc", anc)):
        np.save(os.path.join(d, f"{name}.npy"), arr)
    mm = {k: np.load(os.path.join(d, f"{k}.npy"), mmap_mode="r")
          for k in ("inc", "s0_co", "s0_cr", "anc")}

    # dual-pol inversion, streamed in pieces (small piece size to show
    # the streaming; the default is 4M px)
    wind_co, wind_dual = invert_from_model(
        mm["inc"], mm["s0_co"], mm["s0_cr"], ancillary_wind=mm["anc"],
        dsig_cr=0.1, model=("gmf_cmod5n", "gmf_s1_v2"),
        piece_size=1 << 15)
    rms = np.sqrt(np.nanmean((np.abs(wind_dual) - wspd) ** 2))
    print(f"streamed dual-pol inversion of {ny}x{nx} px from disk: "
          f"RMS vs truth {rms:.3f} m/s")

    # wind-streak histograms, streamed in row bands with stencil halos.
    # A .chunks attribute marks the array as lazy; np.memmap itself is
    # an ndarray, so wrap it the way dask/zarr stores present themselves.
    class Chunked:
        def __init__(self, a):
            self.a, self.shape, self.ndim = a, a.shape, a.ndim
            self.dtype = a.dtype
            self.chunks = ((64,) * (a.shape[0] // 64), (a.shape[1],))

        def __getitem__(self, idx):
            return self.a[idx]

    hist = Gradients2D(
        DimArray(Chunked(mm["s0_co"]), dims=("line", "sample"),
                 coords={"line": np.arange(ny) * 10.0,
                         "sample": np.arange(nx) * 10.0}),
        window_size=800).histogram
    w = np.asarray(hist["weight"].data)
    print(f"banded streaks histogram: {w.shape[0]}x{w.shape[1]} windows, "
          f"{w.shape[2]} angle bins, total weight {w.sum():.3f}")
    assert np.isfinite(w).all()


if __name__ == "__main__":
    main()
