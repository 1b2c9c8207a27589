"""Out-of-core input streaming at the public API.

Covers the framework's replacement for the reference's dask-chunked
execution path (reference windspeed/windspeed.py:345-367, gmfs.py:295-299):
``invert_from_model`` accepts lazy/chunked duck arrays, materializes only
O(piece) rows at a time, and produces output equal to the eager path.
"""

import threading
import tracemalloc

import numpy as np
import pytest

from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.windspeed import invert_from_model

from test_inversion import synthetic_scene


class LazyRows:
    """Duck chunked array: rows generated on demand, materialization counted.

    Mimics the protocol shared by dask.array / zarr / h5py datasets that
    the lazy input path relies on: ``shape``/``ndim``/``dtype``/``chunks``
    attributes plus numpy-style first-axis slicing. Generating rows on
    the fly means the full array NEVER exists in memory — any code path
    that tried to materialize it wholesale would show up as a single
    giant slice request.
    """

    def __init__(self, row_fn, shape, dtype=np.float64):
        self._row_fn = row_fn
        self.shape = tuple(shape)
        self.ndim = len(self.shape)
        self.dtype = np.dtype(dtype)
        self.chunks = ((1,) * self.shape[0],) + tuple(
            (s,) for s in self.shape[1:])
        self.max_request = 0  # elements per single slice request
        self._lock = threading.Lock()

    def __getitem__(self, idx):
        assert isinstance(idx, slice), "lazy path must slice the first axis"
        r0, r1, step = idx.indices(self.shape[0])
        assert step == 1
        block = np.asarray(self._row_fn(r0, r1), dtype=self.dtype)
        with self._lock:
            self.max_request = max(self.max_request, block.size)
        return block


def _lazy_scene(ny, nx):
    """The synthetic scene re-exposed as lazy row generators."""
    inc, s0_co, s0_cr, dsig_cr, anc = synthetic_scene(ny=ny, nx=nx,
                                                      with_nans=True)
    lazy = {
        "inc": LazyRows(lambda a, b: inc[a:b], inc.shape),
        "s0_co": LazyRows(lambda a, b: s0_co[a:b], s0_co.shape),
        "s0_cr": LazyRows(lambda a, b: s0_cr[a:b], s0_cr.shape),
        "dsig_cr": LazyRows(lambda a, b: dsig_cr[a:b], dsig_cr.shape),
        "anc": LazyRows(lambda a, b: anc[a:b], anc.shape, dtype=np.complex128),
    }
    return (inc, s0_co, s0_cr, dsig_cr, anc), lazy


MODEL = ("gmf_cmod5n", "gmf_s1_v2")
KW = dict(inc_step=0.4, wspd_step=0.4, phi_step=2.5)


def test_lazy_chunked_input_matches_eager():
    """Lazy duck-array inputs stream piece-wise and match the eager path."""
    ny, nx = 96, 110  # 10560 px; piece 2048 -> 6 pieces incl. padded tail
    (inc, s0_co, s0_cr, dsig_cr, anc), lazy = _lazy_scene(ny, nx)

    co_ref, dual_ref = invert_from_model(
        inc, s0_co, s0_cr, ancillary_wind=anc, dsig_cr=dsig_cr,
        model=MODEL, mode="exact", **KW)
    piece = 2048
    co_lz, dual_lz = invert_from_model(
        lazy["inc"], lazy["s0_co"], lazy["s0_cr"],
        ancillary_wind=lazy["anc"], dsig_cr=lazy["dsig_cr"],
        model=MODEL, mode="exact", piece_size=piece, **KW)

    np.testing.assert_array_equal(co_lz, co_ref)
    np.testing.assert_array_equal(dual_lz, dual_ref)

    # no input was ever materialized beyond one piece (+ partial rows at
    # both ends of the flat range)
    for name, arr in lazy.items():
        assert 0 < arr.max_request <= piece + 2 * nx, (
            f"{name}: materialized {arr.max_request} elements at once")


def test_lazy_input_inside_dimarray_stays_lazy():
    """DimArray/DataArray wrapping keeps the chunked payload unmaterialized."""
    ny, nx = 64, 70
    (inc, s0_co, s0_cr, dsig_cr, anc), lazy = _lazy_scene(ny, nx)

    dims = ("line", "sample")
    da_s0 = DimArray(lazy["s0_co"], dims=dims,
                     coords={"pol": np.asarray("VV")})
    assert da_s0.data is lazy["s0_co"]  # constructor did not coerce

    co_ref, dual_ref = invert_from_model(
        inc, s0_co, s0_cr, ancillary_wind=anc, dsig_cr=dsig_cr,
        model=MODEL, mode="exact", **KW)
    co_lz, dual_lz = invert_from_model(
        DimArray(lazy["inc"], dims=dims), da_s0, lazy["s0_cr"],
        ancillary_wind=lazy["anc"], dsig_cr=dsig_cr,
        model=MODEL, mode="exact", piece_size=1024, **KW)

    np.testing.assert_array_equal(np.asarray(co_lz.data), co_ref)
    np.testing.assert_array_equal(np.asarray(dual_lz.data), dual_ref)
    assert lazy["s0_co"].max_request <= 1024 + 2 * nx


def test_host_staging_is_piece_bounded():
    """Peak host allocations during streaming stay far below full-scene
    f64 staging (the round-2 path allocated ~6 full-scene f64/c128 copies;
    VERDICT r2 item 1)."""
    ny, nx = 256, 256  # 65536 px
    (inc, s0_co, s0_cr, dsig_cr, anc), lazy = _lazy_scene(ny, nx)
    n = ny * nx
    piece = 4096

    # warm every jit/LUT cache outside the measured window. The lazy path
    # compiles its own spec-wrapped program (wire format: stream presence +
    # scalar-vs-array dsig), so the warm-up must be a lazy call with the
    # same spec AND the same padded piece shape (jit re-traces per shape)
    # — large enough to take the streamed multi-piece branch, not the
    # single-piece fast path (which runs at the unpadded scene shape).
    _, warm = _lazy_scene(96, 96)  # 9216 px > 1.5 * piece -> streams
    invert_from_model(
        warm["inc"], warm["s0_co"], warm["s0_cr"],
        ancillary_wind=warm["anc"], dsig_cr=warm["dsig_cr"],
        model=MODEL, mode="exact", piece_size=piece, **KW)

    tracemalloc.start()
    invert_from_model(
        lazy["inc"], lazy["s0_co"], lazy["s0_cr"],
        ancillary_wind=lazy["anc"], dsig_cr=lazy["dsig_cr"],
        model=MODEL, mode="exact", piece_size=piece, **KW)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    # outputs: 2 complex arrays (complex128 on the x64 CPU test config).
    # Eager staging would add ~6 full-scene f64/c128 temporaries
    # (>= 48 B/px); allow outputs + a generous piece-scaled slack.
    outputs = 2 * n * 16
    slack = 40 * piece * 16  # pieces in flight across 3 lanes, x64
    assert peak < outputs + slack, (
        f"peak {peak / 1e6:.1f} MB suggests full-scene staging "
        f"(outputs alone are {outputs / 1e6:.1f} MB)")


def test_lazy_detrend_matches_eager():
    """sigma0_detrend streams chunked input row-block-wise (same numbers)."""
    from xsarsea_tpu.detrend import sigma0_detrend

    ny, nx = 60, 80
    rng = np.random.default_rng(3)
    inc = np.linspace(18.0, 45.0, nx)[None, :].repeat(ny, axis=0)
    s0 = rng.uniform(0.001, 0.2, size=(ny, nx))

    ref = np.asarray(sigma0_detrend(s0, inc))
    lazy_s0 = LazyRows(lambda a, b: s0[a:b], s0.shape)
    lazy_inc = LazyRows(lambda a, b: inc[a:b], inc.shape)
    got = np.asarray(sigma0_detrend(lazy_s0, lazy_inc))
    np.testing.assert_array_equal(got, ref)
    # only the first incidence row was ever pulled
    assert lazy_inc.max_request == nx


def test_scalar_dsig_and_mono_pol_lazy():
    """Mono-pol lazy input with scalar dsig_cr (None-stream code paths)."""
    ny, nx = 48, 50
    (inc, s0_co, s0_cr, dsig_cr, anc), lazy = _lazy_scene(ny, nx)

    co_ref = invert_from_model(
        inc, s0_co, ancillary_wind=anc, model="gmf_cmod5n",
        mode="exact", **KW)
    co_lz = invert_from_model(
        lazy["inc"], lazy["s0_co"], ancillary_wind=lazy["anc"],
        model="gmf_cmod5n", mode="exact", piece_size=512, **KW)
    np.testing.assert_array_equal(co_lz, co_ref)

    with pytest.warns(UserWarning, match="crosspol"):
        speed_ref = invert_from_model(
            inc, s0_cr, ancillary_wind=anc, dsig_cr=0.3,
            model="gmf_s1_v2", mode="exact", **KW)
    with pytest.warns(UserWarning, match="crosspol"):
        speed_lz = invert_from_model(
            lazy["inc"], lazy["s0_cr"], ancillary_wind=lazy["anc"],
            dsig_cr=0.3, model="gmf_s1_v2", mode="exact",
            piece_size=512, **KW)
    np.testing.assert_array_equal(speed_lz, speed_ref)


def test_scalar_pixel_inputs():
    """0-d / python-scalar inputs through the public API (single-pixel
    query — regressed in the round-3 lazy rework, caught in review)."""
    co = invert_from_model(35.0, 0.0545, ancillary_wind=8 + 4j,
                           model="gmf_cmod5n", mode="exact", **KW)
    co_arr = invert_from_model(np.float64(35.0), np.float64(0.0545),
                               ancillary_wind=np.complex128(8 + 4j),
                               model="gmf_cmod5n", mode="exact", **KW)
    assert np.shape(co) == ()
    assert np.isfinite(np.abs(co)) and np.abs(co) > 0
    np.testing.assert_array_equal(co, co_arr)


def test_chunked_gradients_histogram_matches_eager():
    """Gradients2D.histogram on a chunked image streams row bands and is
    exactly equal to the in-memory result (reference dask map_overlap
    counterpart, gradients.py:649-667)."""
    from xsarsea_tpu.gradients import Gradients2D

    ny, nx = 504, 240
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:ny, 0:nx]
    img = (1.0 + 0.4 * np.sin(0.3 * (xx + 0.7 * yy))
           + 0.1 * rng.normal(size=(ny, nx))).astype(np.float64) ** 2

    coords = {"line": np.arange(ny, dtype=float),
              "sample": np.arange(nx, dtype=float)}
    eager = Gradients2D(DimArray(img, dims=("line", "sample"), coords=coords),
                        window_size=64, window_step=1)._histogram_native

    lazy = LazyRows(lambda a, b: img[a:b], img.shape)
    banded = Gradients2D(DimArray(lazy, dims=("line", "sample"),
                                  coords=coords),
                         window_size=64, window_step=1)._histogram_native

    # whole image fits one band here -> bit-identical to the eager path
    np.testing.assert_array_equal(np.asarray(banded["weight"].data),
                                  np.asarray(eager["weight"].data))
    np.testing.assert_array_equal(np.asarray(banded["used_ratio"].data),
                                  np.asarray(eager["used_ratio"].data))

    # force REAL banding with a small block budget: results agree to f64
    # ulp (different block shapes may fuse differently under XLA) and no
    # band ever materialized more than its bounded slice
    from xsarsea_tpu.gradients import _banded_streaks_hist

    lg_line = np.arange((ny // 2) // 2) * 4.0 + 1.5
    cl = np.abs(lg_line[None, :]
                - np.asarray(eager["weight"].coords["line"])[:, None]
                ).argmin(axis=1)
    lg_sample = np.arange((nx // 2) // 2) * 4.0 + 1.5
    cs = np.abs(lg_sample[None, :]
                - np.asarray(eager["weight"].coords["sample"])[:, None]
                ).argmin(axis=1)
    bins = np.linspace(-np.pi / 2, np.pi / 2, 73)
    bins = (bins[1:] + bins[:-1]) / 2
    lazy2 = LazyRows(lambda a, b: img[a:b], img.shape)
    h2, r2 = _banded_streaks_hist(lazy2, cl, cs, 16, bins,
                                  max_block_px=180 * nx)
    nl, ns = len(cl), len(cs)
    np.testing.assert_allclose(
        h2.reshape(nl, ns, -1), np.asarray(eager["weight"].data),
        rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(r2.reshape(nl, ns),
                               np.asarray(eager["used_ratio"].data),
                               rtol=1e-12)
    assert 0 < lazy2.max_request < img.size  # streamed in bounded bands


@pytest.mark.parametrize("ny", [501, 502, 503])
def test_banded_gradients_unaligned_height(ny):
    """ny % 4 != 0: the bottom band must still end exactly at the image
    edge (review-confirmed bug: the 4-aligned extension used to drop the
    last 1-3 rows and shift the symm reflection boundary)."""
    from xsarsea_tpu.gradients import Gradients2D, _banded_streaks_hist

    nx = 168
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:ny, 0:nx]
    img = (1.0 + 0.4 * np.sin(0.25 * (xx + 0.8 * yy))
           + 0.1 * rng.normal(size=(ny, nx))).astype(np.float64) ** 2
    coords = {"line": np.arange(ny, dtype=float),
              "sample": np.arange(nx, dtype=float)}
    eager = Gradients2D(DimArray(img, dims=("line", "sample"),
                                 coords=coords),
                        window_size=64, window_step=1)._histogram_native

    lg_n = (ny // 2) // 2
    lg_line = np.arange(lg_n) * 4.0 + 1.5
    cl = np.abs(lg_line[None, :]
                - np.asarray(eager["weight"].coords["line"])[:, None]
                ).argmin(axis=1)
    lg_sample = np.arange((nx // 2) // 2) * 4.0 + 1.5
    cs = np.abs(lg_sample[None, :]
                - np.asarray(eager["weight"].coords["sample"])[:, None]
                ).argmin(axis=1)
    bins = np.linspace(-np.pi / 2, np.pi / 2, 73)
    bins = (bins[1:] + bins[:-1]) / 2
    lazy = LazyRows(lambda a, b: img[a:b], img.shape)
    h, r = _banded_streaks_hist(lazy, cl, cs, 16, bins,
                                max_block_px=180 * nx)
    nl, ns = len(cl), len(cs)
    np.testing.assert_allclose(h.reshape(nl, ns, -1),
                               np.asarray(eager["weight"].data),
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(r.reshape(nl, ns),
                               np.asarray(eager["used_ratio"].data),
                               rtol=1e-12)


def test_multiscale_gradients_chunked_input():
    """Multiscale Gradients on a 2-D chunked array: stays lazy at
    factor 1 (review finding: expand_dims used to materialize/crash) and
    raises clearly for factor != 1."""
    from xsarsea_tpu.gradients import Gradients

    ny, nx = 256, 160
    rng = np.random.default_rng(6)
    img = np.abs(rng.normal(1.0, 0.3, (ny, nx))) + 0.05
    coords = {"line": np.arange(ny, dtype=float),
              "sample": np.arange(nx, dtype=float)}

    lazy = LazyRows(lambda a, b: img[a:b], img.shape)
    g = Gradients(DimArray(lazy, dims=("line", "sample"), coords=coords),
                  windows_sizes=[40, 64], downscales_factors=[1])
    h = g.histogram
    eager = Gradients(DimArray(img, dims=("line", "sample"), coords=coords),
                      windows_sizes=[40, 64], downscales_factors=[1]).histogram
    np.testing.assert_allclose(np.asarray(h["weight"].data),
                               np.asarray(eager["weight"].data),
                               rtol=1e-12, atol=1e-300)
    assert 0 < lazy.max_request <= img.size

    with pytest.raises(NotImplementedError, match="downscales_factors"):
        Gradients(DimArray(LazyRows(lambda a, b: img[a:b], img.shape),
                           dims=("line", "sample"), coords=coords),
                  windows_sizes=[40], downscales_factors=[1, 2])


def test_lazy_all_nan_ancillary_rejected():
    """A chunked ancillary_wind that is all-NaN must fail copol validation
    exactly like the eager path — _any_valid samples lazy inputs in row
    blocks instead of assuming validity (advisor r3, inversion.py)."""
    ny, nx = 8, 16
    inc = np.full((ny, nx), 30.0)
    s0 = np.full((ny, nx), 0.01)
    anc_nan = LazyRows(
        lambda a, b: np.full((b - a, nx), np.nan, complex),
        (ny, nx), dtype=np.complex128)
    with pytest.raises(ValueError, match="ancillary_wind"):
        invert_from_model(
            LazyRows(lambda a, b: inc[a:b], inc.shape),
            LazyRows(lambda a, b: s0[a:b], s0.shape),
            ancillary_wind=anc_nan, model="gmf_cmod5n", mode="exact", **KW)


def test_lazy_any_valid_early_exit():
    """_any_valid on a mostly-valid chunked input touches only the first
    row block (early exit) — it must not materialize the scene."""
    from xsarsea_tpu.windspeed.inversion import _any_valid

    probe = LazyRows(lambda a, b: np.ones((b - a, 64), complex), (4096, 64),
                     dtype=np.complex128)
    assert _any_valid(probe)
    assert probe.max_request <= (1 << 22)

    all_nan = LazyRows(lambda a, b: np.full((b - a, 64), np.nan), (128, 64))
    assert not _any_valid(all_nan)


class Lazy3D:
    """(pol, line, sample) duck chunked array with 2-axis basic slicing
    and materialization counting — the multi-pol out-of-core fixture."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)
        self.shape = self._arr.shape
        self.ndim = 3
        self.dtype = self._arr.dtype
        self.chunks = ((1,) * self.shape[0], (1,) * self.shape[1],
                       (self.shape[2],))
        self.max_request = 0

    def __getitem__(self, idx):
        block = np.asarray(self._arr[idx])
        self.max_request = max(self.max_request, block.size)
        return block


def test_multipol_chunked_gradients_matches_eager():
    """3-D (pol, line, sample) chunked sigma0 streams through Gradients
    via virtual per-pol lazy views (VERDICT r3 item 6; reference fans out
    dask-backed 3-D sigma0 lazily, gradients.py:279-300)."""
    from xsarsea_tpu.gradients import Gradients

    ny, nx = 256, 224
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:ny, 0:nx]
    base = (1.0 + 0.4 * np.sin(0.3 * (xx + 0.7 * yy))
            + 0.1 * rng.normal(size=(ny, nx))) ** 2
    img3 = np.stack([base, 0.25 * base])
    coords = {"pol": np.array(["VV", "VH"]),
              "line": np.arange(ny, dtype=float),
              "sample": np.arange(nx, dtype=float)}

    eager = Gradients(DimArray(img3, dims=("pol", "line", "sample"),
                               coords=coords),
                      windows_sizes=[64], downscales_factors=[1]).histogram

    lazy = Lazy3D(img3)
    got = Gradients(DimArray(lazy, dims=("pol", "line", "sample"),
                             coords=coords),
                    windows_sizes=[64], downscales_factors=[1]).histogram

    assert got["weight"].dims == eager["weight"].dims
    np.testing.assert_allclose(np.asarray(got["weight"].data),
                               np.asarray(eager["weight"].data),
                               rtol=1e-10, atol=1e-300)
    np.testing.assert_allclose(np.asarray(got["used_ratio"].data),
                               np.asarray(eager["used_ratio"].data),
                               rtol=1e-10)
    # never materialized more than one pol's row band
    assert 0 < lazy.max_request <= ny * nx


def test_multipol_chunked_gradients_downscale_rejected():
    """downscales_factors != 1 still needs the scene in memory."""
    from xsarsea_tpu.gradients import Gradients

    lazy = Lazy3D(np.ones((2, 64, 64)))
    with pytest.raises(NotImplementedError, match="downscales_factors"):
        Gradients(DimArray(lazy, dims=("pol", "line", "sample")),
                  windows_sizes=[32], downscales_factors=[1, 2]).histogram


def test_multipol_chunked_gradients_first_axis_only_rejected():
    """A protocol-conformant 3-D lazy array that supports only FIRST-axis
    slicing must be rejected with a clear NotImplementedError at
    construction, not crash deep inside the banded streaming path
    (round-4 review finding)."""
    from xsarsea_tpu.gradients import Gradients

    img3 = np.ones((2, 64, 64))

    class FirstAxisOnly:
        shape, ndim, dtype = img3.shape, 3, img3.dtype
        chunks = ((2,), (64,), (64,))

        def __getitem__(self, idx):
            if not isinstance(idx, tuple):
                idx = (idx,)
            if len(idx) != 1 or not isinstance(idx[0], slice):
                raise IndexError("first-axis slicing only")
            return img3[idx]

    with pytest.raises(NotImplementedError, match="pol, row0:row1"):
        Gradients(DimArray(FirstAxisOnly(), dims=("pol", "line", "sample")),
                  windows_sizes=[32], downscales_factors=[1])


def test_lazy_direct_gmf_evaluation():
    """GmfModel.__call__ on chunked N-D inputs stays lazy (reference keeps
    dask inputs lazy via da.broadcast_arrays, gmfs.py:293-316): the result
    is itself a chunked duck array evaluated block-wise on demand."""
    from xsarsea_tpu.dimarray import is_chunked
    from xsarsea_tpu.models import get_model

    m = get_model("gmf_cmod5n")
    ny, nx = 64, 80
    rng = np.random.default_rng(7)
    inc = rng.uniform(18, 47, (ny, nx))
    wspd = rng.uniform(0.5, 45, (ny, nx))
    phi = rng.uniform(0, 360, (ny, nx))

    l_inc = LazyRows(lambda a, b: inc[a:b], inc.shape)
    l_wspd = LazyRows(lambda a, b: wspd[a:b], wspd.shape)

    out = m(l_inc, l_wspd, phi)
    assert is_chunked(out)           # result is lazy, not materialized
    assert out.shape == (ny, nx)
    assert l_inc.max_request == 0    # nothing touched yet

    eager = np.asarray(m(inc, wspd, phi))
    blk = out[3:9]                   # block pull evaluates only that band
    np.testing.assert_array_equal(blk, eager[3:9])
    assert 0 < l_inc.max_request <= 6 * nx

    np.testing.assert_array_equal(np.asarray(out), eager)

    # small broadcast operand: 1-row chunked phi against full-shape others
    l_phi = LazyRows(lambda a, b: phi[:1][a:b], (1, nx))
    out2 = m(l_inc, l_wspd, l_phi)
    eager2 = np.asarray(m(inc, wspd, np.broadcast_to(phi[:1], (ny, nx))))
    np.testing.assert_array_equal(np.asarray(out2), eager2)

    # DimArray wrapping keeps the payload lazy
    da = DimArray(LazyRows(lambda a, b: inc[a:b], inc.shape),
                  dims=("line", "sample"))
    res = m(da, wspd, phi)
    assert isinstance(res, DimArray) and is_chunked(res.data)

    # streaming consumers can slice it, strided access is rejected
    with pytest.raises(IndexError, match="strided"):
        out[::2]


def test_lazy_gmf_phi_independent_broadcast_shape():
    """A phi-independent (crosspol) model must broadcast the LAZY result
    over phi's shape too, exactly like the eager branch does (review
    finding: raws[2]=None used to drop phi from the shape computation)."""
    from xsarsea_tpu.dimarray import is_chunked
    from xsarsea_tpu.models import get_model

    m = get_model("gmf_s1_v2")  # crosspol: ignores phi
    ny, nx = 48, 56
    rng = np.random.default_rng(11)
    inc_row = rng.uniform(18, 47, (1, nx))
    wspd_row = rng.uniform(0.5, 45, (1, nx))
    phi = rng.uniform(0, 360, (ny, nx))

    l_inc = LazyRows(lambda a, b: inc_row[a:b], (1, nx))
    l_wspd = LazyRows(lambda a, b: wspd_row[a:b], (1, nx))

    eager = np.asarray(m(inc_row, wspd_row, phi, broadcast=True))
    assert eager.shape == (ny, nx)  # eager broadcasts over phi

    out = m(l_inc, l_wspd, phi)
    assert is_chunked(out)
    assert out.shape == (ny, nx)   # lazy must agree
    np.testing.assert_array_equal(np.asarray(out), eager)

    # chunked phi as the ONLY lazy input: stays lazy, same shape rule
    l_phi = LazyRows(lambda a, b: phi[a:b], phi.shape)
    out2 = m(inc_row, wspd_row, l_phi)
    assert is_chunked(out2) and out2.shape == (ny, nx)
    np.testing.assert_array_equal(np.asarray(out2), eager)
