"""Gradients pipeline parity vs cv2/scipy oracles and the reference kernel."""

import cv2
import numpy as np
import pytest
from scipy import ndimage, signal

import jax.numpy as jnp

from xsarsea_tpu.dimarray import DimArray, DimDataset
from xsarsea_tpu.gradients import (
    Gradients,
    Gradients2D,
    Mean,
    PlotGradients,
    R2,
    circ_hist,
    circ_smooth,
    filtering_parameters,
    local_gradients,
    smoothing,
)
from xsarsea_tpu.gradients import _extract_windows, _histogram_windows
from reference_runner import load_ref_gradients

rng = np.random.default_rng(0)


def streak_image(ny=256, nx=256, angle_deg=30.0, wavelength=20.0, seed=0):
    """Synthetic sigma0 with sinusoidal streaks at a known orientation."""
    r = np.random.default_rng(seed)
    y, x = np.mgrid[0:ny, 0:nx]
    k = 2 * np.pi / wavelength
    phase = k * (np.cos(np.deg2rad(angle_deg)) * x + np.sin(np.deg2rad(angle_deg)) * y)
    img = 1.0 + 0.5 * np.sin(phase) + 0.1 * r.normal(size=(ny, nx))
    return np.abs(img) + 0.01


# ------------------------------------------------------------------- oracles

def oracle_R2(image):
    B2 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], float) / 16
    B4 = signal.convolve(B2, B2)
    x = signal.convolve2d(image, B4, mode="same", boundary="symm")
    h, w = (x.shape[0] // 2) * 2, (x.shape[1] // 2) * 2
    x = x[:h, :w].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    return signal.convolve2d(x, B2, mode="same", boundary="symm")


def oracle_local_gradients(image):
    gr = cv2.Scharr(image, cv2.CV_64F, 1, 0)
    gi = cv2.Scharr(image, cv2.CV_64F, 0, 1)
    grad12 = (gr + 1j * gi) ** 2
    grad2 = oracle_R2(grad12.real) + 1j * oracle_R2(grad12.imag)
    grad3 = oracle_R2(np.abs(grad12))
    c = np.abs(grad2) / (grad3 + 0.00001)
    c = np.where(c <= 1, c, 0.0)
    return np.sqrt(grad2), grad3, c


def test_local_gradients_matches_oracle():
    img = streak_image(128, 130)
    lg = local_gradients(img)
    g2_o, g3_o, c_o = oracle_local_gradients(img)
    np.testing.assert_allclose(np.asarray(lg["G2"].data), g2_o, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lg["G3"].data), g3_o, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lg["c"].data), c_o, rtol=1e-10, atol=1e-12)
    # local_gradients itself reduces by 2 (one internal R2)
    assert lg["G2"].sizes["line"] == 128 // 2


def test_histogram_kernel_matches_reference():
    """Batch histogram kernel vs the reference per-window gradient_histogram."""
    ref = load_ref_gradients()
    n_angles = 72
    bins = np.linspace(-np.pi / 2, np.pi / 2, n_angles + 1)
    bins = (bins[1:] + bins[:-1]) / 2

    wpix = 100
    windows_g2 = []
    windows_c = []
    for seed in range(6):
        r = np.random.default_rng(seed)
        # G2 comes from a principal-branch complex sqrt -> angles in
        # (-pi/2, pi/2); the reference kernel relies on this domain
        theta = r.uniform(-np.pi / 2 * 0.999, np.pi / 2 * 0.999, wpix)
        g2 = r.uniform(0, 3, wpix) * np.exp(1j * theta)
        c = r.uniform(0, 1, wpix)
        if seed == 2:
            g2[::7] = np.nan + 1j * np.nan  # masked pixels
        if seed == 3:
            g2[:] = np.nan + 1j * np.nan  # fully masked window
        if seed == 4:
            g2[::5] = 0.0  # zero-gradient pixels are excluded
        windows_g2.append(g2)
        windows_c.append(c)

    g2_stack = np.stack(windows_g2)
    got_h, got_r = _histogram_windows(
        jnp.asarray(np.abs(g2_stack)),
        jnp.asarray(np.angle(g2_stack)),
        jnp.asarray(np.stack(windows_c)),
        jnp.asarray(bins),
    )
    got_h, got_r = np.asarray(got_h), np.asarray(got_r)

    import warnings

    for i, (g2, c) in enumerate(zip(windows_g2, windows_c)):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            exp_h, exp_r = ref.gradient_histogram(g2.reshape(10, 10), c.reshape(10, 10), bins)
        np.testing.assert_allclose(got_h[i], exp_h, rtol=1e-10, atol=1e-12,
                                   err_msg=f"window {i}")
        np.testing.assert_allclose(got_r[i], exp_r, rtol=1e-12)


def test_extract_windows_anchoring():
    arr = jnp.asarray(np.arange(100.0).reshape(10, 10))
    w = 4
    wins = np.asarray(_extract_windows(arr, jnp.asarray([5]), jnp.asarray([5]), w, w))
    # xarray rolling(center=True) anchor: start = c - w//2 (pads w//2
    # BEFORE the center — xarray Variable.rolling_window "10 -> 5, 9 -> 4";
    # pandas rolling(center=True) agrees: a w=4 window at label i covers
    # [i-2, i+1])
    expected = np.arange(100.0).reshape(10, 10)[3:7, 3:7].reshape(-1)
    np.testing.assert_array_equal(wins[0], expected)
    # odd window: both anchors coincide at (w-1)//2
    wins5 = np.asarray(_extract_windows(arr, jnp.asarray([5]), jnp.asarray([5]), 5, 5))
    np.testing.assert_array_equal(
        wins5[0], np.arange(100.0).reshape(10, 10)[3:8, 3:8].reshape(-1))
    # border window is NaN-padded: center 0, w=4 covers [-2, 1] -> 2x2 real
    wins0 = np.asarray(_extract_windows(arr, jnp.asarray([0]), jnp.asarray([0]), w, w))
    assert np.isnan(wins0[0]).sum() == w * w - 2 * 2


def test_hist_bin_forms_agree():
    """The TPU one-hot reduce and the CPU scatter-add binning forms sum
    the same per-element products; results agree to accumulation-order
    rounding (and exactly in f64)."""
    import xsarsea_tpu.gradients as G

    rng = np.random.default_rng(9)
    nwin, wpix, nb = 37, 230, 72
    wm = jnp.asarray(rng.uniform(0, 1, (nwin, wpix)))
    ki = jnp.asarray(rng.integers(0, nb, (nwin, wpix)).astype(np.int32))
    old = G._HIST_BIN_FORM
    try:
        G._HIST_BIN_FORM = "reduce"
        hr = np.asarray(G._hist_bins(wm, ki, nb))
        G._HIST_BIN_FORM = "scatter"
        hs = np.asarray(G._hist_bins(wm, ki, nb))
    finally:
        G._HIST_BIN_FORM = old
    np.testing.assert_allclose(hr, hs, rtol=1e-12, atol=0)


def test_extract_windows_batched_matches_unbatched():
    """The stacked (C, H, W) fast path must produce exactly the windows
    the per-channel path produces — including NaN masks at clipped
    border windows and the clamped-slab layout."""
    rng = np.random.default_rng(4)
    chans = [rng.normal(size=(33, 41)).astype(np.float32) for _ in range(3)]
    chans[0][5:9, 7:12] = np.nan  # NaNs in the data itself survive
    cl = jnp.asarray(np.array([0, 7, 16, 30], dtype=np.int32))
    cs = jnp.asarray(np.array([2, 20, 40], dtype=np.int32))
    for w in (6, 7, 50):  # even, odd, larger-than-grid
        batched = np.asarray(_extract_windows(
            jnp.asarray(np.stack(chans)), cl, cs, w, w))
        for k, ch in enumerate(chans):
            single = np.asarray(_extract_windows(jnp.asarray(ch), cl, cs,
                                                 w, w))
            np.testing.assert_array_equal(batched[:, k, :], single)


def test_gradients2d_end_to_end():
    img = streak_image(400, 400, angle_deg=25.0)
    g = Gradients2D(img, window_size=100, window_step=1)
    hist = g.histogram
    assert set(hist.variables) == {"weight", "used_ratio"}
    w = hist["weight"]
    assert w.dims == ("line", "sample", "angles")
    assert w.sizes["angles"] == 72
    assert (np.asarray(hist["used_ratio"].data) <= 1.0).all()

    # streaks at 25 deg -> gradients orthogonal at 25+90; G2 doubles angles
    # so the peak of the histogram sits near -(90-25)... simply check the
    # dominant direction is consistent across interior windows
    interior = np.asarray(w.data)[1:-1, 1:-1]
    peaks = interior.argmax(axis=-1)
    assert peaks.std() < 3.0  # coherent direction field


def test_gradients_multiscale_dims():
    img = streak_image(300, 280)
    da = DimArray(
        np.stack([img, img * 1.1]),
        dims=("pol", "line", "sample"),
        coords={"pol": np.array(["VV", "VH"]), "line": np.arange(300),
                "sample": np.arange(280)},
    )
    g = Gradients(da, windows_sizes=[80, 160], downscales_factors=[1, 2])
    hist = g.histogram
    w = hist["weight"]
    assert w.dims == ("pol", "downscale_factor", "window_size", "line", "sample", "angles")
    assert w.sizes["pol"] == 2
    assert w.sizes["downscale_factor"] == 2
    assert w.sizes["window_size"] == 2
    np.testing.assert_array_equal(w.coords["downscale_factor"], [1, 2])


def test_circ_smooth_matches_scipy():
    h = rng.uniform(0, 1, size=(3, 72))
    da = DimArray(h, dims=("w", "angles"),
                  coords={"angles": np.linspace(-np.pi / 2, np.pi / 2, 72)})
    got = np.asarray(circ_smooth(da).data)

    Bx = np.array([1, 2, 1], float) / 4
    Bx2 = np.array([1, 0, 2, 0, 1], float) / 4
    Bx4 = np.array([1, 0, 0, 0, 2, 0, 0, 0, 1], float) / 4
    Bx8 = np.array([1, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 1], float) / 4
    for row in range(3):
        x = np.pad(h[row], 17, mode="wrap")
        for B in (Bx, Bx2, Bx4, Bx8):
            x = signal.convolve(x, B, mode="same")
        np.testing.assert_allclose(got[row], x[17:-17], rtol=1e-12, atol=1e-14)


def test_filtering_parameters_matches_oracle():
    img = streak_image(128, 128)

    def oracle():
        image = np.sqrt(img)
        r2 = oracle_R2(image)
        _, G3, c = oracle_local_gradients(image)
        B2 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], float) / 16
        B4 = signal.convolve(B2, B2)
        B22 = np.array([[1, 0, 2, 0, 1], [0, 0, 0, 0, 0], [2, 0, 4, 0, 2],
                        [0, 0, 0, 0, 0], [1, 0, 2, 0, 1]], float) / 16
        B42 = signal.convolve(B22, B22)

        def mean_op(x):
            y = signal.convolve2d(x, B4, mode="same", boundary="symm")
            return signal.convolve2d(y, B42, mode="same", boundary="symm")

        J = mean_op(r2)
        J1 = mean_op(r2 ** 2)
        J2 = np.sqrt(J1 - J ** 2)
        P1 = J2 / (J + 0.00001)
        h, w = (r2.shape[0] // 2) * 2, (r2.shape[1] // 2) * 2
        resampl = r2[:h, :w].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        sm = signal.convolve2d(resampl, B2, mode="same", boundary="symm")
        K = r2 - ndimage.zoom(sm, (r2.shape[0] / resampl.shape[0],
                                   r2.shape[1] / resampl.shape[1]), order=1)
        P2 = K ** 2 / (J ** 2 + 0.00001)
        G4 = mean_op(G3)
        P3 = G3 / (G4 + 0.00001)
        P4 = np.sqrt(c)
        f1 = np.clip(-50 * P1 + 2.75, 0, 1)
        f2 = np.clip(-5000 * P2 + 3, 0, 1)
        f3 = np.clip(-2.5 * P3 + 4, 0, 1)
        f4 = np.clip(-10 * P4 + 6.3, 0, 1)
        F = np.sqrt((f1 ** 2 + f2 ** 2 + f3 ** 2 + f4 ** 2) / 4)
        return f1, f2, f3, f4, F

    got = filtering_parameters(img)
    expected = oracle()
    for g, e, name in zip(got, expected, "f1 f2 f3 f4 F".split()):
        np.testing.assert_allclose(np.asarray(g.data), e, rtol=1e-7, atol=1e-9,
                                   err_msg=name)


def test_circ_hist_contract():
    da = DimArray(rng.uniform(0, 1, 72), dims=("angles",),
                  coords={"angles": np.linspace(-np.pi / 2, np.pi / 2, 72)})
    df = circ_hist(da)
    assert list(df.columns) == ["line_g", "sample_g"]
    assert len(df) == 145  # 2*72 + closing point
    np.testing.assert_allclose(df.iloc[0], df.iloc[-1])


def test_plot_gradients():
    import matplotlib

    matplotlib.use("Agg")
    img = streak_image(300, 300)
    hist = Gradients2D(img, window_size=100).histogram
    pg = PlotGradients(hist)
    assert "angle" in pg.peak.variables
    ax = pg.vectorfield()
    assert ax is not None
    ax2 = pg.histogram_plot(line=150, sample=150)
    assert ax2 is not None


def test_plot_gradients_smoke(tmp_path):
    """PlotGradients renders a quiver and a circular histogram (Agg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = streak_image(256, 256, angle_deg=25.0)
    da = DimArray(img[None], dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV"]), "line": np.arange(256),
                          "sample": np.arange(256)})
    g = Gradients(da, windows_sizes=[80], downscales_factors=[1])
    hist = g.histogram
    w = hist["weight"].mean(dim=["pol", "downscale_factor", "window_size"])
    pg = PlotGradients(DimDataset({
        "weight": w,
        "used_ratio": hist["used_ratio"].mean(
            dim=[d for d in hist["used_ratio"].dims
                 if d not in ("line", "sample")]),
    }))
    ax = pg.vectorfield()
    assert len(ax.collections) >= 1
    fig = ax.figure
    fig.savefig(tmp_path / "quiver.png")
    plt.close(fig)

    ax2 = pg.histogram_plot(line=0, sample=0)
    ax2.figure.savefig(tmp_path / "hist.png")
    plt.close(ax2.figure)


# -------------------------------------------- end-to-end pipeline parity

def _blocked_coords(c):
    n = (len(c) // 2) * 2
    return np.asarray(c, np.float64)[:n].reshape(-1, 2).mean(axis=1)


def _oracle_full_histogram(img, line, sample, window_size, windows_at, bins,
                           ref_kernel):
    """Hand-assembled reference pipeline for ONE (image, window_size):
    R2 -> sqrt -> Scharr local gradients -> centered rolling windows
    selected at `windows_at` (nearest) -> reference gradient_histogram,
    normalized by window pixels (reference gradients.py:89-205)."""
    import warnings

    i2 = oracle_R2(img)
    l1, s1 = _blocked_coords(line), _blocked_coords(sample)
    ampl = np.sqrt(i2)
    g2, _, c = oracle_local_gradients(ampl)
    l2, s2 = _blocked_coords(l1), _blocked_coords(s1)

    win = int(np.mean([window_size / (l2[1] - l2[0]),
                       window_size / (s2[1] - s2[0])]))
    wl = np.asarray(windows_at["line"], np.float64)
    ws_ = np.asarray(windows_at["sample"], np.float64)
    il = np.abs(l2[None, :] - wl[:, None]).argmin(axis=1)
    isamp = np.abs(s2[None, :] - ws_[:, None]).argmin(axis=1)

    # NaN-padded centered windows (xarray rolling(center=True).construct:
    # start pad = win // 2, i.e. window covers [c - w//2, c + w-1 - w//2];
    # verified against pandas rolling(center=True) semantics)
    half = win // 2
    pg2 = np.full((g2.shape[0] + 2 * win, g2.shape[1] + 2 * win), np.nan,
                  complex)
    pc = np.full_like(pg2, np.nan, dtype=float)
    pg2[win:win + g2.shape[0], win:win + g2.shape[1]] = g2
    pc[win:win + g2.shape[0], win:win + g2.shape[1]] = c

    weight = np.zeros((len(il), len(isamp), len(bins)))
    ratio = np.zeros((len(il), len(isamp)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for a, i in enumerate(il):
            for b, j in enumerate(isamp):
                wg2 = pg2[win + i - half: win + i - half + win,
                          win + j - half: win + j - half + win]
                wc = pc[win + i - half: win + i - half + win,
                        win + j - half: win + j - half + win]
                h, r = ref_kernel(wg2, wc, bins)
                weight[a, b] = h / (win * win)
                ratio[a, b] = 0.0 if np.isnan(r) else r
    return weight, ratio


def test_gradients_full_pipeline_parity():
    """Assembled multiscale Gradients.histogram vs the reference stages
    composed end-to-end — every (pol, factor, size) combo, including
    windows_at alignment across scales (reference gradients.py:89-125,
    151-205, 208-245, 248-334)."""
    ref = load_ref_gradients()
    img_vv = streak_image(480, 448, angle_deg=25.0)
    img_vh = streak_image(480, 448, angle_deg=25.0, seed=4) * 0.2
    line = np.arange(480, dtype=float)
    sample = np.arange(448, dtype=float)
    da = DimArray(np.stack([img_vv, img_vh]), dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV", "VH"]),
                          "line": line, "sample": sample})

    sizes = [96, 160]
    factors = [1, 2]
    g = Gradients(da, windows_sizes=sizes, downscales_factors=factors,
                  window_step=1)
    got = g.histogram["weight"]  # (pol, downscale_factor, window_size, ...)
    got_r = g.histogram["used_ratio"]
    assert got.dims[:3] == ("pol", "downscale_factor", "window_size")

    bins = np.linspace(-np.pi / 2, np.pi / 2, 73)
    bins = (bins[1:] + bins[:-1]) / 2

    # windows_at from the FIRST combo (pol 0, factor 1, first size)
    step = int(sizes[0] * 1)
    windows_at = {"line": line[::step], "sample": sample[::step]}

    for pi, img in enumerate((img_vv, img_vh)):
        for fi, f in enumerate(factors):
            if f == 1:
                img_f, line_f, sample_f = img, line, sample
            else:
                img_f = cv2.resize(img, (448 // f, 480 // f),
                                   interpolation=cv2.INTER_AREA)
                line_f = line[: (480 // f) * f].reshape(-1, f).mean(axis=1)
                sample_f = sample[: (448 // f) * f].reshape(-1, f).mean(axis=1)
            for si, ws in enumerate(sizes):
                w_exp, r_exp = _oracle_full_histogram(
                    img_f, line_f, sample_f, ws, windows_at, bins,
                    ref.gradient_histogram)
                np.testing.assert_allclose(
                    np.asarray(got.data)[pi, fi, si], w_exp,
                    rtol=1e-7, atol=1e-10,
                    err_msg=f"weight mismatch at pol={pi} factor={f} "
                            f"window={ws}")
                np.testing.assert_allclose(
                    np.asarray(got_r.data)[pi, fi, si], r_exp,
                    rtol=1e-7, atol=1e-12,
                    err_msg=f"used_ratio mismatch at pol={pi} factor={f} "
                            f"window={ws}")


def test_plot_gradients_hv_helpers():
    """Style/combo machinery of the interactive backend (no holoviews)."""
    img = streak_image(256, 256)
    da = DimArray(
        np.stack([img, img * 1.05]), dims=("pol", "line", "sample"),
        coords={"pol": np.array(["VV", "VH"]), "line": np.arange(256.0),
                "sample": np.arange(256.0)})
    g = Gradients(da, windows_sizes=[64, 96], downscales_factors=[1])
    hist = g.histogram
    pg = PlotGradients(hist)

    combos = pg._combos()
    # pol(2) x downscale_factor(1) x window_size(2) = 4 combos
    assert len(combos) == 4
    st = pg._style_for({"pol": 1, "window_size": 0, "downscale_factor": 0})
    assert st["line_dash"] == "dotted" and st["line_color"] == "blue"
    line, sample, ang, wgt = pg._peak_2d(combos[0])
    assert ang.shape == (len(line), len(sample))
    # nearest-center snapping
    s, l = pg._nearest_center(sample[0] + 0.1, line[-1] + 5.0)
    assert s == sample[0] and l == line[-1]


def test_plot_gradients_holoviews_interactive():
    """Interactive linked view (reference gradients.py:441-585).

    Skipped in environments without holoviews (this CI image has none);
    the style/peak machinery it rides on is covered above.
    """
    hv = pytest.importorskip("holoviews")
    hv.extension("bokeh")
    img = streak_image(256, 256)
    g = Gradients2D(img, window_size=64, window_step=1)
    pg = PlotGradients(g.histogram)
    overlay = pg.hv_vectorfield(tap=True)
    assert overlay is not None
    dm = pg.mouse_histogram()
    assert dm is not None
    hp = pg.hv_histogram_plot(sample=100, line=100)
    assert hp is not None


def test_public_convolve2d_and_gradient_histogram_parity():
    """API-parity wrappers match scipy and the reference kernel directly."""
    ref = load_ref_gradients()
    img = streak_image(64, 70)
    B2 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], float) / 16

    from xsarsea_tpu.gradients import convolve2d, gradient_histogram

    got = convolve2d(img, B2, boundary="symm")
    want = signal.convolve2d(img, B2, mode="same", boundary="symm")
    np.testing.assert_allclose(np.asarray(got.data), want, rtol=1e-10)

    bins = np.linspace(-np.pi / 2, np.pi / 2, 73)
    bins = (bins[1:] + bins[:-1]) / 2
    r = np.random.default_rng(0)
    theta = r.uniform(-np.pi / 2 * 0.999, np.pi / 2 * 0.999, (10, 10))
    g2 = r.uniform(0, 3, (10, 10)) * np.exp(1j * theta)
    c = r.uniform(0, 1, (10, 10))
    h, ratio = gradient_histogram(g2, c, bins)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h_ref, ratio_ref = ref.gradient_histogram(g2, c, bins)
    np.testing.assert_allclose(h, h_ref, rtol=1e-10, atol=1e-12)
    assert ratio == ratio_ref


def test_window_stepping_noninteger_coord_ratio():
    """Window-center stepping and snapping at NON-integer coord-spacing
    ratios (VERDICT r2 weak #7): windows_at must stride the sigma0 coords
    by int(ws_px * window_step) and the histogram must snap each center to
    the nearest lg pixel, exactly like the reference's isel stride +
    .sel(method='nearest') (reference gradients.py:151-205)."""
    ref = load_ref_gradients()
    ny, nx = 230, 212
    img = streak_image(ny, nx, angle_deg=40.0)
    line = np.arange(ny) * 7.3 + 3.1      # ws/step = 20.55 px
    sample = np.arange(nx) * 9.1          # ws/step = 16.48 px
    da = DimArray(img, dims=("line", "sample"),
                  coords={"line": line, "sample": sample})

    ws = 150.0
    g2d = Gradients2D(da, window_size=ws, window_step=1)

    # reference windows_at: int(mean(ws / coord_step)) then [::step]
    step_l = np.unique(np.diff(line))[0]
    step_s = np.unique(np.diff(sample))[0]
    ws_px = int(np.mean([ws / step_l, ws / step_s]))
    stride = int(ws_px * 1)
    got_at = g2d.windows_at
    np.testing.assert_allclose(got_at["line"], line[::stride])
    np.testing.assert_allclose(got_at["sample"], sample[::stride])

    bins = np.linspace(-np.pi / 2, np.pi / 2, 73)
    bins = (bins[1:] + bins[:-1]) / 2
    w_exp, r_exp = _oracle_full_histogram(
        img, line, sample, ws,
        {"line": line[::stride], "sample": sample[::stride]}, bins,
        ref.gradient_histogram)
    ds = g2d._histogram_native
    np.testing.assert_allclose(np.asarray(ds["weight"].data), w_exp,
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ds["used_ratio"].data), r_exp,
                               rtol=1e-7, atol=1e-12)


def test_gradients_without_spatial_coords():
    """A DimArray lacking line/sample coords gets arange coords filled
    (regressed in the round-3 batched fan-out, caught in review)."""
    img = streak_image(128, 128)
    da = DimArray(np.stack([img, img * 0.5]), dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV", "VH"])})
    g = Gradients(da, windows_sizes=[40], downscales_factors=[1])
    h = g.histogram
    assert h["weight"].dims[-1] == "angles"
    assert np.isfinite(np.asarray(h["weight"].data)).all()


def test_hist_cache_invalidation_on_lg_reassign():
    """Reassigning _lg_hist after a cached histogram read must serve the
    new lg data, not the cached result (the cache keys on a generation
    counter — an id()-keyed cache could alias a recycled id)."""
    img = streak_image(160, 160)
    g = Gradients2D(img, window_size=40, window_step=1)
    first = g.histogram
    w_first = np.asarray(first["weight"].data).copy()

    # inject a different lg trio (scaled abs changes r-weights -> hist)
    lg = local_gradients(
        Gradients2D(img, window_size=40, window_step=1).ampl)
    coords = {d: lg["G2_abs"].coords[d] for d in ("line", "sample")}
    mk = lambda a, n: DimArray(np.asarray(a), dims=("line", "sample"),
                               coords=coords, name=n)
    g._lg_hist = (mk(np.asarray(lg["G2_abs"].data) * 0.0, "G2_abs"),
                  mk(lg["G2_angle"].data, "G2_angle"),
                  mk(lg["c"].data, "c"))
    second = g.histogram
    w_second = np.asarray(second["weight"].data)
    assert not np.allclose(w_first, w_second)
    # all-zero |G2| -> every pixel masked out -> zero weights
    assert np.allclose(w_second, 0.0)


def test_fused_histogram_matches_instance_path():
    """The single-dispatch fused multiscale path must agree with the
    per-instance (StackedGradients) path — same combos, same windows_at
    snapping, same normalization (they are separately compiled programs,
    so f64-ulp-level fusion differences are allowed)."""
    img = streak_image(320, 288, angle_deg=40.0)
    da = DimArray(np.stack([img, 0.3 * img]), dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV", "VH"]),
                          "line": np.arange(320.0) * 5,
                          "sample": np.arange(288.0) * 5})
    kw = dict(windows_sizes=[400, 640], downscales_factors=[1, 2])

    fused = Gradients(da, **kw).histogram
    g2 = Gradients(da, **kw)
    g2.gradients_list  # touching instances routes through the old path
    inst = g2.histogram

    assert fused["weight"].dims == inst["weight"].dims
    for k in ("line", "sample", "angles", "downscale_factor", "window_size"):
        np.testing.assert_array_equal(fused["weight"].coords[k],
                                      inst["weight"].coords[k])
    np.testing.assert_allclose(np.asarray(fused["weight"].data),
                               np.asarray(inst["weight"].data),
                               rtol=1e-9, atol=1e-300)
    np.testing.assert_allclose(np.asarray(fused["used_ratio"].data),
                               np.asarray(inst["used_ratio"].data),
                               rtol=1e-9)


def test_window_step_none_paths_agree():
    """Gradients(window_step=None) must behave like window_step=1 on BOTH
    the fused and the per-instance path (review finding: the fused path
    silently treated None as 1 while the instance path crashed)."""
    img = streak_image(192, 160, angle_deg=25.0)
    da = DimArray(img[None], dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV"]),
                          "line": np.arange(192.0),
                          "sample": np.arange(160.0)})
    kw = dict(windows_sizes=[64], downscales_factors=[1])

    fused_none = Gradients(da, window_step=None, **kw).histogram
    fused_one = Gradients(da, window_step=1, **kw).histogram
    np.testing.assert_array_equal(np.asarray(fused_none["weight"].data),
                                  np.asarray(fused_one["weight"].data))

    g = Gradients(da, window_step=None, **kw)
    g.gradients_list  # route through the per-instance path
    inst = g.histogram  # used to raise TypeError on None window_step
    np.testing.assert_allclose(np.asarray(inst["weight"].data),
                               np.asarray(fused_one["weight"].data),
                               rtol=1e-9, atol=1e-300)


def test_n_angles_threads_through_fused_path():
    """Changing Gradients.n_angles must change the fused histogram's
    angular bin count (it was hardcoded to 72) and stay consistent with
    the per-instance path."""
    img = streak_image(192, 160, angle_deg=25.0)
    da = DimArray(img[None], dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV"]),
                          "line": np.arange(192.0),
                          "sample": np.arange(160.0)})
    kw = dict(windows_sizes=[64], downscales_factors=[1])

    g_f = Gradients(da, **kw)
    g_f.n_angles = 36
    fused = g_f.histogram
    assert fused["weight"].sizes["angles"] == 36

    g_i = Gradients(da, **kw)
    g_i.n_angles = 36
    g_i.gradients_list
    inst = g_i.histogram
    np.testing.assert_allclose(np.asarray(fused["weight"].data),
                               np.asarray(inst["weight"].data),
                               rtol=1e-9, atol=1e-300)


def test_fused_cache_invalidates_on_windows_sizes_mutation():
    """Appending a window size after a cached fused histogram must
    produce the new combo, not serve the stale cached dataset (review
    finding: the cache key omitted windows_sizes/downscales_factors)."""
    img = streak_image(192, 160, angle_deg=25.0)
    da = DimArray(img[None], dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV"]),
                          "line": np.arange(192.0),
                          "sample": np.arange(160.0)})
    g = Gradients(da, windows_sizes=[64], downscales_factors=[1])
    h1 = g.histogram
    assert h1["weight"].sizes["window_size"] == 1
    g.windows_sizes.append(96)
    h2 = g.histogram
    assert h2["weight"].sizes["window_size"] == 2
    np.testing.assert_array_equal(h2["weight"].coords["window_size"],
                                  [64, 96])


def test_gradients_instance_mutation_honored():
    """Reassigning an instance's windows_at after construction must
    still be honored by .histogram (the fused path only applies while
    gradients_list is untouched)."""
    img = streak_image(256, 256)
    da = DimArray(img[None], dims=("pol", "line", "sample"),
                  coords={"pol": np.array(["VV"]),
                          "line": np.arange(256.0),
                          "sample": np.arange(256.0)})
    g = Gradients(da, windows_sizes=[64], downscales_factors=[1])
    at = {"line": np.array([64.0, 192.0]), "sample": np.array([128.0])}
    for inst in g.gradients_list:
        inst.windows_at = at
    h = g.histogram
    assert h["weight"].sizes["line"] == 2
    assert h["weight"].sizes["sample"] == 1
    np.testing.assert_array_equal(h["weight"].coords["line"], at["line"])
