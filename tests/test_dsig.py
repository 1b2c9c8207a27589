"""dsig weighting and NESZ flattening parity vs the reference utils."""

import numpy as np
import pytest

from xsarsea_tpu.windspeed import get_dsig, get_dsig_wspd, nesz_flattening
from reference_runner import load_ref_windspeed_utils


@pytest.fixture(scope="module")
def ref():
    return load_ref_windspeed_utils()


def test_get_dsig_schemes(ref):
    rng = np.random.default_rng(0)
    inc = rng.uniform(18, 45, size=(6, 7))
    s0 = rng.uniform(1e-4, 1e-2, size=(6, 7))
    nesz = rng.uniform(1e-5, 1e-3, size=(6, 7))
    for name in ("gmf_s1_v2", "gmf_rs2_v2", "sarwing_lut_cmodms1ahw", "nc_lut_cmodms1ahw"):
        got = np.asarray(get_dsig(name, inc, s0, nesz))
        expected = ref.get_dsig(name, inc, s0, nesz)
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    with pytest.raises(ValueError):
        get_dsig("unknown", inc, s0, nesz)


def test_get_dsig_wspd(ref):
    rng = np.random.default_rng(1)
    u = rng.uniform(0, 40, size=(5, 5))
    snr = rng.uniform(0, 10, size=(5, 5))
    for name in ("dsig_wspd_rs2_v3", "dsig_wspd_s1_ew_rec_v3", "dsig_wspd_rcm_v3"):
        got = np.asarray(get_dsig_wspd(name, u, snr))
        expected = ref.get_dsig_wspd(name, u, snr)
        np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_nesz_flattening_parity(ref):
    rng = np.random.default_rng(2)
    ny, nx = 12, 40
    inc = np.linspace(18, 45, nx)[None, :].repeat(ny, axis=0)
    inc += rng.normal(0, 0.01, size=inc.shape)
    # noise decays with incidence in dB plus per-row structure
    noise_db = -25.0 - 0.15 * inc + rng.normal(0, 0.8, size=(ny, nx))
    noise = 10 ** (noise_db / 10.0)
    noise[2, 5] = np.nan  # replaced by column mean before the fit
    noise[7, [0, 1, 2]] = np.nan

    got = np.asarray(nesz_flattening(noise, inc))
    expected = ref.nesz_flattening(noise.copy(), inc)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_nesz_flattening_all_nan_row(ref):
    nx = 30
    inc = np.linspace(18, 45, nx)[None, :].repeat(3, axis=0)
    noise = np.full((3, nx), 1e-3)
    noise[1, :] = np.nan

    got = np.asarray(nesz_flattening(noise, inc))
    # with an all-NaN row, the column means still fill it -> fit still runs
    # in the reference (nanmean over the other rows)
    expected = ref.nesz_flattening(noise.copy(), inc)
    np.testing.assert_allclose(got, expected, rtol=1e-9, equal_nan=True)


def test_nesz_flattening_requires_2d():
    with pytest.raises(IndexError):
        nesz_flattening(np.zeros(5), np.zeros(5))
