"""Packed LUT cache, native codec fallback equivalence, CLI smoke tests."""

import json
import sys

import numpy as np
import pytest

from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.io.lut_io import read_packed_lut, write_packed_lut


def make_lut():
    rng = np.random.default_rng(0)
    inc = np.linspace(16.0, 66.0, 11)
    wspd = np.linspace(0.2, 50.0, 25)
    phi = np.linspace(0.0, 180.0, 7)
    data = rng.uniform(-40.0, 5.0, (11, 25, 7)).astype(np.float32)
    return DimArray(
        data, dims=("incidence", "wspd", "phi"),
        coords={"incidence": inc, "wspd": wspd, "phi": phi},
        attrs={"units": "dB", "model": "test", "resolution": "high"},
    )


def test_packed_roundtrip(tmp_path):
    lut = make_lut()
    p = tmp_path / "lut.xstl"
    write_packed_lut(p, lut, lut.attrs)
    back = read_packed_lut(p)
    assert back.dims == lut.dims
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(lut.data))
    for d in lut.dims:
        np.testing.assert_allclose(np.asarray(back.coords[d]),
                                   np.asarray(lut.coords[d]))
    assert back.attrs["units"] == "dB"


def _hide_native(monkeypatch):
    import xsarsea_tpu

    monkeypatch.setitem(sys.modules, "xsarsea_tpu._lutio", None)
    monkeypatch.delattr(xsarsea_tpu, "_lutio", raising=False)


def test_packed_python_fallback_interop(tmp_path, monkeypatch):
    """Files written by the native codec load with the Python fallback
    and vice versa (same on-disk format)."""
    lut = make_lut()
    p_native = tmp_path / "native.xstl"
    write_packed_lut(p_native, lut, lut.attrs)  # native if built

    _hide_native(monkeypatch)
    back = read_packed_lut(p_native)  # python reader
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(lut.data))

    p_py = tmp_path / "py.xstl"
    write_packed_lut(p_py, lut, lut.attrs)  # python writer
    monkeypatch.undo()
    back2 = read_packed_lut(p_py)  # native reader if built
    np.testing.assert_array_equal(np.asarray(back2.data), np.asarray(lut.data))
    assert back2.attrs == back.attrs


def synth_cmod7_dir(tmp_path):
    m, n, p = 250, 73, 51
    vals = np.random.default_rng(3).uniform(1e-4, 1.0, (m, n, p)).astype(np.float32)
    flat = np.concatenate([[np.float32(1)], vals.reshape(-1, order="F"),
                           [np.float32(1)]])
    (tmp_path / "cmod7").mkdir()
    flat.astype("<f4").tofile(tmp_path / "cmod7" / "gmf_cmod7_vv.dat_little_endian")
    return str(tmp_path / "cmod7"), vals


def test_cmod7_decode_native_matches_fallback(tmp_path, monkeypatch):
    from xsarsea_tpu.models.cmod7 import Cmod7Model

    topdir, vals = synth_cmod7_dir(tmp_path)
    model = Cmod7Model("gmf_cmod7_test_native", topdir, pol="VV")
    lut = model._raw_lut()
    assert lut.dims == ("incidence", "wspd", "phi")
    np.testing.assert_array_equal(np.asarray(lut.data), vals.transpose(2, 0, 1))

    _hide_native(monkeypatch)
    lut2 = Cmod7Model("gmf_cmod7_test_py", topdir, pol="VV")._raw_lut()
    np.testing.assert_array_equal(np.asarray(lut2.data), np.asarray(lut.data))


def test_cli_list(capsys):
    from xsarsea_tpu.cli import main

    main(["list"])
    out = capsys.readouterr().out
    assert "gmf_cmod5n" in out and "VV" in out


def test_cli_models_to_packed(tmp_path, capsys):
    """Export a low-res analytic model through the CLI machinery."""
    from xsarsea_tpu.cli import main
    from xsarsea_tpu.io.lut_io import read_packed_lut as rpl

    # monkey-free: exporting every model at high res is slow; drive the
    # shared helper on one model instead
    from xsarsea_tpu.models import get_model

    m = get_model("gmf_cmod5n")
    lut = m.to_lut(units="dB", resolution="low")
    p = tmp_path / "nc_lut_gmf_cmod5n.xstl"
    write_packed_lut(p, lut, lut.attrs)
    back = rpl(p)
    assert back.sizes["incidence"] == lut.sizes["incidence"]

    main(["list", "--pol", "VV"])
    out = capsys.readouterr().out
    assert "VH" not in out


def test_cli_invert(tmp_path, capsys):
    """Serving entry point: scene .npz in -> wind .npz out (dual + mono)."""
    from test_inversion import synthetic_scene

    from xsarsea_tpu.cli import main
    from xsarsea_tpu.windspeed import invert_from_model

    inc, s0_co, s0_cr, dsig_cr, anc = synthetic_scene(ny=12, nx=14)
    scene = tmp_path / "scene.npz"
    np.savez(scene, inc=inc, sigma0=s0_co, sigma0_dual=s0_cr,
             ancillary_wind=anc)
    out = tmp_path / "wind.npz"
    main(["invert", str(scene), str(out),
          "--model", "gmf_cmod5n,gmf_s1_v2", "--mode", "exact"])
    got = np.load(out)
    ref_co, ref_dual = invert_from_model(
        inc, s0_co, s0_cr, ancillary_wind=anc, dsig_cr=0.1,
        model=("gmf_cmod5n", "gmf_s1_v2"), mode="exact")
    np.testing.assert_array_equal(got["wind_co"], ref_co)
    np.testing.assert_array_equal(got["wind_dual"], ref_dual)
    assert "valid" in capsys.readouterr().out

    # mono-pol copol
    scene2 = tmp_path / "scene2.npz"
    np.savez(scene2, inc=inc, sigma0=s0_co, ancillary_wind=anc)
    out2 = tmp_path / "wind2.npz"
    main(["invert", str(scene2), str(out2),
          "--model", "gmf_cmod5n", "--mode", "exact"])
    ref_mono = invert_from_model(inc, s0_co, ancillary_wind=anc,
                                 model="gmf_cmod5n", mode="exact")
    np.testing.assert_array_equal(np.load(out2)["wind"], ref_mono)


def test_cli_invert_model_count_strict(tmp_path):
    """3+ models without a dual channel must error, never silently run
    single-pol with models[0] (review finding: the check was ==2)."""
    import pytest
    from test_inversion import synthetic_scene

    from xsarsea_tpu.cli import main

    inc, s0_co, _, _, anc = synthetic_scene(ny=8, nx=8)
    scene = tmp_path / "scene.npz"
    np.savez(scene, inc=inc, sigma0=s0_co, ancillary_wind=anc)
    with pytest.raises(SystemExit, match="no 'sigma0_dual'"):
        main(["invert", str(scene), str(tmp_path / "w.npz"),
              "--model", "gmf_cmod5n,gmf_s1_v2,gmf_rs2_v2",
              "--mode", "exact"])


def test_cli_invert_directory_memmap(tmp_path):
    """Directory-of-.npy scene form memory-maps (out-of-core serving)."""
    from test_inversion import synthetic_scene

    from xsarsea_tpu.cli import main

    inc, s0_co, s0_cr, _, anc = synthetic_scene(ny=10, nx=12)
    d = tmp_path / "scene"
    d.mkdir()
    np.save(d / "inc.npy", inc)
    np.save(d / "sigma0.npy", s0_co)
    np.save(d / "sigma0_dual.npy", s0_cr)
    np.save(d / "ancillary_wind.npy", anc)
    out = tmp_path / "wind.npz"
    main(["invert", str(d), str(out),
          "--model", "gmf_cmod5n,gmf_s1_v2", "--mode", "exact"])
    got = np.load(out)
    assert got["wind_dual"].shape == inc.shape
    assert np.isfinite(np.abs(got["wind_dual"])).any()
