"""Run the *reference* xsarsea physics as a parity oracle.

The reference library cannot be imported as-is here (numba/xarray/dask are
not installed), but its physics lives in pure numpy+python. This module
executes selected reference source files inside surgically stubbed module
trees (numba -> pure-python gufunc shim, xarray -> numpy shims), so parity
tests compare against the reference's *actual* code, not a transcription.

Nothing from the reference is copied into the framework: this runner exists
only under tests/ and loads the sources from /root/reference at test time.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF_SRC = "/root/reference/src/xsarsea"


def _exec_file(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ensure_pkg(name):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod
    return sys.modules[name]


# --------------------------------------------------------------------- GMFs

_ref_gmfs_cache = None


def load_ref_gmfs():
    """Dict of reference scalar GMF functions {name: f(inc, wspd, phi)}."""
    global _ref_gmfs_cache
    if _ref_gmfs_cache is not None:
        return _ref_gmfs_cache

    collected = {}

    class FakeGmfModel:
        @classmethod
        def register(cls, name=None, pol=None, units=None, defer=True, **kw):
            def inner(func):
                collected[name or func.__name__] = func
                return func

            return inner

    _ensure_pkg("xsarsea_ref")
    _ensure_pkg("xsarsea_ref.windspeed")
    fake_gmfs = types.ModuleType("xsarsea_ref.windspeed.gmfs")
    fake_gmfs.GmfModel = FakeGmfModel
    sys.modules["xsarsea_ref.windspeed.gmfs"] = fake_gmfs

    src = open(f"{REF_SRC}/windspeed/gmfs_impl.py").read()
    src = src.replace("from xsarsea.windspeed.gmfs import GmfModel",
                      "from xsarsea_ref.windspeed.gmfs import GmfModel")
    mod = types.ModuleType("xsarsea_ref.windspeed.gmfs_impl")
    sys.modules[mod.__name__] = mod
    exec(compile(src, f"{REF_SRC}/windspeed/gmfs_impl.py", "exec"), mod.__dict__)

    _ref_gmfs_cache = collected
    return collected


def ref_gmf_grid(name, inc, wspd, phi=None):
    """Evaluate a reference scalar GMF over an outer-product grid (f64)."""
    fn = load_ref_gmfs()[name]
    inc = np.atleast_1d(np.asarray(inc, dtype=np.float64))
    wspd = np.atleast_1d(np.asarray(wspd, dtype=np.float64))
    if phi is None:
        out = np.empty((inc.size, wspd.size))
        for i, one_inc in enumerate(inc):
            for j, one_wspd in enumerate(wspd):
                out[i, j] = fn(one_inc, one_wspd)
        return out
    phi = np.atleast_1d(np.asarray(phi, dtype=np.float64))
    out = np.empty((inc.size, wspd.size, phi.size))
    for i, one_inc in enumerate(inc):
        for j, one_wspd in enumerate(wspd):
            for k, one_phi in enumerate(phi):
                out[i, j, k] = fn(one_inc, one_wspd, one_phi)
    return out


# ---------------------------------------------------------------- inversion

_ref_windspeed_cache = None


def _load_ref_windspeed():
    """Load reference windspeed.py with numba/xarray stubbed (pure python)."""
    global _ref_windspeed_cache
    if _ref_windspeed_cache is not None:
        return _ref_windspeed_cache

    # ---- numba stub: types + a pure-python guvectorize implementing
    # the "(n),(n),(n),(n),(n)->(n),(n)" contract used at windspeed.py:306-323
    class _TypeExpr:
        def __getitem__(self, item):
            return self

        def __call__(self, *a, **k):
            return self

    numba_stub = types.ModuleType("numba")
    numba_stub.float64 = _TypeExpr()
    numba_stub.float32 = _TypeExpr()
    numba_stub.complex128 = _TypeExpr()
    numba_stub.void = _TypeExpr()

    def guvectorize(signatures, signature, **kw):
        def deco(fn):
            def wrapper(*arrays):
                arrs = [np.asarray(a) for a in arrays]
                shape = arrs[0].shape
                flat = [np.ascontiguousarray(a).reshape(-1) for a in arrs]
                out_co = np.empty(flat[0].shape, dtype=np.complex128)
                out_cr = np.empty(flat[0].shape, dtype=np.complex128)
                fn(*flat, out_co, out_cr)
                return out_co.reshape(shape), out_cr.reshape(shape)

            return wrapper

        return deco

    numba_stub.guvectorize = guvectorize
    numba_stub.njit = lambda *a, **k: (lambda f: f)
    numba_stub.vectorize = lambda *a, **k: (lambda f: np.vectorize(f))

    # ---- xarray stub: force the pure-numpy code path
    xr_stub = types.ModuleType("xarray")

    def zeros_like(x, dtype=None):
        raise TypeError("numpy-only oracle")

    xr_stub.zeros_like = zeros_like
    xr_stub.where = lambda cond, a, b: np.where(cond, a, b)
    xr_stub.DataArray = type("DataArray", (), {})

    saved = {k: sys.modules.get(k) for k in ("numba", "xarray")}
    sys.modules["numba"] = numba_stub
    sys.modules["xarray"] = xr_stub
    try:
        # xsarsea.utils stub (timing decorator only)
        util_pkg = _ensure_pkg("xsarsea")
        utils_stub = types.ModuleType("xsarsea.utils")
        utils_stub.timing = lambda logger=None: (lambda f: f)
        sys.modules["xsarsea.utils"] = utils_stub
        util_pkg.utils = utils_stub

        _ensure_pkg("xsarsea.windspeed")
        models_stub = types.ModuleType("xsarsea.windspeed.models")
        models_stub.get_model = lambda m: m
        sys.modules["xsarsea.windspeed.models"] = models_stub

        import logging

        wutils_stub = types.ModuleType("xsarsea.windspeed.utils")
        wutils_stub.logger = logging.getLogger("ref_oracle")
        sys.modules["xsarsea.windspeed.utils"] = wutils_stub

        mod = _exec_file(f"{REF_SRC}/windspeed/windspeed.py", "xsarsea_ref_windspeed")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    _ref_windspeed_cache = mod
    return mod


class ShimModel:
    """Quacks like the reference Model for invert_from_model's needs."""

    def __init__(self, lut_db, pol, name):
        self._lut = lut_db  # DimArray, dims (incidence, wspd[, phi]), units dB
        self.pol = pol
        self.name = name

    @property
    def iscopol(self):
        return len(set(self.pol)) == 1

    @property
    def iscrosspol(self):
        return len(set(self.pol)) == 2

    def to_lut(self, units="dB", **kwargs):
        assert units == "dB"
        return self._lut


def ref_invert(inc, sigma0_co, sigma0_cr, dsig_cr, ancillary_wind,
               lut_co_db, lut_cr_db, dsig_co=0.1):
    """Run the reference dual-pol inversion (pure-python numba shim).

    All image inputs are numpy arrays (sigma0 in linear units); LUTs are
    DimArrays in dB with dims (incidence, wspd, phi) / (incidence, wspd).
    Returns (wind_co, wind_dual) complex arrays.
    """
    mod = _load_ref_windspeed()
    model_co = ShimModel(lut_co_db, "VV", "oracle_co")
    model_cr = ShimModel(lut_cr_db, "VH", "oracle_cr")
    return mod.invert_from_model(
        np.asarray(inc, dtype=np.float64),
        np.asarray(sigma0_co, dtype=np.float64),
        np.asarray(sigma0_cr, dtype=np.float64),
        ancillary_wind=np.asarray(ancillary_wind, dtype=np.complex128),
        dsig_co=dsig_co,
        dsig_cr=np.asarray(dsig_cr, dtype=np.float64),
        model=(model_co, model_cr),
    )


def ref_invert_mono_copol(inc, sigma0_co, ancillary_wind, lut_co_db, dsig_co=0.1):
    mod = _load_ref_windspeed()
    model_co = ShimModel(lut_co_db, "VV", "oracle_co")
    # mono: sigma0 has no .pol attribute -> reference warns and assumes model pol
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return mod.invert_from_model(
            np.asarray(inc, dtype=np.float64),
            np.asarray(sigma0_co, dtype=np.float64),
            None,
            ancillary_wind=np.asarray(ancillary_wind, dtype=np.complex128),
            dsig_co=dsig_co,
            model=model_co,
        )


def ref_invert_mono_crosspol(inc, sigma0_cr, dsig_cr, lut_cr_db):
    mod = _load_ref_windspeed()
    model_cr = ShimModel(lut_cr_db, "VH", "oracle_cr")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return mod.invert_from_model(
            np.asarray(inc, dtype=np.float64),
            np.asarray(sigma0_cr, dtype=np.float64),
            None,
            dsig_cr=np.asarray(dsig_cr, dtype=np.float64),
            model=model_cr,
        )


# ----------------------------------------------------------------- gradients

_ref_gradients_cache = None


def load_ref_gradients():
    """Load reference gradients.py with an (unused-at-import) xarray stub.

    Only the pure-numpy pieces are usable from it (gradient_histogram);
    the xarray-dependent class machinery is exercised through hand-built
    cv2/scipy oracles in the tests instead.
    """
    global _ref_gradients_cache
    if _ref_gradients_cache is None:
        xr_stub = types.ModuleType("xarray")
        saved = sys.modules.get("xarray")
        sys.modules["xarray"] = xr_stub
        try:
            utils_stub = types.ModuleType("xsarsea.utils")
            utils_stub.timing = lambda logger=None: (lambda f: f)
            _ensure_pkg("xsarsea")
            sys.modules["xsarsea.utils"] = utils_stub
            _ref_gradients_cache = _exec_file(
                f"{REF_SRC}/gradients.py", "xsarsea_ref_gradients"
            )
        finally:
            if saved is None:
                sys.modules.pop("xarray", None)
            else:
                sys.modules["xarray"] = saved
    return _ref_gradients_cache


# ------------------------------------------------------- windspeed utilities

_ref_wutils_cache = None


def load_ref_windspeed_utils():
    """Reference windspeed/utils.py (get_dsig, get_dsig_wspd, nesz_flattening)."""
    global _ref_wutils_cache
    if _ref_wutils_cache is None:
        _ref_wutils_cache = _exec_file(f"{REF_SRC}/windspeed/utils.py", "xsarsea_ref_wutils")
    return _ref_wutils_cache
