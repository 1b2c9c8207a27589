"""Bayesian wind inversion from sigma0 — the framework's hot path.

TPU-native redesign of the reference inversion
(``/root/reference/src/xsarsea/windspeed/windspeed.py:17-439``). The
reference runs a numba-guvectorized per-pixel loop over dask chunks; here
the per-pixel Bayesian cost minimization over the (wspd, phi) LUT grid is a
single jitted XLA program, vmapped over pixel blocks, with the LUT resident
on device. Pixel-level data parallelism scales over a TPU mesh via
``jax.sharding`` (see :mod:`xsarsea_tpu.parallel`).

Algorithm (per pixel, faithfully matching windspeed.py:183-282):

* copol: select the nearest-incidence LUT slice, minimize
  ``J = Jwind + Jsig`` over the (wspd, phi) grid with the ancillary-wind
  prior ``Jwind = ((u - u_anc)/2)^2 + ((v - v_anc)/2)^2`` and
  ``Jsig = ((lut_dB - sigma0_dB)/dsig_co)^2``; for symmetric (0..180°)
  LUTs resolve the ±phi ambiguity against the ancillary direction.
* crosspol: 1-D minimization over wspd of
  ``Jsig_cr + ((wspd - |wind_co|)/2)^2`` (the prior term only when a
  copol solution exists); direction taken from copol.
* NaN semantics: NaN incidence → all NaN; valid copol sigma0 with NaN
  ancillary → NaN; NaN encodes land/missing data throughout.

Two execution modes:

* ``mode='exact'`` — full argmin over the complete grid (bit-matches the
  reference's np.argmin first-minimum tie rule in f64).
* ``mode='fast'`` — coarse-to-fine: top-M argmin on a strided coarse grid,
  then exact refinement windows on the fine grid around each candidate.
  ~15-30x less compute; validated to match 'exact' (see tests).
"""

from __future__ import annotations

import logging
import warnings
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.models.base import get_model
from xsarsea_tpu.utils import timing

logger = logging.getLogger("xsarsea_tpu.windspeed")

__all__ = ["invert_from_model", "InversionTables", "prepare_tables"]

# cost-function constants (reference windspeed.py:139-141)
D_ANTENNA = 2.0
D_AZI = 2.0
DWSPD_FG = 2.0


class InversionTables:
    """Device-resident LUT tables prepared for the inversion kernel.

    copol LUT is stored as (incidence, wspd, phi) in dB with precomputed
    wind-component grids; crosspol as (incidence, wspd) in dB.
    """

    def __init__(self, lut_co_db=None, lut_cr_db=None, dtype=jnp.float32):
        self.dtype = dtype
        self.has_co = lut_co_db is not None
        self.has_cr = lut_cr_db is not None

        if self.has_co:
            # lut dims (incidence, wspd, phi)
            self.co_lut = jnp.asarray(lut_co_db.data, dtype=dtype)
            self.co_inc = jnp.asarray(lut_co_db.coords["incidence"], dtype=dtype)
            wspd = np.asarray(lut_co_db.coords["wspd"], dtype=np.float64)
            phi = np.asarray(lut_co_db.coords["phi"], dtype=np.float64)
            self.co_wspd = jnp.asarray(wspd, dtype=dtype)
            self.co_phi = jnp.asarray(phi, dtype=dtype)
            # symmetric LUT detection (windspeed.py:152-156)
            self.phi_180 = bool((180.0 - (phi[-1] - phi[0])) < 2.0)
            phir = np.deg2rad(phi)
            self.co_u = jnp.asarray(wspd[:, None] * np.cos(phir)[None, :], dtype=dtype)
            self.co_v = jnp.asarray(wspd[:, None] * np.sin(phir)[None, :], dtype=dtype)
            self.co_phir = jnp.asarray(phir, dtype=dtype)

        if self.has_cr:
            self.cr_lut = jnp.asarray(lut_cr_db.data, dtype=dtype)
            self.cr_inc = jnp.asarray(lut_cr_db.coords["incidence"], dtype=dtype)
            self.cr_wspd = jnp.asarray(lut_cr_db.coords["wspd"], dtype=dtype)

        self._coarse = None

    def coarse(self, stride_w=6, stride_p=4, top_m=4):
        """Coarse-grid machinery for the fast (coarse-to-fine) solver.

        The fine (wspd, phi) grid is subsampled by (stride_w, stride_p)
        (always keeping the last node); the fast solver takes the top-M
        coarse minima and refines each in an exact window of the fine grid
        spanning ±stride around the candidate.
        """
        key = (stride_w, stride_p, top_m)
        if self._coarse is not None and self._coarse["key"] == key:
            return self._coarse
        W = self.co_lut.shape[1]
        P = self.co_lut.shape[2]
        iw = np.unique(np.r_[np.arange(0, W, stride_w), W - 1])
        ip = np.unique(np.r_[np.arange(0, P, stride_p), P - 1])
        self._coarse = dict(
            key=key,
            top_m=top_m,
            iw=jnp.asarray(iw, dtype=jnp.int32),
            ip=jnp.asarray(ip, dtype=jnp.int32),
            n_ip=len(ip),
            lut=jnp.asarray(self.co_lut[:, iw][:, :, ip]),
            u=jnp.asarray(self.co_u[iw][:, ip]),
            v=jnp.asarray(self.co_v[iw][:, ip]),
            win_w=2 * stride_w + 1,
            win_p=2 * stride_p + 1,
        )
        return self._coarse


@lru_cache(maxsize=32)
def _cached_tables(model_co_name, model_cr_name, dtype_name, kwargs_key):
    kwargs = dict(kwargs_key)
    lut_co = get_model(model_co_name).to_lut(units="dB", **kwargs) if model_co_name else None
    lut_cr = get_model(model_cr_name).to_lut(units="dB", **kwargs) if model_cr_name else None
    return InversionTables(lut_co, lut_cr, dtype=jnp.dtype(dtype_name).type)


def prepare_tables(model_co=None, model_cr=None, dtype=jnp.float32, **kwargs):
    """Build (and cache) InversionTables for the given models."""
    return _cached_tables(
        get_model(model_co).name if model_co is not None else None,
        get_model(model_cr).name if model_cr is not None else None,
        jnp.dtype(dtype).name,
        tuple(sorted(kwargs.items())),
    )


# --------------------------------------------------------------- kernel core

def _nearest_index(axis, value):
    """First-minimum nearest index, matching np.argmin(|axis - v|)."""
    return jnp.argmin(jnp.abs(axis - value))


def _wrap_angle(a):
    """wrap to (-pi, pi], like np.angle of a unit complex."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def _copol_solution(tables: InversionTables, i_inc, s0_co_db, ma, mz, dsig_co):
    """Per-pixel copol cost minimization. Returns (wspd, phi_signed_rad)."""
    lut_inc = tables.co_lut[i_inc]  # (W, P)
    mz_eff = jnp.abs(mz) if tables.phi_180 else mz
    jwind = ((tables.co_u - ma) / D_ANTENNA) ** 2 + ((tables.co_v - mz_eff) / D_AZI) ** 2
    jsig = ((lut_inc - s0_co_db) / dsig_co) ** 2
    j = jwind + jsig
    flat_idx = jnp.argmin(j.reshape(-1))
    iw, ip = flat_idx // j.shape[-1], flat_idx % j.shape[-1]
    wspd = tables.co_wspd[iw]
    phir = tables.co_phir[ip]

    if tables.phi_180:
        # ±phi ambiguity: pick the sign closest to the ancillary direction
        # (windspeed.py:234-245)
        anc_ang = jnp.arctan2(mz, ma)
        d1 = jnp.abs(_wrap_angle(anc_ang - phir))
        d2 = jnp.abs(_wrap_angle(anc_ang + phir))
        phi_signed = jnp.where(d1 <= d2, phir, -phir)
    else:
        phi_signed = phir
    return wspd, phi_signed


def _crosspol_solution(tables: InversionTables, i_inc_cr, s0_cr_db, dsig_cr, wspd_co):
    """Per-pixel crosspol 1-D cost minimization. Returns wspd_dual."""
    lut_inc = tables.cr_lut[i_inc_cr]  # (Wc,)
    jsig = ((lut_inc - s0_cr_db) / dsig_cr) ** 2
    jwind = ((tables.cr_wspd - wspd_co) / DWSPD_FG) ** 2
    has_co = ~jnp.isnan(wspd_co)
    j = jsig + jnp.where(has_co, jwind, 0.0)
    return tables.cr_wspd[jnp.argmin(j)]


def _invert_pixel(tables: InversionTables, inc, s0_co_db, s0_cr_db, dsig_cr,
                  anc_re, anc_im, dsig_co):
    """Single-pixel inversion; returns (co_re, co_im, dual_re, dual_im).

    Replicates the reference per-pixel kernel (windspeed.py:183-282)
    including the NaN guard ordering.
    """
    nan = jnp.asarray(jnp.nan, dtype=inc.dtype)

    # --- copol
    if tables.has_co:
        i_inc = _nearest_index(tables.co_inc, inc)
        wspd_co, phi_co = _copol_solution(tables, i_inc, s0_co_db, anc_re, anc_im, dsig_co)
        co_valid = ~jnp.isnan(s0_co_db)
        wspd_co = jnp.where(co_valid, wspd_co, nan)
        phi_co = jnp.where(co_valid, phi_co, nan)
    else:
        wspd_co, phi_co = nan, nan

    co_re = wspd_co * jnp.cos(phi_co)
    co_im = wspd_co * jnp.sin(phi_co)

    # --- crosspol / dualpol
    if tables.has_cr:
        i_inc_cr = _nearest_index(tables.cr_inc, inc)
        wspd_dual = _crosspol_solution(tables, i_inc_cr, s0_cr_db, dsig_cr, wspd_co)
        phi_dual = jnp.where(~jnp.isnan(wspd_co), phi_co, 0.0)
        cr_valid = (~jnp.isnan(s0_cr_db)) & (~jnp.isnan(dsig_cr))
        dual_re = jnp.where(cr_valid, wspd_dual * jnp.cos(phi_dual), nan)
        dual_im = jnp.where(cr_valid, wspd_dual * jnp.sin(phi_dual), nan)
    else:
        dual_re, dual_im = nan, nan

    # --- NaN guards (windspeed.py:198-207): order matters.
    # guard 1: NaN incidence -> all NaN. guard 2: valid copol sigma0 but
    # NaN ancillary -> all NaN. The reference assigns the *real* np.nan on
    # guards (-> nan+0j) vs nan*1j (-> nan+nan.j) for missing copol.
    anc_nan = jnp.isnan(anc_re) | jnp.isnan(anc_im)
    guard = jnp.isnan(inc) | ((~jnp.isnan(s0_co_db)) & anc_nan)

    return (
        jnp.where(guard, nan, co_re),
        jnp.where(guard, 0.0, co_im),
        jnp.where(guard, nan, dual_re),
        jnp.where(guard, 0.0, dual_im),
    )


def _make_invert_fn(tables: InversionTables, chunk_size=256):
    """Build the jitted flat-pixel inversion function for these tables."""

    def invert_flat(inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im, dsig_co):
        n = inc.shape[0]
        pad = (-n) % chunk_size
        args = [jnp.pad(a, (0, pad), constant_values=np.nan)
                for a in (inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im)]
        args = [a.reshape(-1, chunk_size) for a in args]

        pixel = lambda i, sc, sx, dc, ar, ai: _invert_pixel(
            tables, i, sc, sx, dc, ar, ai, dsig_co
        )
        chunk_fn = jax.vmap(pixel)
        out = lax.map(lambda xs: chunk_fn(*xs), tuple(args))
        return tuple(o.reshape(-1)[:n] for o in out)

    return jax.jit(invert_flat)


_invert_fn_cache = {}


def _get_invert_fn(tables, chunk_size):
    key = (id(tables), chunk_size)
    if key not in _invert_fn_cache:
        _invert_fn_cache[key] = _make_invert_fn(tables, chunk_size)
    return _invert_fn_cache[key]


def invert_pixels(tables: InversionTables, inc, s0_co_db, s0_cr_db, dsig_cr,
                  ancillary_wind, dsig_co=0.1, chunk_size=256):
    """Invert flat pixel arrays against prepared tables.

    All inputs are 1-D arrays of the same length (sigma0 already in dB);
    ``ancillary_wind`` is complex (antenna convention). Returns
    (wind_co, wind_dual) complex arrays.
    """
    dtype = tables.dtype
    anc = np.asarray(ancillary_wind)
    fn = _get_invert_fn(tables, chunk_size)
    co_re, co_im, du_re, du_im = fn(
        jnp.asarray(inc, dtype=dtype),
        jnp.asarray(s0_co_db, dtype=dtype),
        jnp.asarray(s0_cr_db, dtype=dtype),
        jnp.asarray(dsig_cr, dtype=dtype),
        jnp.asarray(anc.real, dtype=dtype),
        jnp.asarray(anc.imag, dtype=dtype),
        jnp.asarray(dsig_co, dtype=dtype),
    )
    ctype = np.complex128 if dtype == jnp.float64 else np.complex64
    wind_co = np.asarray(co_re, dtype=np.float64) + 1j * np.asarray(co_im, dtype=np.float64)
    wind_dual = np.asarray(du_re, dtype=np.float64) + 1j * np.asarray(du_im, dtype=np.float64)
    return wind_co.astype(ctype), wind_dual.astype(ctype)


# ------------------------------------------------------------- public facade

def _to_numpy(x):
    if isinstance(x, DimArray):
        return np.asarray(x.data)
    return np.asarray(x)


@timing(logger.debug)
def invert_from_model(
    inc,
    sigma0,
    sigma0_dual=None,
    /,
    ancillary_wind=None,
    dsig_co=0.1,
    dsig_cr=0.1,
    model=None,
    dtype=None,
    **kwargs,
):
    """Invert sigma0 into wind speed (and direction) using GMF/LUT model(s).

    API-compatible with the reference ``invert_from_model``
    (windspeed.py:17-128): mono-pol (copol or crosspol) with a single
    model, or dual-pol with ``model=(model_co, model_cr)``. Returns complex
    wind (modulus = speed m/s, angle = direction in antenna convention) —
    a DimArray when inputs are DimArrays. Dual-pol returns
    ``(wind_co, wind_dual)`` where wind_dual takes copol where either
    speed < 5 m/s (windspeed.py:425-428).

    ``dtype``: computation precision; defaults to float32 on TPU and the
    enabled default elsewhere (float64 when x64 is on).
    """
    if dtype is None:
        dtype = jnp.float64 if (jax.config.jax_enable_x64 and
                                jax.default_backend() == "cpu") else jnp.float32

    models = model if isinstance(model, tuple) else (model, None)
    models = tuple(get_model(m) if m is not None else None for m in models)

    template = next((v for v in (sigma0, inc) if isinstance(v, DimArray)), None)

    np_inc = _to_numpy(inc).astype(np.float64)
    np_s0 = _to_numpy(sigma0).astype(np.float64)
    shape = np_s0.shape

    if sigma0_dual is None:
        # mono-pol: check pol compatibility when the input carries one
        pol = None
        if isinstance(sigma0, DimArray):
            pol_c = sigma0.coords.get("pol")
            if pol_c is not None and np.asarray(pol_c).size == 1:
                pol = str(np.asarray(pol_c).reshape(-1)[0])
        model_pol = models[0].pol
        if pol is None:
            warnings.warn(f"Unable to check sigma0 pol. Assuming {model_pol}")
        elif pol not in model_pol:
            raise ValueError(
                f"sigma0 pol is {pol}, and model {models[0].name} can only handle {model_pol}"
            )
        if models[0].iscopol:
            np_s0_co, np_s0_cr = np_s0, np.full(shape, np.nan)
            if ancillary_wind is None or not np.any(~np.isnan(_to_numpy(ancillary_wind))):
                raise ValueError("copol inversion requires valid ancillary_wind")
        else:
            np_s0_co, np_s0_cr = np.full(shape, np.nan), np_s0
            if ancillary_wind is not None and not np.all(np.isnan(_to_numpy(ancillary_wind))):
                warnings.warn(
                    "crosspol inversion is best without ancillary wind, "
                    "but using it as requested."
                )
            models = (None, models[0])
    else:
        np_s0_co = np_s0
        np_s0_cr = _to_numpy(sigma0_dual).astype(np.float64)

    np_anc = (
        _to_numpy(ancillary_wind).astype(np.complex128)
        if ancillary_wind is not None
        else np.full(shape, np.nan, dtype=np.complex128)
    )
    np_dsig_cr = np.broadcast_to(_to_numpy(dsig_cr).astype(np.float64), shape)

    # to dB with epsilon clip (windspeed.py:126-130)
    with np.errstate(invalid="ignore", divide="ignore"):
        s0_co_db = 10.0 * np.log10(np_s0_co + 1e-15)
        s0_cr_db = 10.0 * np.log10(np_s0_cr + 1e-15)

    tables = prepare_tables(
        models[0], models[1], dtype=dtype, **kwargs
    )

    wind_co, wind_dual = invert_pixels(
        tables,
        np_inc.reshape(-1),
        s0_co_db.reshape(-1),
        s0_cr_db.reshape(-1),
        np_dsig_cr.reshape(-1),
        np_anc.reshape(-1),
        dsig_co=dsig_co,
    )
    wind_co = wind_co.reshape(shape)
    wind_dual = wind_dual.reshape(shape)

    def wrap(data, comment, model_names):
        if template is None:
            return data
        out = template.copy(data=data)
        out.attrs = {"comment": comment, "model": model_names}
        out.name = "windspeed_gmf"
        return out

    if sigma0_dual is None:
        if models[0] is not None:
            return wrap(
                wind_co,
                f"wind speed and direction inverted from model {models[0].name} "
                f"({models[0].pol})",
                models[0].name,
            )
        # mono crosspol: speed only
        out = np.abs(wind_dual)
        res = wrap(
            out,
            f"wind speed inverted from model {models[1].name} ({models[1].pol})",
            models[1].name,
        )
        if isinstance(res, DimArray):
            res.attrs["units"] = "m/s"
        return res

    # dual-pol merge (windspeed.py:425-428)
    merged = np.where(
        (np.abs(wind_co) < 5) | (np.abs(wind_dual) < 5), wind_co, wind_dual
    )
    co_out = wrap(
        wind_co,
        f"wind speed and direction inverted from model {models[0].name} "
        f"({models[0].pol})",
        models[0].name,
    )
    dual_out = wrap(
        merged,
        f"wind speed and direction inverted from model {models[0].name} "
        f"({models[0].pol}) and {models[1].name} ({models[1].pol})",
        f"{models[0].name} {models[1].name}",
    )
    return co_out, dual_out
