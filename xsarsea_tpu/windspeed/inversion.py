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

Execution modes (see :func:`invert_pixels`):

* ``mode='exact'`` — portable full-grid argmin (bit-matches the
  reference's np.argmin first-minimum tie rule in f64).
* ``mode='pallas'`` — fused TPU kernels: a coarse-subsampled
  expanded-form MXU group-argmin pass, then a direct-form VPU slab
  refine restoring exact f32 costs and the first-minimum tie rule.
* ``mode='pallas_exact'`` — same two kernels with the first pass on the
  full grid; ``'*_interpret'`` variants run the kernels in interpreter
  mode for CPU testing; ``'auto'`` picks pallas on TPU, exact elsewhere.
"""

from __future__ import annotations

import copy
import logging
import warnings
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from xsarsea_tpu.dimarray import DimArray, is_chunked
from xsarsea_tpu.interop import xarray_io
from xsarsea_tpu.models.base import get_model
from xsarsea_tpu.utils import timing

logger = logging.getLogger("xsarsea_tpu.windspeed")

__all__ = ["invert_from_model", "InversionTables", "prepare_tables"]

# cost-function constants (reference windspeed.py:139-141)
D_ANTENNA = 2.0
D_AZI = 2.0
DWSPD_FG = 2.0


@jax.tree_util.register_pytree_node_class
class InversionTables:
    """Device-resident LUT tables prepared for the inversion kernel.

    copol LUT is stored as (incidence, wspd, phi) in dB with precomputed
    wind-component grids; crosspol as (incidence, wspd) in dB. Registered
    as a JAX pytree so tables enter jitted programs as runtime buffers —
    never as trace-time constants embedded in the HLO.
    """

    _CO_FIELDS = ("co_lut", "co_inc", "co_wspd", "co_phi", "co_u", "co_v", "co_phir")
    _CR_FIELDS = ("cr_lut", "cr_inc", "cr_wspd")

    def tree_flatten(self):
        fields = (self._CO_FIELDS if self.has_co else ()) + (
            self._CR_FIELDS if self.has_cr else ()
        )
        children = tuple(getattr(self, f) for f in fields)
        aux = (self.has_co, self.has_cr, getattr(self, "phi_180", None),
               jnp.dtype(self.dtype).name, fields)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.has_co, obj.has_cr, phi_180, dtype_name, fields = aux
        if phi_180 is not None:
            obj.phi_180 = phi_180
        obj.dtype = jnp.dtype(dtype_name).type
        for f, c in zip(fields, children):
            setattr(obj, f, c)
        obj._coarse = None
        obj._device_full = None
        return obj

    def __init__(self, lut_co_db=None, lut_cr_db=None, dtype=jnp.float32):
        self.dtype = dtype
        self.has_co = lut_co_db is not None
        self.has_cr = lut_cr_db is not None
        # fields stay HOST-side (numpy): large LUTs pinned in device
        # memory degrade host->device bandwidth on constrained plugins.
        # Device residency is explicit: to_device() for the exact path,
        # a slim subset for the pallas path (which has its own packed
        # operands), and sharded device_put in the parallel path.
        np_dtype = np.dtype(jnp.dtype(dtype).name)

        if self.has_co:
            if np.ndim(lut_co_db.data) != 3:
                # mirror of the crosspol-slot diagnostic below: a 2-D
                # (phi-less, crosspol) LUT in the copol slot would
                # otherwise die on an opaque KeyError('phi')
                raise ValueError(
                    "copol model LUT must be 3-D (incidence, wspd, phi); "
                    f"got {np.shape(lut_co_db.data)} — was a crosspol "
                    "(phi-independent) model passed as the copol model?")
            # lut dims (incidence, wspd, phi)
            self.co_lut = np.ascontiguousarray(lut_co_db.data, dtype=np_dtype)
            self.co_inc = np.asarray(
                lut_co_db.coords["incidence"], dtype=np_dtype)
            wspd = np.asarray(lut_co_db.coords["wspd"], dtype=np.float64)
            phi = np.asarray(lut_co_db.coords["phi"], dtype=np.float64)
            self.co_wspd = wspd.astype(np_dtype)
            self.co_phi = phi.astype(np_dtype)
            # symmetric LUT detection (windspeed.py:152-156). NOTE: the
            # reference rule is also True for a full 0..360 span
            # (180 - 360 < 2), so 360-phi LUTs deliberately run through
            # the symmetric path too — characterized in
            # tests/test_inversion.py::test_phi_360_lut_characterization.
            self.phi_180 = bool((180.0 - (phi[-1] - phi[0])) < 2.0)
            phir = np.deg2rad(phi)
            self.co_u = (wspd[:, None] * np.cos(phir)[None, :]).astype(np_dtype)
            self.co_v = (wspd[:, None] * np.sin(phir)[None, :]).astype(np_dtype)
            self.co_phir = phir.astype(np_dtype)

        if self.has_cr:
            if np.ndim(lut_cr_db.data) != 2:
                # a phi-dependent (copol) model slipped into the crosspol
                # slot; fail with the actual mistake instead of a shape
                # unpack error deep in the kernel builders
                raise ValueError(
                    "crosspol model LUT must be 2-D (incidence, wspd); got "
                    f"{np.shape(lut_cr_db.data)} — was a copol "
                    "(phi-dependent) model passed as the crosspol model?")
            self.cr_lut = np.ascontiguousarray(lut_cr_db.data, dtype=np_dtype)
            self.cr_inc = np.asarray(lut_cr_db.coords["incidence"], dtype=np_dtype)
            self.cr_wspd = np.asarray(lut_cr_db.coords["wspd"], dtype=np_dtype)

        self._coarse = None
        self._device_full = None
        self._invert_fn_cache = {}

    def _copy_with(self, **overrides):
        obj = object.__new__(InversionTables)
        obj.__dict__.update(self.__dict__)
        obj.__dict__.update(overrides)
        obj._coarse = None
        obj._device_full = None
        obj._invert_fn_cache = {}
        return obj

    def to_device(self):
        """All-fields device copy (cached) for the exact jit path."""
        if self._device_full is None:
            fields = (self._CO_FIELDS if self.has_co else ()) + (
                self._CR_FIELDS if self.has_cr else ())
            self._device_full = self._copy_with(
                **{f: jnp.asarray(getattr(self, f)) for f in fields})
        return self._device_full

    def to_device_slim(self):
        """Device copy with the big copol grids replaced by placeholders.

        The pallas path reads only the small decode fields (co_wspd,
        co_phir, co_inc bounds, crosspol tables) — its own packed
        operands (g4, lut_pad) carry the LUT data — so pinning the
        ~180 MB co_lut on device would be pure waste.
        """
        overrides = {}
        if self.has_co:
            ph = jnp.zeros((1, 1), dtype=jnp.dtype(self.dtype))
            overrides.update(
                co_lut=jnp.zeros((1, 1, 1), dtype=jnp.dtype(self.dtype)),
                co_u=ph, co_v=ph,
                co_inc=jnp.asarray(self.co_inc),
                co_wspd=jnp.asarray(self.co_wspd),
                co_phi=jnp.asarray(self.co_phi),
                co_phir=jnp.asarray(self.co_phir),
            )
        if self.has_cr:
            overrides.update(
                cr_lut=jnp.asarray(self.cr_lut),
                cr_inc=jnp.asarray(self.cr_inc),
                cr_wspd=jnp.asarray(self.cr_wspd),
            )
        return self._copy_with(**overrides)



@lru_cache(maxsize=32)
def _cached_tables(model_co_name, model_cr_name, dtype_name, kwargs_key):
    kwargs = dict(kwargs_key)
    lut_co = get_model(model_co_name).to_lut(units="dB", **kwargs) if model_co_name else None
    lut_cr = get_model(model_cr_name).to_lut(units="dB", **kwargs) if model_cr_name else None
    return InversionTables(lut_co, lut_cr, dtype=jnp.dtype(dtype_name).type)


def prepare_tables(model_co=None, model_cr=None, dtype=jnp.float32, **kwargs):
    """Build (and cache) InversionTables for the given models."""
    # list/ndarray kwargs (range overrides etc. — Model.to_lut accepts
    # them) must become tuples before entering the lru_cache key, the
    # same normalization to_lut itself applies (base.py _hashable)
    def _hashable(v):
        return tuple(v) if isinstance(v, (list, np.ndarray)) else v

    return _cached_tables(
        get_model(model_co).name if model_co is not None else None,
        get_model(model_cr).name if model_cr is not None else None,
        jnp.dtype(dtype).name,
        tuple(sorted((k, _hashable(v)) for k, v in kwargs.items())),
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
    return wspd, _disambiguate_phi(tables, phir, ma, mz)


def _disambiguate_phi(tables: InversionTables, phir, ma, mz):
    """±phi ambiguity for symmetric LUTs: pick the sign closest to the
    ancillary direction (windspeed.py:234-245)."""
    if not tables.phi_180:
        return phir
    anc_ang = jnp.arctan2(mz, ma)
    d1 = jnp.abs(_wrap_angle(anc_ang - phir))
    d2 = jnp.abs(_wrap_angle(anc_ang + phir))
    return jnp.where(d1 <= d2, phir, -phir)


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
    if tables.has_co:
        i_inc = _nearest_index(tables.co_inc, inc)
        wspd_co, phi_co = _copol_solution(tables, i_inc, s0_co_db, anc_re, anc_im, dsig_co)
    else:
        wspd_co, phi_co = nan, nan
    return _postprocess_pixel(tables, inc, s0_co_db, s0_cr_db, dsig_cr,
                              anc_re, anc_im, wspd_co, phi_co)


def _postprocess_pixel(tables: InversionTables, inc, s0_co_db, s0_cr_db, dsig_cr,
                       anc_re, anc_im, wspd_co, phi_co, wspd_dual=None):
    """Masking + crosspol + NaN guards, shared by the XLA and Pallas paths.

    (wspd_co, phi_co) is the raw copol solution; may be garbage when the
    pixel has no valid copol observation — it is masked here. When the
    crosspol solution was already computed (the pallas path's bucketed
    crosspol kernel), pass it as ``wspd_dual`` to skip the per-pixel
    row-gather minimization.
    """
    nan = jnp.asarray(jnp.nan, dtype=inc.dtype)

    # --- copol validity
    if tables.has_co:
        co_valid = ~jnp.isnan(s0_co_db)
        wspd_co = jnp.where(co_valid, wspd_co, nan)
        phi_co = jnp.where(co_valid, phi_co, nan)

    co_re = wspd_co * jnp.cos(phi_co)
    co_im = wspd_co * jnp.sin(phi_co)

    # --- crosspol / dualpol
    if tables.has_cr:
        if wspd_dual is None:
            i_inc_cr = _nearest_index(tables.cr_inc, inc)
            wspd_dual = _crosspol_solution(tables, i_inc_cr, s0_cr_db, dsig_cr,
                                           wspd_co)
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
    """Build the jitted flat-pixel inversion function for these tables.

    The LUT tables are passed as jit *arguments* (via the pytree-registered
    InversionTables fields), never captured as closure constants — closure
    capture would embed hundreds of MB of LUT literals into the HLO and
    blow up compile times.
    """

    def invert_flat(tbl, inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im, dsig_co):
        n = inc.shape[0]
        pad = (-n) % chunk_size
        args = [jnp.pad(a, (0, pad), constant_values=np.nan)
                for a in (inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im)]
        args = [a.reshape(-1, chunk_size) for a in args]

        pixel = lambda i, sc, sx, dc, ar, ai: _invert_pixel(
            tbl, i, sc, sx, dc, ar, ai, dsig_co
        )
        chunk_fn = jax.vmap(pixel)
        out = lax.map(lambda xs: chunk_fn(*xs), tuple(args))
        return tuple(o.reshape(-1)[:n] for o in out)

    jitted = jax.jit(invert_flat)
    # materialize at build time, NOT first call: run may be traced inside
    # an outer jit (_wrap_for_spec), and a trace-time to_device() would
    # store tracers in the tables' _device_full cache
    tbl_dev = tables.to_device()

    def run(*args):
        return jitted(tbl_dev, *args)

    return run


def _build_g4_grouped(tables: InversionTables, dsig_co,
                      stride_w=1, stride_p=1, tile_target=2048, splits=3):
    """Assemble the group-aligned expanded-cost operand on device.

    The scaled LUT is centered PER INCIDENCE BAND (l' -> l' - shift[i],
    the same shift applied to the per-pixel s0' features of band-i
    blocks) — (l-s0)^2 is shift-invariant and smaller magnitudes keep
    the expanded form's f32 absolute error tight; per-band centers are
    ~3x tighter than the global one for CMOD-family LUTs.

    Entries are packed *per wspd group* (WGROUP fine rows each): group g's
    (possibly stride-subsampled, always keeping the last node) grid entries
    occupy one aligned ``gsize`` chunk, padded with q=1e19 so padding can
    never win a min. The kernel reduces each chunk to a group minimum in a
    single VPU pass — no per-entry index bookkeeping — and downstream only
    consumes the winning group (the slab refine re-searches all its rows).

    Built host-side in numpy and shipped with ONE device_put — the
    operand is used for many calls and building it on device would churn
    ~0.5 GB of intermediate buffers.
    Returns (g4 (I, n_tiles, 4, gpt*gsize), lut_shift (I,) f32 per-band
    shifts, n_groups, gsize).
    """
    if splits not in (2, 3):
        raise ValueError(f"splits must be 2 or 3, got {splits!r}")
    from xsarsea_tpu.ops.pallas_inversion import WGROUP

    lut = np.asarray(tables.co_lut, dtype=np.float32)
    u_full = np.asarray(tables.co_u, np.float32)
    v_full = np.asarray(tables.co_v, np.float32)
    I, W, P = lut.shape
    iw = np.unique(np.r_[np.arange(0, W, stride_w), W - 1])
    ip = np.unique(np.r_[np.arange(0, P, stride_p), P - 1])
    n_groups = (W + WGROUP - 1) // WGROUP
    rows_of = [iw[(iw >= g * WGROUP) & (iw < (g + 1) * WGROUP)]
               for g in range(n_groups)]
    n_ip = len(ip)
    max_e = max(len(r) for r in rows_of) * n_ip
    gsize = ((max_e + 127) // 128) * 128
    gpt = max(1, tile_target // gsize)
    if gpt > 1:
        # Mosaic requires the kernel's per-tile scratch store (offset
        # t*gpt, size gpt sublanes) to be 8-aligned; gpt == 1 lowers as a
        # scalar row store and is exempt.
        gpt = max(8, (gpt // 8) * 8)
    n_tiles = (n_groups + gpt - 1) // gpt
    n_groups_pad = n_tiles * gpt

    scaled = lut / np.float32(dsig_co)
    finite = np.isfinite(scaled)
    # PER-BAND centering: the expanded form's comparison noise is
    # eps * |q - 2*dot| with magnitudes ~ max l'^2, so the shift that
    # minimizes it is the center of each incidence slice's own l range
    # (~3x tighter than the global center for CMOD-family LUTs). The
    # pixel-side s0' must subtract the SAME per-band shift — the
    # pipeline applies it in slot space where every block is single-band
    # (one tiny per-block gather + add, see _make_pallas_invert_fn).
    lo = np.where(finite.any(axis=(1, 2)),
                  np.nanmin(np.where(finite, scaled, np.nan), axis=(1, 2)), 0.0)
    hi = np.where(finite.any(axis=(1, 2)),
                  np.nanmax(np.where(finite, scaled, np.nan), axis=(1, 2)), 0.0)
    shift = ((hi + lo) / 2.0).astype(np.float32)  # (I,)
    ls_full = scaled - shift[:, None, None]
    u_h = u_full / 2.0
    v_h = v_full / 2.0

    g4 = np.zeros((I, n_groups_pad, 4, gsize), dtype=np.float32)
    g4[:, :, 3, :] = 1e19  # padding: cost ~1e19, never selected
    for g, rows in enumerate(rows_of):
        ne = len(rows) * n_ip
        if ne == 0:
            continue
        l = ls_full[:, rows][:, :, ip].reshape(I, ne)
        uu = u_h[rows][:, ip].reshape(ne)
        vv = v_h[rows][:, ip].reshape(ne)
        g4[:, g, 0, :ne] = l
        g4[:, g, 1, :ne] = uu
        g4[:, g, 2, :ne] = vv
        g4[:, g, 3, :ne] = l * l + uu * uu + vv * vv
    g4 = g4.reshape(I, n_tiles, gpt, 4, gsize).transpose(0, 1, 3, 2, 4)
    g4 = np.ascontiguousarray(g4).reshape(I, n_tiles, 4, gpt * gsize)

    # bf16-split K-expansion (see _group_argmin_kernel): rows ordered
    # (s_a, s_b, channel), with each a-side split replicated over s_b.
    #
    # splits=3 -> exact-f32 dot (all 9 cross products; K padded 36->48
    # with a zero s_a block, Mosaic wants bf16 sublane multiples of 16).
    # splits=2 -> K = 2x2x4 = 16 exactly, ~3x smaller operand, relative
    # dot error ~2^-16. Every production mode now uses splits=3: the
    # round-4 sweep measured the exact split at the SAME kernel rate as
    # the 2-term one, and the default's dw=0.8 coarse grid keeps the
    # K=48 operand no larger than the old (dw=0.2, K=16) one; the split
    # error was a measurable source of margin-8 coarse drift.
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16
    a0 = g4.astype(bf16)
    r1 = g4 - a0.astype(np.float32)
    a1 = r1.astype(bf16)
    if splits == 3:
        a2 = (r1 - a1.astype(np.float32)).astype(bf16)
        zero = np.zeros_like(a0)
        gk = np.concatenate([np.tile(s, (1, 1, 3, 1))
                             for s in (a0, a1, a2, zero)], axis=2)
    else:
        gk = np.concatenate([np.tile(s, (1, 1, 2, 1))
                             for s in (a0, a1)], axis=2)
    return jnp.asarray(gk), shift, n_groups, gsize


# coarse-grid spacing for the default pallas mode's first pass, in
# physical units: ~0.8 m/s in wspd and ~4 deg in phi. The refine margin
# must absorb the coarse argmin's wspd-group drift, which has two
# sources: coarse subsampling (a wrong-phi or skipped-wspd sample can
# favor a distant group) and the expanded form's f32 cancellation noise
# (~eps * max l'^2 — minimized by per-band centering and an exact
# 3-term bf16 split, see _build_g4_grouped). Round-4 sweep on 4M
# ADVERSARIAL uniform-random pixels vs the full-grid 'pallas_exact'
# pass (scripts/sweep_margin.py, high-res LUTs, one v5e, per-band
# centering + splits=3 unless noted):
#
#   dw=0.2 dphi=4 m=16 splits=2 (round-3 default): 6.66 Mpx/s, 0 flips
#   dw=0.8 dphi=4 m=16 (THIS DEFAULT):             7.38 Mpx/s, 0 flips
#   dw=0.8 dphi=2 m=16:                            7.00 Mpx/s, 0 flips
#   dw=1.6 dphi=2 m=16:                            7.01 Mpx/s, 0 flips
#   dw=0.4 dphi=2 m=8:                7.56 Mpx/s, 2.4e-7 (max 0.1 m/s)
#   dw=0.8 dphi=2 m=8 (pallas_fast):  7.85 Mpx/s, 1.1e-5 (max 0.6 m/s)
#   dw=1.6 dphi=4 m=16:               7.38 Mpx/s, 2.2e-5 (max 0.6 m/s)
#   dw=0.8 dphi=8 m=16:               7.38 Mpx/s, 3.9e-4 (max 1.0 m/s)
#   dw=1.6 dphi=4 m=8:                8.41 Mpx/s, 4.3e-2 — the cliff
#
# The surviving margin-8 flips are NEAR-TIES, not exact ties: the
# expanded-form noise reorders rows whose direct-form costs differ by
# ~5e-3 in a flat valley (measured on the single (0.4, 2, 8) flip:
# true min row 103 at J=2.471916, chosen row 104 at J=2.477138, coarse
# drifted 9+ rows). Margin 16 absorbed every such case in the sweep;
# margin 8 trades them for ~6% throughput (pallas_fast). The margin
# must stay a multiple of 8: srow0 = g*WGROUP - margin feeds 8-aligned
# sublane loads.
_COARSE_DW = 0.8
_COARSE_DPHI = 4.0
_FAST_MARGIN = 16
# bf16 K-expansion terms for the coarse pass's dot (see _build_g4_grouped):
# 3 is the exact split; at dw=0.8 the grid operand is small enough that
# it costs the same bytes as the old (dw=0.2, splits=2) operand and the
# kernel rate is unchanged (7.49 vs 7.56 measured at equal configs), so
# there is no reason to keep the 2-term approximation anywhere.
_COARSE_SPLITS = 3
# 'pallas_fast' is RETIRED (round 5): an accuracy-relaxing mode must
# buy speed or not exist. The round-4 re-sweep (scripts/sweep_margin.py)
# found every relaxed config at or below the default's rate on the
# pack-2 fused kernel — the old turbo knobs (dphi=2, margin=8) are
# structurally slower (margin 8 breaks the 16-aligned packed loads and
# falls back to the plain layout: 8.2 vs 9.9 Mpx/s), and the last
# remaining lever (dw=1.6) measured 9.93 vs 9.92, i.e. noise — so the
# mode now aliases to 'pallas' with a DeprecationWarning
# (_normalize_mode) and always returns exact results.


def _rebucket_slot(perm, gstar, band_of_block, *, n_inc, n_wgroups,
                   block, slab_block):
    """Stage-2a: rebucket by (band, wspd group) in stage-1 SLOT space.

    The refined key is built from the block metadata (band) and the
    kernel output (group) and re-bucketed with the stage-1 permutation
    as payload — no scatter of the group back to pixel order, no
    pixel-order key rebuild. SINGLE SOURCE shared by the production
    pipeline and scripts/bench_stages.py (they drifted once; see
    commit a8153f2).
    """
    from xsarsea_tpu.ops.pallas_inversion import bucket_by_band

    valid = perm >= 0
    band_slot = jnp.broadcast_to(
        band_of_block[:, None], (band_of_block.shape[0], block)
    ).reshape(-1)
    key_slot = jnp.where(valid, band_slot * n_wgroups + gstar,
                         jnp.int32(n_inc * n_wgroups))
    return bucket_by_band(key_slot, n_bands=n_inc * n_wgroups,
                          block=slab_block, values=perm)


def _decode_rows(flat, co_wspd, co_phir):
    """Decode (wspd, cos phi, sin phi, phi) with ONE (W*P, 4) row gather.

    Packed row gathers measure ~8.4 ns/px on TPU vs ~14 ns/px for EACH
    scalar gather, so one packed lookup beats separate co_wspd[iw] /
    trig[ip] lookups by ~2.5x. Entries are the exact same values the
    separate gathers would return (bit-identical). Shared by the
    production pipeline and scripts/bench_stages.py.
    """
    n_wspd = co_wspd.shape[0]
    n_phi = co_phir.shape[0]
    dec = jnp.stack(
        [
            jnp.broadcast_to(co_wspd[:, None], (n_wspd, n_phi)).reshape(-1),
            jnp.broadcast_to(jnp.cos(co_phir)[None, :],
                             (n_wspd, n_phi)).reshape(-1),
            jnp.broadcast_to(jnp.sin(co_phir)[None, :],
                             (n_wspd, n_phi)).reshape(-1),
            jnp.broadcast_to(co_phir[None, :], (n_wspd, n_phi)).reshape(-1),
        ],
        axis=1,
    )
    drow = dec[flat]
    return drow[:, 0], drow[:, 1], drow[:, 2], drow[:, 3]


def _postprocess_vectorized(inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im,
                            wspd_co_raw, cos_p, sin_p, phir_sol, wspd_dual,
                            *, phi_180, has_cr):
    """Stage-4: vectorized postprocess (sign-rule disambiguation, guards).

    cos/sin of the solution came out of the packed decode gather
    (bit-identical to cos/sin of the gathered phi — same op, same input
    bits); the flip only negates the imaginary part (cos even, sin odd).
    The +-phi disambiguation replicates _disambiguate_phi's EXACT fp op
    sequence (atan2 + trig wrap + d1 <= d2). An earlier algebraic
    shortcut (keep iff anc_im * sin(phir) >= 0 — equivalent in real
    arithmetic via cos(a-p) - cos(a+p) = 2 sin a sin p) diverged on
    exact and near-tie inputs: with ancillary direction exactly 180 deg
    (plain real negative ancillary_wind) the comparison is an fp tie
    broken by wrap-rounding noise, and the shortcut flipped ~15% of
    pixels to the conjugate wind. Elementwise trig is ~free on the VPU;
    the gathers around it dominate either way.

    NaN guards (windspeed.py:198-207): NaN incidence, or valid copol
    sigma0 with NaN ancillary -> real nan (-> nan+0j), matching the
    reference's nan vs nan*1j encoding (_postprocess_pixel). SINGLE
    SOURCE shared with scripts/bench_stages.py.
    """
    co_valid = ~jnp.isnan(s0_co_db)
    nan = jnp.asarray(jnp.nan, dtype=inc.dtype)
    if phi_180:
        anc_ang = jnp.arctan2(anc_im, anc_re)
        d1 = jnp.abs(_wrap_angle(anc_ang - phir_sol))
        d2 = jnp.abs(_wrap_angle(anc_ang + phir_sol))
        keep = d1 <= d2
        sin_co = jnp.where(keep, sin_p, -sin_p)
    else:
        sin_co = sin_p
    wspd_co = jnp.where(co_valid, wspd_co_raw, nan)
    co_re = wspd_co * cos_p
    co_im = wspd_co * sin_co

    if has_cr:
        # phi_dual = phi_co where copol solved, else 0 (cos 1, sin 0)
        has_co = ~jnp.isnan(wspd_co)
        cr_valid = (~jnp.isnan(s0_cr_db)) & (~jnp.isnan(dsig_cr))
        dual_re = jnp.where(
            cr_valid, wspd_dual * jnp.where(has_co, cos_p, 1.0), nan)
        dual_im = jnp.where(
            cr_valid, wspd_dual * jnp.where(has_co, sin_co, 0.0), nan)
    else:
        dual_re = jnp.full_like(co_re, jnp.nan)
        dual_im = jnp.full_like(co_im, jnp.nan)

    anc_nan = jnp.isnan(anc_re) | jnp.isnan(anc_im)
    guard = jnp.isnan(inc) | (co_valid & anc_nan)
    return (
        jnp.where(guard, nan, co_re),
        jnp.where(guard, 0.0, co_im),
        jnp.where(guard, nan, dual_re),
        jnp.where(guard, 0.0, dual_im),
    )


def _normalize_mode(mode):
    """Resolve deprecated mode aliases to their production equivalents.

    ``pallas_fast`` (and ``pallas_fast_interpret``) relaxed the coarse
    pass for speed; since the round-4 pack-2 fused kernel every relaxed
    config measures at or below the default, so the alias now runs the
    exact ``pallas`` pipeline (see the retirement note above
    _COARSE_DW's sweep table).
    """
    if isinstance(mode, str) and mode.startswith("pallas_fast"):
        warnings.warn(
            "mode='pallas_fast' is deprecated and now runs the exact "
            "'pallas' pipeline: the relaxed coarse configs are no faster "
            "on the fused pack-2 kernel (see docs/DESIGN.md)",
            DeprecationWarning, stacklevel=3)
        return "pallas" + mode[len("pallas_fast"):]
    return mode


def _make_pallas_invert_fn(tables: InversionTables, dsig_co_val, chunk_size=8192,
                           interpret=False, coarse=True,
                           mesh=None, data_axis="data"):
    """Pallas-accelerated inversion: bucketed matmul argmin kernel +
    slab-refine kernel + shared XLA postprocess.

    Stage 1 (expanded-form MXU argmin, coarse-subsampled grid by default
    or the full grid with ``coarse=False``) yields a candidate wspd row
    per pixel; stage 2 (direct-form VPU argmin over a VMEM-resident
    full-phi slab around each candidate) restores exact f32 cost
    precision and the np.argmin first-minimum tie rule. See
    :mod:`xsarsea_tpu.ops.pallas_inversion` for both kernel designs.
    """
    from xsarsea_tpu.ops.pallas_inversion import (
        CR_BLOCK,
        DEFAULT_BLOCK,
        SLAB_BLOCK,
        SLAB_MARGIN,
        WGROUP,
        band_boundaries_f32,
        bucket_by_band,
        bucket_by_value,
        build_crosspol_arrays,
        build_direct_arrays,
        copol_group_argmin_pallas,
        crosspol_argmin_pallas,
        nearest_index_sorted,
        slab_refine_pallas,
    )

    block = DEFAULT_BLOCK
    if coarse:
        step_w = float(np.median(np.diff(np.asarray(tables.co_wspd, np.float64))))
        step_p = float(np.median(np.diff(np.asarray(tables.co_phi, np.float64))))
        g4_dev, lut_shift, n_groups_g4, gsize = _build_g4_grouped(
            tables, float(dsig_co_val),
            stride_w=max(1, round(_COARSE_DW / step_w)),
            stride_p=max(1, round(_COARSE_DPHI / step_p)),
            splits=_COARSE_SPLITS)
        margin = _FAST_MARGIN
    else:
        g4_dev, lut_shift, n_groups_g4, gsize = _build_g4_grouped(
            tables, float(dsig_co_val), splits=3)
        margin = SLAB_MARGIN
    slab_rows = WGROUP + 2 * margin
    _direct_np = build_direct_arrays(
        np.asarray(tables.co_lut, np.float32),
        np.asarray(tables.co_u, np.float32),
        np.asarray(tables.co_v, np.float32))
    n_inc = g4_dev.shape[0]
    n_wspd = np.asarray(tables.co_wspd).shape[0]
    n_phi = np.asarray(tables.co_phir).shape[0]
    n_wgroups = (n_wspd + WGROUP - 1) // WGROUP
    assert n_wgroups == n_groups_g4
    wp_rows = _direct_np[0].shape[1]
    # per-table scalars enter the jit as a runtime operand, NOT trace-time
    # constants: the compiled executable is then shared across LUT tables
    # of the same grid shape (e.g. cmod5n vs cmod7 high-res), turning a
    # minutes-scale Mosaic recompile into a cache hit. lut_shift is the
    # (n_inc,) per-band centering vector (see _build_g4_grouped); packing
    # it behind the dsig scalar keeps ONE runtime operand.
    scal_dev = jnp.asarray(
        np.r_[1.0 / float(dsig_co_val), np.asarray(lut_shift, np.float32)],
        jnp.float32)

    # incidence nearest-index: nearest_index_sorted dispatches concrete
    # uniform grids (the common case) to the gather-free arithmetic path
    # itself, and binary-searches non-uniform NcLut grids
    def _make_nearest(grid_np):
        grid = jnp.asarray(np.asarray(grid_np, dtype=np.float64),
                           dtype=jnp.float32)
        return lambda values: nearest_index_sorted(grid, values)

    nearest_inc = _make_nearest(tables.co_inc)
    # fused nearest+bucket (bucket_by_value): the per-pixel nearest-index
    # pass (a packed neighbour-table row gather, ~4 ns/px at 8.4 Mpx)
    # folds into the bucket sort via exact precomputed band boundaries —
    # bit-identical band assignment for every non-NaN pixel
    _inc_bounds = band_boundaries_f32(np.asarray(tables.co_inc, np.float32))
    inc_boundary_keys = None
    if _inc_bounds is not None:
        from xsarsea_tpu.ops.pallas_inversion import _f32_sort_key_np

        inc_boundary_keys = jnp.asarray(_f32_sort_key_np(_inc_bounds))

    # crosspol: bucketed 1-D argmin kernel operands
    if tables.has_cr:
        cr_pad_np, cr_whalf_np = build_crosspol_arrays(
            np.asarray(tables.cr_lut, np.float32),
            np.asarray(tables.cr_wspd, np.float32))
        cr_pad, cr_whalf = jnp.asarray(cr_pad_np), jnp.asarray(cr_whalf_np)
        n_cr_inc = cr_pad_np.shape[0]
        n_cr_wspd = np.asarray(tables.cr_wspd).shape[0]
        nearest_cr = _make_nearest(tables.cr_inc)
        # same incidence axis as copol (the common case: both LUTs built
        # with the same kwargs) -> the crosspol argmin fuses into the
        # slab-refine kernel (its blocks are single-band and the prior's
        # copol winner is the slab argmin itself); with different axes
        # the standalone stage-3 kernel re-buckets by the crosspol axis
        cr_axes_equal = np.array_equal(
            np.asarray(tables.co_inc, np.float64),
            np.asarray(tables.cr_inc, np.float64))
        cr_same_inc = CR_BLOCK == DEFAULT_BLOCK and cr_axes_equal
        if cr_same_inc:
            nearest_cr = None
    else:
        # dummies keep the jit signature stable; never read when !has_cr
        cr_pad = jnp.zeros((1, 1, 128), jnp.float32)
        cr_whalf = jnp.zeros((1, 128), jnp.float32)
        cr_axes_equal = True
    # fused slab+decode+crosspol kernel (see slab_refine_fused_pallas):
    # stage 3's unscatter -> decode gather -> re-gather -> kernel ->
    # scatter round collapses into ONE packed 4-wide row scatter
    fused_tail = (not tables.has_cr) or cr_axes_equal
    from xsarsea_tpu.ops.pallas_inversion import (
        build_decode_arrays, build_direct_arrays_packed,
        slab_refine_fused_pallas)
    # pack-2 lane layout (see build_direct_arrays_packed): two wspd rows
    # per lane-row cuts the slab sweep's VPU ops ~25% at the production
    # P=181. Both the fused and the plain slab kernels support it; it
    # needs 16-aligned slab starts (packed loads slice at srow0/2 on
    # 8-sublane boundaries), hence the margin gate.
    lane_off = None
    if margin % 16 == 0 and WGROUP % 16 == 0:
        _pk = build_direct_arrays_packed(
            np.asarray(tables.co_lut, np.float32),
            np.asarray(tables.co_u, np.float32),
            np.asarray(tables.co_v, np.float32))
        if _pk is not None:
            _direct_np = _pk[:3]
            wp_rows, lane_off = _pk[3], _pk[4]
    lut_pad, u_pad, v_pad = (jnp.asarray(a) for a in _direct_np)
    del _direct_np
    # packed sweep: FULL unroll of the row loop when it fits (24 packed
    # rows at margin 16 — measured 56.3 -> 36.9 ns/px for the fused
    # kernel at 8.4 Mpx, bit-equal; the loop-carried (min, argmin)
    # dependency chains schedule much better fully unrolled). Unpacked
    # paths keep the microbenched rpi=8 default.
    slab_rpi = 8
    if lane_off is not None and (slab_rows // 2) % 8 == 0 \
            and slab_rows // 2 <= 24:
        slab_rpi = slab_rows // 2
    w_half_np, phi_row_np = build_decode_arrays(
        tables.co_wspd, tables.co_phir,
        wp_rows, int(lut_pad.shape[2]), lane_off=lane_off)
    w_half, phi_row = jnp.asarray(w_half_np), jnp.asarray(phi_row_np)

    def invert_flat(tables, g4, lut_pad, u_pad, v_pad, cr_pad, cr_whalf,
                    w_half, phi_row, scal,
                    inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im, dsig_co):
        n = inc.shape[0]
        f32 = jnp.float32
        inv_dsig, shift_vec = scal[0], scal[1:]

        # --- stage 1: bucket by incidence band, expanded-form group argmin
        if inc_boundary_keys is not None and inc.dtype == jnp.float32:
            perm, band_of_block = bucket_by_value(
                inc, inc_boundary_keys, n_bands=n_inc, block=block)
        else:
            i_inc = nearest_inc(inc)
            perm, band_of_block = bucket_by_band(i_inc, n_bands=n_inc,
                                                 block=block)
        valid = perm >= 0
        pidx = jnp.clip(perm, 0)

        mz = jnp.abs(anc_im) if tables.phi_180 else anc_im
        # transform once in pixel order, then ONE row gather per stage
        # (4 separate gathers over the padded index space cost ~2x more)
        pix1 = jnp.stack(
            [
                s0_co_db.astype(f32) * inv_dsig * (-2.0),
                anc_re.astype(f32) * (-1.0),
                mz.astype(f32) * (-1.0),
                jnp.ones_like(s0_co_db, dtype=f32),
            ],
            axis=1,
        )
        feats = jnp.where(valid[:, None], pix1[pidx], jnp.nan)
        # per-band centering of the s0' feature, applied in SLOT space:
        # every block is single-band, so the shift is one (n_blocks,)
        # gather from the tiny per-band table + a broadcast add — no
        # per-pixel gather (channel 0 carries -2*s0', hence +2*shift)
        shift_blk = shift_vec[band_of_block]  # (n_blocks,)
        feats = feats.reshape(-1, block, 4).at[:, :, 0].add(
            2.0 * shift_blk[:, None]).reshape(-1, 4)

        gstar = copol_group_argmin_pallas(
            g4, feats, band_of_block, n_groups=n_wgroups, gsize=gsize,
            block=block, interpret=interpret,
        ).reshape(-1)

        # --- stage 2: bucket by (band, wspd group), direct-form slab refine
        # (slot-space rebucket: see _rebucket_slot)
        perm2, key_of_block = _rebucket_slot(
            perm, gstar, band_of_block, n_inc=n_inc, n_wgroups=n_wgroups,
            block=block, slab_block=SLAB_BLOCK)
        valid2 = perm2 >= 0
        pidx2 = jnp.clip(perm2, 0)
        sband = key_of_block // n_wgroups
        srow0 = jnp.clip((key_of_block % n_wgroups) * WGROUP - margin,
                         0, wp_rows - slab_rows)
        # skip all-padding blocks (their scattered outputs are dropped)
        vmask2 = (perm2.reshape(-1, SLAB_BLOCK) >= 0).any(axis=1)

        if fused_tail:
            # --- stages 2+3+4-head in ONE kernel: slab refine, in-kernel
            # decode to (wspd, phi) values, crosspol argmin (see
            # slab_refine_fused_pallas). feats rows: (s0, ma/2, mz/2,
            # 1/dsig, s0_cr, dsig_cr, 0, 0) — see build_direct_arrays
            # for the exact-rounding argument on the halved operands.
            zero = jnp.zeros_like(s0_co_db, dtype=f32)
            pix2 = jnp.stack(
                [
                    s0_co_db.astype(f32),
                    anc_re.astype(f32) * 0.5,
                    mz.astype(f32) * 0.5,
                    jnp.broadcast_to((1.0 / dsig_co).astype(f32),
                                     s0_co_db.shape),
                    s0_cr_db.astype(f32) if tables.has_cr else zero,
                    dsig_cr.astype(f32) if tables.has_cr else zero,
                    zero,
                    zero,
                ],
                axis=1,
            )
            feats2 = jnp.where(valid2[:, None], pix2[pidx2], jnp.nan)
            vals_nb = slab_refine_fused_pallas(
                lut_pad, u_pad, v_pad, w_half, phi_row, cr_pad, cr_whalf,
                feats2, sband, srow0, n_phi, block=SLAB_BLOCK,
                n_rows=slab_rows, has_cr=tables.has_cr, interpret=interpret,
                valid_mask=vmask2.astype(jnp.int32), lane_off=lane_off,
                rows_per_iter=slab_rpi,
            )
            # pixel order WITHOUT any scatter or gather: one sort keyed
            # by pixel id CARRIES the kernel's result channels as f32
            # payloads (sorting is a pure permutation — every payload
            # bit is preserved). Measured 6.5 ns/px vs 16.0 for the
            # sort+row-gather tail and ~10 ns/px for the old random i32
            # scatter alone — random HBM access is what kills the
            # alternatives; the bitonic network has locality. Valid
            # entries hold each pixel id exactly once; sentinel keys (n)
            # sort past them and are sliced off.
            key = jnp.where(valid2, perm2, jnp.int32(n))
            payloads = (vals_nb[:, 0, :].reshape(-1),
                        vals_nb[:, 1, :].reshape(-1))
            if tables.has_cr:
                payloads += (vals_nb[:, 2, :].reshape(-1),)
            sorted_arrs = lax.sort((key,) + payloads, is_stable=False,
                                   num_keys=1)
            wspd_co_raw = sorted_arrs[1][:n]
            phir_sol = sorted_arrs[2][:n]
            # same input bits as the decode table's cos/sin entries
            # (phi_sol IS the table value), so bit-identical results
            cos_p = jnp.cos(phir_sol)
            sin_p = jnp.sin(phir_sol)
            wspd_dual = sorted_arrs[3][:n] if tables.has_cr else None
            return _postprocess_vectorized(
                inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im,
                wspd_co_raw, cos_p, sin_p, phir_sol, wspd_dual,
                phi_180=tables.phi_180, has_cr=tables.has_cr)

        # --- unfused fallback (crosspol LUT on a DIFFERENT incidence
        # axis): separate slab refine, decode gather and re-bucketed
        # crosspol kernel
        pix2 = jnp.stack(
            [
                s0_co_db.astype(f32),
                anc_re.astype(f32) * 0.5,
                mz.astype(f32) * 0.5,
                jnp.broadcast_to((1.0 / dsig_co).astype(f32), s0_co_db.shape),
            ],
            axis=1,
        )
        feats2 = jnp.where(valid2[:, None], pix2[pidx2], jnp.nan)
        flat_r = slab_refine_pallas(
            lut_pad, u_pad, v_pad, feats2, sband, srow0, n_phi,
            block=SLAB_BLOCK, n_rows=slab_rows, interpret=interpret,
            valid_mask=vmask2.astype(jnp.int32), lane_off=lane_off,
            rows_per_iter=slab_rpi,
        ).reshape(-1)

        flat = jnp.zeros((n,), jnp.int32).at[
            jnp.where(valid2, perm2, n)
        ].set(flat_r, mode="drop")
        flat = jnp.clip(flat, 0, n_wspd * n_phi - 1)
        # packed decode-table row gather (see _decode_rows)
        wspd_co_raw, cos_p, sin_p, phir_sol = _decode_rows(
            flat, tables.co_wspd, tables.co_phir)
        co_valid = ~jnp.isnan(s0_co_db)

        # --- stage 3: bucket by crosspol incidence band, 1-D wspd argmin
        # (a whole block shares one VMEM LUT row — replaces the per-pixel
        # row gather + argmin that dominated the XLA postprocess)
        if tables.has_cr:
            wspd_co_m = jnp.where(co_valid, wspd_co_raw.astype(f32), jnp.nan)
            has_co_f = (~jnp.isnan(wspd_co_m)).astype(f32)
            if cr_same_inc:
                perm3, band3 = perm, band_of_block
                valid3, pidx3 = valid, pidx
            else:
                i_cr = nearest_cr(inc)
                perm3, band3 = bucket_by_band(i_cr, n_bands=n_cr_inc,
                                              block=CR_BLOCK)
                valid3 = perm3 >= 0
                pidx3 = jnp.clip(perm3, 0)
            pix3 = jnp.stack(
                [
                    s0_cr_db.astype(f32),
                    dsig_cr.astype(f32),
                    jnp.where(has_co_f > 0, wspd_co_m, 0.0) * 0.5,
                    has_co_f,
                ],
                axis=1,
            )
            feats3 = jnp.where(valid3[:, None], pix3[pidx3], jnp.nan)
            # the kernel emits the winning wspd VALUE in m/s (f32): one
            # f32 scatter replaces int scatter + pixel-order clip/gather
            wd_r = crosspol_argmin_pallas(
                cr_pad, cr_whalf, feats3, band3, block=CR_BLOCK,
                interpret=interpret).reshape(-1)
            wspd_dual = jnp.zeros((n,), wd_r.dtype).at[
                jnp.where(valid3, perm3, n)
            ].set(wd_r, mode="drop")
        else:
            wspd_dual = None

        # --- stage 4: vectorized postprocess (see _postprocess_vectorized
        # for the disambiguation fp-sequence and NaN-guard rationale)
        return _postprocess_vectorized(
            inc, s0_co_db, s0_cr_db, dsig_cr, anc_re, anc_im,
            wspd_co_raw, cos_p, sin_p, phir_sol, wspd_dual,
            phi_180=tables.phi_180, has_cr=tables.has_cr)

    if mesh is None:
        jitted = jax.jit(invert_flat)
    else:
        # data-parallel over the mesh: pixels sharded, LUT operands
        # replicated — each device runs the full fused pipeline on its
        # shard with zero collectives (the reference's dask apply_gufunc
        # boundary, windspeed.py:356-364, as SPMD)
        from jax.sharding import PartitionSpec as _P

        jitted = jax.jit(jax.shard_map(
            invert_flat,
            mesh=mesh,
            in_specs=(_P(),) * 10 + (_P(data_axis),) * 6 + (_P(),),
            out_specs=(_P(data_axis),) * 4,
            # pallas_call outputs don't carry vma annotations
            check_vma=False,
        ))
    tables_slim = tables.to_device_slim()

    def run(*args):
        return jitted(tables_slim, g4_dev, lut_pad, u_pad, v_pad,
                      cr_pad, cr_whalf, w_half, phi_row, scal_dev, *args)

    return run


def _wrap_for_spec(fn, spec):
    """Adapt the canonical 6-stream invert fn to a :class:`_LazySource` spec.

    Reconstructs the canonical (inc, s0_co_db, s0_cr_db, dsig_cr, anc_re,
    anc_im, dsig_co) arguments from only the streams the source actually
    ships: missing streams become device-side NaN fills (bit-identical to
    shipping NaN arrays), a scalar dsig_cr broadcasts on device, and with
    ``device_db`` the sigma0 streams arrive linear and convert to dB here
    — inside the jit, where XLA fuses the elementwise log10 into the
    pipeline's first pass. See _LazySource for the wire-format rationale.
    """
    device_db, has_co, has_cr, dsig_scalar, has_anc, inc_mode = spec

    # Only the (cheap, elementwise) reconstruction is jitted here; the
    # base fn stays its own compiled program. Nesting it inside this jit
    # would close over the pallas path's packed LUT operands (~0.5 GB)
    # as HLO *constants*, which the axon remote-compile service rejects
    # (HTTP 413) — and the second dispatch is async anyway, so it
    # overlaps device compute rather than adding wall time.
    @jax.jit
    def reconstruct(*args):
        it = iter(args)
        if inc_mode == "full":
            inc = next(it)
        else:
            vec, meta = next(it), next(it)
            inc = None  # needs the piece length — set from sigma0 below
        raw_co = next(it) if has_co else None
        raw_cr = next(it) if has_cr else None
        dsig = next(it)
        anc = (next(it), next(it)) if has_anc else None

        if inc is None:
            # reconstruct the flat-broadcast inc stream on device: same
            # f32 values a host broadcast would ship, zero wire bytes.
            # _LazySource guarantees a sigma0 stream exists in this mode.
            ref = raw_co if raw_co is not None else raw_cr
            idx = meta[0] + jnp.arange(ref.shape[0], dtype=jnp.int32)
            pos = idx % meta[1] if inc_mode == "sample" else idx // meta[1]
            inc = vec[pos]
        nanv = jnp.full(inc.shape, jnp.nan, dtype=inc.dtype)

        def db(x):
            if not device_db:
                return x
            return 10.0 * jnp.log10(x + jnp.asarray(1e-15, x.dtype))

        s0_co = db(raw_co) if has_co else nanv
        s0_cr = db(raw_cr) if has_cr else nanv
        if dsig_scalar:
            dsig = jnp.broadcast_to(dsig, inc.shape)
        anc_re, anc_im = anc if has_anc else (nanv, nanv)
        return inc, s0_co, s0_cr, dsig, anc_re, anc_im

    def wrapped(*args):
        return fn(*reconstruct(*args[:-1]), args[-1])

    return wrapped


def _get_invert_fn(tables, chunk_size, mode="exact", dsig_co=0.1, spec=None):
    # The compiled-closure cache lives ON the tables instance, so its
    # lifetime is tied to the tables it was built from (an id()-keyed
    # global dict can hand a stale closure to a new object that reuses a
    # garbage-collected id).
    mode = _normalize_mode(mode)
    cache = tables.__dict__.setdefault("_invert_fn_cache", {})
    if mode.startswith("pallas"):
        # the pallas path is unchunked (its postprocess is elementwise);
        # chunk_size must not split its cache at all. The sweepable
        # module knobs join the key so mutating them (scripts/
        # sweep_margin.py pattern) is never served a stale closure.
        key = (mode, float(dsig_co), spec, _COARSE_DW, _COARSE_DPHI,
               _FAST_MARGIN, _COARSE_SPLITS)
    else:
        key = (chunk_size, mode, None, spec)
    if key not in cache:
        if spec is not None:
            base = _get_invert_fn(tables, chunk_size, mode=mode,
                                  dsig_co=dsig_co)
            cache[key] = _wrap_for_spec(base, spec)
        elif mode == "exact":
            cache[key] = _make_invert_fn(tables, chunk_size)
        elif mode.startswith("pallas"):
            cache[key] = _make_pallas_invert_fn(
                tables, dsig_co, chunk_size,
                interpret=mode.endswith("_interpret"),
                coarse="exact" not in mode,
            )
        else:
            raise ValueError(f"unknown inversion mode '{mode}'")
    return cache[key]


# ------------------------------------------------------ streamed piece source

def _flat_slice(arr, shape, lo, hi):
    """Materialize flat row-major [lo, hi) of ``arr`` as a 1-D numpy array.

    Contiguous numpy arrays are sliced as zero-copy views. Everything else
    — non-contiguous views (broadcast dsig), and duck arrays with
    numpy-style first-axis slicing (dask.array, h5py/zarr datasets,
    np.memmap) — goes through a first-axis row slice covering [lo, hi), so
    only O(piece) elements are ever materialized on the host. This is the
    out-of-core boundary the reference implements with dask
    (windspeed.py:345-367).
    """
    if isinstance(arr, np.ndarray) and arr.flags.c_contiguous:
        return arr.reshape(-1)[lo:hi]
    rest = 1
    for s in shape[1:]:
        rest *= int(s)
    r0, r1 = lo // rest, -(-hi // rest)
    block = np.ascontiguousarray(np.asarray(arr[r0:r1])).reshape(-1)
    return block[lo - r0 * rest: hi - r0 * rest]


class _PreparedSource:
    """Piece source over flat, already-dB-converted arrays (invert_pixels)."""

    def __init__(self, np_dtype, inc, s0_co_db, s0_cr_db, dsig_cr, anc):
        self.np_dtype = np_dtype
        self.n = int(np.shape(inc)[0])
        anc = np.asarray(anc)
        self._arrs = (inc, s0_co_db, s0_cr_db, dsig_cr, anc.real, anc.imag)

    def piece(self, lo, hi):
        return [np.ascontiguousarray(a[lo:hi], dtype=self.np_dtype)
                for a in self._arrs]


class _LazySource:
    """Piece source running the reference's host prep slice-by-slice.

    The reference converts the whole scene upfront — f64 dB conversion
    with the 1e-15 clip (windspeed.py:126-130), complex128 ancillary,
    broadcast dsig_cr — peaking at ~6 full-scene f64 temporaries. Here
    every transform runs on the rows covering one [lo, hi) piece (same
    f64 math, so results are bit-identical), keeping host memory O(piece)
    and accepting lazy/chunked inputs that never fit in memory at once.
    ``s0_co``/``s0_cr``/``anc`` may be None (NaN streams); ``dsig_cr``
    may be a scalar.

    Wire format (``spec``): missing streams are never shipped — the jit
    wrapper synthesizes the NaN fills on device (bit-identical, zero
    bytes on the wire) — a scalar ``dsig_cr`` ships as one 0-d scalar
    instead of a broadcast full-scene stream, and a broadcastable
    incidence (scalar, ``(nx,)``/``(1, nx)`` sample vector, or
    ``(ny, 1)`` line vector — SAR incidence varies along range only)
    ships as the small vector + a (lo, divisor) pair, reconstructed on
    device by an index gather (bit-identical to a host broadcast;
    drops the 4 B/px inc stream). With ``device_db``
    set (the f32 pallas path), sigma0 ships LINEAR and the
    ``10*log10(x + 1e-15)`` conversion runs inside the jitted pipeline:
    same bytes but the host log10 (the bulk of host prep) disappears.
    The input dB then differs from host-f64 prep at f32-ulp scale; on
    pixels whose cost surface has two near-equal minima, the argmin can
    land on the other one — measured on TPU over 262k random draws:
    ~0.5% of pixels differ, max 0.5 m/s copol / 0.2 m/s dual (a few
    wspd grid steps; the two winds are near-equal-cost solutions, well
    inside the 0.35 m/s retrieval noise). The f64 exact path always
    keeps host prep, preserving reference parity; pass
    ``device_db=False`` for strict cross-mode reproducibility —
    measured 0 differing pixels vs ``mode="exact"`` on the same draws.
    Dual-pol + scalar dsig: 24 -> 20 B/px; mono-pol copol: 24 -> 16.
    """

    def __init__(self, shape, np_dtype, inc, s0_co=None, s0_cr=None,
                 dsig_cr=0.1, anc=None, device_db=None):
        self.shape = tuple(int(s) for s in shape)
        self.np_dtype = np_dtype
        self.n = 1
        for s in self.shape:
            self.n *= s
        self.inc, self.s0_co, self.s0_cr = inc, s0_co, s0_cr
        self.dsig_cr, self.anc = dsig_cr, anc
        self.device_db = device_db

        # broadcastable incidence: SAR incidence varies along range only,
        # so scenes naturally carry a (nx,) sample vector (or a (ny, 1)
        # line vector / a scalar). Ship the SMALL vector once per piece
        # plus a (lo, divisor) tuple and reconstruct the full stream on
        # device with an index gather — bit-identical to broadcasting on
        # host (same f32 values), and it drops the 4 B/px inc stream from
        # the wire (dual-pol + scalar dsig: 20 -> 16 B/px).
        self.inc_mode = "full"
        self._inc_vec = None
        self._inc_div = 1
        inc_shape = None if inc is None else tuple(
            int(s) for s in np.shape(inc))
        if inc_shape is not None and inc_shape != self.shape:
            if inc_shape in ((), (1,)):
                self.inc_mode, self._inc_div = "sample", 1
            elif len(self.shape) == 2 and inc_shape in (
                    (self.shape[1],), (1, self.shape[1])):
                self.inc_mode, self._inc_div = "sample", self.shape[1]
            elif len(self.shape) == 2 and inc_shape == (self.shape[0], 1):
                self.inc_mode, self._inc_div = "line", self.shape[1]
            else:
                raise ValueError(
                    f"incidence shape {inc_shape} is neither the scene "
                    f"shape {self.shape} nor broadcastable to it as a "
                    "scalar, (nx,)/(1, nx) sample vector or (ny, 1) line "
                    "vector")
            if s0_co is None and s0_cr is None:
                raise ValueError(
                    "broadcastable incidence requires a sigma0 stream")
            if self.n >= 2 ** 31:  # flat index rides an i32 on the wire
                raise ValueError("broadcastable incidence supports scenes "
                                 "< 2**31 pixels; pass a full inc array")
            self._inc_vec = np.ascontiguousarray(
                np.asarray(inc, dtype=np.float64).reshape(-1))

    @property
    def n_header(self):
        """Leading piece entries that are not per-pixel streams (and so
        must never be tail-padded): the inc vector + its (lo, div)."""
        return 0 if self.inc_mode == "full" else 2

    @property
    def spec(self):
        return (bool(self.device_db), self.s0_co is not None,
                self.s0_cr is not None, np.ndim(self.dsig_cr) == 0,
                self.anc is not None, self.inc_mode)

    def _db(self, arr, lo, hi):
        if self.device_db:  # ship linear; log10 runs on device (f32)
            return np.ascontiguousarray(
                _flat_slice(arr, self.shape, lo, hi), dtype=self.np_dtype)
        x = _flat_slice(arr, self.shape, lo, hi).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            x = 10.0 * np.log10(x + 1e-15)
        return np.ascontiguousarray(x, dtype=self.np_dtype)

    def piece(self, lo, hi):
        if self.inc_mode == "full":
            out = [np.ascontiguousarray(
                _flat_slice(self.inc, self.shape, lo, hi),
                dtype=self.np_dtype)]
        else:
            # small vector + (lo, divisor): device reconstructs the flat
            # inc stream as vec[(lo+i) % div] (sample; div == len(vec))
            # or vec[(lo+i) // div] (line; div == scene width)
            out = [np.ascontiguousarray(self._inc_vec, dtype=self.np_dtype),
                   np.asarray([lo, self._inc_div], dtype=np.int32)]
        if self.s0_co is not None:
            out.append(self._db(self.s0_co, lo, hi))
        if self.s0_cr is not None:
            out.append(self._db(self.s0_cr, lo, hi))
        if np.ndim(self.dsig_cr) == 0:  # 0-d scalar: broadcast on device
            out.append(np.asarray(float(np.asarray(self.dsig_cr)),
                                  dtype=self.np_dtype))
        elif tuple(np.shape(self.dsig_cr)) == self.shape:
            out.append(np.ascontiguousarray(
                _flat_slice(self.dsig_cr, self.shape, lo, hi),
                dtype=self.np_dtype))
        else:  # broadcastable shape (e.g. per-row): numpy view, O(piece) copy
            out.append(np.ascontiguousarray(
                _flat_slice(np.broadcast_to(
                    np.asarray(self.dsig_cr), self.shape), self.shape, lo, hi),
                dtype=self.np_dtype))
        if self.anc is not None:
            a = _flat_slice(self.anc, self.shape, lo, hi)
            out.append(np.ascontiguousarray(a.real, dtype=self.np_dtype))
            out.append(np.ascontiguousarray(
                a.imag if np.iscomplexobj(a) else np.zeros_like(a),
                dtype=self.np_dtype))
        return out


def _invert_source(tables: InversionTables, source, dsig_co=0.1,
                   chunk_size=256, mode="auto", device_output=False,
                   piece_size=None):
    """Run the inversion over a piece source (see invert_pixels for modes).

    Large inputs stream in fixed-size pieces with THREE overlapped lanes:
    a prep worker slices + casts + host->device-transfers piece k+1, the
    main thread's (async-dispatched) kernels chew on piece k, and a fetch
    worker copies piece k-1's results device->host straight into the
    preallocated output arrays. Device residency and host temporaries
    both stay O(piece) — on the axon dev tunnel, whose h2d bandwidth
    collapses once large buffers sit resident, bounded residency is also
    the main end-to-end throughput lever.

    ``device_output=True`` opts out of that residency bound BY DESIGN:
    the caller wants the full results as device arrays (downstream
    device-side consumption), so per-piece outputs accumulate on device
    (O(n) residency, ~16 B/px f32) and concatenate once. Use the default
    host output for scenes that don't fit device memory.
    """
    if mode == "auto":
        mode = (
            "pallas"
            if tables.has_co and jax.default_backend() == "tpu"
            else "exact"
        )
    dtype = tables.dtype
    # f32 pallas path: ship linear sigma0 and convert to dB on device
    # (the exact/f64 path keeps the reference's host prep for bit
    # parity). device_db=None means auto; an explicit False/True from
    # the constructor is respected. Auto-resolution is PER CALL, onto a
    # shallow copy — never stamped onto the caller's source, so one
    # source object reused across modes gets each mode's wire format
    # (an exact call after a pallas call must keep host f64 dB prep).
    if isinstance(source, _LazySource) and source.device_db is None:
        if (mode.startswith("pallas")
                and np.dtype(jnp.dtype(dtype).name) == np.float32):
            source = copy.copy(source)
            source.device_db = True
    spec = getattr(source, "spec", None)
    fn = _get_invert_fn(tables, chunk_size, mode=mode, dsig_co=dsig_co,
                        spec=spec)
    dsig_dev = jnp.asarray(dsig_co, dtype=dtype)
    n = source.n
    ctype = np.complex128 if dtype == jnp.float64 else np.complex64

    _PIECE = piece_size or (1 << 22)
    if n <= _PIECE + (_PIECE >> 1):
        piece = [jnp.asarray(a) for a in source.piece(0, n)]
        co_re, co_im, du_re, du_im = fn(*piece, dsig_dev)
        if device_output:
            return lax.complex(co_re, co_im), lax.complex(du_re, du_im)
        wind_co = np.empty(n, dtype=ctype)
        wind_dual = np.empty(n, dtype=ctype)
        wind_co.real, wind_co.imag = np.asarray(co_re), np.asarray(co_im)
        wind_dual.real, wind_dual.imag = np.asarray(du_re), np.asarray(du_im)
        return wind_co, wind_dual

    from concurrent.futures import ThreadPoolExecutor

    # leading piece entries that are NOT per-pixel streams (the vector-inc
    # header) must never be tail-padded
    n_header = getattr(source, "n_header", 0)

    def prep(lo):
        hi = min(lo + _PIECE, n)
        piece = source.piece(lo, hi)
        if hi - lo < _PIECE:  # pad the tail piece: one jit shape only
            piece = [np.pad(a, (0, _PIECE - (hi - lo)),
                            constant_values=np.nan)
                     if a.ndim and i >= n_header else a
                     for i, a in enumerate(piece)]
        return [jnp.asarray(a) for a in piece]

    offsets = list(range(0, n, _PIECE))

    if device_output:
        # device-resident results: accumulate per-piece outputs, one concat
        outs = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(prep, offsets[0])
            for i, lo in enumerate(offsets):
                piece = fut.result()
                if i + 1 < len(offsets):
                    fut = pool.submit(prep, offsets[i + 1])
                outs.append(fn(*piece, dsig_dev))
        co_re, co_im, du_re, du_im = (
            jnp.concatenate(parts)[:n] for parts in zip(*outs))
        return lax.complex(co_re, co_im), lax.complex(du_re, du_im)

    wind_co = np.empty(n, dtype=ctype)
    wind_dual = np.empty(n, dtype=ctype)

    def fetch(outs, lo, hi):
        co_re, co_im, du_re, du_im = outs
        m = hi - lo
        wind_co.real[lo:hi] = np.asarray(co_re)[:m]
        wind_co.imag[lo:hi] = np.asarray(co_im)[:m]
        wind_dual.real[lo:hi] = np.asarray(du_re)[:m]
        wind_dual.imag[lo:hi] = np.asarray(du_im)[:m]

    with ThreadPoolExecutor(max_workers=1) as prep_pool, \
            ThreadPoolExecutor(max_workers=1) as fetch_pool:
        fut = prep_pool.submit(prep, offsets[0])
        fetch_futs = []
        for i, lo in enumerate(offsets):
            piece = fut.result()
            if i + 1 < len(offsets):
                fut = prep_pool.submit(prep, offsets[i + 1])
            if i >= 2:  # bound in-flight results: device residency O(piece)
                fetch_futs[i - 2].result()
            fetch_futs.append(fetch_pool.submit(
                fetch, fn(*piece, dsig_dev), lo, min(lo + _PIECE, n)))
        for f in fetch_futs:
            f.result()
    return wind_co, wind_dual


def invert_pixels(tables: InversionTables, inc, s0_co_db, s0_cr_db, dsig_cr,
                  ancillary_wind, dsig_co=0.1, chunk_size=256, mode="auto",
                  device_output=False, piece_size=None):
    """Invert flat pixel arrays against prepared tables.

    All inputs are 1-D arrays of the same length (sigma0 already in dB);
    ``ancillary_wind`` is complex (antenna convention). Returns
    (wind_co, wind_dual) complex arrays — numpy by default, or
    device-resident jax arrays with ``device_output=True`` (skips the
    device->host copy for pipelines that keep working on device).

    mode: 'exact' (portable full-grid argmin), 'pallas' (fused TPU
    kernels: coarse expanded-form pass + direct-form slab refine +
    bucketed crosspol argmin; 0 deviations vs the full-grid pass on the
    4M-adversarial-pixel sweep — see the table above _COARSE_DW),
    'pallas_exact' (full-grid
    expanded-form pass + slab refine), '*_interpret' variants (kernels
    in interpreter mode, for CPU testing), or 'auto' (pallas on TPU when
    a copol table is present, exact elsewhere). 'pallas_fast' is a
    deprecated alias of 'pallas' (the relaxed coarse configs stopped
    being faster with the round-4 fused pack-2 kernel).
    """
    np_dtype = np.dtype(jnp.dtype(tables.dtype).name)
    source = _PreparedSource(np_dtype, inc, s0_co_db, s0_cr_db, dsig_cr,
                             ancillary_wind)
    return _invert_source(tables, source, dsig_co=dsig_co,
                          chunk_size=chunk_size, mode=mode,
                          device_output=device_output, piece_size=piece_size)


# ------------------------------------------------------------- public facade

def _to_numpy(x):
    if isinstance(x, DimArray):
        return np.asarray(x.data)
    return np.asarray(x)


def _raw_data(x):
    """Underlying data object WITHOUT materializing lazy/chunked arrays.

    Scalars and array-likes without an ``ndim`` (python floats, lists)
    are coerced to numpy so the piece slicer can subscript them.
    """
    if x is None:
        return None
    data = x.data if isinstance(x, DimArray) else x
    # python scalars have no ndim; numpy scalars (np.float64) have
    # ndim == 0 but are not sliceable — coerce both to 0-d ndarrays
    if not hasattr(data, "ndim") or (
            getattr(data, "ndim") == 0 and not isinstance(data, np.ndarray)):
        data = np.asarray(data)
    return data


_any_valid_dev = None


def _any_valid(x):
    """True when ``x`` holds at least one non-NaN value.

    Memory discipline: jax arrays reduce ON DEVICE (no d2h of the data);
    numpy arrays — including scene-sized memmaps — and lazy/chunked
    inputs scan in row blocks with early exit, so the typical
    (mostly-valid) case touches O(block) and never allocates a
    full-scene boolean temporary. Chunked sources materialize one row
    block at a time through the first-axis-slicing protocol; only a
    truly all-NaN input reads every block — the price of making the
    'copol inversion requires valid ancillary_wind' check as strict for
    lazy inputs as for eager ones.
    """
    if x is None:
        return False
    data = _raw_data(x)
    if is_chunked(data):
        rest = 1
        for s in data.shape[1:]:
            rest *= int(s)
        step = max(1, (1 << 22) // max(1, rest))
        for r0 in range(0, int(data.shape[0]), step):
            if np.any(~np.isnan(np.asarray(data[r0:r0 + step]))):
                return True
        return False
    if isinstance(data, jax.Array):
        global _any_valid_dev
        if _any_valid_dev is None:
            _any_valid_dev = jax.jit(lambda t: jnp.any(~jnp.isnan(t)))
        return bool(_any_valid_dev(data))
    data = np.asarray(data)
    if data.ndim == 0:
        return bool(~np.isnan(data))
    rest = 1
    for s in data.shape[1:]:
        rest *= int(s)
    step = max(1, (1 << 22) // max(1, rest))
    for r0 in range(0, data.shape[0], step):
        if np.any(~np.isnan(data[r0:r0 + step])):
            return True
    return False


@xarray_io
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
    mode="auto",
    piece_size=None,
    device_db=None,
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

    ``inc`` may be the full scene array or broadcastable to it — a
    scalar, a ``(nx,)``/``(1, nx)`` per-sample vector, or a ``(ny, 1)``
    per-line vector (SAR incidence varies along range only). Vector
    incidence never ships a full-scene stream to the device: the flat
    stream is reconstructed on device, bit-identical to broadcasting on
    host and 4 B/px cheaper on the wire.

    Inputs may be lazy/chunked duck arrays (dask.array, zarr, h5py
    datasets, np.memmap — anything with ``shape`` and numpy-style
    first-axis slicing), including inside DataArrays/DimArrays: the scene
    is streamed through the device in ``piece_size``-pixel pieces
    (default 4M) and the host prep (f64 dB conversion, complex split,
    dtype cast — the reference's whole-scene prep, windspeed.py:126-130)
    runs per piece, so host memory stays O(piece) + O(outputs) no matter
    the scene size. This replaces the reference's dask chunk execution
    (windspeed.py:345-367).

    ``device_db``: where the dB conversion of linear sigma0 runs. The
    default (None = auto) ships linear f32 and converts on device in
    pallas mode — fastest wire format, but on rare near-cost-tie pixels
    the retrieved wind can differ from ``mode="exact"`` by a few wspd
    grid steps (see ``_LazySource``). Pass ``False`` to keep the
    reference's host f64 dB prep in every mode: ``mode="pallas"`` then
    returns bit-identical winds to ``mode="exact"``.
    """
    if dtype is None:
        dtype = jnp.float64 if (jax.config.jax_enable_x64 and
                                jax.default_backend() == "cpu") else jnp.float32

    models = model if isinstance(model, tuple) else (model, None)
    models = tuple(get_model(m) if m is not None else None for m in models)

    template = next((v for v in (sigma0, inc) if isinstance(v, DimArray)), None)

    # raw (possibly lazy/chunked) data objects — the host prep (dtype
    # casts, dB conversion, complex split) runs per streamed piece inside
    # _LazySource, never on the whole scene at once
    raw_inc = _raw_data(inc)
    raw_s0 = _raw_data(sigma0)
    shape = tuple(np.shape(raw_s0))

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
            raw_s0_co, raw_s0_cr = raw_s0, None
            if not _any_valid(ancillary_wind):
                raise ValueError("copol inversion requires valid ancillary_wind")
        else:
            raw_s0_co, raw_s0_cr = None, raw_s0
            if _any_valid(ancillary_wind):
                warnings.warn(
                    "crosspol inversion is best without ancillary wind, "
                    "but using it as requested."
                )
            models = (None, models[0])
    else:
        raw_s0_co = raw_s0
        raw_s0_cr = _raw_data(sigma0_dual)

    tables = prepare_tables(
        models[0], models[1], dtype=dtype, **kwargs
    )

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    source = _LazySource(
        shape, np_dtype, raw_inc,
        s0_co=raw_s0_co, s0_cr=raw_s0_cr,
        dsig_cr=_raw_data(dsig_cr), anc=_raw_data(ancillary_wind),
        device_db=device_db,
    )
    wind_co, wind_dual = _invert_source(
        tables, source, dsig_co=dsig_co, mode=mode, piece_size=piece_size,
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

    # dual-pol merge (windspeed.py:425-428): take copol where either speed
    # < 5 m/s. In-place chunked over wind_dual — no third full-scene array.
    co_f, du_f = wind_co.reshape(-1), wind_dual.reshape(-1)
    for lo in range(0, co_f.shape[0], 1 << 22):
        hi = min(lo + (1 << 22), co_f.shape[0])
        co_c, du_c = co_f[lo:hi], du_f[lo:hi]
        take_co = (np.abs(co_c) < 5) | (np.abs(du_c) < 5)
        du_c[take_co] = co_c[take_co]
    merged = wind_dual
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
