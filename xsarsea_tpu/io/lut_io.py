"""LUT (de)serialization.

The reference persists LUTs as netCDF4 files with a fixed schema
(``models.py:232-262``: variable ``sigma0_model`` over dims
(incidence, wspd[, phi]), dB units, range/step global attrs) and reloads
them lazily (``models.py:350-410``). This module reproduces that schema:

* :func:`write_lut` writes NetCDF3 (classic) via scipy — readable by any
  netCDF tool including xarray/the reference library.
* :func:`read_lut` reads both NetCDF3 (scipy) and netCDF4/HDF5 (h5py),
  so LUT files produced *by the reference* load unchanged.
"""

from __future__ import annotations

import os

import numpy as np

from xsarsea_tpu.dimarray import DimArray

__all__ = ["write_lut", "read_lut", "read_lut_attrs",
           "write_packed_lut", "read_packed_lut"]

_LUT_VAR = "sigma0_model"


def _sanitize_attr(v):
    if isinstance(v, np.ndarray):
        return v
    if isinstance(v, (list, tuple)):
        return np.asarray(v)
    return v


def write_lut(path, lut: DimArray, attrs: dict):
    """Write a LUT DimArray to a classic-netCDF file with the xsarsea schema."""
    from scipy.io import netcdf_file

    with netcdf_file(path, "w", version=2) as nc:
        for dim in lut.dims:
            nc.createDimension(dim, lut.sizes[dim])
            var = nc.createVariable(dim, "d", (dim,))
            var[:] = np.asarray(lut.coords[dim], dtype=np.float64)
        data = np.asarray(lut.data, dtype=np.float64)
        var = nc.createVariable(_LUT_VAR, "d", lut.dims)
        var[:] = data
        for k, v in attrs.items():
            setattr(nc, k, _sanitize_attr(v))


def _is_hdf5(path):
    with open(path, "rb") as f:
        return f.read(8) == b"\x89HDF\r\n\x1a\n"


def _decode(v):
    if isinstance(v, bytes):
        return v.decode()
    if isinstance(v, np.ndarray) and v.dtype.kind == "S":
        return v.astype(str)
    if isinstance(v, np.generic):
        return v.item()
    return v


def read_lut_attrs(path):
    """Read only the global attributes of a LUT file (cheap registration scan).

    Counterpart of the reference attrs-only open at registration time
    (models.py:361-398).
    """
    if _is_hdf5(path):
        import h5py

        with h5py.File(path, "r") as f:
            return {k: _decode(v) for k, v in f.attrs.items()}
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as nc:
        return {k: _decode(v) for k, v in nc._attributes.items()}


def read_lut(path) -> DimArray:
    """Read a LUT file into a DimArray (dims incidence, wspd[, phi])."""
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    if _is_hdf5(path):
        import h5py

        with h5py.File(path, "r") as f:
            dset = f[_LUT_VAR]
            # netCDF4-over-HDF5 stores dim names in the DIMENSION_LIST /
            # attached scales; fall back to positional names.
            dims = []
            for i in range(dset.ndim):
                scales = dset.dims[i] if hasattr(dset, "dims") else []
                name = None
                try:
                    if len(scales):
                        name = scales[0].name.lstrip("/")
                except Exception:
                    name = None
                dims.append(name or ("incidence", "wspd", "phi")[i])
            coords = {d: np.asarray(f[d]) for d in dims if d in f}
            attrs = {k: _decode(v) for k, v in f.attrs.items()}
            data = np.asarray(dset)
    else:
        from scipy.io import netcdf_file

        with netcdf_file(path, "r", mmap=False) as nc:
            var = nc.variables[_LUT_VAR]
            dims = tuple(var.dimensions)
            coords = {d: np.asarray(nc.variables[d][:]).copy() for d in dims if d in nc.variables}
            attrs = {k: _decode(v) for k, v in nc._attributes.items()}
            data = np.asarray(var[:]).copy()
    return DimArray(data, dims=dims, coords=coords, attrs=attrs, name=_LUT_VAR)


# ------------------------------------------------- packed device-ready cache

def _packed_meta(lut: DimArray, attrs):
    import json

    return json.dumps({
        "dims": list(lut.dims),
        "coords": {d: np.asarray(lut.coords[d], np.float64).tolist()
                   for d in lut.dims},
        "attrs": {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                  for k, v in (attrs or {}).items()},
    })


def write_packed_lut(path, lut: DimArray, attrs=None):
    """Write a LUT in the packed XSTL1 cache format (f32 C-order payload).

    Device-ready layout: a single contiguous f32 block loads straight
    into the inversion tables with one read — ~10x faster than the
    netCDF path at model-registration time. Uses the native codec
    (xsarsea_tpu._lutio) when built, a pure-Python writer otherwise.
    """
    meta = _packed_meta(lut, attrs if attrs is not None else lut.attrs)
    data = np.ascontiguousarray(np.asarray(lut.data), dtype=np.float32)
    try:
        from xsarsea_tpu import _lutio

        _lutio.write_packed(str(path), data, meta)
    except ImportError:
        mb = meta.encode()
        with open(path, "wb") as f:
            f.write(b"XSTL1\n")
            f.write(np.uint32(len(mb)).tobytes())
            f.write(mb)
            f.write(np.uint32(data.ndim).tobytes())
            f.write(np.asarray(data.shape, np.uint64).tobytes())
            f.write(data.tobytes())


def read_packed_lut(path) -> DimArray:
    """Read a packed XSTL1 LUT cache written by :func:`write_packed_lut`."""
    import json

    try:
        from xsarsea_tpu import _lutio

        data, meta = _lutio.read_packed(str(path))
        meta = json.loads(meta)
    except ImportError:
        with open(path, "rb") as f:
            if f.read(6) != b"XSTL1\n":
                raise ValueError(f"{path}: not an XSTL1 file")
            mlen = int(np.frombuffer(f.read(4), np.uint32)[0])
            meta = json.loads(f.read(mlen))
            ndim = int(np.frombuffer(f.read(4), np.uint32)[0])
            shape = np.frombuffer(f.read(8 * ndim), np.uint64).astype(int)
            data = np.fromfile(f, np.float32).reshape(shape)
    return DimArray(
        data,
        dims=tuple(meta["dims"]),
        coords={d: np.asarray(c) for d, c in meta["coords"].items()},
        attrs=meta.get("attrs", {}),
        name=_LUT_VAR,
    )
