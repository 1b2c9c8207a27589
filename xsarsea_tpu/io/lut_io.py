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

__all__ = ["write_lut", "read_lut", "read_lut_attrs"]

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
