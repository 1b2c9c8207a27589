"""Minimal xarray.DataArray/Dataset stand-in for interop tests.

Mirrors just the protocol surface xsarsea_tpu.interop duck-types against
(dims/coords/values/attrs + the DataArray constructor contract), so the
adapter layer is exercised in environments without xarray installed. With
real xarray present the same tests would pass unchanged modulo imports.
"""

import numpy as np


class DataArray:
    def __init__(self, data, coords=None, dims=None, name=None, attrs=None):
        # mirror xarray's .data/.values split: a chunked (dask-like) array
        # is kept lazy in .data; .values materializes (like real xarray)
        if hasattr(data, "chunks") and not isinstance(data, np.ndarray):
            self._data = data
        else:
            self._data = np.asarray(data)
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(self._data.ndim))
        self.dims = tuple(dims)
        self.coords = dict(coords or {})
        self.attrs = dict(attrs or {})
        self.name = name

    @property
    def data(self):
        return self._data

    @property
    def values(self):
        if isinstance(self._data, np.ndarray):
            return self._data
        return np.asarray(self._data[0:self._data.shape[0]])

    @property
    def shape(self):
        return self._data.shape


class Dataset:
    def __init__(self, variables=None):
        self.variables = dict(variables or {})
        self.attrs = {}

    def __getitem__(self, key):
        return self.variables[key]

    def __contains__(self, key):
        return key in self.variables
