"""Minimal xarray.DataArray/Dataset stand-in for interop tests.

Mirrors just the protocol surface xsarsea_tpu.interop duck-types against
(dims/coords/values/attrs + the DataArray constructor contract), so the
adapter layer is exercised in environments without xarray installed. With
real xarray present the same tests would pass unchanged modulo imports.
"""

import numpy as np


class DataArray:
    def __init__(self, data, coords=None, dims=None, name=None, attrs=None):
        self.values = np.asarray(data)
        if dims is None:
            dims = tuple(f"dim_{i}" for i in range(self.values.ndim))
        self.dims = tuple(dims)
        self.coords = dict(coords or {})
        self.attrs = dict(attrs or {})
        self.name = name

    @property
    def shape(self):
        return self.values.shape


class Dataset:
    def __init__(self, variables=None):
        self.variables = dict(variables or {})
        self.attrs = {}

    def __getitem__(self, key):
        return self.variables[key]

    def __contains__(self, key):
        return key in self.variables
