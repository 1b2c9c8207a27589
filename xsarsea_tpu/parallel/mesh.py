"""Device mesh construction helpers.

The reference scales out through dask chunk graphs (SURVEY §2.2); here the
equivalents are jax.sharding meshes: pixel-level data parallelism over a
``data`` axis (ICI collectives), optional LUT-grid model parallelism over a
``model`` axis, and stencil halo exchange handled by XLA SPMD partitioning
of convolutions.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a (data, model) mesh from available devices.

    n_data defaults to ``len(devices) // n_model``. The 'data' axis shards
    pixels (embarrassingly parallel), the 'model' axis shards the phi
    dimension of the copol LUT cost grid.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_model < 1:
        raise ValueError(
            f"mesh axes must be >= 1, got data={n_data} model={n_model} "
            f"({len(devices)} devices available)")
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))
