"""windspeed module: wind retrieval from sigma0 and GMF/LUT models.

Public surface mirrors the reference ``xsarsea.windspeed`` package
(windspeed/__init__.py:5-34).
"""

__all__ = [
    "invert_from_model",
    "available_models",
    "get_model",
    "register_cmod7",
    "register_pickle_luts",
    "register_nc_luts",
    "register_luts",
    "nesz_flattening",
    "get_dsig",
    "get_dsig_wspd",
    "GmfModel",
    "Model",
    "gmfs",
    "gmfs_impl",
    "InversionTables",
    "prepare_tables",
]

from xsarsea_tpu.models import (
    GmfModel,
    Model,
    available_models,
    get_model,
    gmfs_impl,
    register_cmod7,
    register_luts,
    register_nc_luts,
    register_pickle_luts,
)
# the reference exposes its GMF engine as `windspeed.gmfs`
from xsarsea_tpu.models import gmf as gmfs  # noqa: F401
from xsarsea_tpu.windspeed.dsig import get_dsig, get_dsig_wspd, nesz_flattening
from xsarsea_tpu.windspeed.inversion import (
    InversionTables,
    invert_from_model,
    prepare_tables,
)
