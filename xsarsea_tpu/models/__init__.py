"""Model registry and GMF/LUT implementations."""

from xsarsea_tpu.models.base import (  # noqa: F401
    LutModel,
    Model,
    available_models,
    get_model,
    register_luts,
)
from xsarsea_tpu.models.gmf import GmfModel  # noqa: F401
from xsarsea_tpu.models import gmfs_impl  # noqa: F401  (registers built-in GMFs)
from xsarsea_tpu.models.nc_lut import NcLutModel, register_nc_luts  # noqa: F401
from xsarsea_tpu.models.cmod7 import Cmod7Model, register_cmod7  # noqa: F401
from xsarsea_tpu.models.pickle_lut import PickleLutModel, register_pickle_luts  # noqa: F401
