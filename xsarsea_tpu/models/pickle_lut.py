"""Legacy sarwing pickle-LUT reader.

Loads the historical sarwing LUT directory layout (``sigma.npy`` +
``incidence_angle.pkl`` + ``wind_speed[_and_direction].pkl``), inferring
polarization from the files present, as in the reference
``pickle_luts.py:20-133``.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from xsarsea_tpu.dimarray import DimArray
from xsarsea_tpu.models.base import LutModel

__all__ = ["PickleLutModel", "register_pickle_luts"]


class PickleLutModel(LutModel):

    _name_prefix = "sarwing_lut__"
    _priority = 10

    def __init__(self, name, path, **kwargs):
        super().__init__(name, **kwargs)
        self.path = path

    def _raw_lut(self, **kwargs):
        if not os.path.isdir(self.path):
            raise FileNotFoundError(self.path)

        sigma0_db = np.ascontiguousarray(np.load(os.path.join(self.path, "sigma.npy")).T)
        with open(os.path.join(self.path, "incidence_angle.pkl"), "rb") as f:
            inc = pickle.load(f, encoding="iso-8859-1")
        try:
            with open(os.path.join(self.path, "wind_speed_and_direction.pkl"), "rb") as f:
                phi, wspd = pickle.load(f, encoding="iso-8859-1")
        except FileNotFoundError:
            phi = None
            with open(os.path.join(self.path, "wind_speed.pkl"), "rb") as f:
                wspd = pickle.load(f, encoding="iso-8859-1")

        self.wspd_step = float(np.round(np.diff(wspd).mean(), 2))
        self.inc_step = float(np.round(np.diff(inc).mean(), 2))
        self.inc_range = [float(np.round(np.min(inc), 2)), float(np.round(np.max(inc), 2))]
        self.wspd_range = [float(np.round(np.min(wspd), 2)), float(np.round(np.max(wspd), 2))]

        if phi is not None:
            dims = ("wspd", "phi", "incidence")
            coords = {"incidence": inc, "phi": phi, "wspd": wspd}
            self.phi_step = float(np.round(np.diff(phi).mean(), 2))
            self.phi_range = [float(np.round(np.min(phi), 2)), float(np.round(np.max(phi), 2))]
            self.inc_step_lr, self.wspd_step_lr, self.phi_step_lr = 1.0, 0.4, 2.5
        else:
            dims = ("wspd", "incidence")
            coords = {"incidence": inc, "wspd": wspd}
            self.inc_step_lr, self.wspd_step_lr, self.phi_step_lr = 1.0, 0.1, 1.0

        lut = DimArray(
            sigma0_db, dims=dims, coords=coords,
            attrs={"units": "dB", "model": self.name, "resolution": "high"},
            name="sigma0_gmf",
        )
        final = ("incidence", "wspd") if phi is None else ("incidence", "wspd", "phi")
        return lut.transpose(*final)


def register_pickle_luts(path):
    """Register sarwing pickle LUT(s) from a dir or GMF_* subdirs."""

    def register_one(p):
        name = os.path.basename(p).replace("GMF_", PickleLutModel._name_prefix)
        if os.path.exists(os.path.join(p, "wind_speed_and_direction.pkl")):
            pol = "VV"
        elif os.path.exists(os.path.join(p, "wind_speed.pkl")):
            pol = "VH"
        else:
            pol = None
        PickleLutModel(name, p, pol=pol)

    base = os.path.basename(os.path.normpath(path))
    if base.startswith("GMF_"):
        register_one(path)
    elif os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            sub = os.path.join(path, fn)
            if os.path.isdir(sub) and fn.startswith("GMF_"):
                register_one(sub)
