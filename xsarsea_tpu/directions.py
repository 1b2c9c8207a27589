"""Wind-direction convention conversions.

Same conventions as the reference (``detrend.py:96-201``): meteorological
(degrees clockwise from north, direction *from*), oceanographic (*to*),
and image/antenna convention (radians anticlockwise from the sample axis).
All functions broadcast over numpy / jnp arrays / DimArrays.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "dir_meteo_to_sample",
    "dir_sample_to_meteo",
    "dir_meteo_to_oceano",
    "dir_oceano_to_meteo",
    "dir_to_180",
    "dir_to_360",
]


def dir_meteo_to_sample(meteo_dir, ground_heading):
    """Meteorological N/S direction → image convention.

    Returns the angle in radians, relative to the sample axis,
    anticlockwise (reference detrend.py:96-111).
    """
    return np.pi / 2 - np.deg2rad(meteo_dir - ground_heading)


def dir_sample_to_meteo(sample_dir, ground_heading):
    """Image direction (deg, anticlockwise from sample axis) → meteorological."""
    return 90.0 - sample_dir + ground_heading


def dir_meteo_to_oceano(meteo_dir):
    """Meteorological (from) → oceanographic (to) convention."""
    return (meteo_dir + 180.0) % 360.0


def dir_oceano_to_meteo(oceano_dir):
    """Oceanographic (to) → meteorological (from) convention."""
    return (oceano_dir - 180.0) % 360.0


def dir_to_180(angle):
    """Wrap angle in degrees to [-180, 180)."""
    return (angle + 180.0) % 360.0 - 180.0


def dir_to_360(angle):
    """Wrap angle in degrees to [0, 360)."""
    return (angle + 360.0) % 360.0
