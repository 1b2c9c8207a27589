"""Batch multi-scene inversion over a device mesh (BASELINE config #5).

The reference has no multi-node backend (SURVEY §2.2: dask chunks only);
this is the TPU-native scale-out: scenes are flattened, concatenated and
flat-sharded over the mesh's ``data`` axis — inversion is embarrassingly
parallel per pixel, so scenes need no alignment or padding relative to
each other and scaling across chips is linear until the (tiny) model-axis
argmin collectives.
"""

from __future__ import annotations

import numpy as np

from xsarsea_tpu.parallel.inversion import sharded_invert_pixels

__all__ = ["invert_scenes"]


def invert_scenes(tables, scenes, mesh, dsig_co=0.1, chunk_size=256,
                  mode="exact"):
    """Invert a batch of dual-pol scenes sharded over `mesh`.

    Parameters
    ----------
    tables : InversionTables
    scenes : sequence of dicts with keys ``inc``, ``sigma0_co_db``,
        ``sigma0_cr_db``, ``dsig_cr``, ``ancillary_wind`` — 2-D arrays of
        per-scene shape (shapes may differ between scenes).
    mesh : jax.sharding.Mesh with ('data', 'model') axes.
    mode : 'exact' (portable), or 'pallas*' for the per-device
        fused-kernel pipeline (requires a 1-wide 'model' axis).

    Returns a list of ``(wind_co, wind_dual)`` complex arrays, one pair
    per scene, reshaped to each scene's shape.
    """
    shapes = [np.shape(s["inc"]) for s in scenes]
    sizes = [int(np.prod(sh)) for sh in shapes]

    def flat(key):
        return np.concatenate(
            [np.asarray(s[key], dtype=np.float64).reshape(-1) for s in scenes])

    inc = flat("inc")
    s0_co = flat("sigma0_co_db")
    s0_cr = flat("sigma0_cr_db")
    dsig_cr = np.concatenate(
        [np.broadcast_to(np.asarray(s["dsig_cr"], np.float64),
                         sh).reshape(-1)
         for s, sh in zip(scenes, shapes)])
    anc = np.concatenate(
        [np.asarray(s["ancillary_wind"], np.complex128).reshape(-1)
         for s in scenes])

    co, dual = sharded_invert_pixels(
        tables, inc, s0_co, s0_cr, dsig_cr, anc, mesh=mesh,
        dsig_co=dsig_co, chunk_size=chunk_size, mode=mode)

    out = []
    off = 0
    for sh, n in zip(shapes, sizes):
        out.append((co[off:off + n].reshape(sh),
                    dual[off:off + n].reshape(sh)))
        off += n
    return out
