"""Build script: native extension only (metadata lives in pyproject.toml).

In-place build of the LUT codec:  python setup.py build_ext --inplace
The package works without it (pure-Python fallbacks are used).
"""

import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "xsarsea_tpu._lutio",
            sources=["native/lutio.cpp"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            # pure-Python fallbacks exist: a missing C++ toolchain must
            # not make the package uninstallable from source
            optional=True,
        )
    ],
)
