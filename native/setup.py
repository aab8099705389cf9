"""Build the native batch-builder: ``python native/setup.py build_ext --inplace``
(run from the repo root; scripts/build_native.sh wraps this)."""

import numpy as np
from setuptools import Extension, setup

setup(
    name="gnn_batcher",
    ext_modules=[
        Extension(
            "_gnn_batcher",
            sources=["native/batcher.cc"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
