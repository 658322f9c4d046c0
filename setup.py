"""Build script: python package + the native host-runtime extension."""

import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "popsift_tpu._host_native",
            sources=["cpp/host_native.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        ),
    ],
)
