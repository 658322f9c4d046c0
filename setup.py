"""Build script: python package + the native host-runtime extension."""

import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "popsift_tpu._host_native",
            sources=["cpp/host_native.cpp"],
            include_dirs=[np.get_include()],
            # x86-64-v3 baseline: the u8 residual/count loops in the wire
            # codec vectorize ~4x wider with AVX2 (safe on any post-2013
            # x86; the TPU-attached hosts are all newer)
            extra_compile_args=["-O3", "-std=c++17", "-pthread", "-mavx2",
                                "-funroll-loops"],
            extra_link_args=["-pthread"],
        ),
    ],
)
