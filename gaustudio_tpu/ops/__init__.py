"""Compute ops: the TPU-native replacement for the reference's CUDA kernels.

Everything the vendored gaustudio-diff-gaussian-rasterization CUDA extension
provides (cuda_rasterizer/forward.cu, backward.cu, rasterizer_impl.cu) is
re-designed here as jit/vmap JAX math plus Pallas kernels for the hot
per-tile compositing loops.
"""

from gaustudio_tpu.ops import sh  # noqa: F401
from gaustudio_tpu.ops import gaussian  # noqa: F401
