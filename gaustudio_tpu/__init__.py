"""gaustudio_tpu — a TPU-native 3D Gaussian Splatting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
GAP-LAB-CUHK-SZ/gaustudio (reference layout: gaustudio/ at the upstream repo):
registries of models / renderers / datasets / initializers / optimizers, a
differentiable tile-based Gaussian rasterizer emitting RGB + expected depth +
median depth/weight/id + accumulated opacity, mesh extraction via TSDF fusion
+ marching cubes, and a full 3DGS training loop with adaptive
densification — all designed TPU-first (static shapes, pjit/shard_map device
meshes, Pallas kernels for the hot compositing loops).

The public surface mirrors the reference's registry idiom
(gaustudio/models/__init__.py:1-26 etc.): ``models.make(cfg)``,
``renderers.make(cfg)``, ``datasets.make(cfg)``.
"""

__version__ = "0.1.0"

import os as _os

# Persist XLA compilations across processes: the first gs-extract-mesh /
# gs-render invocation pays the full compile (~20-40 s per pipeline on the
# remote compile service); every later invocation — of ANY entry point that
# hits the same (settings, resolution) jits — replays from this cache.
# Opt out (or redirect) with GS_NO_COMPILE_CACHE=1 / JAX_COMPILATION_CACHE_DIR.
if _os.environ.get("GS_NO_COMPILE_CACHE") != "1":
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "gaustudio_tpu_jax"),
    )

from gaustudio_tpu import models, renderers, datasets  # noqa: F401
from gaustudio_tpu.pipelines import initializers, optimizers  # noqa: F401
