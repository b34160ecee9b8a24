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

from gaustudio_tpu import models, renderers, datasets  # noqa: F401
from gaustudio_tpu.pipelines import initializers, optimizers  # noqa: F401
