"""Datasets registry (mirrors gaustudio/datasets/__init__.py)."""

from gaustudio_tpu.registry import Registry

_registry = Registry("datasets")
register = _registry.register
make = _registry.make
keys = _registry.keys

from gaustudio_tpu.cameras import Camera  # noqa: E402,F401  (reference exposes datasets.Camera)
from gaustudio_tpu.datasets import colmap, vanilla, nerf, more_formats  # noqa: E402,F401
