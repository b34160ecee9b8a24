"""Initializers registry (mirrors gaustudio/pipelines/initializers/__init__.py)."""

from gaustudio_tpu.registry import Registry

_registry = Registry("initializers")
register = _registry.register
make = _registry.make
keys = _registry.keys

from gaustudio_tpu.pipelines.initializers import (  # noqa: E402,F401
    base, pcd, depth, dust3r, gaussiansky, mesh, mask, colmap,
)
