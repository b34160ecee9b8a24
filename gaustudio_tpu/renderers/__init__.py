"""Renderers registry (mirrors gaustudio/renderers/__init__.py)."""

from gaustudio_tpu.registry import Registry

_registry = Registry("renderers")
register = _registry.register
make = _registry.make
keys = _registry.keys

from gaustudio_tpu.renderers import vanilla, pcd, mip, surfel, scaffold, gsplat  # noqa: E402,F401
