"""Optimizers registry (mirrors gaustudio/pipelines/optimizers/__init__.py)."""

from gaustudio_tpu.registry import Registry

_registry = Registry("optimizers")
register = _registry.register
make = _registry.make
keys = _registry.keys

from gaustudio_tpu.pipelines.optimizers import general  # noqa: E402,F401
