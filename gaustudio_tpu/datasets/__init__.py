"""Datasets registry (mirrors gaustudio/datasets/__init__.py)."""

from gaustudio_tpu.registry import Registry

_registry = Registry("datasets")
register = _registry.register
make = _registry.make
keys = _registry.keys
