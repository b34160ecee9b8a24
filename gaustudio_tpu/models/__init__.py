"""Models registry (mirrors gaustudio/models/__init__.py)."""

from gaustudio_tpu.registry import Registry

_registry = Registry("models")
register = _registry.register
make = _registry.make
keys = _registry.keys

from gaustudio_tpu.models import vanilla, general, mip, sap, scaffold  # noqa: E402,F401
