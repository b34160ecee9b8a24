"""Shared register/make decorator-registry idiom.

The reference implements an identical copy of this pattern in every package
(gaustudio/models/__init__.py:1-23, gaustudio/renderers/__init__.py:1-28,
gaustudio/datasets/__init__.py:397-415, pipelines/initializers, optimizers).
Here it is factored into one reusable helper.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    """A name -> class registry with the reference's make() semantics."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str) -> Callable:
        def decorator(cls):
            self._entries[name] = cls
            return cls

        return decorator

    def keys(self):
        return self._entries.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __getitem__(self, name: str):
        return self._entries[name]

    def make(self, config):
        """Instantiate a registered class from a name or a config mapping.

        Mirrors e.g. gaustudio/models/__init__.py:10-26: a bare string is a
        name with empty config; otherwise ``config['name']`` selects the
        class, and the full config dict is passed to the constructor.
        """
        if isinstance(config, str):
            name = config
            config = {}
        else:
            name = config.get("name")
        if not name:
            raise ValueError(f"{self.kind} name is required")
        if name not in self._entries:
            raise ValueError(f"Unknown {self.kind}: {name}")
        return self._entries[name](config)
