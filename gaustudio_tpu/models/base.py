"""BasePointCloud — config-driven attribute store.

Port of gaustudio/models/base.py:7-135 without torch: attributes are numpy /
jnp arrays in a flat ``_<name>`` layout, PLY IO via gaustudio_tpu.utils.ply.
Models double as parameter containers for training: ``params()`` returns the
raw attribute dict as a pytree and ``update(**attrs)`` writes trained values
back.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from gaustudio_tpu.utils import ply as plyio


class BasePointCloud:
    default_conf: Dict = {"attributes": {}}

    def __repr__(self):
        properties = list(self.config["attributes"].keys()) if isinstance(
            self.config["attributes"], dict) else list(self.config["attributes"])
        return f"{self.__class__.__name__}(num_points={self.num_points}, properties={properties})"

    def __init__(self, config=None, device=None) -> None:
        del device  # JAX manages placement
        config = dict(config or {})
        self.config = {**self.default_conf, **config}
        self.setup()
        self.setup_functions()

    # -- construction ---------------------------------------------------------
    def setup(self, num_points: int = 0):
        """models/base.py:48-53."""
        self.num_points = num_points
        for elem in self.config["attributes"]:
            dim = self.config["attributes"][elem] if isinstance(
                self.config["attributes"], dict) else None
            shape = (num_points, dim) if dim else (num_points,)
            setattr(self, "_" + elem, np.zeros(shape, np.float32))

    def setup_functions(self):
        pass

    def update(self, **args):
        """models/base.py:56-61."""
        for elem in self.config["attributes"]:
            if elem in args:
                setattr(self, "_" + elem, args[elem])
        self.num_points = int(self._xyz.shape[0])

    def create_from_attribute(self, **args):
        """models/base.py:63-71."""
        for elem, value in args.items():
            if value is None:
                continue
            arr = np.asarray(value, np.float32)
            setattr(self, "_" + elem, arr)
            self.num_points = int(arr.shape[0])
        self.config["attributes"] = list(args.keys())

    # -- geometry helpers -----------------------------------------------------
    @property
    def get_center_and_size(self):
        """models/base.py:32-40: 5/95-percentile bounding box."""
        xyz = np.asarray(self._xyz)
        lower = np.percentile(xyz, 5, axis=0)
        upper = np.percentile(xyz, 95, axis=0)
        return (lower + upper) / 2, upper - lower

    @property
    def get_center(self):
        """models/base.py:42-46."""
        xyz = np.asarray(self._xyz)
        return (xyz.min(0) + xyz.max(0)) / 2

    # -- IO -------------------------------------------------------------------
    def load(self, ply_path: str):
        """models/base.py:73-105: Inria-format checkpoint loader — xyz,
        opacity, rgb (u8), and prefix-numbered fields (f_dc_0.., scale_0..)."""
        data = plyio.read_ply(ply_path)["vertex"]
        names = list(data.keys())
        self.num_points = len(data[names[0]])

        for elem in self.config["attributes"]:
            if elem == "xyz":
                self._xyz = np.stack(
                    [data["x"], data["y"], data["z"]], axis=1
                ).astype(np.float32)
            elif elem == "opacity":
                self._opacity = np.asarray(data["opacity"], np.float32)[:, None]
            elif elem == "rgb":
                self._rgb = (
                    np.stack([data["red"], data["green"], data["blue"]], 1).astype(np.float32)
                    / 255.0
                )
            else:
                matching = [n for n in names if n.startswith(elem)]
                matching = sorted(matching, key=lambda n: int(n.split("_")[-1]))
                if not matching:
                    continue
                arr = np.zeros((self.num_points, len(matching)), np.float32)
                for i, n in enumerate(matching):
                    arr[:, i] = data[n]
                setattr(self, "_" + elem, arr)
        print(f"Loaded {self.num_points} points from {ply_path}")

    def get_attribute(self, attribute):
        """models/base.py:107-108 (activation-free base version)."""
        return getattr(self, "_" + attribute)

    # -- training interop -----------------------------------------------------
    def params(self):
        """Raw attributes as a pytree (jnp arrays) for optax training."""
        return {
            elem: jnp.asarray(getattr(self, "_" + elem))
            for elem in self.config["attributes"]
        }

    def __add__(self, other):
        """models/base.py:110-134: concatenation with zero-padding."""
        if not isinstance(other, BasePointCloud):
            raise TypeError(
                f"Unsupported operand type for +: '{type(self).__name__}' and "
                f"'{type(other).__name__}'"
            )
        result = self.__class__(self.config)
        for attr in self.config["attributes"]:
            self_attr = np.asarray(getattr(self, f"_{attr}"))
            other_attr = getattr(other, f"_{attr}", None)
            if other_attr is not None and len(np.asarray(other_attr)):
                combined = np.concatenate([self_attr, np.asarray(other_attr)], 0)
            else:
                pad_shape = (other.num_points,) + self_attr.shape[1:]
                combined = np.concatenate([self_attr, np.zeros(pad_shape, np.float32)], 0)
            setattr(result, f"_{attr}", combined)
        result.num_points = self.num_points + other.num_points
        return result
