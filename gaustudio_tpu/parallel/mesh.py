"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, gs: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("dp", "gs") mesh over the available devices.

    ``dp`` defaults to n_devices // gs.  With one device this still returns
    a valid 1x1 mesh so all parallel code paths run unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // gs
    assert dp * gs == n, f"mesh {dp}x{gs} != {n} devices"
    arr = np.asarray(devices).reshape(dp, gs)
    return Mesh(arr, ("dp", "gs"))


def shard_info(mesh: Mesh) -> Tuple[int, int]:
    return mesh.shape["dp"], mesh.shape["gs"]
