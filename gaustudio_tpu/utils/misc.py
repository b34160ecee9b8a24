"""Misc helpers — port of gaustudio/utils/misc.py (config loading lives in
gaustudio_tpu.config; here: checkpoint iteration search, rank helpers)."""

from __future__ import annotations

import os

from gaustudio_tpu.config import load_config  # noqa: F401  (API parity re-export)


def searchForMaxIteration(folder: str) -> int:
    """utils/misc.py:50-52 / scripts/extract_mesh.py:17-19."""
    saved_iters = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved_iters)


def get_rank() -> int:
    """utils/misc.py:40-48 (SLURM/env rank helper; JAX: process_index)."""
    for key in ("RANK", "LOCAL_RANK", "SLURM_PROCID", "JSM_NAMESPACE_RANK"):
        rank = os.environ.get(key)
        if rank is not None:
            return int(rank)
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0
