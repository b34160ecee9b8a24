"""Tracing, metrics, and failure-detection utilities.

The reference has none of these (SURVEY.md §5: print/tqdm only; its sole
debug aid is the rasterizer's snapshot-on-CUDA-error pickle,
gaustudio_diff_gaussian_rasterization/__init__.py:83-90).  Here:

  * ``trace(...)``: context manager around ``jax.profiler`` emitting a
    Perfetto-compatible trace directory;
  * ``MetricsLogger``: structured JSONL scalar logging (loss, PSNR,
    #gaussians, densify counts, throughput);
  * ``snapshot_on_nonfinite``: the debug-snapshot idea as a host-side dump —
    if any array in a pytree is non-finite, pickle the inputs for offline
    repro and raise.
"""

from __future__ import annotations

import contextlib
import json
import os
import pickle
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, name: str = "gaustudio"):
    """Profile a block with jax.profiler (view with Perfetto/TensorBoard)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside an active trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class MetricsLogger:
    """Append-only JSONL scalar metrics with wall-clock timestamps."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                rec[k] = float(np.asarray(v))
            except (TypeError, ValueError):
                rec[k] = str(v)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self.echo:
            body = "  ".join(f"{k} {v:.5g}" if isinstance(v, float) else f"{k} {v}"
                             for k, v in rec.items() if k not in ("wall_s",))
            print(body, flush=True)
        return rec

    def close(self):
        if self._f:
            self._f.close()


def snapshot_on_nonfinite(tree, dump_path: str, context: str = "") -> bool:
    """If any leaf has non-finite values, pickle the whole pytree for
    offline repro (the TPU analogue of snapshot_fw.dump) and return True."""
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        os.makedirs(os.path.dirname(os.path.abspath(dump_path)), exist_ok=True)
        with open(dump_path, "wb") as f:
            pickle.dump({"context": context, "bad_leaves": bad,
                         "tree": jax.tree.map(np.asarray, tree)}, f)
        print(f"[snapshot] non-finite values in {bad} -> {dump_path}")
        return True
    return False
