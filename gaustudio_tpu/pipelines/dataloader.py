"""Host-side data pipeline: threaded camera-batch prefetch.

The reference has no loader beyond torch Dataset indexing; on TPU the host
must keep the device fed (SURVEY.md §2.3 "Host data pipeline").  This
loader samples cameras, builds device-ready CameraBatch pytrees on a
background thread, and keeps a small queue ahead of the training loop so
host image->device transfer overlaps the previous step's compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


class PrefetchLoader:
    """Infinite sampler of per-step batches with background prefetch."""

    def __init__(self, cameras: List, make_batch: Callable, batch_size: int = 1,
                 prefetch: int = 2, seed: int = 0, shuffle: bool = True):
        self.cameras = cameras
        self.make_batch = make_batch
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _sample(self):
        if self.shuffle:
            idx = self._rng.integers(len(self.cameras), size=self.batch_size)
        else:
            if not hasattr(self, "_pos"):
                self._pos = 0
            idx = [(self._pos + i) % len(self.cameras) for i in range(self.batch_size)]
            self._pos = (self._pos + self.batch_size) % len(self.cameras)
        cams = [self.cameras[int(i)] for i in idx]
        if self.batch_size == 1:
            return self.make_batch(cams[0])
        batches = [self.make_batch(c) for c in cams]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._sample()
            except Exception as e:  # surface loader errors to the consumer
                self._q.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def make_batch_source(cameras: List, make_batch: Callable,
                      use_prefetch: bool = True, seed: int = 0,
                      cache_limit_bytes: int = 1 << 30,
                      batch_size: Optional[int] = None):
    """Per-step batch supplier shared by the trainers.

    Device-resident cache when the capture fits in ``cache_limit_bytes``
    (re-uploading gt images every step serializes with compute on
    relay-attached TPUs); threaded host prefetch otherwise; plain per-step
    conversion when ``use_prefetch`` is False (callers bounding device
    memory keep that guarantee — no implicit cache).

    ``batch_size=None`` (single-device trainers) yields one unbatched
    CameraBatch per call; an integer yields stacked leading-axis batches —
    even for batch_size=1 — as the camera-DP step expects.

    Returns a zero-arg callable yielding the next batch; it carries a
    ``.close()`` for loader-thread shutdown.
    """
    rng = np.random.default_rng(seed)
    cam0 = cameras[0]
    total = len(cameras) * int(cam0.image_height) * int(cam0.image_width) * 12
    bs = 1 if batch_size is None else batch_size

    def stack(batches):
        if batch_size is None:
            return batches[0]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    if use_prefetch and total <= cache_limit_bytes:
        cache = [make_batch(c) for c in cameras]
        fn = lambda: stack(  # noqa: E731
            [cache[i] for i in rng.integers(len(cache), size=bs)])
        fn.close = lambda: None
        return fn
    if use_prefetch:
        loader = PrefetchLoader(cameras, make_batch, prefetch=2, seed=seed,
                                batch_size=bs)
        if batch_size is None:
            fn = lambda: next(loader)  # noqa: E731
        else:
            # PrefetchLoader only stacks for batch_size > 1; force the
            # leading axis for a dp=1 mesh
            fn = (lambda: next(loader)) if bs > 1 else (  # noqa: E731
                lambda: jax.tree.map(lambda x: jnp.stack([x]), next(loader)))
        fn.close = loader.close
        return fn
    fn = lambda: stack(  # noqa: E731
        [make_batch(cameras[i])
         for i in rng.integers(len(cameras), size=bs)])
    fn.close = lambda: None
    return fn
