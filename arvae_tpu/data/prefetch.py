"""Host→device prefetching.

The reference's input path is a synchronous per-batch ``.cuda()`` copy
inside the train loop (``utils/trainer.py:126-135``). Here a background
thread runs the host work (numpy slicing, bit-unpacking, dtype casts)
and ``device_put``s the next batches while the TPU executes the current
step, keeping the device queue full.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

from arvae_tpu.parallel import MeshContext, shard_batch_truncated


class DevicePrefetcher:
    """Wraps a host batch iterable; yields device-sharded batches with
    ``depth`` batches in flight."""

    def __init__(
        self,
        loader: Iterable,
        mesh: MeshContext,
        process_fn: Optional[Callable[[Any], Any]] = None,
        depth: int = 2,
    ):
        self.loader = loader
        self.mesh = mesh
        self.process_fn = process_fn or (lambda x: x)
        self.depth = depth

    def __len__(self) -> int:
        # Upper bound: on a multi-chip data axis the producer drops a
        # final partial batch smaller than the axis
        # (shard_batch_truncated returns None), so iteration can yield
        # one batch fewer than this. Callers count yielded batches
        # themselves for metric denominators.
        return len(self.loader)

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _SENTINEL = object()
        err: list = []
        abandoned = threading.Event()

        def _put(item) -> bool:
            # Bounded put that notices consumer abandonment: if the
            # epoch loop breaks or raises mid-iteration, the generator's
            # finally sets `abandoned` and the producer exits instead of
            # blocking forever on a full queue with device batches
            # pinned in HBM.
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self.loader:
                    if abandoned.is_set():
                        return
                    batch = self.process_fn(batch)
                    # partial final batches are truncated to a multiple
                    # of the data axis (a no-op when n_data == 1) rather
                    # than padded with repeats, which would bias the
                    # per-batch metric means; batches smaller than the
                    # mesh truncate to zero rows and are skipped
                    sharded = shard_batch_truncated(self.mesh, batch)
                    if sharded is not None and not _put(sharded):
                        return
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                _put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            abandoned.set()
