"""Host-side data loading: prefetch pipeline feeding the device.

The reference keeps TPUs/GPUs fed with torch DataLoader workers
(``8 * num_processes`` workers, ``scripts/train/train.py:236-237,262-270``).
Here the split is: ``MangaTrainSizeBucketDataset.batches(num_workers=N)``
builds each batch's samples on a thread pool (PIL releases the GIL for
decode/resize) with per-host sharding, while this module's ``PrefetchLoader``
runs ONE producer thread that drains that iterator through a bounded queue and
``device_put``s ahead of the consuming train step — so sample building (the
expensive part) is parallel and the device never waits on host transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


class PrefetchLoader:
    """Wrap a batch iterator factory with background prefetch + device put."""

    def __init__(self, batch_factory: Callable[[int], Iterator[Any]],
                 num_epochs: Optional[int] = None,
                 prefetch: int = 2,
                 device_put: Optional[Callable[[Any], Any]] = None,
                 seed: int = 0):
        self.batch_factory = batch_factory
        self.num_epochs = num_epochs
        self.prefetch = prefetch
        self.device_put = device_put or jax.device_put
        self.seed = seed

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END = object()

        def worker():
            epoch = 0
            try:
                while not stop.is_set() and (
                        self.num_epochs is None or epoch < self.num_epochs):
                    for batch in self.batch_factory(self.seed + epoch):
                        if stop.is_set():
                            return
                        q.put(self.device_put(batch))
                    epoch += 1
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                yield item
        finally:
            stop.set()
            # drain so the worker's blocked put() can exit
            while not q.empty():
                q.get_nowait()
