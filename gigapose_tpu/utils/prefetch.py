"""Background-thread prefetching for host data loaders.

The reference hides host latency behind 10 torch DataLoader worker processes
(configs/machine/local.yaml). Here a bounded background thread (or several)
keeps a queue of ready batches so the TPU never waits on PNG decode / PIL
augmentation; device transfer still happens on the consumer side.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class PrefetchIterator(Iterator[T]):
    def __init__(self, iterable: Iterable[T], buffer_size: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._error = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as e:  # propagate to the consumer
                self._error = e
            finally:
                self._queue.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self) -> T:
        item = self._queue.get()
        if item is _SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch(iterable: Iterable[T], buffer_size: int = 4) -> Iterator[T]:
    return PrefetchIterator(iterable, buffer_size)
