"""Host-side batch prefetching.

`ThreadedIterator` reproduces the one concurrent structure of the
reference: a background thread fills a bounded queue so batch assembly
overlaps device compute (reference: utils.py:16-36). Elements must not be
None (None is the end sentinel).

`device_prefetch` additionally overlaps host→device transfer with compute
by keeping `size` batches in flight on the device — the TPU analog of the
feed-dict queue, minimising host↔device stalls.
"""

import queue
import threading
from typing import Iterator, Iterable, Any

import jax


class ThreadedIterator:
    """An iterator whose elements are computed in a background thread."""

    def __init__(self, original_iterator: Iterable[Any], max_queue_size: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue_size)
        self._thread = threading.Thread(
            target=self._worker, args=(original_iterator,), daemon=True
        )
        self._error = None
        self._thread.start()

    def _worker(self, original_iterator):
        try:
            for element in original_iterator:
                assert element is not None, "iterator elements must not be None"
                self._queue.put(element, block=True)
        except BaseException as e:  # surface worker errors on the consumer
            self._error = e
        finally:
            self._queue.put(None, block=True)

    def __iter__(self):
        next_element = self._queue.get(block=True)
        while next_element is not None:
            yield next_element
            next_element = self._queue.get(block=True)
        self._thread.join()
        if self._error is not None:
            raise self._error


def device_prefetch(iterator: Iterator[Any], size: int = 2) -> Iterator[Any]:
    """Keep `size` batches transferred to device ahead of consumption."""
    buf = []
    for item in iterator:
        buf.append(jax.device_put(item))
        if len(buf) == size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
