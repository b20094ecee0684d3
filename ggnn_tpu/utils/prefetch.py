"""Host-side batch prefetching.

`ThreadedIterator` reproduces the one concurrent structure of the
reference: a background thread fills a bounded queue so batch assembly
overlaps device compute (reference: utils.py:16-36). Elements must not be
None (None is the end sentinel). Unlike the reference, abandoning the
iteration early (an exception in the consuming loop) does not leak a
blocked worker thread: `close()` — called automatically when the
generator is torn down — unblocks and retires the worker.
"""

import queue
import threading
from typing import Any, Iterable


class ThreadedIterator:
    """An iterator whose elements are computed in a background thread."""

    def __init__(self, original_iterator: Iterable[Any], max_queue_size: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue_size)
        self._closed = False
        self._thread = threading.Thread(
            target=self._worker, args=(original_iterator,), daemon=True
        )
        self._error = None
        self._thread.start()

    def _put(self, element) -> bool:
        """Bounded put that gives up when the consumer closed us (a
        plain blocking put would park the worker forever — holding its
        packed batches — if the consuming loop is abandoned early)."""
        while not self._closed:
            try:
                self._queue.put(element, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self, original_iterator):
        try:
            for element in original_iterator:
                assert element is not None, "iterator elements must not be None"
                if not self._put(element):
                    return
        except BaseException as e:  # surface worker errors on the consumer
            self._error = e
        finally:
            self._put(None)

    def close(self):
        """Retire the worker without consuming the stream (called by the
        generator's finally on early exit)."""
        self._closed = True
        try:  # unblock a parked put
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __iter__(self):
        try:
            next_element = self._queue.get(block=True)
            while next_element is not None:
                yield next_element
                next_element = self._queue.get(block=True)
            self._thread.join()
            if self._error is not None:
                raise self._error
        finally:
            self.close()
