"""Host-side batch prefetching.

Double-buffers the host packing pipeline (C++ `pack_batch` + numpy) behind
the device step: a daemon thread pulls batches from the loader into a small
bounded queue while the main thread blocks inside the jitted step. Both the
ctypes packer call and the jax dispatch release the GIL, so packing genuinely
overlaps device execution. This is the TPU analog of the reference's
DataLoader `num_workers` (protein_pharm_dataset.py:273-276) without the
multiprocessing tax — the packer is already native code.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class _End:
    pass


class _Raise:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate `iterable` on a background thread, `depth` items ahead.

    Exceptions raised by the producer re-raise at the consuming site. The
    producer thread is a daemon: abandoning the iterator mid-epoch cannot
    hang interpreter shutdown.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - relayed to consumer
            q.put(_Raise(e))
            return
        q.put(_End)

    thread = threading.Thread(target=producer, daemon=True,
                              name="batch-prefetch")
    thread.start()
    while True:
        item = q.get()
        if item is _End:
            break
        if isinstance(item, _Raise):
            raise item.exc
        yield item
