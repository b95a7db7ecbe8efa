"""Background-thread batch prefetcher (SURVEY §7 stage 6: grain-style host
loader feeding device buffers).

The reference leans on torch DataLoader workers (train.py:112); here the
loaders are plain generators, so without prefetch the host featurization
(deepcopy + transforms + stack) serializes with device steps. A small
bounded queue filled by a daemon thread overlaps the two — with jax's async
dispatch this keeps the device step queue full.

Usage:
    loader = prefetch(make_loader(...), buffer_size=2)
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class _End:
    pass


def prefetch(it: Iterator, buffer_size: int = 2) -> Iterator:
    """Wrap an iterator so items are produced in a daemon thread ahead of
    consumption. Exceptions in the producer re-raise at the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, buffer_size))

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — relay to consumer
            q.put(e)
        q.put(_End)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _End:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
