"""Shared host-side prefetch pipeline: a producer thread stays `maxsize`
batches ahead of the consumer (overlapping decode with device compute).
Used by every dataset's `batches()` (SURVEY.md §3.1 double-buffering).

The producer re-checks the stop flag while waiting for queue space, so a
consumer that abandons the iterator early (exception in the train loop,
test teardown) never leaks a blocked thread."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator


def prefetch_batches(sample_fn: Callable[[], Dict], steps: int,
                     maxsize: int = 2) -> Iterator[Dict]:
    q: "queue.Queue" = queue.Queue(maxsize=maxsize)
    stop = threading.Event()
    _SENTINEL = object()

    def producer():
        for _ in range(steps):
            if stop.is_set():
                return
            batch = sample_fn()
            while not stop.is_set():
                try:
                    q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue
        while not stop.is_set():
            try:
                q.put(_SENTINEL, timeout=0.2)
                return
            except queue.Full:
                continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            b = q.get()
            if b is _SENTINEL:
                return
            yield b
    finally:
        stop.set()
