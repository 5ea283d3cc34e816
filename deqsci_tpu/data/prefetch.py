"""Background-thread batch prefetching for training iterators.

The reference hides .mat-decode latency behind the GPU step with
``DataLoader(num_workers=2, ...)`` (video_sci_proxgrad.py:135). Here the
training step is a single XLA program on the TPU, so one host thread
decoding the NEXT batch while the device runs the CURRENT step is enough
to hide IO completely (measured: 64-220 ms/batch of scipy .mat decode vs
~2.5 s/train step on the flagship config — up to 9% of step time).

A thread (not a process) suffices because scipy's .mat decode releases
the GIL in numpy copies and the consumer spends its time blocked in the
device runtime, not in Python bytecode.
"""

from __future__ import annotations

import queue
import threading

_END = object()


class PrefetchIterator:
    """Wrap any iterable so items are produced by a background thread.

    Each ``__iter__`` starts a fresh daemon thread filling a bounded
    queue (``depth`` items ahead). Exceptions raised by the source
    iterable are re-raised in the consumer at the point of consumption.
    """

    def __init__(self, iterable, depth: int = 2):
        self._iterable = iterable
        self._depth = int(depth)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)

        def _fill():
            try:
                for item in self._iterable:
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put((_END, e))
                return
            q.put((_END, None))

        t = threading.Thread(target=_fill, daemon=True)
        t.start()
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
