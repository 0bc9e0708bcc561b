"""Host-side pipeline parallelism: prefetch + parallel row processing.

The reference overlaps augmentation with training via 4 DataLoader worker
processes (reference rnnt/train.py:86-93, config num_workers).  Here:

* ``PrefetchIterator`` — a producer thread drains the batch iterator into a
  bounded queue while the main thread feeds the device, overlapping host
  DSP (scipy augmentation, tokenization) with device steps.
* ``BatchIterator(num_workers=N)`` (rnnt_tpu/data/dataset.py) additionally
  maps the per-utterance augment+tokenize work over a thread pool — numpy/
  scipy release the GIL, so threads scale on the host cores.

Measured on the v5e stability run: the synchronous pipeline fed the chip at
~450 audio-s/s against a ~2000 audio-s/s device capability; prefetch exists
to close exactly that gap on weak hosts.
"""

from __future__ import annotations

import queue
import threading


class PrefetchIterator:
    """Wrap an iterable; a daemon producer thread keeps ``depth`` items
    ready.  Exceptions in the producer re-raise in the consumer."""

    _DONE = object()

    def __init__(self, iterable, depth: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def produce():
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                self._err = e
            finally:
                self._queue.put(self._DONE)

        self._thread = threading.Thread(target=produce, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item
