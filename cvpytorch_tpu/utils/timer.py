"""Step timing without per-step device sync.

The reference forces ``torch.cuda.synchronize()`` every step to time it
(reference: trainer.py:379-382) — a throughput killer.  Here timing is
host-side wall clock over N async-dispatched steps; a single blocking
``block_until_ready`` happens only at measurement boundaries.
"""
from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = None
        self.elapsed = 0.0
        self.count = 0

    def tic(self):
        self._start = time.perf_counter()

    def toc(self, n: int = 1) -> float:
        dt = time.perf_counter() - self._start
        self.elapsed += dt
        self.count += n
        return dt

    def ips(self, batch_size: int = 1) -> float:
        """images/sec over all recorded steps."""
        if self.elapsed == 0:
            return 0.0
        return self.count * batch_size / self.elapsed
