"""Live ingest progress — the reference's progress bar
(``utils/progress.py:23-93``: queue-fed ETA/percent display over the
load) re-expressed for a distributed run: staging tasks fire
increments at a tiny named Ray actor; the driver polls it from a
daemon thread and renders percent/rate lines while the epoch streams.

Off by default (``EngineConfig.progress``) — the counter adds one
fire-and-forget actor call per staged batch, nothing on the data path.
"""

from __future__ import annotations

import threading
import time

import ray


@ray.remote(num_cpus=0)
class ProgressCounter:
    """Shared counter (ST3 shape: the engine's shared-state analog)."""

    def __init__(self):
        self.done = 0

    def add(self, n: int) -> None:
        self.done += int(n)

    def get(self) -> int:
        return self.done


class ProgressReporter:
    """Driver-side: spawn the counter, hand its handle to stages, render
    from a daemon thread until ``stop()``."""

    def __init__(self, total: int, label: str = "ingest",
                 interval: float = 2.0, out=None):
        self.total = max(int(total), 1)
        self.label = label
        self.interval = interval
        self.counter = ProgressCounter.remote()
        self._stop = threading.Event()
        self._out = out
        self._t0 = time.perf_counter()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _emit(self, line: str) -> None:
        import sys

        print(line, file=self._out or sys.stderr, flush=True)

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            done = ray.get(self.counter.get.remote())
            elapsed = time.perf_counter() - self._t0
            rate = done / elapsed if elapsed > 0 else 0.0
            pct = min(100.0, 100.0 * done / self.total)
            eta = (self.total - done) / rate if rate > 0 else float("inf")
            self._emit(
                f"[{self.label}] {pct:5.1f}% | {done:,}/{self.total:,} events"
                f" | {rate:,.0f}/s | eta {eta:,.0f}s"
            )

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=self.interval + 1)
        done = ray.get(self.counter.get.remote())
        elapsed = time.perf_counter() - self._t0
        self._emit(
            f"[{self.label}] done: {done:,} events in {elapsed:,.1f}s"
            f" ({done / max(elapsed, 1e-9):,.0f}/s)"
        )
