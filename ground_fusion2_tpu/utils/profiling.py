"""Per-stage timing (the reference's ``zjloc::common::Timer::Evaluate`` /
``TicToc`` rolled into one, ``lio/src/common/timer/timer.h:59-62``).

Device-aware: stages that return jax arrays are blocked on before stopping
the clock, so timings reflect real device work, not dispatch.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class Timer:
    def __init__(self):
        self.records: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def time(self, label: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.records[label].append(time.perf_counter() - t0)

    def evaluate(self, fn, label: str):
        """Timer::Evaluate(lambda, label): run fn, record, return result."""
        t0 = time.perf_counter()
        out = fn()
        try:
            jax.block_until_ready(out)
        except Exception:
            pass
        self.records[label].append(time.perf_counter() - t0)
        return out

    def summary(self) -> str:
        lines = []
        for label, ts in sorted(self.records.items()):
            n = len(ts)
            mean = sum(ts) / n * 1e3
            mx = max(ts) * 1e3
            lines.append(f"{label:32s} n={n:5d} mean={mean:8.3f} ms "
                         f"max={mx:8.3f} ms total={sum(ts):7.2f} s")
        return "\n".join(lines)

    def dump(self, path: str):
        """Timer::DumpIntoFile equivalent."""
        with open(path, "w") as f:
            f.write(self.summary() + "\n")


GLOBAL_TIMER = Timer()
