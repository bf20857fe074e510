"""Named wall-clock timers with device synchronisation.

Rebuild of `tool::Timer` (ref: src/Tool/TickTock.h:36-76 TICK/TOCK/LogAll)
with one crucial difference: JAX dispatch is asynchronous, so TOCK calls
`jax.block_until_ready` on an optional value before reading the clock —
otherwise every stage would appear to take microseconds while the last one
absorbs the whole pipeline.
"""

from __future__ import annotations

import time
from collections import defaultdict


class Timer:
    def __init__(self):
        self._starts: dict[str, float] = {}
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    def tick(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def tock(self, name: str, sync_value=None) -> float:
        """Stop timer `name`; if sync_value given, block on it first."""
        if sync_value is not None:
            import jax

            jax.block_until_ready(sync_value)
        dt = time.perf_counter() - self._starts[name]
        self._totals[name] += dt
        self._counts[name] += 1
        return dt * 1e3

    def mean_ms(self, name: str) -> float:
        c = self._counts[name]
        return self._totals[name] / c * 1e3 if c else 0.0

    def log_all(self) -> str:
        """(ref: TickTock.h `LogAll`)."""
        lines = [
            f"[Timer] {k}: total {v * 1e3:.2f} ms, mean {self.mean_ms(k):.2f} ms over {self._counts[k]}"
            for k, v in sorted(self._totals.items())
        ]
        out = "\n".join(lines)
        print(out)
        return out


GLOBAL_TIMER = Timer()
