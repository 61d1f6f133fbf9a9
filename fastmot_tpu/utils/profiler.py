"""Wall-clock section profiler (behavioral reference: utils/profiler.py).

Context-manager timers accumulating into class-level counters;
``aggregate=True`` folds a nested section's time into an enclosing section
of the same name (used by mot.py:152 in the reference).
"""
from __future__ import annotations

import time
from collections import Counter


class Profiler:
    __slots__ = ('name', 'aggregate', 'start', 'duration')

    timing = Counter()
    count = Counter()

    def __init__(self, name, aggregate=False):
        self.name = name
        self.aggregate = aggregate

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        elapsed = time.perf_counter() - self.start
        self.duration = elapsed
        Profiler.timing[self.name] += elapsed
        if not self.aggregate:
            Profiler.count[self.name] += 1
        return False

    @classmethod
    def reset(cls):
        cls.timing.clear()
        cls.count.clear()

    @classmethod
    def get_avg_millis(cls, name):
        n = cls.count[name]
        if n == 0:
            return 0.0
        return cls.timing[name] * 1000.0 / n
