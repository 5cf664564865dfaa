"""Tracing / profiling utilities.

The reference has no profiler (SURVEY.md §5.1 — only skorch per-epoch `dur`);
the TPU-native equivalents: `jax.profiler` trace capture for xprof/tensorboard,
a per-step timing callback for the training loop, and a compiled-HLO cost
probe for kernel engineering.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

__all__ = ["trace", "StepTimer", "compiled_stats"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block:

        with trace("/tmp/tr"):
            state, _ = trainer.train_step(state, x, y)
            jax.block_until_ready(state.params)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Training-loop callback collecting per-step wall times and throughput.

    Usage: timer = StepTimer(batch_size); timer.start(); ...; timer.tick()
    after each (blocking) step; timer.summary().
    """

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._t0 is not None:
            self.times.append(now - self._t0)
        self._t0 = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        mean = sum(ts) / n
        return {
            "steps": n,
            "mean_s": mean,
            "p50_s": ts[n // 2],
            "p90_s": ts[int(n * 0.9)],
            "items_per_s": self.items_per_step / mean,
        }


def compiled_stats(fn: Callable, *args, **kwargs) -> dict:
    """Compile fn and report XLA cost analysis (flops, bytes accessed) —
    what the reference's missing profiler would have told you."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_mb": (cost.get("bytes accessed") or 0) / 1e6,
    }
