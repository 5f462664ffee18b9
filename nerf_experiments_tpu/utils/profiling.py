"""Profiling/tracing hooks (SURVEY.md §5.1 — absent in the reference).

The reference had no profiler (one commented Lightning AdvancedProfiler
import, `3d-ingp/main.py:24`); rays/sec came from eyeballing wandb step
rates. Here:
  * `trace(dir)` — context manager around `jax.profiler` producing a
    TensorBoard-compatible trace of the jitted steps;
  * `StepTimer` — host-side step timing with the device-tunnel-safe sync
    (forces a host transfer; block_until_ready acks early through the
    tunnel);
  * rays/sec is a first-class metric already logged by the trainer
    (`training/trainer.py` logs train_rays_per_sec every log interval).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling host-side phases in the trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput meter with a device-transfer sync point.

    usage:
        timer = StepTimer(sync=lambda m: float(m["loss"]))
        for ...:
            state, metrics = step(...)
            timer.tick(metrics, rays=batch_size)
        print(timer.rays_per_sec())
    """

    def __init__(self, sync=None, warmup: int = 3):
        self._sync = sync or (lambda m: None)
        self._warmup = warmup
        self._count = 0
        self._rays = 0
        self._t0: Optional[float] = None

    def tick(self, metrics, rays: int) -> None:
        self._count += 1
        if self._count == self._warmup:
            self._sync(metrics)  # drain the pipeline before starting the clock
            self._t0 = time.perf_counter()
            self._rays = 0
        elif self._count > self._warmup:
            self._rays += rays

    def rays_per_sec(self, metrics=None) -> float:
        if self._t0 is None or self._rays == 0:
            return float("nan")
        if metrics is not None:
            self._sync(metrics)
        return self._rays / (time.perf_counter() - self._t0)
