"""Profiling / tracing helpers.

The reference has no profiler integration — only manual wall-clock
timing with cuda.synchronize (/root/reference/eval_throughput.py:109-119)
and memory counters (train.py:282). The TPU-native equivalent is the XLA
profiler: traces written by ``jax.profiler`` are viewable in
TensorBoard/Perfetto and attribute time to compiled ops.

Usage:
    with trace_if("/tmp/profile", enabled=step == 10):
        state, stats = step_fn(state, batch, rng)
or via Trainer(cfg.profile_dir=...) which traces steps
[profile_start_step, profile_start_step + profile_steps).
"""

from __future__ import annotations

import contextlib
import logging

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool = True):
    """jax.profiler.trace context, no-op when disabled."""
    if not enabled or not log_dir:
        yield
        return
    import jax
    logger.info("Writing profiler trace to %s", log_dir)
    with jax.profiler.trace(log_dir):
        yield


class StepProfiler:
    """Traces a window of training steps into ``log_dir``."""

    def __init__(self, log_dir: str, start_step: int = 10,
                 num_steps: int = 3):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.log_dir and not self._active and step == self.start:
            import jax
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            logger.info("profiler trace started at step %d -> %s", step,
                        self.log_dir)

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop:
            import jax
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace stopped at step %d", step)

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
