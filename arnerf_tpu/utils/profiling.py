"""Tracing / profiling helpers (SURVEY.md §5: the reference only has
wall-clock timers + TensorBoard sample counters; here we expose the same
counters plus real device traces via jax.profiler)."""

import contextlib
import json
import os
import time

import jax


@contextlib.contextmanager
def device_trace(logdir="traces"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock EMA timer for hot loops (the reference's time.time()
    bracketing, show_gui.py:73-99, with smoothing)."""

    def __init__(self, alpha=0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        self.ema = dt if self.ema is None else \
            (1 - self.alpha) * self.ema + self.alpha * dt

    @property
    def fps(self):
        return 1.0 / self.ema if self.ema else 0.0


class MetricsLogger:
    """JSONL + optional TensorBoard metrics sink (replaces the reference's
    Lightning TensorBoardLogger, train.py:277-279)."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def log(self, step, metrics: dict):
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
