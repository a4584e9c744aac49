"""Profiling: jax.profiler traces with a wait/warmup/active/repeat schedule.

TPU-native equivalent of the reference's torch.profiler integration
(training/trainer.py:119-138, 553-564): traces are written as TensorBoard-
compatible dumps under <model_dir>/profile and can be inspected with
tensorboard or xprof.
"""

from __future__ import annotations

import os


class ScheduledProfiler:
    """step() once per training iteration; traces `active` steps after
    `wait`+`warmup`, `repeat`+1 times (reference schedule semantics)."""

    def __init__(self, logdir: str, wait: int = 10, warmup: int = 5,
                 active: int = 5, repeat: int = 1, enabled: bool = True):
        self.logdir = logdir
        self.wait = int(wait)
        self.warmup = int(warmup)
        self.active = int(active)
        self.cycle = self.wait + self.warmup + self.active
        self.total = self.cycle * (int(repeat) + 1)
        self.enabled = enabled
        self._step = 0
        self._tracing = False
        if enabled:
            os.makedirs(logdir, exist_ok=True)

    @classmethod
    def from_config(cls, args) -> "ScheduledProfiler":
        p = args.get_path("logging.profiling", {}) or {}
        return cls(
            logdir=os.path.join(str(args.model_dir), "profile"),
            wait=int(p.get("wait", 10)), warmup=int(p.get("warmup", 5)),
            active=int(p.get("active", 5)), repeat=int(p.get("repeat", 1)),
            enabled=bool(p.get("enabled", False)),
        )

    def step(self):
        if not self.enabled or self._step >= self.total:
            if self._tracing:
                self._stop()
            return
        pos = self._step % self.cycle
        if pos == self.wait + self.warmup and not self._tracing:
            self._start()
        elif pos == 0 and self._tracing:
            self._stop()
        self._step += 1

    def _start(self):
        import jax

        try:
            jax.profiler.start_trace(self.logdir)
            self._tracing = True
        except Exception as e:  # profiling may be unsupported on some backends
            print(f"profiler start failed: {e}")
            self.enabled = False

    def _stop(self):
        import jax

        try:
            jax.profiler.stop_trace()
        except Exception as e:
            print(f"profiler stop failed: {e}")
        self._tracing = False

    def close(self):
        if self._tracing:
            self._stop()
