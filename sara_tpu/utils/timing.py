"""Wall-clock timers (reference: cpp/src/DO/Sara/Core/Timer.hpp, TicToc.hpp)."""

from __future__ import annotations

import time
from collections import defaultdict


class Timer:
    def __init__(self):
        self.restart()

    def restart(self):
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    def elapsed_ms(self) -> float:
        return 1e3 * self.elapsed()


class TicToc:
    """Named tic/toc accumulator for per-stage pipeline timings
    (the reference logs per-stage ms inside SIFT, FeatureDetectors/SIFT.cpp:36-105)."""

    def __init__(self):
        self._t0 = {}
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    def tic(self, name: str = "default"):
        self._t0[name] = time.perf_counter()

    def toc(self, name: str = "default") -> float:
        dt = time.perf_counter() - self._t0[name]
        self.totals[name] += dt
        self.counts[name] += 1
        return dt * 1e3

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals):
            n = self.counts[k]
            lines.append(f"{k}: total {self.totals[k]*1e3:.1f} ms, "
                         f"n={n}, avg {self.totals[k]/max(n,1)*1e3:.2f} ms")
        return "\n".join(lines)


class device_trace:
    """Context manager around ``jax.profiler.trace`` (XLA trace dump for
    TensorBoard/xprof) — the tracing/profiling aux subsystem (SURVEY §5).
    Degrades to a no-op when the backend/plugin cannot trace (the axon
    tunnel runtime may not support profiling RPCs)."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        self._active = False

    def __enter__(self):
        try:
            import jax.profiler

            jax.profiler.start_trace(self.logdir)
            self._active = True
        except Exception as e:  # pragma: no cover - backend dependent
            import logging

            logging.getLogger("sara_tpu").warning("trace unavailable: %s", e)
        return self

    def __exit__(self, *exc):
        if self._active:
            try:
                import jax.profiler

                jax.profiler.stop_trace()
            except Exception:
                pass
        return False
