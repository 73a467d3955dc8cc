"""First-class tracing/profiling hooks.

The reference has no profiler — only wall-clock prints
(`train_epoch.py:75-80`, SURVEY §5 "Tracing/profiling: none"). The TPU
build makes tracing first-class: `trace()` wraps a region in a
`jax.profiler` trace (viewable in TensorBoard / Perfetto), and
`StageTimer` collects named wall-clock stages with device sync at the
boundaries.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for a named sub-region (shows up in the
    trace viewer timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall-clock stage timer with optional device sync.

    with timer.stage("backbone"): ...
    print(timer.report())
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    def _sync(self, x=None):
        if self.sync and x is not None:
            import numpy as np

            import jax

            leaves = jax.tree_util.tree_leaves(x)
            if leaves:
                np.asarray(leaves[0].ravel()[:1])

    @contextlib.contextmanager
    def stage(self, name: str, result_ref=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sync(result_ref)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {t / n * 1e3:.1f} ms/call "
                         f"({n} calls)")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
