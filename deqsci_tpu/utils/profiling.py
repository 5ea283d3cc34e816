"""Tracing / profiling utilities.

The reference has no profiling subsystem (SURVEY.md §5) — its closest
artifacts are the solver residual lists and print statements. Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  TensorBoard-viewable XLA traces of the jitted programs;
* ``time_fn`` — robust wall-time measurement of a jitted callable
  (blocks on ALL outputs; single-call timings on TPU lie because dispatch
  is async and a buffer can report ready before the program retires);
* ``EasyDict`` — the reference's attribute-dict convenience
  (utils/cg_utils.py:241-254).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> None:
    """Force completion of a jitted call's outputs.

    On tunnel runtimes (axon) ``block_until_ready`` can return before the
    program retires, so the only dependable sync is a device->host fetch;
    one element of one leaf suffices (XLA programs retire atomically).
    """
    import jax
    import numpy as np
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    if leaves and hasattr(leaves[0], "ravel"):
        np.asarray(jax.numpy.ravel(leaves[0])[0])


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1,
            **kwargs) -> float:
    """Median-of-``iters`` wall seconds per call, compile excluded."""
    for _ in range(warmup):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


class EasyDict(dict):
    """dict with attribute access (reference utils/cg_utils.py:241-254)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]
