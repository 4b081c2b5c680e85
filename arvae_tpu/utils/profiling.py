"""Profiling + numerical-health utilities.

The reference has no tracing/profiling (SURVEY.md §5.1) and guards
numerics with per-forward Python NaN sweeps over the weights
(``encoder.py:101-106``, ``decoder.py:420-425``). TPU-native
equivalents: ``jax.profiler`` traces around training windows, a
steps/sec meter, and an on-device finite-check of the parameter tree
(one all-reduce instead of a Python loop over tensors).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/arvae_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard's profile
    plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steps/sec meter with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._n = 0
        # warmup=0 counts from construction — tick() only starts the
        # clock at the _n == warmup crossing, which never fires for 0.
        self._t0: Optional[float] = (
            time.perf_counter() if warmup == 0 else None
        )

    def tick(self) -> None:
        self._n += 1
        if self._n == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._n <= self.warmup:
            return float("nan")
        return (self._n - self.warmup) / (time.perf_counter() - self._t0)


@jax.jit
def _tree_finite(tree: Any) -> jax.Array:
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(leaves))


def assert_tree_finite(tree: Any, what: str = "parameters") -> None:
    """Raises ValueError if any floating leaf contains NaN/Inf — the
    TPU-side analog of the reference's per-forward weight NaN sweep."""
    if not bool(_tree_finite(tree)):
        raise ValueError(f"{what} contain non-finite values")
