"""Tracing / profiling hooks (SURVEY.md §5: the reference has none — its
only instrumentation is ad-hoc ``torch.autograd.profiler`` in a notebook
and a disabled Taichi ``kernel_profiler`` flag, ``taichi_ngp.py:26-29``.
This is the greenfield TPU-era equivalent).

Two tools:

* :class:`PhaseTimer` — lightweight wall-clock phase accounting for the
  training loop (data / step / grid-update / eval).  Forces a host
  readback before closing a phase when asked, because through the axon
  tunnel ``block_until_ready`` does not actually block — dispatch
  returns immediately and the next phase would absorb the wait.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard/XProf trace directory (the JAX-native replacement for the
  reference's CUDA-events-in-a-notebook approach).

Driven by ``train.py --profile_dir`` and printed with the per-1000-step
telemetry (the reference prints rm_s/vr_s marching stats there,
``train.py:203-219``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    >>> pt = PhaseTimer()
    >>> with pt.phase("step"):
    ...     ...
    >>> pt.summary()  # doctest: +SKIP
    'step 1 calls 0.0s (100.0%)'
    """

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None) -> Iterator[None]:
        """Time a block.  ``sync``: optional zero-arg callable forcing a
        device sync (e.g. ``lambda: float(metrics["loss"])``) so async
        dispatch doesn't attribute this phase's device time to the next.
        """
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            self.seconds[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def summary(self, reset: bool = False) -> str:
        total = sum(self.seconds.values()) or 1.0
        parts = [
            f"{k} {self.calls[k]}x {v:.2f}s ({100.0 * v / total:.1f}%)"
            for k, v in sorted(
                self.seconds.items(), key=lambda kv: -kv[1]
            )
        ]
        out = " | ".join(parts)
        if reset:
            self.seconds.clear()
            self.calls.clear()
        return out


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace of the enclosed block into ``log_dir``
    (TensorBoard / XProf readable).  No-op when ``log_dir`` is falsy, so
    call sites don't need their own conditionals."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
