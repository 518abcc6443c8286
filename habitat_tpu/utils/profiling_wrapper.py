"""Profiling ranges (reference habitat/utils/profiling_wrapper.py:16-62).

The reference shims NVTX push/pop for Nsight; the TPU equivalent is
jax.profiler traces + named scopes (SURVEY §5.1). Same API surface:
configure / on_start_step / range_push / range_pop / RangeContext.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, List, Optional

import jax

_capture_start_step: int = -1
_num_steps_to_capture: int = -1
_step: int = 0
_trace_dir: Optional[str] = None
_tracing: bool = False
_ranges: List[Any] = []


def configure(capture_start_step: int = -1, num_steps_to_capture: int = -1, trace_dir: str = "/tmp/habitat_tpu_trace") -> None:
    global _capture_start_step, _num_steps_to_capture, _trace_dir
    _capture_start_step = capture_start_step
    _num_steps_to_capture = num_steps_to_capture
    _trace_dir = trace_dir


def on_start_step() -> None:
    global _step, _tracing
    _step += 1
    if _capture_start_step < 0 or _num_steps_to_capture < 0:
        return
    if _step == _capture_start_step and not _tracing:
        os.makedirs(_trace_dir or ".", exist_ok=True)
        jax.profiler.start_trace(_trace_dir)
        _tracing = True
    elif _tracing and _step >= _capture_start_step + _num_steps_to_capture:
        jax.profiler.stop_trace()
        _tracing = False


def range_push(msg: str) -> None:
    ctx = jax.profiler.TraceAnnotation(msg)
    ctx.__enter__()
    _ranges.append(ctx)


def range_pop() -> None:
    if _ranges:
        _ranges.pop().__exit__(None, None, None)


@contextlib.contextmanager
def RangeContext(msg: str):
    with jax.profiler.TraceAnnotation(msg):
        yield
