"""Tracing / profiling utilities.

The reference marks pipeline phases with NVTX ranges, compile-gated by
PopSift_USE_NVTX_PROFILING (/root/reference/src/popsift/popsift.h:26-31,
nvtx calls in popsift.cpp:441-452, sift_pyramid.cu:288-319).  The TPU
analogs:

* :func:`scope` — ``jax.named_scope`` annotations at the same cut points
  (upload, pyramid, detection, orientation, descriptors, download); they
  appear in XLA HLO names and in profiler traces,
* :func:`trace` — a ``jax.profiler`` trace context producing
  Perfetto/TensorBoard traces; enable ambiently with
  ``POPSIFT_TPU_TRACE=<dir>``,
* :class:`BriefDuration` — the event-pair wall-clock timer analog
  (debug_macros.h:84-117).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

import jax

# POPSIFT_TPU_HOSTTRACE=1: record host-pipeline timestamps and print a
# stage summary at PopSift.uninit (the NVTX-range analog for the host
# threads).  Events are (time, tag, key, kwargs); "<name>.start"/".end"
# pairs become duration spans, events with kwargs become value series.
HOSTTRACE = os.environ.get("POPSIFT_TPU_HOSTTRACE", "") not in ("", "0")
_trace_events: list = []


def host_trace(tag: str, key, **kw) -> None:
    if HOSTTRACE:
        _trace_events.append((time.time(), tag, key, kw))


def _collect_spans(events):
    """Fold raw (t, tag, key, kwargs) events into named series.

    ``<name>.start``/``.end`` pairs become duration spans (ms); kwarg
    values become ``#<tag>`` series.  Non-numeric kwarg values are
    counted, never aggregated (round-3 postmortem: a string kwarg made
    np.asarray(..., float64) raise inside PopSift.uninit and the bench
    never printed its JSON line)."""
    import collections

    spans = collections.defaultdict(list)
    open_at = {}
    for t, tag, key, kw in sorted(events):
        if tag.endswith(".start"):
            open_at[(tag[:-6], key)] = t
        elif tag.endswith(".end"):
            t0 = open_at.pop((tag[:-4], key), None)
            if t0 is not None:
                spans[tag[:-4]].append((t - t0) * 1e3)
        if kw:
            v = next(iter(kw.values()))
            try:
                v = float(v)
            except (TypeError, ValueError):
                v = 1.0  # count occurrences of non-numeric events
            spans[f"#{tag}"].append(v)
    return spans


def host_trace_snapshot(clear: bool = False) -> dict:
    """Per-pass attribution: return {name: (count, sum)} of all span /
    kwarg series recorded so far; optionally clear the buffer.  The bench
    calls this after every pass so compile events, regrow/fallback
    counts, and wire bytes are attributable to the pass that incurred
    them (round-3 verdict task 5)."""
    spans = _collect_spans(_trace_events)
    if clear:
        _trace_events.clear()
    return {name: (len(v), float(sum(v))) for name, v in spans.items()}


def host_trace_summary() -> None:  # pragma: no cover - diagnostic only
    if not HOSTTRACE or not _trace_events:
        return
    import numpy as np
    spans = _collect_spans(_trace_events)
    _trace_events.clear()
    print("# host trace:", file=sys.stderr)
    for name in sorted(spans):
        try:
            v = np.asarray(spans[name], dtype=np.float64)
            print(f"#   {name:22s} n={v.size:4d} mean={v.mean():8.2f} "
                  f"p50={np.percentile(v, 50):8.2f} "
                  f"p95={np.percentile(v, 95):8.2f} sum={v.sum():9.1f}",
                  file=sys.stderr)
        except Exception as e:  # diagnostics must never fail shutdown
            print(f"#   {name:22s} <unsummarizable: {e}>", file=sys.stderr)


def scope(name: str):
    """Named scope for pipeline phases (NVTX range analog)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Profiler trace context. If ``log_dir`` is None, uses the
    POPSIFT_TPU_TRACE env var; no-op when neither is set."""
    log_dir = log_dir or os.environ.get("POPSIFT_TPU_TRACE")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class BriefDuration:
    """Wall-clock phase timer (BriefDuration, debug_macros.h:84-117)."""

    def __init__(self, label: str, stream=None) -> None:
        self._label = label
        self._stream = stream or sys.stderr
        self._t0 = None
        self._elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self._elapsed += time.perf_counter() - self._t0
            self._t0 = None

    def report(self) -> None:
        print(f"{self._label}: {self._elapsed * 1e3:.3f} ms",
              file=self._stream)

    def __enter__(self) -> "BriefDuration":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
        self.report()
