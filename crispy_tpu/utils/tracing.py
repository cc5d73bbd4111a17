"""Tracing/observability: stage timers + device profiling.

The reference's observability is env-gated prints + the Tauri event bus
(SURVEY §5); here every pipeline stage can emit `stage-timing` events and
wrap work in a jax.profiler trace for device-level timelines.

    with stage("transcribe-batch"):        # emits {"stage", "seconds"}
        ...
    with device_trace("/tmp/trace"):        # XLA/TPU profiler capture
        ...

Enable debug prints with CRISPY_DEBUG=1 (the CRISPY_AUDIO_DEBUG analog).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Dict, Optional

from ..api.events import BUS, EventBus

DEBUG = os.environ.get("CRISPY_DEBUG", "") not in ("", "0", "false")


def debug(msg: str) -> None:
    if DEBUG:
        print(f"[crispy] {msg}", file=sys.stderr)


@contextlib.contextmanager
def stage(name: str, bus: EventBus = BUS, extra: Optional[dict] = None):
    t0 = time.monotonic()
    try:
        yield
    finally:
        dt = time.monotonic() - t0
        payload = {"stage": name, "seconds": dt, **(extra or {})}
        bus.emit("stage-timing", payload)
        debug(f"{name}: {dt*1000:.1f} ms")


@contextlib.contextmanager
def device_trace(trace_dir: str):
    """jax.profiler capture (view with tensorboard/xprof)."""
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class Timings:
    """Collect stage-timing events into per-stage totals (for reports/tests)."""

    def __init__(self, bus: EventBus = BUS):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._unlisten = bus.listen("stage-timing", self._on)

    def _on(self, payload):
        s = payload["stage"]
        self.totals[s] = self.totals.get(s, 0.0) + payload["seconds"]
        self.counts[s] = self.counts.get(s, 0) + 1

    def report(self) -> str:
        lines = [f"{s}: {self.totals[s]*1000:.1f} ms over {self.counts[s]} call(s)"
                 for s in sorted(self.totals, key=self.totals.get, reverse=True)]
        return "\n".join(lines)

    def close(self):
        self._unlisten()
