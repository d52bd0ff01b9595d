"""Chrome-trace recorder: spans + counters appended to a JSON trace file.

Same event format as the reference's recorder (native/common/src/tracing.rs:26
begin/end spans :58, counters :66, written to comet-event-trace.json) so
chrome://tracing / Perfetto and the reference's analyze_trace tooling work on
our traces unchanged. Enabled via config key ``comet.tracing.enabled`` or
TRACING env; thread-safe; host-side (device-side timing comes from XLA
profiler integration, a later phase).
"""

from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

__all__ = ["Tracer", "tracer", "with_trace", "trace_counter"]


class Tracer:
    def __init__(self, path: str = "comet-event-trace.json", enabled: bool = False):
        self.path = path
        self.enabled = enabled
        self._lock = threading.Lock()
        self._started = False

    def _emit(self, ev: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        with self._lock:
            new = not self._started and not os.path.exists(self.path)
            mode = "a"
            with open(self.path, mode) as f:
                if new:
                    f.write("[\n")
                f.write(json.dumps(ev) + ",\n")
            self._started = True

    def begin(self, name: str, **args) -> None:
        self._emit(
            {
                "name": name,
                "ph": "B",
                "ts": time.time() * 1e6,
                "pid": os.getpid(),
                "tid": threading.get_ident() % (1 << 31),
                "args": args,
            }
        )

    def end(self, name: str) -> None:
        self._emit(
            {
                "name": name,
                "ph": "E",
                "ts": time.time() * 1e6,
                "pid": os.getpid(),
                "tid": threading.get_ident() % (1 << 31),
            }
        )

    def counter(self, name: str, **values) -> None:
        self._emit(
            {
                "name": name,
                "ph": "C",
                "ts": time.time() * 1e6,
                "pid": os.getpid(),
                "tid": 0,
                "args": values,
            }
        )


tracer = Tracer(
    path=os.environ.get("COMET_TPU_TRACE_FILE", "comet-event-trace.json"),
    enabled=os.environ.get("COMET_TPU_TRACING", "0") == "1",
)


@contextmanager
def with_trace(name: str, t: Optional[Tracer] = None, **args):
    tr = t or tracer
    tr.begin(name, **args)
    try:
        yield
    finally:
        tr.end(name)


def trace_counter(name: str, t: Optional[Tracer] = None, **values) -> None:
    (t or tracer).counter(name, **values)
