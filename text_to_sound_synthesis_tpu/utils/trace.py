"""Chrome-trace parsing for TPU device-time attribution.

Every perf claim in this repo is DEVICE time from a ``jax.profiler.trace``
Chrome trace — wall-clocks through the axon relay lie even for scan-chained
runs (CLAUDE.md ledger), and XLA names a fusion after its LAST op, so trust
``hlo_category`` over event names (the "43.5 ms of stat reductions" that were
actually convolution fusions — docs/ROOFLINE.md appendix 1).

This module is the one copy of the parsing logic the tools/ benchmarks share:

    from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace
    tr = DeviceTrace.capture(lambda: run_and_sync(), "/tmp/my_trace")
    print(tr.jit_wrapper_us())          # whole-dispatch device time
    for name, (us, n) in tr.by_name(strip_instance=True, top=10):
        ...

No tensorboard/tensorflow needed.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
from typing import Callable, Dict, Iterable, List, Optional, Tuple

__all__ = ["DeviceTrace"]

_WRAPPER_PREFIXES = ("jit_",)
# while/while.5 loop rows + bare-number step-lane rows nest the real ops
_WRAPPER_RE = re.compile(r"^(while(\.\d+)?|\d+)$")


class DeviceTrace:
    """Complete ('X') events from the device process rows of a Chrome trace."""

    def __init__(self, events: List[dict]):
        self.events = events

    # -- construction --------------------------------------------------------

    @classmethod
    def capture(cls, run_once: Callable[[], None], log_dir: str) -> "DeviceTrace":
        """Run ``run_once`` (which must SYNC — e.g. end with np.asarray of a
        small dependent slice) under the profiler and parse the result."""
        import jax

        shutil.rmtree(log_dir, ignore_errors=True)
        with jax.profiler.trace(log_dir):
            run_once()
        return cls.load(log_dir)

    @classmethod
    def load(cls, log_dir: str) -> "DeviceTrace":
        files = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                                 recursive=True), key=os.path.getmtime)
        if not files:
            raise FileNotFoundError(f"no trace under {log_dir}")
        with gzip.open(files[-1], "rt") as f:
            trace = json.load(f)
        return cls.from_trace_json(trace)

    @classmethod
    def from_trace_json(cls, trace: dict) -> "DeviceTrace":
        pids = {}
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pids[ev["pid"]] = ev.get("args", {}).get("name", "")
        dev = {p for p, n in pids.items()
               if "TPU" in n or "XLA" in n or "/device" in n.lower()}
        events = []
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            if dev and ev.get("pid") not in dev:
                continue
            events.append(ev)
        return cls(events)

    # -- queries --------------------------------------------------------------

    @staticmethod
    def _is_wrapper(name: str) -> bool:
        return name.startswith(_WRAPPER_PREFIXES) or bool(_WRAPPER_RE.match(name))

    def jit_wrapper_us(self) -> float:
        """Device time of the largest jit dispatch (the whole computation)."""
        return max((e["dur"] for e in self.events
                    if e["name"].startswith("jit_")), default=0.0)

    def total_us(self, include_wrappers: bool = False) -> float:
        """Sum of op device time.  Wrapper rows (jit_*, while, step lanes)
        nest the real ops and double-count — excluded by default."""
        return sum(e["dur"] for e in self.events
                   if include_wrappers or not self._is_wrapper(e["name"]))

    def by_name(self, strip_instance: bool = False,
                top: Optional[int] = None) -> List[Tuple[str, Tuple[float, int]]]:
        """[(name, (total_us, count))] sorted by total, wrappers excluded.
        ``strip_instance`` folds ``fusion.123`` into ``fusion``."""
        agg: Dict[str, List[float]] = {}
        for e in self.events:
            name = e["name"]
            if self._is_wrapper(name):
                continue
            if strip_instance:
                name = re.sub(r"\.\d+$", "", name)
            cur = agg.setdefault(name, [0.0, 0])
            cur[0] += e["dur"]
            cur[1] += 1
        rows = sorted(((k, (v[0], int(v[1]))) for k, v in agg.items()),
                      key=lambda kv: -kv[1][0])
        return rows[:top] if top else rows

    def by_category(self) -> List[Tuple[str, Tuple[float, int]]]:
        """Aggregate by ``args.hlo_category`` — the truthful attribution."""
        agg: Dict[str, List[float]] = {}
        for e in self.events:
            if self._is_wrapper(e["name"]):
                continue
            cat = e.get("args", {}).get("hlo_category", "?")
            cur = agg.setdefault(cat, [0.0, 0])
            cur[0] += e["dur"]
            cur[1] += 1
        return sorted(((k, (v[0], int(v[1]))) for k, v in agg.items()),
                      key=lambda kv: -kv[1][0])

    def matching(self, pattern: str) -> float:
        """Total us of ops whose name matches the regex (wrappers excluded)."""
        rx = re.compile(pattern)
        return sum(e["dur"] for e in self.events
                   if not self._is_wrapper(e["name"]) and rx.search(e["name"]))
