"""Xplane-trace device timing.

Wall-clock timing of dispatch loops is unreliable under remote TPU
runtimes (asynchronous dispatch returns before execution; repeated
identical executions can be deduplicated — CLAUDE.md "measurement
warning"), so authoritative timing comes from profiler traces: the
device-side duration of each executed program.

The reference times every kernel with wall-clock TICK/TOCK macros
(se_shared/timings.h:7-15) — valid for synchronous CPU code; this module
is the TPU-native equivalent.
"""

import glob
import gzip
import json


def _events(trace_dir):
    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        return []
    d = json.load(gzip.open(files[-1]))
    return [e for e in d.get("traceEvents", [])
            if e.get("ph") == "X"
            and "device_duration_ps" in e.get("args", {})]


def program_device_seconds(trace_dir, name_prefix="jit_"):
    """Total device seconds of top-level compiled programs in the trace.

    Sums the ``device_duration_ps`` of events whose name starts with
    ``name_prefix`` (XLA names the program event after the jitted
    function). Returns (total_seconds, event_count).
    """
    total_ps = 0.0
    n = 0
    for e in _events(trace_dir):
        if e.get("name", "").startswith(name_prefix):
            total_ps += float(e["args"]["device_duration_ps"])
            n += 1
    return total_ps / 1e12, n
