"""Device-trace summariser: top ops by accumulated duration.

Extends the profiling subsystem beyond the reference's cProfile top-10
(ref ice_profile.py:141-159): ``jax.profiler.start_trace`` captures an
xplane protobuf; this module aggregates per-op device time from it without
needing the TensorBoard UI (whose converter plugin is version-pinned and
often broken against the installed TF). Used by
``cli/ice_profile.py --trace-dir ... --trace-summary`` and importable for
ad-hoc analysis:

    with jax.profiler.trace("/tmp/trace"):
        step(...)
    for row in summarize_trace("/tmp/trace"):
        print(row)
"""

from __future__ import annotations

import collections
import glob
import os
from typing import List, NamedTuple, Optional


class OpRow(NamedTuple):
    name: str
    total_ms: float
    count: int
    plane: str


def _find_xplanes(trace_dir: str) -> List[str]:
    return sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        )
    )


def _import_xplane_pb2():
    """The xplane proto has moved between TF releases (tsl vs core); try the
    known homes in order and fail with an actionable message (lazy import —
    TF is heavyweight and only needed for --trace-summary)."""
    candidates = (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "xprof.pywrap.protobuf.xplane_pb2",
    )
    import importlib

    for mod in candidates:
        try:
            return importlib.import_module(mod)
        except ImportError:
            continue
    raise ImportError(
        "xplane_pb2 proto not found — trace summaries need a tensorflow "
        "(or tsl/xprof) install that ships the profiler protos; tried: "
        + ", ".join(candidates)
    )


def summarize_trace(
    trace_dir: str,
    top: int = 25,
    plane_filter: Optional[str] = None,
) -> List[OpRow]:
    """Aggregate event durations by op name across trace planes.

    Args:
      trace_dir: directory passed to ``jax.profiler.start_trace``.
      top: max rows returned (most time first).
      plane_filter: substring to select planes (e.g. "TPU", "CPU");
        None = device planes if any exist, else all planes.

    Durations are *accumulated* per op name — async DMA events overlap, so
    the column sums can exceed wall-clock; use it to rank, not to add.
    """
    files = _find_xplanes(trace_dir)
    if not files:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xplane_pb2 = _import_xplane_pb2()

    totals = collections.Counter()
    counts = collections.Counter()
    plane_of = {}
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        planes = list(xs.planes)
        if plane_filter is not None:
            planes = [p for p in planes if plane_filter in p.name]
        else:
            dev = [p for p in planes if "/device:" in p.name and p.lines]
            planes = dev or planes
        for p in planes:
            meta = p.event_metadata
            for line in p.lines:
                for e in line.events:
                    name = meta[e.metadata_id].name
                    if name.isdigit():  # per-step marker annotations
                        continue
                    totals[name] += e.duration_ps
                    counts[name] += 1
                    plane_of.setdefault(name, p.name)
    return [
        OpRow(name, ps / 1e9, counts[name], plane_of[name])
        for name, ps in totals.most_common(top)
    ]


def print_trace_summary(trace_dir: str, top: int = 25, **kw) -> None:
    rows = summarize_trace(trace_dir, top=top, **kw)
    print(f"top {len(rows)} ops by accumulated device time ({trace_dir}):")
    for r in rows:
        print(f"{r.total_ms:10.2f} ms  x{r.count:<7} {r.name[:100]}")
