"""Device-time op breakdown from jax.profiler traces.

The reference has no profiling of any kind (SURVEY.md §5); here per-op
device time is a first-class tool: `op_breakdown(fn, *args)` captures a
jax.profiler trace of `fn`, parses the XLA device plane from the
`.xplane.pb` dump, and returns exclusive device milliseconds per op
family. This is the tool that located the framework's two largest step
costs to date (the jnp.pad-reflect s32 iota/select expansion and the
Pallas warp backward share — docs/DESIGN.md §8a).

Parsing uses the XSpace protobuf schema bundled with the installed
tensorflow package (CPU build, present in this image); everything is
gated so the module works — returning empty results with a warning —
when the proto schema is unavailable.
"""

from __future__ import annotations

import collections
import glob
import os
import tempfile
from typing import Callable, Dict, List, Optional, Tuple

import jax

from unsupervised_pseuso_lidar_tpu.utils.profiling import hard_sync


def _load_xspace(path: str):
    """Parse one .xplane.pb file; None if the proto schema is missing."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        try:
            from tensorflow.core.profiler.protobuf import xplane_pb2
        except Exception:
            return None
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def _op_family(name: str) -> str:
    """HLO instruction name -> op family (strip %, SSA ids, digits)."""
    base = name.split(" = ")[0].strip("%")
    base = base.split(".")[0]
    return "".join(c for c in base if not c.isdigit()) or base


def summarize_xplane(
    path: str, plane_substr: str = "/device:", collapse: bool = True
) -> List[Tuple[str, float, int]]:
    """[(op_family, total_ms, count)] for the first matching device plane.

    collapse=False keeps full HLO instruction names (one row per
    instruction) instead of op families — cross-reference the names
    against `jitted.lower(...).compile().as_text()` to see exactly what a
    hot fusion computes.

    Falls back to the host plane when no device plane exists (CPU-backend
    traces put XLA ops on the host plane).
    """
    xspace = _load_xspace(path)
    if xspace is None:
        return []
    planes = [p for p in xspace.planes if plane_substr in p.name]
    if not planes:
        planes = [p for p in xspace.planes if "/host:CPU" in p.name]
    if not planes:
        return []
    plane = max(
        planes,
        key=lambda p: sum(
            ev.duration_ps for line in p.lines for ev in line.events
        ),
    )
    ev_names = {m.id: m.name for m in plane.event_metadata.values()}
    durs: Dict[str, float] = collections.defaultdict(float)
    counts: Dict[str, int] = collections.Counter()
    # prefer the exclusive-time "XLA Ops" line; otherwise take all lines
    xla_ops_lines = [l for l in plane.lines if l.name == "XLA Ops"]
    for line in xla_ops_lines or plane.lines:
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
            fam = _op_family(name) if collapse else name
            durs[fam] += ev.duration_ps / 1e9  # ps -> ms
            counts[fam] += 1
    return sorted(
        ((k, v, counts[k]) for k, v in durs.items()),
        key=lambda t: -t[1],
    )


def op_breakdown(
    fn: Callable,
    *args,
    steps: int = 5,
    warmup: int = 2,
    trace_dir: Optional[str] = None,
    top: int = 20,
    verbose: bool = True,
) -> Dict[str, float]:
    """Run `fn(*args)` under a jax.profiler trace; return ms/step by op family.

    Example::

        step = make_train_step(depth_model, pose_model, tx)
        op_breakdown(lambda: step(state, batch))
    """
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    hard_sync(out)
    tmp = trace_dir or tempfile.mkdtemp(prefix="jax_trace_")
    jax.profiler.start_trace(tmp)
    try:
        for _ in range(steps):
            out = fn(*args)
        hard_sync(out)
    finally:
        jax.profiler.stop_trace()
    dumps = sorted(
        glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not dumps:
        if verbose:
            print("[trace] no .xplane.pb produced; is profiling supported?")
        return {}
    rows = summarize_xplane(dumps[-1])
    if not rows:
        if verbose:
            print(
                "[trace] xplane proto schema unavailable "
                f"(raw trace kept at {dumps[-1]})"
            )
        return {}
    result = {fam: ms / steps for fam, ms, _ in rows}
    if verbose:
        total = sum(result.values())
        print(f"[trace] device time by op family ({total:.2f} ms/step):")
        for fam, ms, count in rows[:top]:
            print(f"  {ms / steps:9.3f} ms/step  x{count:5d}  {fam}")
    return result
