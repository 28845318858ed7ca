"""Aggregate device op self-times from a jax.profiler xplane trace.

The tensorboard_plugin_profile converter in this image is incompatible with
the installed TF (`xspace_to_tools_data` missing), so this parses the
xplane.pb directly (proto from tensorflow/tsl) and prints per-HLO-op
duration totals for the device plane — enough to rank where the step's
milliseconds go.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python -m scripts.read_xplane <logdir-or-xplane.pb> [top_n]
"""

import glob
import sys
from collections import defaultdict


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    if not path.endswith(".xplane.pb"):
        cands = sorted(glob.glob(f"{path}/plugins/profile/*/*.xplane.pb"))
        if not cands:
            raise SystemExit(f"no xplane.pb under {path}")
        path = cands[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


def device_op_times(xs):
    """{op_name: total_ns} over all device (TPU/accelerator) planes,
    counting only leaf-line events (XLA Ops line), plus the plane span."""
    per_op = defaultdict(float)
    span = 0.0
    for plane in xs.planes:
        if not (plane.name.startswith("/device")
                or "TPU" in plane.name or "Device" in plane.name):
            continue
        stats_meta = {i: m.name for i, m in plane.stat_metadata.items()}
        ev_meta = {i: m for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA Ops / XLA TraceMe lines carry per-op events; steps lines
            # carry aggregate markers. Prefer the op lines.
            if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                pass
            if line.name == "XLA Modules":
                for ev in line.events:
                    span += ev.duration_ps / 1e3
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                # control-flow wrappers re-count their children
                if name.lstrip("%").startswith(("while", "conditional",
                                                "call")):
                    continue
                per_op[name] += ev.duration_ps / 1e3  # -> ns
        del stats_meta
    return per_op, span


def classify(name):
    n = name.lower()
    if "fusion" in n:
        return "fusion"
    for k in ("copy", "convert", "transpose", "reshape", "bitcast"):
        if k in n:
            return "data-movement"
    for k in ("dot", "conv"):
        if k in n:
            return "matmul"
    if "custom-call" in n or "tpu_custom_call" in n:
        return "custom-call(pallas)"
    for k in ("all-reduce", "all-gather", "reduce-scatter", "collective"):
        if k in n:
            return "collective"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/scatter"
    return "other"


def main():
    xs, path = load(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    per_op, span = device_op_times(xs)
    total = sum(per_op.values())
    print(f"# {path}")
    print(f"device op time total: {total/1e6:.3f} ms"
          + (f"  (module span {span/1e6:.3f} ms)" if span else ""))
    by_class = defaultdict(float)
    for name, ns in per_op.items():
        by_class[classify(name)] += ns
    for cls, ns in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {cls:22s} {ns/1e6:9.3f} ms  {100*ns/max(total,1):5.1f}%")
    print()
    for name, ns in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ns/1e6:9.3f} ms  {100*ns/max(total,1):5.1f}%  {name}")


if __name__ == "__main__":
    main()
