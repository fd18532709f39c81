"""Parse the latest xplane trace and print top TPU ops by total duration.

Reads the raw XSpace proto (tensorflow.core.profiler xplane) directly —
the tbp converter pipeline is version-mismatched in this image.
"""

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sd_trace"


def main() -> None:
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(
        glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    space = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: plane.event_metadata[m.id].name for m in plane.event_metadata.values()}
        totals: dict = defaultdict(float)
        counts: dict = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
        if not totals:
            continue
        print(f"== plane: {plane.name} (lines: {[l.name for l in plane.lines]})")
        items = sorted(totals.items(), key=lambda kv: -kv[1])
        total = sum(totals.values())
        print(f"total op time: {total:.1f} ms")
        for name, ms in items[:40]:
            print(f"{ms:9.2f} ms  x{counts[name]:4d}  {name[:110]}")
        break


if __name__ == "__main__":
    main()
