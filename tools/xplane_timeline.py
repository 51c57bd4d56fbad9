"""Timeline view of the latest xplane trace: per-line busy time, gaps on the
main compute line, and the top ops per line. Distinguishes critical-path
compute from overlapped async copies (which inflate naive duration sums).

Usage: python tools/xplane_timeline.py [trace_dir] [top_n]
"""

import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xplane_prof"
TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 12


def newest_xplane(root):
    paths = []
    for r, _d, files in os.walk(root):
        paths += [os.path.join(r, f) for f in files if f.endswith(".xplane.pb")]
    return max(paths, key=os.path.getmtime)


def merged_busy(intervals):
    if not intervals:
        return 0.0
    intervals.sort()
    busy = 0.0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy += cur_e - cur_s
    return busy


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = newest_xplane(TRACE_DIR)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        pname = plane.name
        low = pname.lower()
        if "host" in low and "tpu" not in low and "device" not in low:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if not line.events:
                continue
            per_op = defaultdict(float)
            counts = defaultdict(int)
            intervals = []
            t_min, t_max = float("inf"), 0.0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                start = (line.timestamp_ns * 1e3 + ev.offset_ps) / 1e9  # ms
                per_op[name] += dur
                counts[name] += 1
                intervals.append((start, start + dur))
                t_min = min(t_min, start)
                t_max = max(t_max, start + dur)
            busy = merged_busy(intervals)
            span = t_max - t_min
            print(f"\n== plane '{pname}' line '{line.name}' "
                  f"({len(line.events)} events) ==")
            print(f"   span {span:9.2f} ms  busy {busy:9.2f} ms  "
                  f"idle {span - busy:9.2f} ms")
            for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:TOP_N]:
                print(f"   {ms:9.2f} ms x{counts[name]:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
