"""Summarize an xplane.pb: top ops by total duration on the device plane."""
import sys, glob, collections

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1] if len(sys.argv) > 1 else sorted(
    glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True))[-1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())

for plane in xs.planes:
    total_by_name = collections.Counter()
    count_by_name = collections.Counter()
    ev_total = 0
    n_events = 0
    for line in plane.lines:
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            name = meta.name
            dur = ev.duration_ps / 1e9  # ms
            total_by_name[name] += dur
            count_by_name[name] += 1
            ev_total += dur
            n_events += 1
    if n_events == 0:
        continue
    print(f"=== plane: {plane.name}  events={n_events} total={ev_total:.2f} ms")
    for name, ms in total_by_name.most_common(40):
        print(f"  {ms:9.3f} ms  x{count_by_name[name]:<6d} {name[:110]}")
