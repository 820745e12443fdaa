"""Summarize the TPU experiment queue's logs (/tmp/*.log) into one table.

The round-3 relay-outage watcher (/tmp/tpu_watch.sh) runs, on recovery:
the fp64 verify drive, a full bench.py, a ROCQ_LANE_DOT_WIDTH sweep, a
ROCQ_DOT_PRECISION=high probe, and a ROCQ_GEOMETRY sweep — each logging a
JSON line. Run this to collect them.
"""

import glob
import json
import os


def last_json(path):
    try:
        lines = open(path).read().splitlines()
    except OSError:
        return None
    for line in reversed(lines):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def main(out_path=None):
    out_lines = []

    def emit(line):
        print(line)
        out_lines.append(line)

    rows = []
    bench = last_json("/tmp/bench_run.log")
    if bench:
        rows.append(("bench (default)", bench))
    for path in sorted(glob.glob("/tmp/lane_w*.log")
                       + glob.glob("/tmp/geo_*.log")
                       + glob.glob("/tmp/dotprec_*.log")):
        rec = last_json(path)
        if rec:
            rows.append((os.path.basename(path)[:-4], rec))
    if not rows:
        print("no queue results yet (check /tmp/tpu_watch.log)")
        return
    for name, rec in rows:
        key = next((k for k in ("ansatz_gates_per_sec", "value")
                    if k in rec), None)
        headline = f"{rec.get(key)} " if key else ""
        emit(f"{name:24s} {headline}{json.dumps(rec)[:160]}")
    for name, verify in (("fp64", "/tmp/verify_fp64.log"),
                         ("mixed-geometry", "/tmp/verify_mixed.log")):
        if os.path.exists(verify):
            txt = open(verify).read()
            emit(f"{name} verify: "
                 + ("OK" if "VERIFY-OK" in txt else "(no OK line)"))
    if out_path and out_lines:
        with open(out_path, "w") as f:
            f.write("# TPU queue results (auto-harvested)\n\n```\n"
                    + "\n".join(out_lines) + "\n```\n")


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else None)
