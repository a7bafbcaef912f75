"""Commit the multi-chip AOT audit as a per-round artifact (VERDICT r3
item 6): run tools/northstar_aot.py across the v5e topology ladder and
collect the JSON rows into AOT_r{N}.json.

Rows per topology: the 1-D gy decomposition (round-1 baseline) and the
2-D (gy, gx) seam-strip OVERLAP decomposition (the production choice
past ~32 chips — 128-lane x alignment per gx shard, 8-row y alignment
amortised over fewer gy shards); at 128 chips additionally the
ALL_DEFINED fast path.  Each row records collective counts/placement,
per-chip HBM, padded live fraction, and compile health for the EXACT
production program (the same one tests/test_parallel_fused.py checks
numerically on the 8-device CPU mesh).

Usage: python tools/aot_artifact.py [--out AOT_r04.json]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: (topology, chips, extra args) — gy/gx per PERF.md "Config-5 AOT"
ROWS = [
    ("v5e:4x4", ["--gy", "16", "--gx", "1"]),
    ("v5e:4x4", ["--gy", "4", "--gx", "4", "--overlap"]),
    ("v5e:4x8", ["--gy", "32", "--gx", "1"]),
    ("v5e:4x8", ["--gy", "8", "--gx", "4", "--overlap"]),
    ("v5e:8x8", ["--gy", "8", "--gx", "8", "--overlap"]),
    ("v5e:8x16", ["--gy", "16", "--gx", "8", "--overlap"]),
    ("v5e:8x16", ["--gy", "16", "--gx", "8", "--overlap",
                  "--all-defined"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="AOT_r04.json")
    args = ap.parse_args()

    rows = []
    for topo, extra in ROWS:
        cmd = [sys.executable, os.path.join(REPO, "tools",
                                            "northstar_aot.py"),
               "--topology", topo] + extra
        t0 = time.time()
        res = subprocess.run(cmd, cwd=REPO, capture_output=True,
                             text=True, timeout=1800)
        if res.returncode != 0:
            rows.append({"topology": topo, "args": extra, "ok": False,
                         "error": res.stderr[-2000:]})
            print(f"FAIL {topo} {extra}: {res.stderr[-300:]}", flush=True)
            continue
        row = json.loads(res.stdout.strip().splitlines()[-1])
        row["wall_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(f"{topo} {extra}: permutes "
              f"{row['collective_permutes_async']}a/"
              f"{row['collective_permutes_sync']}s, "
              f"HBM {row['per_chip_memory']}, compile "
              f"{row['compile_s']}s", flush=True)

    doc = {"workload": "config5_isobaric_global_0.25deg_137L",
           "generated_by": "tools/aot_artifact.py",
           "rows": rows,
           "ok": all(r.get("ok") for r in rows)}
    path = os.path.join(REPO, args.out)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("wrote", path, "ok =", doc["ok"])


if __name__ == "__main__":
    main()
