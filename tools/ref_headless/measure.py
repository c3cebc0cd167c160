#!/usr/bin/env python
"""Measure the reference pipeline's CPU wall-clock per sequence.

Builds the headless reference binary (build.sh) and runs it on the four
benchmark sequences with the same config overrides bench.py uses, at the
reference's own defaults otherwise (init_size=700, RANSAC 1500, 8 threads).
Records best-of-N stitch+preview seconds (the quantity bench.py calls
``seconds``) plus full-res render time where bench.py measures one, into
/root/repo/ref_baseline.json, which bench.py then gates against.

Run:  python tools/ref_headless/measure.py [--repeats N]
"""
import argparse
import glob
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
RES = "/root/reference/results"

# name -> (glob, overrides, measure_full)  — mirrors bench.py SEQUENCES
SEQUENCES = {
    "map": (f"{RES}/map/budapest*.jpg", [], True),
    "brocken": (f"{RES}/brocken/resized*.jpg", [], False),
    "front": (f"{RES}/front/resized*.jpg", ["cut=true"], False),
    "FKH360": (f"{RES}/FKH360/resized*.jpg", ["proj=CYLINDRICAL"], True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    subprocess.run([os.path.join(HERE, "build.sh")], check=True)
    binary = os.environ.get("BIN", "/tmp/ref_headless")

    out = {"binary": binary, "repeats": args.repeats,
           "note": "reference (SimplePanorama) compiled headlessly, "
                   "measured on this machine's CPU at its own defaults; "
                   "seconds = stitch+preview (best of repeats)"}
    seqs = {}
    for name, (pattern, overrides, full) in SEQUENCES.items():
        paths = sorted(glob.glob(pattern))
        cmd = [binary] + paths + overrides + (["--full"] if full else [])
        best = None
        for r in range(args.repeats):
            res = subprocess.run(cmd, capture_output=True, text=True)
            if res.returncode != 0:
                print(f"{name}: FAILED\n{res.stderr[-2000:]}", file=sys.stderr)
                sys.exit(1)
            j = json.loads(res.stdout.strip().splitlines()[-1])
            if best is None or j["stitch_s"] + j["preview_s"] < best["stitch_s"] + best["preview_s"]:
                best = j
            print(f"{name} run {r}: stitch {j['stitch_s']:.2f}s preview "
                  f"{j['preview_s']:.2f}s full {j['full_s']:.2f}s", file=sys.stderr)
        sec = best["stitch_s"] + best["preview_s"]
        seqs[name] = {
            "images": len(paths),
            "seconds": round(sec, 3),
            "images_per_s": round(len(paths) / sec, 4),
            "full_res_render_s": round(best["full_s"], 3) if full else None,
            "connected": best["connected"],
        }
    out["sequences"] = seqs
    with open(os.path.join(REPO, "ref_baseline.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
