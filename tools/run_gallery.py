"""Run the FULL example gallery in smoke mode and record per-script results.

This is the repo's analog of the reference's CI policy (ref
tests/test_examples.py:6-26 executes every example script every run, sharded
via NODE_TOTAL/NODE_INDEX). Here we run every top-level example with
OMG_SMOKE=1 across N worker processes and commit the evidence as
EXAMPLES_r{N}.json: {script: {ok, wall_s}} plus a summary line.

Usage:  python tools/run_gallery.py [--workers 2] [--out EXAMPLES_r05.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES_DIR = os.path.join(REPO, "examples")


def run_one(rel, timeout=2400):
    env = dict(os.environ, OMG_SMOKE="1", MPLBACKEND="Agg")
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    t0 = time.time()
    # run from the script's own directory (subdir examples load .nc/.pickle
    # assets with relative paths)
    cwd = os.path.join(EXAMPLES_DIR, os.path.dirname(rel)) or EXAMPLES_DIR
    try:
        result = subprocess.run(
            [sys.executable, os.path.basename(rel)], cwd=cwd, env=env,
            capture_output=True, text=True, timeout=timeout)
        ok = result.returncode == 0
        tail = "" if ok else (result.stdout[-800:] + result.stderr[-1600:])
    except subprocess.TimeoutExpired:
        ok, tail = False, f"TIMEOUT after {timeout}s"
    return rel, ok, round(time.time() - t0, 1), tail


def collect_scripts():
    scripts = sorted(f for f in os.listdir(EXAMPLES_DIR)
                     if f.endswith(".py") and not f.startswith("_"))
    for sub in ("GCode_examples", "gui_examples"):
        subdir = os.path.join(EXAMPLES_DIR, sub)
        if os.path.isdir(subdir):
            scripts += sorted(
                os.path.join(sub, f) for f in os.listdir(subdir)
                if f.endswith(".py") and not f.startswith("_"))
    return scripts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "EXAMPLES_r05.json"))
    ap.add_argument("--filter", default=None,
                    help="only run scripts whose path contains one of "
                         "these comma-separated substrings; results merge "
                         "into --out")
    args = ap.parse_args()

    all_scripts = collect_scripts()
    pats = args.filter.split(",") if args.filter else None
    scripts = [s for s in all_scripts
               if pats is None or any(p in s for p in pats)]
    print(f"running {len(scripts)} examples with {args.workers} workers",
          flush=True)
    t0 = time.time()
    results = {}
    if args.filter and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("results", {})
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        for fname, ok, wall, tail in ex.map(run_one, scripts):
            results[fname] = {"ok": ok, "wall_s": wall}
            status = "ok" if ok else "FAIL"
            print(f"  [{status}] {fname} ({wall}s)", flush=True)
            if not ok:
                results[fname]["tail"] = tail
                print(tail[-1200:], flush=True)

    n_ok = sum(1 for r in results.values() if r["ok"])
    summary = {
        "passed": n_ok, "total": len(results),
        "wall_s": round(time.time() - t0, 1),
        "mode": "smoke (OMG_SMOKE=1, 2 MPC steps per closed loop)",
        "command": f"python tools/run_gallery.py --workers {args.workers}",
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1,
                  sort_keys=True)
    print(json.dumps(summary), flush=True)
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
