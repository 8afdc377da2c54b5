"""Preset-matrix bench automation (VERDICT r4 item 7): one run measures
every serving preset through the same bench.py supervisor the driver
uses, records each preset's degrade-chain decision (packed / gather_pack
/ taps resolved per geometry), and emits BOTH one JSON document
(``bench_presets.json``) and the BENCHMARKS.md preset table as markdown —
so future lever rounds re-verify every preset, not just the north-star.

Usage:
    python scripts/bench_presets.py [--only north_star,...] [--out FILE]

Each preset is a full tunnel-chip measurement (compile + timed iters);
expect ~10-25 min/preset cold, less with the persistent compile cache.
The 1056x1920 preset is NOT runnable single-chip (six measured failure
modes, BENCHMARKS.md round-4) and is emitted as a static annotation row
pointing at its deployment shape (--spatial 2 + --feat_chunk 2).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Env deltas per preset on top of the bench defaults (fp8 tables, fp8
# residual, fused residual, gather_pack 2, 6x6 tables, block 8 — bench.py
# resolves the degrade chain per geometry exactly like the infer driver).
PRESETS = {
    "north_star_864x1152_v5": {},
    "tnt_544x1024_v7": {
        "BENCH_SIZE": "544x1024", "BENCH_VIEWS": "7",
        "BENCH_SAMPLER": "inverse_bounded",
    },
    "dtu_600x800_v7": {"BENCH_SIZE": "600x800", "BENCH_VIEWS": "7"},
}

UNRUNNABLE = {
    "tnt_1056x1920_v7": {
        "status": "not-runnable-single-chip",
        "note": "six measured single-chip failure modes (HBM OOM / compile "
        "SIGKILL / tunnel worker crash, BENCHMARKS.md round-4); deploy "
        "--spatial 2 --feat_chunk 2 (sharding validated by "
        "dryrun_multichip's spatial-halo equality check)",
    },
}


def run_preset(name: str, env_delta: dict, deadline: float) -> dict:
    env = dict(os.environ, **{k: str(v) for k, v in env_delta.items()},
               BENCH_DEADLINE_S=str(deadline))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=deadline + 120,
    )
    sys.stderr.write(proc.stderr[-2000:])
    rec = None
    for line in reversed(proc.stdout.splitlines()):
        if line.strip().startswith("{"):
            rec = json.loads(line)
            break
    assert rec is not None, f"{name}: no JSON from bench.py"
    rec["preset"] = name
    rec["wall_s"] = round(time.time() - t0, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", help="comma-separated preset subset")
    ap.add_argument("--out", default=os.path.join(_ROOT, "bench_presets.json"))
    ap.add_argument("--deadline", type=float, default=2700.0)
    args = ap.parse_args()
    names = (args.only.split(",") if args.only else list(PRESETS))

    rows = []
    for name in names:
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        rows.append(run_preset(name, PRESETS[name], args.deadline))
    for name, ann in UNRUNNABLE.items():
        rows.append(dict(preset=name, **ann))

    with open(args.out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)

    print("| preset | maps/s | config resolved | bound | roofline |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "value" not in r:
            print(f"| {r['preset']} | — | {r['status']} | — | — |")
            continue
        c = r.get("config", {})
        resolved = (
            f"packed={c.get('packed_rows')} pack={c.get('gather_pack')} "
            f"taps={c.get('table_taps')} block={c.get('depth_block')} "
            f"tables={c.get('table_dtype')} residual={c.get('residual_dtype')}"
        )
        print(f"| {r['preset']} | {r['value']} | {resolved} | "
              f"{r.get('bound', '?')} | {r.get('roofline_fraction', '?')} |")
    print(f"written: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
