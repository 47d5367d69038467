"""Accuracy-vs-iteration-budget frontier.

The eval forward is structurally budget-bound: the round-4 trace showed no
single consumer >21%, so "further gains need algorithmic changes — fewer or
cheaper iterations" (BENCHLOG r4 #7). This tool measures exactly that
trade: a grid over (render_iters x gru_iters) — the reference's
RENDER_ITER_COUNT x ITER_COUNT budget
(`config/linemod/template_fw0.5.yml:76-81`) — recording, per point,

  * held-out accuracy (ADD(-S) thresholds + mean distances + rot/trans
    errors) of a TRAINED checkpoint on its eval split, via the real eval
    pipeline (EvalRunner / make_frame_stream);
  * device throughput (fps B=1 and B=8) at that budget via the bench.py
    chain protocol (anti-relay-dedup, host-read-in-window).

Usage:
  python -m rnnpose_tpu.tools.budget_frontier \
      --config_path .data/synlm/train_config.yml \
      --ckpt_path .data/runs/sustained/rnnpose-20000 \
      [--grid 3x4,3x3,3x2,2x4,2x3,2x2,1x4] [--max_frames 64] \
      [--skip_fps] [--out frontier.json]

Output: one JSON line per grid point + a markdown table, and --out gets the
full JSON list (the BENCHLOG artifact).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--grid", type=str, default="3x4,3x3,3x2,2x4,2x3,2x2,1x4",
                   help="comma-separated RxG points (R=render_iters, "
                   "G=gru_iters); 3x4 is the shipping/reference budget")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--eval_batch", type=int, default=1)
    p.add_argument("--desc_tail_res", choices=("full", "half"), default=None)
    p.add_argument("--skip_fps", action="store_true",
                   help="accuracy only (e.g. when running on CPU)")
    p.add_argument("--out", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from .eval import main as eval_main

    points = []
    for spec in args.grid.split(","):
        r, g = (int(x) for x in spec.strip().split("x"))
        points.append((r, g))

    # bench.py lives at the repo root (driver contract), two levels up.
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    rows = []
    for r, g in points:
        eval_argv = [
            "--config_path", args.config_path, "--ckpt_path", args.ckpt_path,
            "--render_iters", str(r), "--gru_iters", str(g),
            "--eval_batch", str(args.eval_batch),
        ]
        if args.max_frames:
            eval_argv += ["--max_frames", str(args.max_frames)]
        if args.desc_tail_res:
            eval_argv += ["--desc_tail_res", args.desc_tail_res]
        overall = eval_main(eval_argv)
        row = {
            "render_iters": r,
            "gru_iters": g,
            **{k: round(float(v), 5) for k, v in overall.items()},
        }
        if not args.skip_fps:
            import bench

            fps1, gf1, reps1 = bench.measure_fps(1, r, g)
            fps8, gf8, reps8 = bench.measure_fps(8, r, g)
            row.update({
                "fps_b1": round(fps1, 2), "fps_b8": round(fps8, 2),
                "fps_b1_runs": [round(x, 2) for x in reps1],
                "fps_b8_runs": [round(x, 2) for x in reps8],
                "gflops_per_frame_b1": round(gf1, 2),
            })
        print("FRONTIER " + json.dumps(row), flush=True)
        rows.append(row)

    # markdown summary
    keys = ["add01", "add005", "add002", "add_dist", "rot_err_deg"]
    have_fps = rows and "fps_b1" in rows[0]
    hdr = "| RxG | " + " | ".join(keys)
    hdr += " | fps B=1 | fps B=8 |" if have_fps else " |"
    print("\n" + hdr)
    print("|" + "---|" * (len(keys) + 1 + (2 if have_fps else 0)))
    for row in rows:
        cells = [f"{row['render_iters']}x{row['gru_iters']}"]
        cells += [f"{row.get(k, float('nan')):.4g}" for k in keys]
        if have_fps:
            cells += [f"{row['fps_b1']:.1f}", f"{row['fps_b8']:.1f}"]
        print("| " + " | ".join(cells) + " |")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.out}")
    return rows


if __name__ == "__main__":
    main()
