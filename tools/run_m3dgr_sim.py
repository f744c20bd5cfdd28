#!/usr/bin/env python
"""Generate + replay an M3DGR-format sequence end-to-end and print ATE.

The runnable form of the north-star check (reference ``README.md:146-189``):

    python tools/run_m3dgr_sim.py [--duration 12] [--no-lidar] [--out seq.gf2log]

Writes a TUM trajectory next to the log and prints one JSON line with the
ATE numbers.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ground_fusion2_tpu.config.loader import load_config            # noqa: E402
from ground_fusion2_tpu.data.m3dgr_sim import (                     # noqa: E402
    generate_m3dgr_log, replay_m3dgr_log)
from ground_fusion2_tpu.eval.metrics import ate_rmse                # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/m3dgr.yaml")
    ap.add_argument("--duration", type=float, default=12.0)
    ap.add_argument("--num-feats", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-lidar", action="store_true")
    ap.add_argument("--out", default=None, help="log path (default: temp)")
    args = ap.parse_args()

    cfg = load_config(args.config)
    path = args.out or str(Path(tempfile.mkdtemp()) / "m3dgr_sim.gf2log")
    t0 = time.time()
    generate_m3dgr_log(path, cfg, duration=args.duration,
                       with_lidar=not args.no_lidar, seed=args.seed)
    t1 = time.time()
    res = replay_m3dgr_log(path, cfg, num_feats=args.num_feats,
                           use_lidar=not args.no_lidar)
    t2 = time.time()

    out = {
        "sequence": Path(path).name,
        "duration_s": args.duration,
        "vio_frames": len(res.est_p_vio),
        "fused_frames": len(res.est_p),
        "switches": res.n_switches,
        "gen_s": round(t1 - t0, 1),
        "replay_s": round(t2 - t1, 1),
    }
    if len(res.est_p_vio) > 3:
        out["ate_vio_m"] = round(ate_rmse(res.est_p_vio, res.gt_p_vio,
                                          align=True), 4)
    if len(res.est_p) > 3:
        out["ate_fused_m"] = round(ate_rmse(res.est_p, res.gt_p, align=True), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
