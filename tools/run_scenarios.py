#!/usr/bin/env python3
"""Degraded-scenario validation campaign — ONE command (VERDICT r4 item 1).

Renders the M3DGR-taxonomy scenario sequences (60–180 s each, converted-bag
TLV format, real m3dgr calibration) and replays every one through the FULL
fused stack (LVIO + degeneracy switch + loop closure + global fusion + mesh
+ occupancy), emitting a per-scenario ATE/switch table (markdown + JSON).

  python tools/run_scenarios.py out/campaign [--scenario NAME] [--fresh]

The same rows are CI-gated by tests/test_scenarios.py (slow tier).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--tpu", action="store_true",
                    help="keep the default (TPU) platform; by default the "
                         "campaign runs on CPU — the replay is many small "
                         "dispatches and a remote-tunnel TPU pays ~25 ms "
                         "latency per dispatch")
    ap.add_argument("--scenario", default=None,
                    help="run one scenario (default: all)")
    ap.add_argument("--config", default="configs/m3dgr.yaml")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-feats", type=int, default=96)
    ap.add_argument("--no-full-stack", action="store_true",
                    help="LVIO only (skip loop/mesh/occupancy/global)")
    ap.add_argument("--fresh", action="store_true",
                    help="re-render logs even if cached")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: ~90 s of XLA compiles on the first run.
    # Overridable so concurrent invocations don't share one cache dir
    # (round-4's segfault was concurrent access to a shared cache).
    import os
    cache_dir = os.environ.get("GF2_CAMPAIGN_CACHE",
                               "/root/.jax_cache_campaign")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ground_fusion2_tpu.data.scenarios import SCENARIOS, run_scenario

    names = [args.scenario] if args.scenario else list(SCENARIOS)
    rows = []
    for name in names:
        t0 = time.time()
        row = run_scenario(name, args.workdir, config_path=args.config,
                           seed=args.seed, num_feats=args.num_feats,
                           full_stack=not args.no_full_stack,
                           reuse_log=not args.fresh)
        row["wall_s"] = round(time.time() - t0, 1)
        spec = SCENARIOS[name]
        row["gate_ate_fused"] = spec.max_ate_fused
        row["pass"] = bool(
            row.get("ate_fused", 9e9) <= spec.max_ate_fused
            and row.get("switches", 0) >= spec.min_switches)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = Path(args.workdir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "campaign.json", "w") as f:
        json.dump(rows, f, indent=1)

    cols = ["scenario", "taxonomy", "duration_s", "frames", "switches",
            "loops", "ate_vio", "ate_fused", "gate_ate_fused", "pass"]
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "---|" * len(cols)]
    for r in rows:
        lines.append("| " + " | ".join(str(r.get(c, "—")) for c in cols)
                     + " |")
    table = "\n".join(lines)
    (out / "campaign.md").write_text(table + "\n")
    print(table, flush=True)
    if not all(r["pass"] for r in rows):
        sys.exit(1)


if __name__ == "__main__":
    main()
