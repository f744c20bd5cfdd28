#!/usr/bin/env python
"""Drive the whole pipeline on a synthetic ground-robot sequence.

Prints per-frame estimated vs ground-truth poses and the final ATE — the
quick end-to-end verification drive (see .claude/skills/verify/SKILL.md).

    timeout 600 python examples/run_synthetic.py [duration]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np                                            # noqa: E402

from ground_fusion2_tpu.data.runner import run_synthetic_sequence  # noqa: E402
from ground_fusion2_tpu.eval.metrics import ate_rmse               # noqa: E402


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    res = run_synthetic_sequence(duration=duration, pix_noise=0.5 / 460.0,
                                 imu_noise=True, seed=1, num_feats=64)
    init = [i for i, o in enumerate(res.outputs) if o.initialized]
    for i in range(0, len(res.outputs), 5):
        o = res.outputs[i]
        e = np.linalg.norm(res.est_p[i] - res.gt_p[i])
        print(f"t={o.t:5.2f}  est={np.round(res.est_p[i], 3)}  "
              f"gt={np.round(res.gt_p[i], 3)}  |err|={e:.4f}  "
              f"init={int(o.initialized)} kf={int(o.is_keyframe)} "
              f"trk={o.tracked}")
    if init:
        s = init[0]
        print(f"ATE (post-init): {ate_rmse(res.est_p[s:], res.gt_p[s:], align=False):.4f} m "
              f"over {len(res.outputs) - s} frames")
    else:
        print("estimator never initialized!")


if __name__ == "__main__":
    main()
