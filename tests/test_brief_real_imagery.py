"""Real-imagery sanity check for the simhash place-recognition descriptor
(VERDICT r3 item 10): round-3 tuned ``sim_thresh``/``hamming_max`` only on
self-rendered scenes; this validates the margins on real photographs
(public images shipped in the reference tree's docs — real camera/texture
content, not our renderer's output).
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.frontend import klt
from ground_fusion2_tpu.posegraph import brief
from ground_fusion2_tpu.posegraph.pose_graph import PoseGraphConfig

DOC = pathlib.Path("/root/reference/Ground-Fusion++/lio/doc")
IMAGES = ["hku_avia.png", "staircase.png", "nclt.png", "line_image.png",
          "vm.png"]

pytestmark = pytest.mark.skipif(
    not DOC.exists(), reason="reference image pack not mounted")


def _load_gray(name, crop=None):
    from PIL import Image
    im = Image.open(DOC / name).convert("L")
    a = np.asarray(im, np.float32) / 255.0
    if crop is not None:
        y, x = crop
        a = a[y:y + 480, x:x + 640]
    return a


def _gdesc(img):
    uv, ok = _corners(img)
    _, sign = brief.brief_describe(jnp.asarray(img), uv, ok)
    return np.asarray(brief.global_descriptor(sign, ok)), (uv, ok)


def _corners(img, n=64):
    resp = klt.shi_tomasi(jnp.asarray(img))
    uv, _, ok = klt.detect_grid(resp, jnp.zeros((0, 2)), 24, n,
                                occupied_mask=jnp.zeros((0,)), border=28)
    return uv, ok


def test_real_self_similarity_beats_threshold():
    """A re-observation of the same real scene (small shift + brightness
    change — a mild viewpoint/exposure proxy) must clear ``sim_thresh``."""
    cfg = PoseGraphConfig()
    for name in IMAGES[:3]:
        img = _load_gray(name, crop=(40, 60))
        g1, _ = _gdesc(img)
        # shifted + brightness-scaled re-observation
        img2 = np.roll(np.roll(img, 3, axis=0), 4, axis=1) * 0.9 + 0.03
        g2, _ = _gdesc(np.clip(img2, 0, 1))
        sim = float(g1 @ g2)
        assert sim > cfg.sim_thresh, (name, sim)


def test_real_cross_similarity_below_threshold():
    """Distinct real scenes must NOT retrieve each other."""
    cfg = PoseGraphConfig()
    gs = []
    for name in IMAGES:
        g, _ = _gdesc(_load_gray(name, crop=(40, 60)))
        gs.append(g)
    worst = -1.0
    for a in range(len(gs)):
        for b in range(a + 1, len(gs)):
            worst = max(worst, float(gs[a] @ gs[b]))
    assert worst < cfg.sim_thresh, worst


def test_real_disjoint_crops_below_threshold():
    """Different regions of the SAME photo (different visual content) must
    not alias — the hardest negative for a global descriptor."""
    cfg = PoseGraphConfig()
    img = _load_gray(IMAGES[2])            # large real photo
    g1, _ = _gdesc(img[:480, :640])
    g2, _ = _gdesc(img[-480:, -640:])
    sim = float(g1 @ g2)
    assert sim < cfg.sim_thresh, sim


def test_real_feature_hamming_margins():
    """Per-feature BRIEF: self-matches (slightly shifted sampling) stay
    under ``hamming_max``; unrelated corners land far above it."""
    cfg = PoseGraphConfig()
    img = jnp.asarray(_load_gray(IMAGES[0], crop=(40, 60)))
    uv, ok = _corners(img)
    d1, _ = brief.brief_describe(img, uv, ok)
    d2, _ = brief.brief_describe(img, uv + 0.7, ok)
    ham = np.asarray(brief.hamming(d1, d2))
    okn = np.asarray(ok) > 0
    self_d = np.diag(ham)[okn]
    assert np.median(self_d) < cfg.hamming_max, np.median(self_d)
    off = np.diag(np.asarray(brief.hamming(d1, jnp.roll(d1, 1, axis=0))))
    assert off[okn].mean() > cfg.hamming_max, off[okn].mean()
