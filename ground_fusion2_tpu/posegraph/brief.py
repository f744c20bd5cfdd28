"""BRIEF binary descriptors + simhash global descriptor, on device.

Replaces the reference's DBoW2/BRIEF stack (``dense_map/src/ThirdParty``,
``brief_pattern.yml``, ``brief_k10L6.bin`` vocabulary): per-corner 256-bit
BRIEF descriptors from a fixed random pattern, packed into int32 lanes, and a
per-keyframe *simhash bag*: each descriptor (as ±1 vector) is projected by a
fixed random matrix and the signs are averaged — a vocabulary-free stand-in
for the BoW vector whose cosine similarity is one matmul over the whole
keyframe database (MXU-friendly retrieval instead of inverted-index lookup).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_BITS = 256
N_WORDS = N_BITS // 32
PATCH = 24          # pattern half-extent in pixels
GDIM = 128          # global simhash descriptor dim

_rng = np.random.default_rng(42)
_PATTERN = _rng.normal(scale=PATCH / 2.5, size=(N_BITS, 4)).clip(
    -PATCH, PATCH).astype(np.float32)
_PROJ = _rng.normal(size=(N_BITS, GDIM)).astype(np.float32) / np.sqrt(N_BITS)


def _bilinear(img, xy):
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


@jax.jit
def brief_describe(img: jax.Array, uv: jax.Array, valid: jax.Array):
    """Descriptors for corners uv [F, 2] on img [H, W].

    Returns (bits [F, N_WORDS] int32 packed, sign [F, N_BITS] ±1 float for
    the simhash path).
    """
    pat = jnp.asarray(_PATTERN)
    p1 = uv[:, None, :] + pat[None, :, 0:2]
    p2 = uv[:, None, :] + pat[None, :, 2:4]
    i1 = _bilinear(img, p1)
    i2 = _bilinear(img, p2)
    bits = (i1 < i2)
    sign = jnp.where(bits, 1.0, -1.0) * valid[:, None]

    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, N_WORDS, 32).astype(jnp.uint32) << shifts[None, None]
    packed = jnp.sum(words, axis=-1, dtype=jnp.uint32)  # disjoint bits: sum==or
    return packed, sign


@jax.jit
def global_descriptor(sign: jax.Array, valid: jax.Array):
    """Simhash bag over a keyframe's descriptors: [F, N_BITS] -> [GDIM]."""
    proj = sign @ jnp.asarray(_PROJ)             # [F, GDIM]
    h = jnp.tanh(proj)                            # soft sign
    g = jnp.sum(h * valid[:, None], axis=0)
    return g / jnp.maximum(jnp.linalg.norm(g), 1e-6)


@jax.jit
def hamming(a: jax.Array, b: jax.Array):
    """Pairwise Hamming distance between packed descriptor sets
    a [Na, W], b [Nb, W] -> [Na, Nb]."""
    x = (a[:, None, :] ^ b[None, :, :]).astype(jnp.uint32)
    # popcount via bit tricks (uint32)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    cnt = (x * 0x01010101) >> 24
    return jnp.sum((cnt & 0xFF).astype(jnp.int32), axis=-1)
