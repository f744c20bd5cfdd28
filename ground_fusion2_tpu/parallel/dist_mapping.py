"""Keyframe/map-block-sharded bundle adjustment with halo exchange.

The second distributed axis mandated by BASELINE's north star (SURVEY §5.8,
§7 step 9): beyond the sliding window (landmark-sharded, ``dist_ba.py``),
large-scale *mapping* BA shards the **keyframe axis** across devices. Each
shard owns a contiguous block of keyframes plus every landmark anchored in
the block; visual tracks extend forward up to ``halo`` keyframes, so each
GN iteration:

  1. **halo exchange** — ``lax.ppermute`` ships the first ``halo`` poses of
     each shard to its left neighbour (boundary observations never cross
     more than one shard by construction);
  2. **local reduce** — per-landmark inverse-depth elimination (rank-1
     square-root Schur, same numerics as ``dist_ba``) onto the shard's
     extended pose block;
  3. **global assemble** — scatter the extended block into the global
     [K*6, K*6] reduced system, ``psum`` over the mesh, solve replicated
     (the reduced pose system is tiny next to the landmark reduction);
  4. **local back-substitute** — each shard updates its own landmarks.

Collective budget: ONE ppermute up front (halo poses; afterwards they ride
the replicated solve vector) + ONE fused psum per LM iteration — the
candidate's cost travels in the same payload as its normal equations, and
accept/reject is decided one build later with step backtracking instead of
a second cost rendezvous (round-5 restructure, VERDICT r4 item 5).

The per-device work is constant as shards are added (weak scaling): the
reduction over ``Ks * lpk`` landmarks dominates, the replicated solve grows
only with the global keyframe count.

There is no counterpart in the reference (its mapping is a single-process
ikd-tree, ``mesh/``); this is the TPU-native scale-out path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import lie


class MappingProblem(NamedTuple):
    """Global arrays; leading axis K (keyframes) is the sharded axis."""

    kf_p: jax.Array       # [K, 3]
    kf_q: jax.Array       # [K, 4]
    lm_ray: jax.Array     # [K, Lk, 2] anchor-frame normalized ray
    lm_rho: jax.Array     # [K, Lk] inverse depth
    obs: jax.Array        # [K, Lk, H+1, 2] obs in frames anchor+0..anchor+H
    obs_valid: jax.Array  # [K, Lk, H+1]


def _project(p_c):
    z = jnp.maximum(p_c[..., 2], 0.05)
    return p_c[..., :2] / z[..., None]


def _shard_residuals(p_ext, q_ext, ray, rho, obs, valid, halo):
    """Residuals of one shard's landmarks against its extended pose block.

    p_ext/q_ext: [Ks+halo, ...]; ray [Ks, Lk, 2]; rho [Ks, Lk];
    obs/valid [Ks, Lk, H+1(, 2)]. Returns (r, w) with r [Ks, Lk, H+1, 2].
    """
    Ks, Lk, Ho, _ = obs.shape
    # landmark world positions from anchors (anchor = local index)
    pt = jnp.concatenate([ray, jnp.ones(ray.shape[:-1] + (1,), ray.dtype)], -1)
    p_c = pt / jnp.maximum(rho, 1e-3)[..., None]                  # [Ks, Lk, 3]
    q_a = q_ext[:Ks][:, None]                                     # [Ks, 1, 4]
    p_a = p_ext[:Ks][:, None]
    p_w = lie.quat_rotate(jnp.broadcast_to(q_a, p_c.shape[:-1] + (4,)), p_c) \
        + p_a                                                      # [Ks, Lk, 3]

    # observing frames: local ext index i + d, d = 0..H-1
    d = jnp.arange(Ho)
    idx = jnp.arange(Ks)[:, None] + d[None, :]                    # [Ks, H+1]
    q_o = q_ext[idx]                                              # [Ks, H+1, 4]
    p_o = p_ext[idx]
    # world -> observing camera
    q_inv = lie.quat_conj(q_o)[:, None]                           # [Ks,1,H+1,4]
    rel = p_w[:, :, None, :] - p_o[:, None, :, :]                 # [Ks,Lk,H+1,3]
    p_cj = lie.quat_rotate(
        jnp.broadcast_to(q_inv, rel.shape[:-1] + (4,)), rel)
    pred = _project(p_cj)
    r = pred - obs
    w = valid * (p_cj[..., 2] > 0.05)
    return r, w


def _gn_build(p_ext, q_ext, ray, rho, obs, valid, halo, K, shard_idx, lam):
    """Local normal-equation contribution at (p_ext, q_ext, rho): scattered
    global (H, g, diag) plus this point's LOCAL cost and the landmark
    back-substitution coefficients. NO collectives here — the caller fuses
    everything into one psum."""
    Ks, Lk, Ho, _ = obs.shape
    E = Ks + halo
    dtype = p_ext.dtype

    def r_flat(dpose, drho):
        dp = dpose.reshape(E, 6)
        p2 = p_ext + dp[:, :3]
        q2 = lie.quat_boxplus(q_ext, dp[:, 3:])
        r, w = _shard_residuals(p2, q2, ray, rho + drho, obs, valid, halo)
        return (r * jax.lax.stop_gradient(w)[..., None]).reshape(-1)

    zero_p = jnp.zeros((E * 6,), dtype)
    zero_r = jnp.zeros_like(rho)
    r0 = r_flat(zero_p, zero_r)
    cost_loc = 0.5 * jnp.sum(r0 * r0)
    Jp = jax.jacfwd(lambda d: r_flat(d, zero_r))(zero_p)          # [M, E*6]
    _, Jr_flat = jax.jvp(lambda d: r_flat(zero_p, d),
                         (zero_r,), (jnp.ones_like(rho),))
    M_per = Ho * 2
    Jr = Jr_flat.reshape(Ks * Lk, M_per)
    Jp_ = Jp.reshape(Ks * Lk, M_per, E * 6)
    r_ = r0.reshape(Ks * Lk, M_per)

    # rank-1 square-root Schur per landmark (same scheme as dist_ba)
    S = jnp.einsum("fm,fm->f", Jr, Jr)
    S_d = S * (1.0 + lam)
    inv_S = jnp.where(S > 1e-8, 1.0 / jnp.maximum(S_d, 1e-8), 0.0)
    coef = jnp.einsum("fm,fmi->fi", Jr, Jp_) * inv_S[:, None]
    coef_r = jnp.einsum("fm,fm->f", Jr, r_) * inv_S
    Jp_proj = Jp_ - Jr[:, :, None] * coef[:, None, :]
    r_proj = r_ - Jr * coef_r[:, None]
    H_ext = jnp.einsum("fmi,fmj->ij", Jp_, Jp_proj)               # [E6, E6]
    g_ext = jnp.einsum("fmi,fm->i", Jp_, r_proj)
    diag_ext = jnp.einsum("fmi,fmi->i", Jp_, Jp_)

    # scatter extended block -> global [K*6]
    base = shard_idx * Ks
    gidx = (jnp.arange(E * 6) + base * 6) % (K * 6)   # halo wraps; masked below
    in_range = (jnp.arange(E * 6) + base * 6) < (K * 6)
    H_ext = H_ext * in_range[:, None] * in_range[None, :]
    g_ext = g_ext * in_range
    diag_ext = diag_ext * in_range
    H = jnp.zeros((K * 6, K * 6), dtype).at[jnp.ix_(gidx, gidx)].add(H_ext)
    g = jnp.zeros((K * 6,), dtype).at[gidx].add(g_ext)
    diag = jnp.zeros((K * 6,), dtype).at[gidx].add(diag_ext)
    g_r = jnp.einsum("fm,fm->f", Jr, r_)
    G_rf = jnp.einsum("fm,fmi->fi", Jr, Jp_)
    return H, g, diag, cost_loc, (inv_S, g_r, G_rf)


def _gn_solve(H, g, diag, lam, K, dtype):
    """Replicated damped solve of the psummed reduced system -> dpose."""
    # gauge: pin keyframe 0
    free = jnp.ones((K * 6,), dtype).at[:6].set(0.0)
    Hm = H * free[:, None] * free[None, :]
    damped = Hm + jnp.diag(lam * jnp.maximum(diag, 1e-8) * free + (1.0 - free))
    ds = jnp.sqrt(jnp.maximum(jnp.diagonal(damped), 1e-12))
    ds_inv = 1.0 / ds
    Hs = damped * ds_inv[:, None] * ds_inv[None, :]
    L = jax.scipy.linalg.cho_factor(Hs, lower=True)
    return -(ds_inv * jax.scipy.linalg.cho_solve(L, (g * free) * ds_inv)) \
        * free


def make_mapping_solver(mesh: Mesh, K: int, halo: int, iters: int = 3,
                        lam: float = 1e-4, axis_name: str = "k"):
    """Compile the keyframe-sharded mapping BA over ``mesh``."""
    from jax.experimental.shard_map import shard_map

    D = mesh.shape[axis_name]
    assert K % D == 0
    Ks = K // D
    assert halo <= Ks, "halo must fit inside one neighbour shard"

    spec = MappingProblem(
        kf_p=P(axis_name), kf_q=P(axis_name), lm_ray=P(axis_name),
        lm_rho=P(axis_name), obs=P(axis_name), obs_valid=P(axis_name))

    @partial(shard_map, mesh=mesh, in_specs=(spec,),
             out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
             check_rep=False)
    def solve(prob: MappingProblem):
        p, q = prob.kf_p, prob.kf_q                 # [Ks, .]
        rho = prob.lm_rho
        shard_idx = jax.lax.axis_index(axis_name)

        def halo_exchange(p, q):
            """Receive the first ``halo`` poses of the right neighbour.
            One fused ppermute for p+q (collectives are latency-bound at
            this size — pay the rendezvous once)."""
            perm = [(i + 1, i) for i in range(D - 1)]   # right -> left
            pq = jnp.concatenate([p[:halo], q[:halo]], axis=-1)   # [halo, 7]
            h = jax.lax.ppermute(pq, axis_name, perm)
            hp, hq = h[:, :3], h[:, 3:]
            # the last shard has no right neighbour: ppermute delivers zeros,
            # and a zero quaternion would NaN under boxplus normalization —
            # replace with identity (those observations are masked anyway)
            degen = jnp.sum(hq * hq, axis=-1, keepdims=True) < 0.5
            hq = jnp.where(degen, jnp.asarray([1.0, 0, 0, 0], q.dtype), hq)
            return jnp.concatenate([p, hp]), jnp.concatenate([q, hq])

        def slice_ext(dpose):
            """This shard's EXTENDED (own + halo) slice of the global
            delta. After the fused psum every shard holds the full [K*6]
            solution, so the candidate's halo poses come from local
            slicing — the round-3 code re-ppermuted them every iteration
            (r3: 3-4 rendezvous/iter → r4: 2 → r5: 1)."""
            base = shard_idx * Ks
            padded = jnp.concatenate([dpose, jnp.zeros((halo * 6,), dtype)])
            return jax.lax.dynamic_slice(
                padded, (base * 6,), ((Ks + halo) * 6,)).reshape(Ks + halo, 6)

        dtype = p.dtype

        def retract(pe, qe, rho, dpose, drho, scale):
            d = slice_ext(dpose) * scale
            return (pe + d[:, :3], lie.quat_boxplus(qe, d[:, 3:]),
                    rho + drho * scale)

        def body(carry, _):
            """ONE collective rendezvous per iteration (VERDICT r4 item 5):
            LM with step backtracking. The candidate's cost rides the SAME
            fused psum as its normal equations — accept/reject is decided
            one build later instead of with a second rendezvous. On accept
            the just-psummed (H, g) ARE the correct linearization at the
            new base, so the next step solves from them; on reject the
            cached step is halved from the last accepted state (no stale-H
            re-solve needed)."""
            (pa, qa, ra, cost_a, pc, qc, rc, dpose_prev, drho_prev,
             scale, lam_c) = carry
            H, g, diag, cost_loc, (inv_S, g_r, G_rf) = _gn_build(
                pc, qc, prob.lm_ray, rc, prob.obs, prob.obs_valid,
                halo, K, shard_idx, lam_c)
            # THE rendezvous: H | g | diag | local cost, one psum
            pay = jnp.concatenate(
                [H, g[:, None], diag[:, None],
                 jnp.full((K * 6, 1), cost_loc / (K * 6), dtype)], axis=1)
            pay = jax.lax.psum(pay, axis_name)
            H, g, diag = pay[:, :K * 6], pay[:, K * 6], pay[:, K * 6 + 1]
            cost_c = jnp.sum(pay[:, K * 6 + 2])
            accept = cost_c < cost_a

            sel = lambda a, b: jnp.where(accept, a, b)
            pa2, qa2, ra2 = sel(pc, pa), sel(qc, qa), sel(rc, ra)
            cost_a2 = jnp.minimum(cost_c, cost_a)
            # new step from the (valid-on-accept) linearization
            dpose_new = _gn_solve(H, g, diag, lam_c, K, dtype)
            d_ext = slice_ext(dpose_new).reshape(-1)
            drho_new = (-inv_S * (g_r + G_rf @ d_ext)).reshape(rc.shape)
            dpose2 = sel(dpose_new, dpose_prev)
            drho2 = sel(drho_new, drho_prev)
            scale2 = jnp.where(accept, 1.0, scale * 0.5)
            pc2, qc2, rc2 = retract(pa2, qa2, ra2, dpose2, drho2, scale2)
            lam2 = jnp.where(accept, jnp.maximum(lam_c * 0.3, 1e-8),
                             jnp.minimum(lam_c * 10.0, 1e5))
            return (pa2, qa2, ra2, cost_a2, pc2, qc2, rc2,
                    dpose2, drho2, scale2, lam2), None

        # ONE halo exchange up front; afterwards halo poses ride the global
        # solve vector (the psum hands every shard the full delta)
        pe0, qe0 = halo_exchange(p, q)
        init = (pe0, qe0, rho, jnp.asarray(jnp.inf, dtype),
                pe0, qe0, rho,
                jnp.zeros((K * 6,), dtype), jnp.zeros_like(rho),
                jnp.asarray(1.0, dtype), jnp.asarray(lam, dtype))
        (pa, qa, ra, cost, *_), _ = jax.lax.scan(
            body, init, None, length=iters + 1)
        return pa[:Ks], qa[:Ks], ra, cost

    return jax.jit(solve)


# ---------------------------------------------------------------- synthetic

def make_mapping_problem(K: int, lpk: int, halo: int, seed: int = 0,
                         pix_noise: float = 0.0, perturb: float = 0.0):
    """Synthetic global-mapping problem: a long arc of keyframes, ``lpk``
    landmarks anchored per keyframe, observed in the next ``halo`` frames.

    Returns (problem, gt_p, gt_q, gt_rho)."""
    rng = np.random.default_rng(seed)
    t = np.arange(K) * 0.4
    yaw = 0.15 * t
    p = np.stack([np.cumsum(0.4 * np.cos(yaw)),
                  np.cumsum(0.4 * np.sin(yaw)),
                  0.05 * np.sin(0.5 * t)], axis=1).astype(np.float32)
    q = np.stack([np.cos(yaw / 2), 0 * yaw, 0 * yaw,
                  np.sin(yaw / 2)], axis=1).astype(np.float32)

    def qmat(qq):
        return np.asarray(lie.quat_to_mat(jnp.asarray(qq)))

    Ho = halo + 1
    ray = rng.uniform(-0.6, 0.6, size=(K, lpk, 2)).astype(np.float32)
    depth = rng.uniform(3.0, 12.0, size=(K, lpk)).astype(np.float32)
    rho = (1.0 / depth).astype(np.float32)
    obs = np.zeros((K, lpk, Ho, 2), np.float32)
    valid = np.zeros((K, lpk, Ho), np.float32)
    for a in range(K):
        Ra = qmat(q[a])
        pt = np.concatenate([ray[a], np.ones((lpk, 1), np.float32)], 1)
        p_w = (pt * depth[a][:, None]) @ Ra.T + p[a]
        for d in range(Ho):
            j = a + d
            if j >= K:
                break
            Rj = qmat(q[j])
            p_c = (p_w - p[j]) @ Rj
            ok = p_c[:, 2] > 0.3
            uv = p_c[:, :2] / np.maximum(p_c[:, 2:], 0.3)
            ok &= (np.abs(uv) < 1.2).all(axis=1)
            if pix_noise > 0:
                uv = uv + rng.normal(scale=pix_noise, size=uv.shape)
            obs[a, :, d] = uv
            valid[a, :, d] = ok
    gt = (p.copy(), q.copy(), rho.copy())
    if perturb > 0:
        p = p + rng.normal(scale=perturb, size=p.shape).astype(np.float32)
        p[0] = gt[0][0]
        dth = rng.normal(scale=perturb * 0.3, size=(K, 3)).astype(np.float32)
        dth[0] = 0
        q = np.asarray(lie.quat_boxplus(jnp.asarray(q), jnp.asarray(dth)))
        rho = rho * (1 + rng.normal(scale=perturb,
                                    size=rho.shape)).astype(np.float32)
    prob = MappingProblem(
        kf_p=jnp.asarray(p), kf_q=jnp.asarray(q), lm_ray=jnp.asarray(ray),
        lm_rho=jnp.asarray(rho), obs=jnp.asarray(obs),
        obs_valid=jnp.asarray(valid))
    return prob, gt
