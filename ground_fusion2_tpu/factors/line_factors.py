"""Plücker-line projection factors with orthonormal 4-DoF parametrization.

Rebuild of the reference's optional line factors
(``line_projection_factor.cpp`` (591), ``line_parameterization.cpp`` (102),
``onlyLineOpt``/``optimizationwithLine`` ``estimator.cpp:4264,4334``; all
shipped configs run ``use_line: 0`` so the live window keeps these off —
see SURVEY §7). Math is the standard PL-VIO formulation:

* a 3D line is Plücker (n, v): v the direction, n = p × v the moment
  (normal of the plane through the origin and the line), ‖·‖ unscaled;
* the minimal 4-DoF update uses the orthonormal representation
  (U ∈ SO(3), φ): U = [n̂, v̂, n̂×v̂], W = [[cos φ, −sin φ], [sin φ, cos φ]]
  with (cos φ, sin φ) ∝ (‖n‖, ‖v‖); δ = (δθ ∈ ℝ³, δφ);
* projection of the camera-frame moment n_c gives the image line
  l = K_L n_c; the residual is the signed distance of the two observed
  endpoints to l (2-vector per observation).

Everything is batched jnp math usable inside the jitted window solver; the
tests run a Gauss-Newton fit via jax.jacfwd over the 4-DoF chart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import lie


# -- Plücker <-> orthonormal ------------------------------------------------

def pluecker_from_points(p1: jax.Array, p2: jax.Array):
    """Two world points [..., 3] → Plücker (n [...,3], v [...,3])."""
    v = p2 - p1
    n = jnp.cross(p1, p2)
    return n, v


def orthonormal_from_pluecker(n: jax.Array, v: jax.Array):
    """(n, v) → (U [3,3], phi). Inverse of :func:`pluecker_from_orthonormal`."""
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    u1 = n / (nn + 1e-12)
    u2 = v / (nv + 1e-12)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    phi = jnp.arctan2(nv[..., 0], nn[..., 0])
    return U, phi


def pluecker_from_orthonormal(U: jax.Array, phi: jax.Array):
    """(U, phi) → (n, v) with ‖(n, v)‖ = 1 split as (cos φ, sin φ)."""
    n = U[..., :, 0] * jnp.cos(phi)[..., None]
    v = U[..., :, 1] * jnp.sin(phi)[..., None]
    return n, v


def orthonormal_boxplus(U: jax.Array, phi: jax.Array, delta: jax.Array):
    """4-DoF update (reference ``LineOrthParameterization::Plus``):
    δ = (δθ ∈ ℝ³ right-applied to U, δφ added to φ)."""
    U2 = U @ lie.so3_exp(delta[..., :3])
    return U2, phi + delta[..., 3]


# -- projection -------------------------------------------------------------

def line_to_camera(n_w: jax.Array, v_w: jax.Array,
                   q_wc: jax.Array, t_wc: jax.Array):
    """World Plücker → camera frame. T_wc = camera-to-world pose.

    L_c = T_cw ⊛ L_w:  v_c = Rᵀ v_w;  n_c = Rᵀ n_w − Rᵀ [t]× v_w.
    """
    R = lie.quat_to_mat(q_wc)
    v_c = v_w @ R                      # Rᵀ v  (batched row-vector form)
    n_c = (n_w - jnp.cross(t_wc, v_w)) @ R
    return n_c, v_c


def project_line(n_c: jax.Array, fx, fy, cx, cy):
    """Camera-frame moment → homogeneous image line l = K_L n_c
    (reference line projection matrix)."""
    l1 = fy * n_c[..., 0]
    l2 = fx * n_c[..., 1]
    l3 = -fy * cx * n_c[..., 0] - fx * cy * n_c[..., 1] \
        + fx * fy * n_c[..., 2]
    return jnp.stack([l1, l2, l3], -1)


def line_reprojection_residual(n_w, v_w, q_wc, t_wc, obs_p1, obs_p2,
                               fx, fy, cx, cy):
    """Residual [..., 2]: distance of the two observed segment endpoints
    (pixels, [..., 2]) to the projected infinite line."""
    n_c, _ = line_to_camera(n_w, v_w, q_wc, t_wc)
    l = project_line(n_c, fx, fy, cx, cy)
    den = jnp.sqrt(l[..., 0] ** 2 + l[..., 1] ** 2) + 1e-9
    d1 = (l[..., 0] * obs_p1[..., 0] + l[..., 1] * obs_p1[..., 1]
          + l[..., 2]) / den
    d2 = (l[..., 0] * obs_p2[..., 0] + l[..., 1] * obs_p2[..., 1]
          + l[..., 2]) / den
    return jnp.stack([d1, d2], -1)


def triangulate_line(seg_a: jax.Array, seg_b: jax.Array,
                     q_a: jax.Array, t_a: jax.Array,
                     q_b: jax.Array, t_b: jax.Array,
                     fx, fy, cx, cy):
    """Two-view line triangulation (reference line triangulation): each view's
    segment back-projects to a plane; the world line is the planes' meet.

    seg_*: [4] pixel endpoints in views a/b; (q, t): camera-to-world poses.
    Returns world Plücker (n, v).
    """
    def plane(seg, q, t):
        p1 = jnp.array([(seg[0] - cx) / fx, (seg[1] - cy) / fy, 1.0])
        p2 = jnp.array([(seg[2] - cx) / fx, (seg[3] - cy) / fy, 1.0])
        R = lie.quat_to_mat(q)
        a1, a2 = R @ p1 + t, R @ p2 + t
        nrm = jnp.cross(a1 - t, a2 - t)
        return jnp.concatenate([nrm, -(nrm @ t)[None]])

    pa, pb = plane(seg_a, q_a, t_a), plane(seg_b, q_b, t_b)
    # meet of two planes (n_i·x + d_i = 0): v = n_a × n_b, m = d_a n_b − d_b n_a
    v = jnp.cross(pa[:3], pb[:3])
    n = pa[3] * pb[:3] - pb[3] * pa[:3]
    return n, v
