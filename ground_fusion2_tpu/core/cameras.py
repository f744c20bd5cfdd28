"""Camera projection models, batched and jit-friendly.

Replaces the reference's camodocal library (``Ground-Fusion++/camera_models/``,
~13 kLoC of per-point virtual dispatch) with three vectorized models covering
every shipped dataset config:

* :class:`Pinhole` — pinhole + radial-tangential (k1 k2 p1 p2); camodocal
  ``PinholeCamera`` (``camera_models/src/camera_models/PinholeCamera.cc``).
* :class:`PinholeFull` — pinhole + full rational model (k1..k6 p1 p2);
  camodocal ``PinholeFullCamera``.
* :class:`Equidistant` — Kannala-Brandt fisheye (k2..k5); camodocal
  ``EquidistantCamera``.
* :class:`Mei` — unified omnidirectional (xi + radtan); camodocal ``CataCamera``.

Each model exposes ``project`` (3D camera-frame point -> pixel) and ``lift``
(pixel -> unit-norm ray), both operating on ``[..., 3]`` / ``[..., 2]``
arrays. ``lift`` uses a fixed small number of fixed-point/Newton iterations so
it is a static-shape XLA loop — no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pinhole(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array = 0.0
    k2: jax.Array = 0.0
    p1: jax.Array = 0.0
    p2: jax.Array = 0.0

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        vals = [jnp.asarray(v, dtype=dtype) for v in (fx, fy, cx, cy, k1, k2, p1, p2)]
        return Pinhole(*vals)

    def distort(self, xy: jax.Array) -> jax.Array:
        """Apply radtan distortion to normalized coords ``[..., 2]``."""
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        dx = 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        dy = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)

    def project(self, p: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Camera-frame point ``[..., 3]`` -> pixel ``[..., 2]``, valid mask."""
        z = p[..., 2]
        valid = z > 1e-6
        inv_z = 1.0 / jnp.where(valid, z, 1.0)
        xy = p[..., :2] * inv_z[..., None]
        xyd = self.distort(xy)
        u = self.fx * xyd[..., 0] + self.cx
        v = self.fy * xyd[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1), valid

    def lift(self, uv: jax.Array, iters: int = 8) -> jax.Array:
        """Pixel ``[..., 2]`` -> unit ray ``[..., 3]`` (iterative undistort)."""
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        xy_d = jnp.stack([mx, my], axis=-1)

        def body(_, xy):
            # fixed-point: xy = xy_d - distortion_residual(xy)
            d = self.distort(xy) - xy
            return xy_d - d

        xy = jax.lax.fori_loop(0, iters, body, xy_d)
        ray = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


class PinholeFull(NamedTuple):
    """Pinhole + full OpenCV *rational* distortion model (k1..k6, p1, p2):
    camodocal ``PinholeFullCamera``
    (``camera_models/src/camera_models/PinholeFullCamera.cc:754-781``):

        radial = (1 + k1 r² + k2 r⁴ + k3 r⁶) / (1 + k4 r² + k5 r⁴ + k6 r⁶)

    plus the usual tangential (p1, p2) terms."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array = 0.0
    k2: jax.Array = 0.0
    k3: jax.Array = 0.0
    k4: jax.Array = 0.0
    k5: jax.Array = 0.0
    k6: jax.Array = 0.0
    p1: jax.Array = 0.0
    p2: jax.Array = 0.0

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, k3=0.0, k4=0.0, k5=0.0,
               k6=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        vals = [jnp.asarray(v, dtype=dtype)
                for v in (fx, fy, cx, cy, k1, k2, k3, k4, k5, k6, p1, p2)]
        return PinholeFull(*vals)

    def distort(self, xy: jax.Array) -> jax.Array:
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        cdist = 1.0 + self.k1 * r2 + self.k2 * r4 + self.k3 * r6
        icdist2 = 1.0 / (1.0 + self.k4 * r2 + self.k5 * r4 + self.k6 * r6)
        a1 = 2.0 * x * y
        a2 = r2 + 2.0 * x * x
        a3 = r2 + 2.0 * y * y
        return jnp.stack([x * cdist * icdist2 + self.p1 * a1 + self.p2 * a2,
                          y * cdist * icdist2 + self.p1 * a3 + self.p2 * a1],
                         axis=-1)

    def project(self, p: jax.Array) -> tuple[jax.Array, jax.Array]:
        z = p[..., 2]
        valid = z > 1e-6
        inv_z = 1.0 / jnp.where(valid, z, 1.0)
        xy = p[..., :2] * inv_z[..., None]
        xyd = self.distort(xy)
        u = self.fx * xyd[..., 0] + self.cx
        v = self.fy * xyd[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1), valid

    def lift(self, uv: jax.Array, iters: int = 10) -> jax.Array:
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        xy_d = jnp.stack([mx, my], axis=-1)

        def body(_, xy):
            d = self.distort(xy) - xy
            return xy_d - d

        xy = jax.lax.fori_loop(0, iters, body, xy_d)
        ray = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


class Equidistant(NamedTuple):
    """Kannala-Brandt: theta_d = theta + k2 th^3 + k3 th^5 + k4 th^7 + k5 th^9."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k2: jax.Array = 0.0
    k3: jax.Array = 0.0
    k4: jax.Array = 0.0
    k5: jax.Array = 0.0

    @staticmethod
    def create(fx, fy, cx, cy, k2=0.0, k3=0.0, k4=0.0, k5=0.0, dtype=jnp.float32):
        vals = [jnp.asarray(v, dtype=dtype) for v in (fx, fy, cx, cy, k2, k3, k4, k5)]
        return Equidistant(*vals)

    def _theta_d(self, theta):
        t2 = theta * theta
        return theta * (1.0 + t2 * (self.k2 + t2 * (self.k3 + t2 * (self.k4 + t2 * self.k5))))

    def project(self, p: jax.Array) -> tuple[jax.Array, jax.Array]:
        r = jnp.linalg.norm(p[..., :2], axis=-1)
        theta = jnp.arctan2(r, p[..., 2])
        valid = theta < jnp.pi / 2 * 0.999
        td = self._theta_d(theta)
        scale = td / jnp.maximum(r, 1e-9)
        u = self.fx * scale * p[..., 0] + self.cx
        v = self.fy * scale * p[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1), valid

    def lift(self, uv: jax.Array, iters: int = 10) -> jax.Array:
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        td = jnp.sqrt(mx * mx + my * my)

        def body(_, theta):
            # Newton on f(theta) = theta_d(theta) - td
            t2 = theta * theta
            f = self._theta_d(theta) - td
            df = 1.0 + t2 * (3 * self.k2 + t2 * (5 * self.k3 + t2 * (7 * self.k4 + t2 * 9 * self.k5)))
            return theta - f / jnp.maximum(df, 1e-9)

        theta = jax.lax.fori_loop(0, iters, body, td)
        scale = jnp.sin(theta) / jnp.maximum(td, 1e-9)
        ray = jnp.stack([mx * scale, my * scale, jnp.cos(theta)], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


class Mei(NamedTuple):
    """Unified camera model: project to unit sphere, offset by xi, pinhole+radtan."""

    xi: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array = 0.0
    k2: jax.Array = 0.0
    p1: jax.Array = 0.0
    p2: jax.Array = 0.0

    @staticmethod
    def create(xi, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        vals = [jnp.asarray(v, dtype=dtype) for v in (xi, fx, fy, cx, cy, k1, k2, p1, p2)]
        return Mei(*vals)

    def project(self, p: jax.Array) -> tuple[jax.Array, jax.Array]:
        n = jnp.linalg.norm(p, axis=-1)
        z = p[..., 2] + self.xi * n
        valid = z > 1e-6
        inv_z = 1.0 / jnp.where(valid, z, 1.0)
        xy = p[..., :2] * inv_z[..., None]
        pin = Pinhole(self.fx, self.fy, self.cx, self.cy, self.k1, self.k2, self.p1, self.p2)
        xyd = pin.distort(xy)
        u = self.fx * xyd[..., 0] + self.cx
        v = self.fy * xyd[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1), valid

    def lift(self, uv: jax.Array, iters: int = 8) -> jax.Array:
        pin = Pinhole(self.fx, self.fy, self.cx, self.cy, self.k1, self.k2, self.p1, self.p2)
        mx = (uv[..., 0] - self.cx) / self.fx
        my = (uv[..., 1] - self.cy) / self.fy
        xy_d = jnp.stack([mx, my], axis=-1)

        def body(_, xy):
            d = pin.distort(xy) - xy
            return xy_d - d

        xy = jax.lax.fori_loop(0, iters, body, xy_d)
        # invert unified projection: point on sphere from normalized coords
        r2 = jnp.sum(xy * xy, axis=-1)
        xi = self.xi
        disc = 1.0 + (1.0 - xi * xi) * r2
        zs = (xi + jnp.sqrt(jnp.maximum(disc, 0.0))) / (1.0 + r2)
        ray = jnp.concatenate([zs[..., None] * xy, (zs - xi)[..., None]], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


class Scaramuzza(NamedTuple):
    """Scaramuzza/OCamCalib omnidirectional model (camodocal
    ``ScaramuzzaCamera``): cam→world is the polynomial
    ``z(ρ) = a0 + a2 ρ² + a3 ρ³ + a4 ρ⁴`` over the centered sensor radius ρ
    (affine [[c, d], [e, 1]] + principal point); world→cam inverts it with
    Newton on the ray angle (camodocal fits a separate inverse polynomial —
    Newton avoids carrying two mutually-inconsistent fits)."""

    cx: jax.Array
    cy: jax.Array
    a0: jax.Array
    a2: jax.Array = 0.0
    a3: jax.Array = 0.0
    a4: jax.Array = 0.0
    c: jax.Array = 1.0
    d: jax.Array = 0.0
    e: jax.Array = 0.0

    @staticmethod
    def create(cx, cy, a0, a2=0.0, a3=0.0, a4=0.0, c=1.0, d=0.0, e=0.0,
               dtype=jnp.float32):
        vals = [jnp.asarray(v, dtype=dtype)
                for v in (cx, cy, a0, a2, a3, a4, c, d, e)]
        return Scaramuzza(*vals)

    def _poly(self, rho):
        r2 = rho * rho
        return self.a0 + r2 * (self.a2 + rho * (self.a3 + rho * self.a4))

    def _dpoly(self, rho):
        return rho * (2 * self.a2 + rho * (3 * self.a3 + rho * 4 * self.a4))

    def lift(self, uv: jax.Array) -> jax.Array:
        """Pixel → unit ray (camodocal liftProjective: affine-undo + poly)."""
        du = uv[..., 0] - self.cx
        dv = uv[..., 1] - self.cy
        inv_det = 1.0 / (self.c - self.d * self.e)
        mx = inv_det * (du - self.d * dv)
        my = inv_det * (-self.e * du + self.c * dv)
        rho = jnp.sqrt(mx * mx + my * my)
        ray = jnp.stack([mx, my, -self._poly(rho)], axis=-1)
        return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    def project(self, p: jax.Array, iters: int = 12
                ) -> tuple[jax.Array, jax.Array]:
        """3D point → pixel: solve ρ with Newton on
        ``-poly(ρ) / ρ = z / r_xy`` (the ray-direction match), then apply
        the affine + principal point."""
        r_xy = jnp.linalg.norm(p[..., :2], axis=-1)
        r_safe = jnp.maximum(r_xy, 1e-9)
        k = p[..., 2] / r_safe              # target z/ρ slope

        def body(_, rho):
            f = -self._poly(rho) - k * rho
            df = -self._dpoly(rho) - k
            step = f / jnp.where(jnp.abs(df) > 1e-9, df,
                                 jnp.sign(df) * 1e-9 + 1e-12)
            return jnp.clip(rho - step, 1e-6, 1e6)

        rho0 = jnp.maximum(-self.a0, 1.0)    # ≈ focal length in pixels
        rho = jax.lax.fori_loop(0, iters, body,
                                jnp.broadcast_to(rho0, k.shape))
        mx = p[..., 0] / r_safe * rho
        my = p[..., 1] / r_safe * rho
        u = self.c * mx + self.d * my + self.cx
        v = self.e * mx + my + self.cy
        resid = jnp.abs(-self._poly(rho) - k * rho)
        valid = (r_xy > 1e-9) & (resid < 1e-3 * jnp.maximum(rho, 1.0))
        return jnp.stack([u, v], axis=-1), valid
