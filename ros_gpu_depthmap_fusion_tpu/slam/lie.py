"""SO(3)/SE(3) exponential and logarithm maps (jnp, batch-friendly).

All small-angle branches use the double-``where`` idiom (replace the
degenerate operand before the nonlinearity, then select) so the maps stay
differentiable at the identity — the pose-graph optimizer differentiates
through them with ``jacfwd``. ``so3_log`` is undefined at rotation angle
exactly pi (axis ambiguity), as usual.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def _theta_of(w: jnp.ndarray):
    """(theta [..., 1, 1], small [..., 1, 1] bool, theta_safe) with
    theta_safe != 0 where small, for NaN-free untaken branches."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    small = theta < _EPS
    theta_safe = jnp.where(small, 1.0, theta)
    return theta, small, theta_safe


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta, small, theta_safe = _theta_of(w)
    k = skew(w / theta_safe[..., 0, 0][..., None])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    r = eye + jnp.sin(theta) * k + (1 - jnp.cos(theta)) * (k @ k)
    return jnp.where(small, eye + skew(w), r)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle (angle < pi)."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos = jnp.clip((trace - 1) / 2, -1.0, 1.0)
    v = jnp.stack([r[..., 2, 1] - r[..., 1, 2],
                   r[..., 0, 2] - r[..., 2, 0],
                   r[..., 1, 0] - r[..., 0, 1]], axis=-1)  # = 2 sin(th) axis
    near_id = cos > 1.0 - _EPS
    cos_safe = jnp.where(near_id, 0.0, cos)
    theta = jnp.arccos(cos_safe)
    sin_safe = jnp.sqrt(jnp.maximum(1.0 - cos_safe * cos_safe, _EPS ** 2))
    scale = jnp.where(near_id, 0.5, theta / (2.0 * sin_safe))
    return v * scale[..., None]


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (rho, phi) -> [..., 4, 4]; t = V(phi) rho."""
    rho = xi[..., :3]
    phi = xi[..., 3:]
    r = so3_exp(phi)
    theta, small, theta_safe = _theta_of(phi)
    k = skew(phi / theta_safe[..., 0, 0][..., None])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), r.shape)
    a = (1 - jnp.cos(theta_safe)) / (theta_safe ** 2)
    b = (theta_safe - jnp.sin(theta_safe)) / (theta_safe ** 3)
    v_general = eye + a * k * theta_safe + b * (k @ k) * theta_safe ** 2
    v_small = eye + 0.5 * skew(phi)
    v = jnp.where(small, v_small, v_general)
    t = (v @ rho[..., None])[..., 0]
    out = jnp.zeros(xi.shape[:-1] + (4, 4), xi.dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def se3_log(tf: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6] (rho, phi)."""
    phi = so3_log(tf[..., :3, :3])
    theta, small, theta_safe = _theta_of(phi)
    k = skew(phi / theta_safe[..., 0, 0][..., None])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tf.dtype),
                           tf[..., :3, :3].shape)
    half_theta = theta_safe / 2
    cot_term = (1 - theta_safe * jnp.cos(half_theta)
                / (2.0 * jnp.sin(half_theta))) / (theta_safe ** 2)
    v_inv_general = (eye - 0.5 * k * theta_safe
                     + cot_term * (k @ k) * theta_safe ** 2)
    v_inv_small = eye - 0.5 * skew(phi)
    v_inv = jnp.where(small, v_inv_small, v_inv_general)
    rho = (v_inv @ tf[..., :3, 3:4])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inv(tf: jnp.ndarray) -> jnp.ndarray:
    r = tf[..., :3, :3]
    t = tf[..., :3, 3:]
    rt = jnp.swapaxes(r, -1, -2)
    out = jnp.zeros_like(tf)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3:].set(-rt @ t)
    out = out.at[..., 3, 3].set(1.0)
    return out
