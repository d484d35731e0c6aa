"""SO(3) geometry ops, fully vectorized for TPU.

Capability parity with the reference delta-feature ops (reference:
``utils.py:112-174``), re-derived as batched jnp programs:

- :func:`axis_angle_to_matrix` — Rodrigues formula (ref ``utils.py:114-128``).
- :func:`log_so3`              — SO(3) log map      (ref ``utils.py:130-140``).
- :func:`rotmat_delta`         — relative rotation between consecutive frames,
  returned as axis-angle (ref ``utils.py:165-174``).
- :func:`axis_angle_delta`     — same for axis-angle inputs (ref ``utils.py:149-159``).

All clamping constants match the reference so downstream normalization
statistics agree to float32 precision. Everything is shape-polymorphic over
leading batch dims and jit/vmap friendly (no Python loops over frames).
"""

from __future__ import annotations

import jax.numpy as jnp

_THETA_MIN = 1e-8      # ref utils.py:116 clamp_min on |axis-angle|
_TRACE_EPS = 1e-6      # ref utils.py:132 trace clamp margin
_SIN_MIN = 1e-6        # ref utils.py:134 clamp_min on 2*sin(theta)


def axis_angle_to_matrix(a: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle ``[..., 3]`` -> rotation matrix ``[..., 3, 3]``."""
    theta = jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _THETA_MIN)
    k = a / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    # K is the cross-product (skew) matrix of the unit axis.
    row0 = jnp.stack([zero, -kz, ky], axis=-1)
    row1 = jnp.stack([kz, zero, -kx], axis=-1)
    row2 = jnp.stack([-ky, kx, zero], axis=-1)
    K = jnp.stack([row0, row1, row2], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), a.shape[:-1] + (3, 3))
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    return eye + s * K + (1.0 - c) * (K @ K)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map: rotation matrix ``[..., 3, 3]`` -> axis-angle ``[..., 3]``."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    tr = jnp.clip(tr, -1.0 + _TRACE_EPS, 3.0 - _TRACE_EPS)
    theta = jnp.arccos((tr - 1.0) / 2.0)
    denom = jnp.maximum(2.0 * jnp.sin(theta), _SIN_MIN)[..., None]
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    ) / denom
    return theta[..., None] * v


def _shift_prepend_first(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """[x0, x0, x1, ..., x_{T-2}] along ``axis`` — the reference's "previous
    frame with first-frame self-pairing" convention (first delta == 0)."""
    first = jnp.take(x, jnp.array([0]), axis=axis)
    rest = jnp.take(x, jnp.arange(x.shape[axis] - 1), axis=axis)
    return jnp.concatenate([first, rest], axis=axis)


def rotmat_delta(R: jnp.ndarray) -> jnp.ndarray:
    """Per-frame relative rotation as axis-angle.

    ``R``: ``[T, J, 3, 3]`` or ``[T, 3, 3]`` (time leading). Returns the same
    leading dims with trailing dim 3: ``log(R_{t-1}^T R_t)``; frame 0 pairs
    with itself so its delta is ~0 (exactly the log-map output at identity,
    which with the reference's clamping is a small constant ~1e-3*0 = 0 vector
    — the trace clamp makes theta ~ 1e-3 but v = 0, so the product is 0).
    """
    R_prev = _shift_prepend_first(R, axis=0)
    R_rel = jnp.swapaxes(R_prev, -1, -2) @ R
    return log_so3(R_rel)


def axis_angle_delta(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle pose ``[T, 3*J]`` -> per-joint SO(3) relative delta ``[T, 3*J]``."""
    T, D = aa.shape
    J = D // 3
    a = aa.reshape(T, J, 3)
    a_prev = _shift_prepend_first(a, axis=0)
    R = axis_angle_to_matrix(a)
    R0 = axis_angle_to_matrix(a_prev)
    R_rel = jnp.swapaxes(R0, -1, -2) @ R
    return log_so3(R_rel).reshape(T, D)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> rotation matrix (Zhou et al.), as used by
    TokenHMR's decoder head (ref ``modifications/token_head.py:227-231``).

    ``x``: ``[..., 6]`` (two 3-vectors, column convention) -> ``[..., 3, 3]``.
    Columns: b1 = norm(a1); b2 = norm(a2 - (b1.a2) b1); b3 = b1 x b2.
    """
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    eps = 1e-12
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), eps)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)
