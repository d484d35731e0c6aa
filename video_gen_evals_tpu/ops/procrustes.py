"""Procrustes-normalized 2D keypoint velocity, fully vectorized.

Capability parity with reference ``utils.py:177-217`` (``_procrustes_kp_delta``),
which runs a per-frame Python loop computing a 2x2 Kabsch SVD per consecutive
frame pair. On TPU that loop is replaced by a closed-form batched rotation:

For each consecutive pair (X = frame t-1, Y = frame t), both already centered
and scale-normalized, the reference computes ``H = X^T Y``, an SVD
``H = U S Vh``, the rotation ``R = Vh U^T`` (flipping the last *column* of
``Vh`` if ``det(R) < 0``), and the residual ``delta_t = Y - X R``.

The 2x2 case has an exact closed form. Writing ``H = [[a, b], [c, d]]``:

- ``det(H) >= 0``:  ``R = rot(-atan2(c - b, a + d))``
  (the orthogonal polar factor of ``H^T`` — identical to the SVD result).
- ``det(H) <  0``:  the reference's column-flip convention, combined with
  LAPACK's sign convention for the negative second singular value, reduces
  algebraically to ``R = rot(-atan2(c + b, a - d))``.

Both branches were verified to match ``torch.linalg.svd``-based reference
output exactly on randomized 2x2 inputs (see tests/test_procrustes.py).
This removes the hot Python loop entirely: a [T, K, 2] sequence becomes a
handful of fused elementwise ops + two tiny batched matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp


def kabsch_rotation_2d(H: jnp.ndarray) -> jnp.ndarray:
    """Closed-form reference-convention Kabsch rotation for 2x2 cross-covariances.

    ``H``: ``[..., 2, 2]`` -> rotation ``[..., 2, 2]`` equal to the reference's
    ``Vh @ U.T`` (with its det<0 column-flip) applied as ``X @ R``.
    """
    a = H[..., 0, 0]
    b = H[..., 0, 1]
    c = H[..., 1, 0]
    d = H[..., 1, 1]
    det = a * d - b * c
    ang = jnp.where(det >= 0, jnp.arctan2(c - b, a + d), jnp.arctan2(c + b, a - d))
    ca = jnp.cos(-ang)
    sa = jnp.sin(-ang)
    row0 = jnp.stack([ca, -sa], axis=-1)
    row1 = jnp.stack([sa, ca], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def procrustes_kp_delta(kp: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Procrustes (translation + scale + rotation) normalized keypoint velocity.

    ``kp``: ``[T, 2*K]`` or ``[T, K, 2]`` with x, y in [0, 1].
    Returns ``[T, 2*K]``; row 0 is zero.
    """
    if kp.ndim == 3:
        T, K, _ = kp.shape
        pts = kp
    else:
        T, D = kp.shape
        K = D // 2
        pts = kp.reshape(T, K, 2)

    # 1) remove translation (center each frame)
    pts_c = pts - pts.mean(axis=1, keepdims=True)
    # 2) remove scale (frobenius norm per frame)
    s = jnp.maximum(
        jnp.sqrt(jnp.sum(pts_c * pts_c, axis=(1, 2), keepdims=True)), eps
    )
    pts_n = pts_c / s

    # 3) batched consecutive-frame alignment residuals
    X = pts_n[:-1]                                   # [T-1, K, 2]
    Y = pts_n[1:]                                    # [T-1, K, 2]
    H = jnp.einsum("tki,tkj->tij", X, Y)             # [T-1, 2, 2]
    R = kabsch_rotation_2d(H)                        # [T-1, 2, 2]
    deltas = Y - jnp.einsum("tki,tij->tkj", X, R)    # [T-1, K, 2]

    zero = jnp.zeros((1, K, 2), dtype=deltas.dtype)
    return jnp.concatenate([zero, deltas], axis=0).reshape(T, K * 2)
