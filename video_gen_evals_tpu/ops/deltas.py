"""Temporal difference ("diff") features for embedding-like modalities.

Capability parity with reference ``utils.py:142-163``:
- :func:`vit_delta`   — cosine-stable change of L2-normalized embeddings
  (used for vit / clip / dino streams).
- :func:`betas_delta` — plain finite difference (SMPL shape betas).

First frame pairs with itself, so row 0 of every delta is exactly zero.
"""

from __future__ import annotations

import jax.numpy as jnp

_L2_EPS = 1e-12  # torch F.normalize default eps (ref utils.py:145)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = _L2_EPS) -> jnp.ndarray:
    """Match torch ``F.normalize``: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _prev(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x[:1], x[:-1]], axis=0)


def vit_delta(v: jnp.ndarray) -> jnp.ndarray:
    """``[T, D]`` embeddings -> normalized consecutive difference ``[T, D]``."""
    vn = l2_normalize(v, axis=-1)
    return vn - _prev(vn)


def betas_delta(betas: jnp.ndarray) -> jnp.ndarray:
    """``[T, D]`` -> consecutive finite difference, first row zero."""
    return betas - _prev(betas)
