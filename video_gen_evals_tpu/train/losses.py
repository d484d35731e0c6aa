"""Contrastive losses for the fusion encoder, as pure jnp functions.

Capability parity with reference ``losses.py`` (C6-C10 in SURVEY.md):

- :func:`tcl_loss`              <- ``TCL``                      (ref ``losses.py:6-34``)
- :func:`supcon_hard_negatives` <- ``SupConWithHardNegatives``  (ref ``losses.py:37-56``)
- :func:`hard_neg_infonce`      <- ``HardNegInfoNCE``           (ref ``losses.py:60-99``)
- :func:`arc_margin_logits`     <- ``ArcMarginProduct``         (ref ``losses.py:102-128``)
- :func:`margin_hard_negatives` <- ``MarginHardNegativesLoss``  (ref ``losses.py:131-156``)

All are stateless (weights passed explicitly) and shaped for a single jitted
train step; masks are built with label-equality compares instead of host loops.
"""

from __future__ import annotations

import math
import typing as T

import jax
import jax.numpy as jnp


def tcl_loss(
    projections: jnp.ndarray,   # [B, D] (L2-normalized embeddings)
    targets: jnp.ndarray,       # [B] int labels
    temperature: float = 0.1,
    k1: float = 5000.0,
    k2: float = 1.0,
) -> jnp.ndarray:
    """Tuned supervised contrastive loss.

    Denominator per anchor i: sum over positives of exp(sim/tau)
    + k1 * sum over positives of exp(-sim) + k2 * sum over negatives of
    exp(sim/tau); numerator is each positive pair's exp(sim/tau)
    (ref ``losses.py:31``).
    """
    B = projections.shape[0]
    sim = projections @ projections.T
    exp_t = jnp.exp(sim / temperature)
    exp_n = jnp.exp(-sim)

    same = targets[:, None] == targets[None, :]
    eye = jnp.eye(B, dtype=bool)
    mask_pos = (same & ~eye).astype(sim.dtype)
    mask_neg = (~same).astype(sim.dtype)
    n_pos = jnp.sum(mask_pos, axis=1)

    denom = (
        jnp.sum(exp_t * mask_pos, axis=1)
        + k1 * jnp.sum(exp_n * mask_pos, axis=1)
        + k2 * jnp.sum(exp_t * mask_neg, axis=1)
    )
    per_anchor = jnp.sum(-jnp.log(exp_t / denom[:, None]) * mask_pos, axis=1) / n_pos
    return jnp.mean(per_anchor)


def _ce_first_class(logits: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy with the true class at index 0, mean over batch."""
    return jnp.mean(jax.nn.logsumexp(logits, axis=-1) - logits[:, 0])


def supcon_hard_negatives(
    anchor: jnp.ndarray,        # [B, D]
    positive: jnp.ndarray,      # [B, D]
    hard_negative: jnp.ndarray, # [B, D]
    temperature: float = 0.07,
) -> jnp.ndarray:
    """2-way CE over (anchor.pos, anchor.hardneg)/tau (ref ``losses.py:37-56``)."""
    sim_ap = jnp.sum(anchor * positive, axis=-1) / temperature
    sim_ah = jnp.sum(anchor * hard_negative, axis=-1) / temperature
    logits = jnp.stack([sim_ap, sim_ah], axis=1)
    return _ce_first_class(logits)


def hard_neg_infonce(
    anchor: jnp.ndarray,                       # [B, D]
    negatives: jnp.ndarray,                    # [B, D] or [B, K, D]
    positive: T.Optional[jnp.ndarray] = None,  # optional [B, D]
    temperature: float = 0.07,
    neg_margin: float = 0.0,
    detach_neg: bool = True,
) -> jnp.ndarray:
    """Anchor-vs-hard-negatives InfoNCE (ref ``losses.py:60-99``)."""
    a = anchor
    p = a if positive is None else positive
    n = negatives if negatives.ndim == 3 else negatives[:, None, :]
    if detach_neg:
        n = jax.lax.stop_gradient(n)
    sim_ap = jnp.sum(a * p, axis=-1, keepdims=True)          # [B, 1]
    sim_an = jnp.einsum("bd,bkd->bk", a, n) + neg_margin     # [B, K]
    logits = jnp.concatenate([sim_ap, sim_an], axis=1) / temperature
    return _ce_first_class(logits)


def arc_margin_logits(
    x: jnp.ndarray,        # [B, D]
    labels: jnp.ndarray,   # [B] int
    weight: jnp.ndarray,   # [C, D] class prototypes
    s: float = 30.0,
    m: float = 0.30,
) -> jnp.ndarray:
    """ArcFace margin logits (ref ``losses.py:102-128``); feed to CE."""
    from ..ops.deltas import l2_normalize

    xn = l2_normalize(x, axis=-1)
    wn = l2_normalize(weight, axis=-1)
    cos = xn @ wn.T                                          # [B, C]
    sin = jnp.sqrt(1.0 - cos**2 + 1e-7)
    phi = cos * math.cos(m) - sin * math.sin(m)              # cos(theta + m)
    one_hot = jax.nn.one_hot(labels, weight.shape[0], dtype=cos.dtype)
    return (one_hot * phi + (1.0 - one_hot) * cos) * s


def margin_hard_negatives(
    anchor: jnp.ndarray,
    pos: jnp.ndarray,
    neg: jnp.ndarray,
    margin: float = 0.15,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Hinge max(0, margin - s_pos + s_neg) on cosine sims (ref ``losses.py:131-156``)."""
    s_pos = jnp.sum(anchor * pos, axis=-1)
    s_neg = jnp.sum(anchor * neg, axis=-1)
    loss = jax.nn.relu(margin - s_pos + s_neg)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
