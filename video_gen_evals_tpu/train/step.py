"""Fused jitted train step: clean + 3 corrupted forwards in ONE XLA program.

Capability parity with the default experiment's loss (C23 in SURVEY.md, ref
``train.py:488-524``): ``TCL(clean) + w * (hard_shuf + hard_rev + hard_stat)``
where each hard term is a SupCon 2-way CE between the clean embedding and the
embedding of a temporally corrupted copy of the batch.

TPU-first restructurings vs the reference:
- the reference runs 4 sequential forwards per step (ref ``train.py:511-524``);
  here the clean batch and its 3 corruptions are stacked into one ``[4B,T,D]``
  forward, quadrupling MXU-visible batch and letting XLA fuse everything;
- corruptions are generated in-graph from a PRNG key (no host RNG round-trip);
- the reference's "skip non-finite loss batches" guard (ref ``train.py:499-500``)
  becomes a ``lax.cond`` that applies a zero update, keeping the step jitted;
- AdamW + per-step cosine decay to ``eta_min`` exactly mirror torch semantics
  (betas 0.9/0.999, eps 1e-8, decoupled weight decay 0.01 on all params;
  ref ``train.py:163,183-186``).
"""

from __future__ import annotations

import dataclasses
import typing as T

import jax
import jax.numpy as jnp
import optax

from ..models.fusion_encoder import HumanActionScorer
from ..ops.corruption import (
    partial_shuffle_within_window,
    reverse_sequence,
    static_window,
)
from .losses import supcon_hard_negatives, tcl_loss


@dataclasses.dataclass
class TrainState:
    params: T.Any
    opt_state: T.Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def make_optimizer(
    lr: float, total_steps: int, eta_min: float = 1e-6, weight_decay: float = 0.01
) -> optax.GradientTransformation:
    """AdamW with per-step cosine annealing to ``eta_min`` (torch
    ``CosineAnnealingLR`` semantics)."""
    schedule = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max(1, total_steps), alpha=eta_min / lr
    )
    return optax.adamw(
        schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def make_loss_fn(
    model: HumanActionScorer,
    hard_weight: float = 10.0,
    matmul_precision: str = "default",
):
    """Returns loss_fn(params, feats [B,T,D], labels [B], rng, train: bool)
    -> (total, dict of components). Training defaults to "default" matmul
    precision (bf16 passes) — standard for training; scoring uses "high"
    for reference parity (see PARITY.md)."""

    def loss_fn(params, feats, labels, rng, train: bool):
      with jax.default_matmul_precision(matmul_precision):
          k_shuf, k_drop = jax.random.split(rng)
          B = feats.shape[0]
          stacked = jnp.concatenate(
              [
                  feats,
                  partial_shuffle_within_window(k_shuf, feats),
                  reverse_sequence(feats),
                  static_window(feats),
              ],
              axis=0,
          )
          variables = {"params": params}
          if train:
              emb, _, _ = model.apply(
                  variables, stacked, deterministic=False, rngs={"dropout": k_drop}
              )
          else:
              emb, _, _ = model.apply(variables, stacked, deterministic=True)
          clean, sh, rev, st = (
              emb[:B],
              emb[B : 2 * B],
              emb[2 * B : 3 * B],
              emb[3 * B :],
          )
          components = {
              "tcl": tcl_loss(clean, labels),
              "hard_shuf": hard_weight * supcon_hard_negatives(clean, clean, sh),
              "hard_rev": hard_weight * supcon_hard_negatives(clean, clean, rev),
              "hard_stat": hard_weight * supcon_hard_negatives(clean, clean, st),
          }
          total = sum(components.values())
          return total, components

    return loss_fn


def make_train_step(
    model: HumanActionScorer,
    tx: optax.GradientTransformation,
    hard_weight: float = 10.0,
    donate: bool = True,
):
    """Build the jitted train step: (state, feats, labels, rng) ->
    (state, metrics). Non-finite losses skip the update (zero-cost cond)."""
    loss_fn = make_loss_fn(model, hard_weight)

    def step(state: TrainState, feats, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        (total, components), grads = jax.value_and_grad(
            lambda p: loss_fn(p, feats, labels, rng, True), has_aux=True
        )(state.params)

        finite = jnp.isfinite(total)

        def do_update(_):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return new_params, new_opt

        def skip(_):
            return state.params, state.opt_state

        new_params, new_opt = jax.lax.cond(finite, do_update, skip, None)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        metrics = dict(components)
        metrics["total"] = total
        metrics["skipped"] = (~finite).astype(jnp.float32)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_loss_fn(model: HumanActionScorer, hard_weight: float = 10.0):
    """Jitted eval-mode loss (no dropout, no grad) — ref ``train.py:286-333``."""
    loss_fn = make_loss_fn(model, hard_weight)

    def eval_loss(params, feats, labels, rng):
        total, components = loss_fn(params, feats, labels, rng, False)
        components = dict(components)
        components["total"] = total
        return components

    return jax.jit(eval_loss)
