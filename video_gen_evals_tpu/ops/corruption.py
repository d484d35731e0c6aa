"""Temporal corruption ops — hard-negative synthesis, in-graph.

Capability parity with reference ``utils.py:65-95``. The reference mutates
batches on the host with per-sample Python loops; here every corruption is a
pure jittable function over ``[B, T, D]`` driven by a JAX PRNG key, so the
training step can compute clean + 3 corrupted forwards inside a single XLA
program (no host round-trips, no recompilation).

RNG semantics are *distributionally* equivalent to the reference (torch
``randperm`` vs ``jax.random.permutation``); bitwise emulation of torch's RNG
is intentionally out of scope (documented behavior difference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def partial_shuffle_within_window(
    key: jax.Array, seqs: jnp.ndarray, shuffle_fraction: float = 0.7
) -> jnp.ndarray:
    """Shuffle a random ``shuffle_fraction`` subset of frames within each window.

    Matches ref ``utils.py:65-75``: per sample, pick ``n = max(1, int(f*T))``
    distinct frame positions, then permute the frames occupying them.
    """
    B, T, _ = seqs.shape
    n = max(1, int(shuffle_fraction * T)) if T > 1 else 0
    if n == 0:
        return seqs

    def one(k, seq):
        k1, k2 = jax.random.split(k)
        positions = jax.random.permutation(k1, T)[:n]
        gathered = seq[positions]
        permuted = gathered[jax.random.permutation(k2, n)]
        return seq.at[positions].set(permuted)

    return jax.vmap(one)(jax.random.split(key, B), seqs)


def reverse_sequence(seqs: jnp.ndarray) -> jnp.ndarray:
    """Reverse along time. Ref ``utils.py:78-86``."""
    return jnp.flip(seqs, axis=1)


def static_window(seqs: jnp.ndarray) -> jnp.ndarray:
    """Replace every frame with frame 0. Ref ``utils.py:88-95``."""
    return jnp.broadcast_to(seqs[:, :1, :], seqs.shape)
