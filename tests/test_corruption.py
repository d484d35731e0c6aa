"""In-graph corruption ops (hard-negative synthesis)."""

import jax
import numpy as np
import jax.numpy as jnp

from video_gen_evals_tpu.ops import (
    partial_shuffle_within_window,
    reverse_sequence,
    static_window,
)


def test_reverse(rng):
    x = rng.normal(size=(3, 8, 4)).astype(np.float32)
    out = np.asarray(reverse_sequence(jnp.asarray(x)))
    np.testing.assert_allclose(out, x[:, ::-1, :])


def test_static(rng):
    x = rng.normal(size=(3, 8, 4)).astype(np.float32)
    out = np.asarray(static_window(jnp.asarray(x)))
    for t in range(8):
        np.testing.assert_allclose(out[:, t], x[:, 0])


def test_partial_shuffle_preserves_frames(rng):
    x = rng.normal(size=(4, 32, 6)).astype(np.float32)
    out = np.asarray(
        partial_shuffle_within_window(jax.random.key(0), jnp.asarray(x), 0.7)
    )
    # every output window is a permutation of its input frames
    for b in range(4):
        src = {tuple(np.round(f, 5)) for f in x[b]}
        dst = {tuple(np.round(f, 5)) for f in out[b]}
        assert src == dst


def test_partial_shuffle_moves_only_subset(rng):
    x = rng.normal(size=(2, 32, 3)).astype(np.float32)
    out = np.asarray(
        partial_shuffle_within_window(jax.random.key(1), jnp.asarray(x), 0.7)
    )
    n_max = int(0.7 * 32)  # at most n frames may move
    for b in range(2):
        moved = np.sum(np.any(out[b] != x[b], axis=-1))
        assert moved <= n_max


def test_partial_shuffle_actually_shuffles():
    x = np.arange(2 * 32 * 2, dtype=np.float32).reshape(2, 32, 2)
    out = np.asarray(
        partial_shuffle_within_window(jax.random.key(2), jnp.asarray(x), 0.7)
    )
    assert not np.allclose(out, x)


def test_partial_shuffle_jittable(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    f = jax.jit(lambda k, s: partial_shuffle_within_window(k, s, 0.7))
    out = f(jax.random.key(3), x)
    assert out.shape == x.shape
