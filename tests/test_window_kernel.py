"""Pallas window-gather kernel vs the take-based gather (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from video_gen_evals_tpu.data.features import gather_windows
from video_gen_evals_tpu.ops.window_kernel import (
    aligned_starts,
    pad_bank_lanes,
    pallas_gather_windows,
)


def _layout(rng, D=40, per_video_rows=(48, 16)):
    offsets = np.cumsum([0] + list(per_video_rows[:-1])).astype(np.int32)
    row_limit = (offsets + np.array(per_video_rows) - 1).astype(np.int32)
    bank = rng.normal(size=(sum(per_video_rows), D)).astype(np.float32)
    row_limit_rel = (np.array(per_video_rows) - 1).astype(np.int32)
    return bank, offsets, row_limit_rel


def test_pallas_gather_matches_take(rng):
    D, T = 40, 16
    bank, offsets, row_limit = _layout(rng, D)
    z0 = rng.normal(size=(D - 24,)).astype(np.float32)
    vi = jnp.asarray(np.array([0, 0, 0, 1], np.int32))
    st = jnp.asarray(np.array([0, 8, 16, 0], np.int32))

    ref = np.asarray(
        gather_windows(
            jnp.asarray(bank), jnp.asarray(offsets), jnp.asarray(row_limit),
            jnp.asarray(z0), 24, vi, st, T,
        )
    )
    out = np.asarray(
        pallas_gather_windows(
            pad_bank_lanes(jnp.asarray(bank)), jnp.asarray(offsets),
            jnp.asarray(row_limit), jnp.asarray(z0), 24, vi, st, T,
            out_dim=D, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=0)


def test_pad_bank_lanes(rng):
    bank = jnp.asarray(rng.normal(size=(8, 130)).astype(np.float32))
    padded = pad_bank_lanes(bank)
    assert padded.shape == (8, 256)
    np.testing.assert_array_equal(np.asarray(padded[:, :130]), np.asarray(bank))
    np.testing.assert_array_equal(np.asarray(padded[:, 130:]), 0.0)
    already = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    assert pad_bank_lanes(already) is already


def test_aligned_starts():
    assert aligned_starts([0, 8, 16, 128])
    assert not aligned_starts([0, 8, 3])
