"""Window-gather implementations vs the exact take-based gather
(Pallas kernel in interpret mode, sliced lax.gather on CPU)."""

import numpy as np
import jax.numpy as jnp

from video_gen_evals_tpu.data.features import gather_windows, gather_windows_sliced
from video_gen_evals_tpu.ops.window_kernel import (
    aligned_starts,
    pad_bank_lanes,
    pallas_gather_windows,
)


def _layout(rng, D=40, per_video_rows=(48, 16)):
    offsets = np.cumsum([0] + list(per_video_rows[:-1])).astype(np.int32)
    bank = rng.normal(size=(sum(per_video_rows), D)).astype(np.float32)
    row_limit = (np.array(per_video_rows) - 1).astype(np.int32)
    return bank, offsets, row_limit


def _args(rng, D=40, T=16):
    bank, offsets, row_limit = _layout(rng, D)
    z0 = rng.normal(size=(D - 24,)).astype(np.float32)
    vi = jnp.asarray(np.array([0, 0, 0, 1], np.int32))
    st = jnp.asarray(np.array([0, 8, 16, 0], np.int32))
    return (
        jnp.asarray(bank),
        jnp.asarray(offsets),
        jnp.asarray(row_limit),
        jnp.asarray(z0),
        24,
        vi,
        st,
        T,
    )


def test_pallas_gather_matches_take(rng):
    args = _args(rng)
    ref = np.asarray(gather_windows(*args))
    out = np.asarray(
        pallas_gather_windows(
            pad_bank_lanes(args[0]), *args[1:], out_dim=40, interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=0)


def test_sliced_gather_matches_take(rng):
    args = _args(rng)
    ref = np.asarray(gather_windows(*args))
    out = np.asarray(gather_windows_sliced(*args))
    np.testing.assert_allclose(out, ref, atol=0)


def test_sliced_gather_on_enumerated_fixture_windows(rng):
    """All three implementations agree over a realistic enumeration."""
    from video_gen_evals_tpu.data import (
        ModalityPaths,
        build_feature_bank,
        compute_stats,
        enumerate_windows,
        scan_class_tree,
    )
    from video_gen_evals_tpu.data.fixtures import make_fixture_tree
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        mesh_root, kp_root = make_fixture_tree(
            root, ["PushUps"], videos_per_class=3, frames=(40, 25, 52)
        )
        manifest = scan_class_tree(mesh_root)
        paths = ModalityPaths(keypoint_dir=kp_root, layout="real")
        stats = compute_stats(manifest.items, paths)
        bank = build_feature_bank(manifest.items, paths, stats)
        windows = enumerate_windows(manifest, clip_len=32, stride=8)
        vi = jnp.asarray(np.array([w[0] for w in windows], np.int32))
        st = jnp.asarray(np.array([w[1] for w in windows], np.int32))
        assert aligned_starts(np.asarray(st))
        args = (
            jnp.asarray(bank.bank),
            jnp.asarray(bank.offsets),
            jnp.asarray(bank.row_limit),
            jnp.asarray(bank.z0_diff),
            bank.one_pass_raw,
            vi,
            st,
            32,
        )
        ref = np.asarray(gather_windows(*args))
        np.testing.assert_allclose(
            np.asarray(gather_windows_sliced(*args)), ref, atol=0
        )
        out = np.asarray(
            pallas_gather_windows(
                pad_bank_lanes(args[0]), *args[1:],
                out_dim=bank.feature_dim, interpret=True,
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


def test_burst_gather_matches_take(rng):
    from video_gen_evals_tpu.ops.window_kernel import pallas_gather_windows_burst

    args = _args(rng)
    ref = np.asarray(gather_windows(*args))
    out = np.asarray(
        pallas_gather_windows_burst(
            pad_bank_lanes(args[0]), *args[1:], windows_per_step=2,
            out_dim=40, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=0)
