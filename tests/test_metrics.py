"""AC/TC metric tests on hand-constructed embeddings (SURVEY §4.4)."""

import numpy as np
import jax.numpy as jnp

from video_gen_evals_tpu.metrics import (
    build_centroids,
    segment_mean,
    tc_per_window,
    video_ac_scores,
    video_tc_scores,
)
from video_gen_evals_tpu.metrics.correlation import (
    match_and_correlate,
    match_scores,
)


def test_tc_constant_frames_is_zero():
    fe = np.ones((2, 5, 8), np.float32)
    fe /= np.linalg.norm(fe, axis=-1, keepdims=True)
    tc = np.asarray(tc_per_window(jnp.asarray(fe)))
    np.testing.assert_allclose(tc, 0.0, atol=1e-6)


def test_tc_known_value():
    # frames alternate between two orthogonal unit vectors -> every
    # consecutive distance is sqrt(2); CLS token (index 0) must be ignored
    e1 = np.array([1, 0, 0, 0], np.float32)
    e2 = np.array([0, 1, 0, 0], np.float32)
    frames = np.stack([e1, e1, e2, e1, e2])[None]  # [1, 5, 4]: CLS + 4 frames
    tc = float(tc_per_window(jnp.asarray(frames))[0])
    np.testing.assert_allclose(tc, np.sqrt(2.0), atol=1e-6)


def test_segment_mean(rng):
    v = rng.normal(size=(6, 3)).astype(np.float32)
    seg = np.array([0, 0, 1, 1, 1, 3])
    out = np.asarray(segment_mean(jnp.asarray(v), jnp.asarray(seg), 4))
    np.testing.assert_allclose(out[0], v[:2].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[1], v[2:5].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[2], 0.0)  # empty segment -> 0 (count clamped)
    np.testing.assert_allclose(out[3], v[5], atol=1e-6)


def test_centroids_normalized(rng):
    emb = rng.normal(size=(20, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    labels = rng.integers(0, 3, size=20).astype(np.int32)
    cen, counts = build_centroids(jnp.asarray(emb), jnp.asarray(labels), 3)
    cen = np.asarray(cen)
    np.testing.assert_allclose(np.linalg.norm(cen, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(counts), np.bincount(labels, minlength=3).astype(np.float32)
    )


def test_ac_zero_when_embedding_equals_centroid(rng):
    D = 8
    e = rng.normal(size=(1, D)).astype(np.float32)
    e /= np.linalg.norm(e)
    seqs = np.repeat(e, 4, axis=0)            # 4 windows, same embedding
    win_video = np.zeros(4, np.int32)
    centroids = e.copy()
    ac = np.asarray(
        video_ac_scores(
            jnp.asarray(seqs),
            jnp.asarray(win_video),
            jnp.asarray(np.zeros(1, np.int32)),
            jnp.asarray(centroids),
        )
    )
    np.testing.assert_allclose(ac, 0.0, atol=1e-5)


def test_video_tc_aggregation():
    window_tc = np.array([1.0, 3.0, 5.0], np.float32)
    win_video = np.array([0, 0, 1], np.int32)
    out = np.asarray(video_tc_scores(jnp.asarray(window_tc), jnp.asarray(win_video), 2))
    np.testing.assert_allclose(out, [2.0, 5.0])


def test_match_exact_and_suffix_fallback():
    model = {"Hunyuan_JumpingJack_01_abcd": 0.5, "wan21_PushUps_02_efgh": 0.7}
    human = {
        "Hunyuan_videos_JumpingJack_01_abcd.mp4": {"ac": 1.0},   # exact after norm
        "SomethingElse_02_efgh.mp4": {"ac": 2.0},                # suffix fallback
        "NoMatchAtAll.mp4": {"ac": 3.0},                         # unmatched
    }
    mv, hv, matched = match_scores(model, human, "ac")
    assert mv == [0.5, 0.7]
    assert hv == [1.0, 2.0]
    assert len(matched) == 2


def test_correlation_sign_inverted():
    # model distance perfectly anti-correlated with human quality -> +1
    model = {f"v_{i}": float(10 - i) for i in range(10)}
    human = {f"v_{i}.mp4": {"ac": float(i)} for i in range(10)}
    out = match_and_correlate(model, human, "ac")
    np.testing.assert_allclose(out["spearman"], 1.0, atol=1e-9)
    assert out["n"] == 10


def test_correlation_too_few_matches():
    out = match_and_correlate({"a": 1.0}, {"a.mp4": {"ac": 1.0}}, "ac")
    assert out["spearman"] is None and out["n"] == 1


def test_empty_class_centroid_is_nan(rng):
    """A class with ZERO training windows gets a NaN centroid (the
    reference's mean over an empty set), not a zero centroid — a zero
    centroid would score every video of that class at a fabricated
    constant AC of exactly 1.0."""
    emb = rng.normal(size=(6, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    labels = np.array([0, 0, 2, 2, 2, 0], np.int32)  # class 1 empty
    cen, counts = build_centroids(jnp.asarray(emb), jnp.asarray(labels), 3)
    cen = np.asarray(cen)
    assert np.all(np.isnan(cen[1]))
    assert np.all(np.isfinite(cen[[0, 2]]))
    np.testing.assert_allclose(
        np.linalg.norm(cen[[0, 2]], axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(counts), [3, 0, 3])
