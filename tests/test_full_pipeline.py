"""BASELINE config 4: frames -> extraction -> features -> encoder -> scores,
all in-process, on tiny networks + synthetic frame stacks. Also the sharded
scoring test (SURVEY §4.5): encode on an 8-device mesh == single device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_gen_evals_tpu.models import EncoderConfig
from video_gen_evals_tpu.models.fusion_encoder import init_encoder
from video_gen_evals_tpu.pipelines.full import score_videos_end_to_end
from video_gen_evals_tpu.pipelines.score import ScoreConfig
from tests.test_extract_pipeline import tiny_extractor


def _stub_single_person_detect(extractor, box=(8.0, 8.0, 32.0, 40.0)):
    """Replace the jitted detect stage with a deterministic single-person
    result: a random-weight YOLOX scores every location near sigmoid(0)^2 ~
    0.25 < the 0.5 threshold, so nothing would ever be detected. The real
    detector forward + NMS + filter semantics are covered by tests/test_yolox.py
    and test_extraction_models.py; this test is about the frames -> scores
    plumbing around it."""

    def fake_detect(params, frames_f32, frame_wh):
        B = frames_f32.shape[0]
        boxes = jnp.tile(jnp.asarray([list(box)], jnp.float32), (B, 1))
        return (
            boxes,                  # mesh box
            boxes,                  # pose box
            jnp.ones((B,), bool),   # exactly-one-person (mesh filter)
            jnp.ones((B,), bool),   # person-present (kp frame gate)
        )

    extractor._detect = fake_detect
    return extractor


def test_frames_to_scores_end_to_end(rng):
    extractor = _stub_single_person_detect(tiny_extractor())
    # encoder matching the tiny extractor's mesh output dims (the random-weight
    # pose net rarely passes the both-hands validity rule, so the kp2d modality
    # is disabled here; its drop logic is exercised in test_extract_pipeline)
    dims_raw = {"vit": 32, "global": 9, "pose": 207, "beta": 10}
    dims_diff = {"vit": 32, "global": 3, "pose": 69, "beta": 10}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=8)

    frames_by_video = {
        f"GenX_JumpingJack_{i:02d}": rng.integers(0, 255, size=(12, 48, 40, 3)).astype(np.uint8)
        for i in range(3)
    }
    label_dict = {"JumpingJack": 0, "PushUps": 1}
    centroids = rng.normal(size=(2, 32)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True)

    result = score_videos_end_to_end(
        extractor,
        model,
        params,
        frames_by_video,
        centroids,
        label_dict,
        cfg=ScoreConfig(clip_len=8, stride=8, batch_size=8),
        with_keypoints=False,
    )
    assert len(result.scores) + len(result.rejected) == 3
    for name, s in result.scores.items():
        assert np.isfinite(s["ac"]) and np.isfinite(s["tc"])
        assert 0 <= s["ac"] <= 2.0 and s["tc"] >= 0
    # the encoder consumed whatever modalities every video produced
    assert "vit" in result.stats.modalities


def test_classless_video_gets_tc_only(rng):
    """A video whose name matches no known class substring is EXCLUDED from
    AC (the reference skips it rather than scoring against an arbitrary
    centroid, ref ``utils.py:1154-1159``) but still gets TC — same semantics
    as the oracled score_bank path."""
    extractor = _stub_single_person_detect(tiny_extractor())
    dims_raw = {"vit": 32, "global": 9, "pose": 207, "beta": 10}
    dims_diff = {"vit": 32, "global": 3, "pose": 69, "beta": 10}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=8)

    frames_by_video = {
        "GenX_JumpingJack_00": rng.integers(0, 255, size=(12, 48, 40, 3)).astype(np.uint8),
        "GenX_mystery_clip_01": rng.integers(0, 255, size=(12, 48, 40, 3)).astype(np.uint8),
    }
    label_dict = {"JumpingJack": 0, "PushUps": 1}
    centroids = rng.normal(size=(2, 32)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True)

    result = score_videos_end_to_end(
        extractor, model, params, frames_by_video, centroids, label_dict,
        cfg=ScoreConfig(clip_len=8, stride=8, batch_size=8),
        with_keypoints=False,
    )
    known = result.scores["GenX_JumpingJack_00"]
    unknown = result.scores["GenX_mystery_clip_01"]
    assert "ac" in known and np.isfinite(known["ac"])
    assert "ac" not in unknown
    assert np.isfinite(unknown["tc"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_window_scoring_matches_serial(rng):
    """Window batch sharded over the mesh data axis scores identically to the
    single-device program (SURVEY §4.5: sharded-window scoring == serial)."""
    from video_gen_evals_tpu.data.features import gather_windows_sliced
    from video_gen_evals_tpu.metrics.scores import tc_per_window
    from video_gen_evals_tpu.parallel import batch_sharding, make_mesh, replicated_sharding

    dims_raw = {"vit": 16, "pose": 18}
    dims_diff = {"vit": 16, "pose": 6}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(1), clip_len=8)
    D = cfg.input_dim

    V, rows, T = 4, 24, 8
    bank = jnp.asarray(rng.normal(size=(V * rows, D)).astype(np.float32))
    offsets = jnp.asarray((np.arange(V) * rows).astype(np.int32))
    row_limit = jnp.asarray(np.full(V, rows - 1, np.int32))
    z0 = jnp.asarray(rng.normal(size=(D - cfg.one_pass_raw,)).astype(np.float32))
    vi = jnp.asarray(np.repeat(np.arange(V), 4).astype(np.int32))
    st = jnp.asarray(np.tile(np.arange(4) * 8, V).astype(np.int32) % 16)

    @jax.jit
    def encode(params, vi, st):
        w = gather_windows_sliced(
            bank, offsets, row_limit, z0, cfg.one_pass_raw, vi, st, T
        )
        seq, frames, _ = model.apply({"params": params}, w, deterministic=True)
        return seq, tc_per_window(frames)

    seq1, tc1 = encode(params, vi, st)

    mesh = make_mesh(n_data=8, n_model=1)
    params_r = jax.device_put(params, replicated_sharding(mesh))
    vi_s = jax.device_put(vi, batch_sharding(mesh))
    st_s = jax.device_put(st, batch_sharding(mesh))
    seq8, tc8 = encode(params_r, vi_s, st_s)

    np.testing.assert_allclose(np.asarray(seq8), np.asarray(seq1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc8), np.asarray(tc1), atol=1e-5)


def test_streamed_extraction_matches_per_video(rng):
    """process_videos_streamed == process_video_full per video (mixed
    lengths + a tiny super-batch bound forcing multiple stream batches)."""
    extractor = _stub_single_person_detect(tiny_extractor())
    items = [
        (f"v{i}", rng.integers(0, 255, size=(t, 48, 40, 3)).astype(np.uint8))
        for i, t in enumerate((6, 11, 9))
    ]
    mesh_by, kp_by = extractor.process_videos_streamed(
        items, with_keypoints=True, max_stream_frames=12
    )
    for name, frames in items:
        mesh_ref, kp_ref = extractor.process_video_full(
            frames, with_keypoints=True
        )
        assert (mesh_by[name] is None) == (mesh_ref is None), name
        if mesh_ref is None:
            continue
        for k_ in mesh_ref:
            np.testing.assert_allclose(
                mesh_by[name][k_], mesh_ref[k_], atol=1e-5, err_msg=f"{name}/{k_}"
            )
        np.testing.assert_array_equal(kp_by[name]["valid"], kp_ref["valid"])
        np.testing.assert_allclose(
            kp_by[name]["kp120"], kp_ref["kp120"], atol=1e-4
        )


def test_streamed_extraction_rejects_per_video(rng):
    """A video failing the single-person ratio test inside a streamed batch
    maps to (None, None) without affecting its batchmates."""
    import jax.numpy as jnp_

    extractor = tiny_extractor()

    def detect_by_brightness(params, frames_f32, frame_wh):
        B = frames_f32.shape[0]
        boxes = jnp_.tile(jnp_.asarray([[8.0, 8.0, 32.0, 40.0]], jnp_.float32),
                          (B, 1))
        single = jnp_.mean(frames_f32, axis=(1, 2, 3)) > 1.0
        return boxes, boxes, single, single

    extractor._detect = detect_by_brightness
    good = rng.integers(50, 255, size=(10, 48, 40, 3)).astype(np.uint8)
    dark = np.zeros((10, 48, 40, 3), np.uint8)   # every frame fails
    items = [("good", good), ("dark", dark), ("good2", good.copy())]
    mesh_by, kp_by = extractor.process_videos_streamed(
        items, with_keypoints=True
    )
    assert mesh_by["dark"] is None and kp_by["dark"] is None
    for name in ("good", "good2"):
        assert mesh_by[name] is not None
        assert mesh_by[name]["vit"].shape[0] == 10
        assert kp_by[name] is not None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_full_pipeline_with_meshed_extractor_matches(rng):
    """Config-4 composition on a dp8 mesh: score_videos_end_to_end with a
    mesh-sharded extractor (ViT/head/pose stages data-parallel over the
    frame batch) produces the same per-video AC/TC as the single-device
    extractor on identical params and frames."""
    from video_gen_evals_tpu.pipelines.extract import Extractor
    from video_gen_evals_tpu.parallel import make_mesh

    base = _stub_single_person_detect(tiny_extractor())
    meshed = _stub_single_person_detect(
        Extractor(base.cfg, params=base.params, mesh=make_mesh(8, 1))
    )

    dims_raw = {"vit": 32, "global": 9, "pose": 207, "beta": 10}
    dims_diff = {"vit": 32, "global": 3, "pose": 69, "beta": 10}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=32,
                               time_layers=1, time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=8)

    frames_by_video = {
        f"GenX_JumpingJack_{i:02d}": rng.integers(
            0, 255, size=(12, 48, 40, 3)
        ).astype(np.uint8)
        for i in range(2)
    }
    label_dict = {"JumpingJack": 0}
    centroids = rng.normal(size=(1, 32)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True)

    results = [
        score_videos_end_to_end(
            ex, model, params, frames_by_video, centroids, label_dict,
            cfg=ScoreConfig(clip_len=8, stride=8, batch_size=8),
            with_keypoints=False,
        )
        for ex in (base, meshed)
    ]
    assert set(results[0].scores) == set(results[1].scores)
    for name in results[0].scores:
        for k in ("ac", "tc"):
            np.testing.assert_allclose(
                results[1].scores[name][k], results[0].scores[name][k],
                atol=1e-4, err_msg=f"{name}:{k}",
            )


def test_device_bank_pipeline_matches_host(rng):
    """Round-5 directive #3: config-4 with the device-resident bank assembly
    (bank_impl='device', extraction outputs never fetched) produces EXACTLY
    the host-assembled scores when given the same stats. With stats=None the
    device path self-normalizes via the f32 stream-stats fast path — scores
    must then agree to well inside the parity budget."""
    extractor = _stub_single_person_detect(tiny_extractor())
    dims_raw = {"vit": 32, "global": 9, "pose": 207, "beta": 10}
    dims_diff = {"vit": 32, "global": 3, "pose": 69, "beta": 10}
    cfg = EncoderConfig.create(
        dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4
    )
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=8)
    frames_by_video = {
        f"GenX_JumpingJack_{i:02d}": rng.integers(
            0, 255, size=(12, 48, 40, 3)
        ).astype(np.uint8)
        for i in range(3)
    }
    label_dict = {"JumpingJack": 0}
    centroids = rng.normal(size=(1, 32)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=-1, keepdims=True)

    def run(bank_impl, stats=None):
        return score_videos_end_to_end(
            extractor, model, params, frames_by_video, centroids, label_dict,
            stats=stats,
            cfg=ScoreConfig(
                clip_len=8, stride=8, batch_size=8, bank_impl=bank_impl
            ),
            with_keypoints=False,
        )

    host = run("host")
    dev = run("device", stats=host.stats)   # same stats -> bitwise bank
    assert set(dev.scores) == set(host.scores)
    for name in host.scores:
        for k in ("ac", "tc"):
            assert dev.scores[name][k] == host.scores[name][k], (name, k)

    dev_self = run("device")                # f32 stream-stats fast path
    for name in host.scores:
        for k in ("ac", "tc"):
            np.testing.assert_allclose(
                dev_self.scores[name][k], host.scores[name][k],
                atol=1e-4, err_msg=f"{name}:{k}",
            )
