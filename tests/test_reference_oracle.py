"""Direct parity against the reference's OWN executable modules.

Unlike the hand-built torch oracles elsewhere in the suite, these tests import
``/root/reference/model.py`` and ``/root/reference/losses.py`` verbatim
(torch-only dependencies), convert the reference model's freshly-initialized
state_dict through :mod:`video_gen_evals_tpu.models.torch_compat`, and assert
our flax forward / loss functions reproduce the reference's outputs. This
closes the "oracle could share the implementer's misreading" hole: the
reference code itself is the oracle (ref ``model.py:102-193``,
``losses.py:6-156``).
"""

import importlib.util
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference repo not present"
)


def _load_ref(name: str, filename: str):
    spec = importlib.util.spec_from_file_location(
        f"ref_tag_{name}", os.path.join(REF_DIR, filename)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_model_mod():
    return _load_ref("model", "model.py")


@pytest.fixture(scope="module")
def ref_losses_mod():
    return _load_ref("losses", "losses.py")


DIMS_RAW = {"vit": 48, "global": 9, "pose": 45, "beta": 10, "kp2d": 24}
DIMS_DIFF = {"vit": 48, "global": 3, "pose": 15, "beta": 10, "kp2d": 24}


def test_forward_matches_reference_module(ref_model_mod):
    """Reference torch HumanActionScorer (random init) == our flax model with
    converted weights, on the same batch, to float32 numerical noise."""
    from video_gen_evals_tpu.models import EncoderConfig, HumanActionScorer
    from video_gen_evals_tpu.models.torch_compat import torch_state_dict_to_flax

    torch.manual_seed(0)
    ref = ref_model_mod.HumanActionScorer(
        DIMS_RAW, DIMS_DIFF, d_model=64, latent_dim=32, time_layers=2,
        time_heads=4, dropout=0.0,
    ).eval()

    cfg = EncoderConfig.create(
        DIMS_RAW, DIMS_DIFF, d_model=64, latent_dim=32, time_layers=2,
        time_heads=4, dropout=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_state_dict_to_flax(sd, cfg)

    rng = np.random.default_rng(7)
    B, T = 4, 16
    D = sum(DIMS_RAW.values()) + sum(DIMS_DIFF.values())
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    with torch.no_grad():
        seq_t, frames_t, tokens_t = ref(torch.from_numpy(x))

    model = HumanActionScorer(cfg)
    seq_j, frames_j, tokens_j = model.apply(
        {"params": params}, jnp.asarray(x), deterministic=True
    )

    np.testing.assert_allclose(np.asarray(seq_j), seq_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(frames_j), frames_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tokens_j), tokens_t.numpy(), atol=2e-5)


def test_forward_matches_reference_no_diff_modalities(ref_model_mod):
    """has_diff=False branch: all-zero diff dims -> reference skips motion_enc."""
    from video_gen_evals_tpu.models import EncoderConfig, HumanActionScorer
    from video_gen_evals_tpu.models.torch_compat import torch_state_dict_to_flax

    dims_raw = {"vit": 32, "beta": 10}
    dims_diff = {"vit": 0, "beta": 0}
    torch.manual_seed(3)
    ref = ref_model_mod.HumanActionScorer(
        dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4, dropout=0.0
    ).eval()
    cfg = EncoderConfig.create(
        dims_raw, dims_diff, d_model=32, time_layers=1, time_heads=4, dropout=0.0
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_state_dict_to_flax(sd, cfg)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(3, 8, 42)).astype(np.float32)
    with torch.no_grad():
        seq_t, _, tokens_t = ref(torch.from_numpy(x))
    model = HumanActionScorer(cfg)
    seq_j, _, tokens_j = model.apply({"params": params}, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(seq_j), seq_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tokens_j), tokens_t.numpy(), atol=2e-5)


def _rand_unit(rng, *shape):
    v = rng.normal(size=shape).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_tcl_matches_reference_module(ref_losses_mod):
    from video_gen_evals_tpu.train.losses import tcl_loss

    rng = np.random.default_rng(0)
    proj = _rand_unit(rng, 12, 16)
    targets = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3], np.int64)
    ref = ref_losses_mod.TCL(temperature=0.1, k1=5000.0, k2=1.0)
    want = float(ref(torch.from_numpy(proj), torch.from_numpy(targets)))
    got = float(tcl_loss(jnp.asarray(proj), jnp.asarray(targets.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_supcon_hard_matches_reference_module(ref_losses_mod):
    from video_gen_evals_tpu.train.losses import supcon_hard_negatives

    rng = np.random.default_rng(1)
    a, p, h = (_rand_unit(rng, 8, 16) for _ in range(3))
    ref = ref_losses_mod.SupConWithHardNegatives(temperature=0.07)
    want = float(ref(*map(torch.from_numpy, (a, p, h))))
    got = float(supcon_hard_negatives(*map(jnp.asarray, (a, p, h))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hard_neg_infonce_matches_reference_module(ref_losses_mod):
    from video_gen_evals_tpu.train.losses import hard_neg_infonce

    rng = np.random.default_rng(2)
    a = _rand_unit(rng, 8, 16)
    negs = _rand_unit(rng, 8, 3, 16)
    ref = ref_losses_mod.HardNegInfoNCE(temperature=0.07, neg_margin=0.05)
    want = float(ref(torch.from_numpy(a), torch.from_numpy(negs)))
    got = float(hard_neg_infonce(jnp.asarray(a), jnp.asarray(negs), neg_margin=0.05))
    # the loss value itself is tiny (logsumexp of well-separated logits):
    # absolute tolerance is the meaningful comparison
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_arc_margin_matches_reference_module(ref_losses_mod):
    from video_gen_evals_tpu.train.losses import arc_margin_logits

    rng = np.random.default_rng(3)
    torch.manual_seed(5)
    ref = ref_losses_mod.ArcMarginProduct(16, 5, s=30.0, m=0.30)
    x = rng.normal(size=(6, 16)).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4, 0], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(labels)).numpy()
    got = np.asarray(
        arc_margin_logits(
            jnp.asarray(x),
            jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(ref.weight.detach().numpy()),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_margin_hard_matches_reference_module(ref_losses_mod):
    from video_gen_evals_tpu.train.losses import margin_hard_negatives

    rng = np.random.default_rng(4)
    a, p, n = (_rand_unit(rng, 8, 16) for _ in range(3))
    ref = ref_losses_mod.MarginHardNegativesLoss(margin=0.15)
    want = float(ref(*map(torch.from_numpy, (a, p, n))))
    got = float(margin_hard_negatives(*map(jnp.asarray, (a, p, n))))
    np.testing.assert_allclose(got, want, rtol=1e-5)
