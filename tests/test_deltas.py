"""vit/betas delta features: conventions and torch parity."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from video_gen_evals_tpu.ops import vit_delta, betas_delta


def test_vit_delta_first_row_zero(rng):
    v = rng.normal(size=(9, 32)).astype(np.float32)
    d = np.asarray(vit_delta(jnp.asarray(v)))
    np.testing.assert_allclose(d[0], 0.0, atol=1e-7)


def test_vit_delta_matches_torch(rng):
    v = rng.normal(size=(16, 64)).astype(np.float32)
    vt = torch.from_numpy(v)
    vn = F.normalize(vt, dim=-1)
    oracle = (vn - torch.cat([vn[:1], vn[:-1]], dim=0)).numpy()
    ours = np.asarray(vit_delta(jnp.asarray(v)))
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_vit_delta_scale_invariant(rng):
    v = rng.normal(size=(5, 16)).astype(np.float32)
    d1 = np.asarray(vit_delta(jnp.asarray(v)))
    d2 = np.asarray(vit_delta(jnp.asarray(v * 100.0)))
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_betas_delta(rng):
    b = rng.normal(size=(6, 10)).astype(np.float32)
    d = np.asarray(betas_delta(jnp.asarray(b)))
    np.testing.assert_allclose(d[0], 0.0)
    np.testing.assert_allclose(d[1:], b[1:] - b[:-1], atol=1e-7)
