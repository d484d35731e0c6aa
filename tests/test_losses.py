"""Loss parity tests against independent torch/numpy derivations of the specs."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from video_gen_evals_tpu.train import (
    tcl_loss,
    supcon_hard_negatives,
    hard_neg_infonce,
    arc_margin_logits,
    margin_hard_negatives,
)


def _unit_rows(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def torch_tcl(proj, targets, tau=0.1, k1=5000.0, k2=1.0):
    proj = torch.from_numpy(proj)
    targets = torch.from_numpy(targets)
    sim = proj @ proj.T
    e = torch.exp(sim / tau)
    en = torch.exp(-sim)
    same = targets.unsqueeze(1) == targets.unsqueeze(0)
    eye = torch.eye(len(targets), dtype=torch.bool)
    mp = (same & ~eye).float()
    mn = (~same).float()
    denom = (e * mp).sum(1) + k1 * (en * mp).sum(1) + k2 * (e * mn).sum(1)
    per = (-torch.log(e / denom.unsqueeze(1)) * mp).sum(1) / mp.sum(1)
    return per.mean().item()


def test_tcl_matches_torch(rng):
    proj = _unit_rows(rng, (24, 16))
    targets = rng.integers(0, 4, size=24).astype(np.int32)
    ours = float(tcl_loss(jnp.asarray(proj), jnp.asarray(targets)))
    oracle = torch_tcl(proj, targets.astype(np.int64))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4)


def test_supcon_hard_negatives_matches_torch(rng):
    a = _unit_rows(rng, (10, 8))
    p = _unit_rows(rng, (10, 8))
    n = _unit_rows(rng, (10, 8))
    ours = float(supcon_hard_negatives(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
    sim_ap = torch.sum(torch.from_numpy(a * p), dim=-1) / 0.07
    sim_ah = torch.sum(torch.from_numpy(a * n), dim=-1) / 0.07
    logits = torch.stack([sim_ap, sim_ah], dim=1)
    oracle = F.cross_entropy(logits, torch.zeros(10, dtype=torch.long)).item()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_supcon_identical_negative_gives_log2(rng):
    a = _unit_rows(rng, (6, 8))
    val = float(supcon_hard_negatives(jnp.asarray(a), jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(val, np.log(2.0), rtol=1e-5)


def test_hard_neg_infonce_matches_torch(rng):
    a = _unit_rows(rng, (7, 8))
    negs = _unit_rows(rng, (7, 3, 8))
    ours = float(hard_neg_infonce(jnp.asarray(a), jnp.asarray(negs), neg_margin=0.05))
    at = torch.from_numpy(a)
    nt = torch.from_numpy(negs)
    sim_ap = (at * at).sum(-1, keepdim=True)
    sim_an = torch.einsum("bd,bkd->bk", at, nt) + 0.05
    logits = torch.cat([sim_ap, sim_an], dim=1) / 0.07
    oracle = F.cross_entropy(logits, torch.zeros(7, dtype=torch.long)).item()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-7)


def test_arc_margin_matches_torch(rng):
    x = rng.normal(size=(9, 12)).astype(np.float32)
    w = rng.normal(size=(5, 12)).astype(np.float32)
    labels = rng.integers(0, 5, size=9).astype(np.int32)
    ours = np.asarray(arc_margin_logits(jnp.asarray(x), jnp.asarray(labels), jnp.asarray(w)))

    import math

    xt = F.normalize(torch.from_numpy(x))
    wt = F.normalize(torch.from_numpy(w))
    cos = F.linear(xt, wt)
    sin = torch.sqrt(1.0 - cos**2 + 1e-7)
    phi = cos * math.cos(0.30) - sin * math.sin(0.30)
    one_hot = torch.zeros_like(cos).scatter_(
        1, torch.from_numpy(labels.astype(np.int64)).view(-1, 1), 1.0
    )
    oracle = ((one_hot * phi) + ((1.0 - one_hot) * cos)) * 30.0
    np.testing.assert_allclose(ours, oracle.numpy(), atol=1e-4)


def test_margin_hard_negatives(rng):
    a = _unit_rows(rng, (8, 6))
    p = _unit_rows(rng, (8, 6))
    n = _unit_rows(rng, (8, 6))
    ours = float(margin_hard_negatives(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
    s_pos = np.sum(a * p, axis=-1)
    s_neg = np.sum(a * n, axis=-1)
    oracle = np.maximum(0.0, 0.15 - s_pos + s_neg).mean()
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)
