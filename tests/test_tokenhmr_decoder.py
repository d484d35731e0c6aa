"""Weight-conversion parity for the TokenHMR/HMR2 TransformerDecoder.

The reference's SMPL head builds ``TransformerDecoder(num_tokens=1,
token_dim=1, dim=1024, ...)`` from the upstream ``pose_transformer`` module
(ref ``modifications/token_head.py:145-153``) — ``token_out``, the per-frame
"vit" modality, is exactly this decoder's output. The upstream package isn't
shipped, so this test reconstructs its published torch architecture verbatim
(PreNorm blocks, fused to_qkv / to_kv, inner dim = heads*dim_head != dim,
token embedding + pos embedding, no final norm), random-initializes it, and
asserts :func:`torch_head_to_flax` + our flax ``CrossAttentionDecoder``
reproduce its forward bit-for-bit at float32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn


# ---- torch replica of the published upstream layout (oracle) ----------------
class PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x, **kw):
        return self.fn(self.norm(x), **kw)


class FeedForward(nn.Module):
    def __init__(self, dim, hidden_dim):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, hidden_dim),
            nn.GELU(),
            nn.Dropout(0.0),
            nn.Linear(hidden_dim, dim),
            nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.net(x)


class Attention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.scale = heads, dim_head ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        B, N, _ = x.shape
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (
            t.view(B, N, self.heads, -1).transpose(1, 2) for t in (q, k, v)
        )
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.to_out(out)


class CrossAttention(nn.Module):
    def __init__(self, dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.scale = heads, dim_head ** -0.5
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(context_dim, inner * 2, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x, context=None):
        B, N, _ = x.shape
        Nc = context.shape[1]
        q = self.to_q(x).view(B, N, self.heads, -1).transpose(1, 2)
        k, v = self.to_kv(context).chunk(2, dim=-1)
        k = k.view(B, Nc, self.heads, -1).transpose(1, 2)
        v = v.view(B, Nc, self.heads, -1).transpose(1, 2)
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.to_out(out)


class TransformerCrossAttn(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim, context_dim):
        super().__init__()
        self.layers = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        PreNorm(dim, Attention(dim, heads, dim_head)),
                        PreNorm(dim, CrossAttention(dim, context_dim, heads, dim_head)),
                        PreNorm(dim, FeedForward(dim, mlp_dim)),
                    ]
                )
                for _ in range(depth)
            ]
        )

    def forward(self, x, context=None):
        for sa, ca, ff in self.layers:
            x = sa(x) + x
            x = ca(x, context=context) + x
            x = ff(x) + x
        return x


class TransformerDecoder(nn.Module):
    def __init__(self, num_tokens, token_dim, dim, depth, heads, dim_head, mlp_dim, context_dim):
        super().__init__()
        self.to_token_embedding = nn.Linear(token_dim, dim)
        self.pos_embedding = nn.Parameter(torch.randn(1, num_tokens, dim))
        self.transformer = TransformerCrossAttn(
            dim, depth, heads, dim_head, mlp_dim, context_dim
        )

    def forward(self, inp, context=None):
        x = self.to_token_embedding(inp)
        n = x.shape[1]
        x = x + self.pos_embedding[:, :n]
        return self.transformer(x, context=context)


# -----------------------------------------------------------------------------
def test_decoder_matches_upstream_torch_layout():
    from video_gen_evals_tpu.models.smpl_head import (
        CrossAttentionDecoder,
        SMPLHeadConfig,
        torch_head_to_flax,
    )

    # inner (heads*dim_head=32) != dim (48): exercises the asymmetric
    # projection shapes of the real config (512 inside 1024)
    cfg = SMPLHeadConfig(
        dim=48, context_dim=40, depth=3, heads=4, dim_head=8, mlp_dim=64
    )
    torch.manual_seed(0)
    ref = TransformerDecoder(
        num_tokens=1, token_dim=1, dim=cfg.dim, depth=cfg.depth, heads=cfg.heads,
        dim_head=cfg.dim_head, mlp_dim=cfg.mlp_dim, context_dim=cfg.context_dim,
    ).eval()

    sd = {f"transformer.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_head_to_flax(sd, cfg)["decoder"]

    rng = np.random.default_rng(1)
    B, N = 3, 12
    token = np.zeros((B, 1, 1), np.float32)
    ctx = rng.normal(size=(B, N, cfg.context_dim)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(token), context=torch.from_numpy(ctx)).numpy()

    dec = CrossAttentionDecoder(cfg)
    got = np.asarray(dec.apply({"params": params}, jnp.asarray(token), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_converter_consumes_every_decoder_key():
    """Every transformer.* torch key must land in the flax tree (no silent
    drops), and the converted tree must match the init tree's structure."""
    from video_gen_evals_tpu.models.smpl_head import (
        CrossAttentionDecoder,
        SMPLHeadConfig,
        torch_head_to_flax,
    )

    cfg = SMPLHeadConfig(dim=32, context_dim=24, depth=2, heads=2, dim_head=8, mlp_dim=48)
    torch.manual_seed(1)
    ref = TransformerDecoder(1, 1, cfg.dim, cfg.depth, cfg.heads, cfg.dim_head, cfg.mlp_dim, cfg.context_dim)
    sd = {f"transformer.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = torch_head_to_flax(sd, cfg)["decoder"]

    n_torch = len(sd)
    n_flax = len(jax.tree_util.tree_leaves(converted))
    assert n_flax == n_torch, f"converted {n_flax} leaves from {n_torch} torch keys"

    dec = CrossAttentionDecoder(cfg)
    init = dec.init(jax.random.key(0), jnp.zeros((1, 1, 1)), jnp.zeros((1, 4, cfg.context_dim)))["params"]
    want_shapes = jax.tree_util.tree_map(lambda x: x.shape, init)
    got_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, converted)
    assert want_shapes == got_shapes


def test_full_head_with_converted_decoder_runs():
    """torch_head_to_flax output (decoder + readouts + IEF buffers) merges
    into the head's init tree and produces the extraction contract shapes."""
    from video_gen_evals_tpu.models.smpl_head import (
        SMPLHeadConfig,
        SMPLTokenDecoderHead,
        torch_head_to_flax,
    )

    cfg = SMPLHeadConfig(
        dim=32, context_dim=24, depth=2, heads=2, dim_head=8, mlp_dim=48,
        token_num=4, token_class_num=16, token_code_dim=8,
    )
    torch.manual_seed(2)
    ref = TransformerDecoder(1, 1, cfg.dim, cfg.depth, cfg.heads, cfg.dim_head, cfg.mlp_dim, cfg.context_dim)
    sd = {f"transformer.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    rng = np.random.default_rng(2)
    for name, shape in (
        ("decpose_grot", (6, cfg.dim)),
        ("decpose_hands", (12, cfg.dim)),
        ("decshape", (10, cfg.dim)),
        ("deccam", (3, cfg.dim)),
    ):
        sd[f"{name}.weight"] = rng.normal(size=shape).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=shape[0]).astype(np.float32)
    sd["init_body_pose"] = rng.normal(size=(1, cfg.npose)).astype(np.float32)
    sd["init_betas"] = rng.normal(size=(1, 10)).astype(np.float32)
    sd["init_cam"] = rng.normal(size=(1, 3)).astype(np.float32)

    head = SMPLTokenDecoderHead(cfg)
    ctx = jnp.asarray(rng.normal(size=(2, 6, cfg.context_dim)).astype(np.float32))
    params = dict(head.init(jax.random.key(0), ctx)["params"])
    converted = torch_head_to_flax(sd, cfg)
    params.update(converted)

    out = head.apply({"params": params}, ctx)
    assert out["body_pose"].shape == (2, cfg.num_body_joints, 3, 3)
    assert out["global_orient"].shape == (2, 1, 3, 3)
    assert out["betas"].shape == (2, 10)
    assert out["token_out"].shape == (2, cfg.dim)
