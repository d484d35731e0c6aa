"""Measure the reference-equivalent torch-CPU scoring throughput.

The reference publishes no throughput numbers (BASELINE.md), so this script
measures a faithful torch re-creation of its scoring hot path — per-window
batches through a torch HumanActionScorer-architecture model built from
standard ``torch.nn`` modules (batch 32, CPU, eval mode, ref ``eval.py:410-425``)
— and stores windows/sec in ``BENCH_BASELINE.json`` for ``bench.py`` to
compute ``vs_baseline`` against.

Run once per machine: ``python scripts/measure_baseline.py``.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# architecture hyperparameters of the flagship configuration
DIMS_RAW = {"vit": 1024, "global": 9, "pose": 207, "beta": 10, "kp2d": 120}
DIMS_DIFF = {"vit": 1024, "global": 3, "pose": 69, "beta": 10, "kp2d": 120}
D_MODEL, HEADS, LAYERS, CLIP_LEN = 256, 8, 4, 32
BATCH = 32  # ref eval.py:412


class _ConvBlock(nn.Module):
    def __init__(self, c: int, k: int = 5, dilation: int = 1):
        super().__init__()
        pad = dilation * (k - 1) // 2
        self.conv1 = nn.Conv1d(c, c, k, padding=pad, dilation=dilation, bias=False)
        self.conv2 = nn.Conv1d(c, c, k, padding=pad, dilation=dilation, bias=False)
        self.norm = nn.GroupNorm(1, c)

    def forward(self, x):
        y = F.gelu(self.conv1(x))
        y = self.conv2(y)
        return self.norm(F.gelu(y + x))


class _MovementEncoder(nn.Module):
    def __init__(self, d_in: int, d_out: int):
        super().__init__()
        self.stem = nn.Conv1d(d_in, d_out, 1, bias=False)
        self.blocks = nn.ModuleList([_ConvBlock(d_out, dilation=d) for d in (1, 2, 4, 8)])
        self.proj = nn.Linear(d_out, d_out, bias=False)

    def forward(self, x):
        y = self.stem(x.transpose(1, 2))
        for b in self.blocks:
            y = b(y)
        return self.proj(y.transpose(1, 2))


class _Scorer(nn.Module):
    def __init__(self):
        super().__init__()
        self.state_enc = nn.ModuleDict({m: _MovementEncoder(d, D_MODEL) for m, d in DIMS_RAW.items()})
        self.motion_enc = nn.ModuleDict({m: _MovementEncoder(d, D_MODEL) for m, d in DIMS_DIFF.items()})
        self.latent = nn.Parameter(torch.randn(1, 1, D_MODEL))
        self.q_ln = nn.LayerNorm(D_MODEL)
        self.kv_ln = nn.LayerNorm(D_MODEL)
        self.Wq = nn.Linear(D_MODEL, D_MODEL, bias=False)
        self.Wk = nn.Linear(D_MODEL, D_MODEL, bias=False)
        self.Wv = nn.Linear(D_MODEL, D_MODEL, bias=False)
        self.Wo = nn.Linear(D_MODEL, D_MODEL, bias=False)
        self.logit_temp = nn.Parameter(torch.zeros(len(DIMS_RAW)))
        self.logit_bias = nn.Parameter(torch.zeros(len(DIMS_RAW)))
        self.cls = nn.Parameter(torch.randn(1, 1, D_MODEL))
        layer = nn.TransformerEncoderLayer(D_MODEL, HEADS, 4 * D_MODEL, 0.1, batch_first=True)
        self.temporal = nn.TransformerEncoder(layer, LAYERS)

    def forward(self, x):
        B, Tl, _ = x.shape
        raw_dims = list(DIMS_RAW.values())
        diff_dims = list(DIMS_DIFF.values())
        raw = x[:, :, : sum(raw_dims)]
        diff = x[:, :, sum(raw_dims) :]
        raws = torch.split(raw, raw_dims, dim=-1)
        diffs = torch.split(diff, diff_dims, dim=-1)
        toks = []
        for (m, _), r, d in zip(DIMS_RAW.items(), raws, diffs):
            s = self.state_enc[m](r) + self.motion_enc[m](d)
            toks.append(F.layer_norm(s, (D_MODEL,)).unsqueeze(2))
        M = torch.cat(toks, dim=2)
        kv = self.kv_ln(M).view(B * Tl, len(DIMS_RAW), D_MODEL)
        q = self.q_ln(self.latent.expand(B * Tl, 1, D_MODEL))
        A = (
            (self.Wq(q) @ self.Wk(kv).transpose(-2, -1)) / math.sqrt(D_MODEL)
            / (F.softplus(self.logit_temp) + 1e-3).view(1, 1, -1)
            + self.logit_bias.view(1, 1, -1)
        ).softmax(-1)
        fused = self.Wo((A @ self.Wv(kv)).squeeze(1)).view(B, Tl, D_MODEL)
        tokens = torch.cat([self.cls.expand(B, 1, D_MODEL), fused], dim=1)
        tokens = self.temporal(tokens)
        seq = F.normalize(tokens[:, 0])
        frames = F.normalize(tokens, dim=-1)
        tc = (frames[:, 2:] - frames[:, 1:-1]).pow(2).sum(-1).sqrt().mean(-1)
        return seq, tc


def main() -> None:
    torch.set_num_threads(os.cpu_count() or 8)
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    D = sum(DIMS_RAW.values()) + sum(DIMS_DIFF.values())
    model = _Scorer().eval()
    x = torch.randn(n_windows, CLIP_LEN, D)

    with torch.no_grad():
        _ = model(x[:BATCH])  # warmup
        t0 = time.perf_counter()
        for lo in range(0, n_windows, BATCH):
            _ = model(x[lo : lo + BATCH])
        dt = time.perf_counter() - t0

    wps = n_windows / dt
    out = {
        "metric": "TAG scoring clips/sec (windows through fusion encoder + TC)",
        "windows_per_sec": wps,
        "hardware": "cpu-torch-reference-equivalent",
        "n_windows": n_windows,
        "batch": BATCH,
        "torch_threads": torch.get_num_threads(),
    }
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_BASELINE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
