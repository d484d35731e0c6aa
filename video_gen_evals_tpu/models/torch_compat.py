"""Torch-checkpoint <-> Flax parameter conversion for the fusion encoder.

The reference trains/saves a torch ``HumanActionScorer`` state_dict
(ref ``train.py:81-83``, loaded permissively at ref ``eval.py:136-165``).
To validate score parity on TAG-Bench against a published ``model.pt``, this
module maps that state_dict onto the param tree of
:class:`video_gen_evals_tpu.models.fusion_encoder.HumanActionScorer` and back.

Layout conventions:
- torch ``Conv1d.weight``  is ``[out, in, k]``; flax ``Conv.kernel`` is ``[k, in, out]``.
- torch ``Linear.weight``  is ``[out, in]``;   flax ``Dense.kernel`` is ``[in, out]``.
- torch ``MultiheadAttention`` packs qkv in ``in_proj_weight [3D, D]``; our
  ``in_proj`` Dense uses kernel ``[D, 3D]`` with the same q,k,v order.
- ``pos_enc.pe`` is a deterministic buffer and is ignored (recomputed).

Works on plain numpy arrays so no torch import is required at runtime; pass
``{name: np.ndarray}`` (e.g. ``{k: v.numpy() for k, v in sd.items()}``).
"""

from __future__ import annotations

import typing as T

import numpy as np

from .fusion_encoder import EncoderConfig

Array = np.ndarray
TorchStateDict = T.Dict[str, Array]
FlaxParams = T.Dict[str, T.Any]


def _conv_t2f(w: Array) -> Array:
    return np.transpose(w, (2, 1, 0))


def _dense_t2f(w: Array) -> Array:
    return np.transpose(w, (1, 0))


def _movement_encoder_t2f(sd: TorchStateDict, prefix: str) -> FlaxParams:
    out: FlaxParams = {"stem": {"kernel": _conv_t2f(sd[f"{prefix}.stem.weight"])}}
    i = 0
    while f"{prefix}.blocks.{i}.conv1.weight" in sd:
        out[f"block{i}"] = {
            "conv1": {"kernel": _conv_t2f(sd[f"{prefix}.blocks.{i}.conv1.weight"])},
            "conv2": {"kernel": _conv_t2f(sd[f"{prefix}.blocks.{i}.conv2.weight"])},
            "norm": {
                "scale": sd[f"{prefix}.blocks.{i}.norm.weight"],
                "bias": sd[f"{prefix}.blocks.{i}.norm.bias"],
            },
        }
        i += 1
    out["proj"] = {"kernel": _dense_t2f(sd[f"{prefix}.proj.weight"])}
    return out


class _TrackingDict(dict):
    """Records which keys the converter consumed (strict-mode accounting)."""

    def __init__(self, d):
        super().__init__(d)
        self.used: T.Set[str] = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


def torch_state_dict_to_flax(
    sd: TorchStateDict, config: EncoderConfig, strict: bool = False
) -> FlaxParams:
    """Convert a reference-layout torch state_dict into our flax param tree.

    ``strict=False`` (default) mirrors the reference's permissive
    ``strict=False`` loading (ref ``eval.py:136-165``, gated by
    ``BugCompat.permissive_ckpt``); ``strict=True`` raises on any torch key
    the conversion did not consume (deterministic ``pos_enc.pe`` buffers are
    always exempt — they are recomputed)."""
    sd = _TrackingDict(sd)
    params: FlaxParams = {}
    diff_dims = dict(config.dims_map_diff)

    for m, _ in config.dims_map_raw:
        params[f"state_enc_{m}"] = _movement_encoder_t2f(sd, f"state_enc.{m}")
        if config.has_diff and diff_dims[m] > 0 and f"motion_enc.{m}.stem.weight" in sd:
            params[f"motion_enc_{m}"] = _movement_encoder_t2f(sd, f"motion_enc.{m}")

    params["fusion"] = {
        "latent": sd["fusion.latent"],
        "q_ln": {"scale": sd["fusion.q_ln.weight"], "bias": sd["fusion.q_ln.bias"]},
        "kv_ln": {"scale": sd["fusion.kv_ln.weight"], "bias": sd["fusion.kv_ln.bias"]},
        "Wq": {"kernel": _dense_t2f(sd["fusion.Wq.weight"])},
        "Wk": {"kernel": _dense_t2f(sd["fusion.Wk.weight"])},
        "Wv": {"kernel": _dense_t2f(sd["fusion.Wv.weight"])},
        "Wo": {"kernel": _dense_t2f(sd["fusion.Wo.weight"])},
        "logit_temp": sd["fusion.logit_temp"],
        "logit_bias": sd["fusion.logit_bias"],
    }
    params["cls"] = sd["cls"]

    for i in range(config.time_layers):
        p = f"temporal.layers.{i}"
        params[f"temporal{i}"] = {
            "in_proj": {
                "kernel": _dense_t2f(sd[f"{p}.self_attn.in_proj_weight"]),
                "bias": sd[f"{p}.self_attn.in_proj_bias"],
            },
            "out_proj": {
                "kernel": _dense_t2f(sd[f"{p}.self_attn.out_proj.weight"]),
                "bias": sd[f"{p}.self_attn.out_proj.bias"],
            },
            "linear1": {
                "kernel": _dense_t2f(sd[f"{p}.linear1.weight"]),
                "bias": sd[f"{p}.linear1.bias"],
            },
            "linear2": {
                "kernel": _dense_t2f(sd[f"{p}.linear2.weight"]),
                "bias": sd[f"{p}.linear2.bias"],
            },
            "ln1": {"scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
            "ln2": {"scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
        }

    if strict:
        leftovers = {
            k for k in sd if k not in sd.used and "pos_enc.pe" not in k
        }
        if leftovers:
            raise KeyError(
                f"strict conversion: {len(leftovers)} unconsumed torch keys, "
                f"e.g. {sorted(leftovers)[:5]}"
            )
    return params


def _movement_encoder_f2t(p: FlaxParams, prefix: str, sd: TorchStateDict) -> None:
    sd[f"{prefix}.stem.weight"] = _conv_t2f(np.asarray(p["stem"]["kernel"]))
    i = 0
    while f"block{i}" in p:
        b = p[f"block{i}"]
        sd[f"{prefix}.blocks.{i}.conv1.weight"] = _conv_t2f(np.asarray(b["conv1"]["kernel"]))
        sd[f"{prefix}.blocks.{i}.conv2.weight"] = _conv_t2f(np.asarray(b["conv2"]["kernel"]))
        sd[f"{prefix}.blocks.{i}.norm.weight"] = np.asarray(b["norm"]["scale"])
        sd[f"{prefix}.blocks.{i}.norm.bias"] = np.asarray(b["norm"]["bias"])
        i += 1
    sd[f"{prefix}.proj.weight"] = _dense_t2f(np.asarray(p["proj"]["kernel"]))


def flax_params_to_torch_state_dict(
    params: FlaxParams, config: EncoderConfig
) -> TorchStateDict:
    """Inverse conversion (used for round-trip tests and exporting)."""
    sd: TorchStateDict = {}
    diff_dims = dict(config.dims_map_diff)
    for m, _ in config.dims_map_raw:
        _movement_encoder_f2t(params[f"state_enc_{m}"], f"state_enc.{m}", sd)
        if config.has_diff and diff_dims[m] > 0 and f"motion_enc_{m}" in params:
            _movement_encoder_f2t(params[f"motion_enc_{m}"], f"motion_enc.{m}", sd)

    f = params["fusion"]
    sd["fusion.latent"] = np.asarray(f["latent"])
    sd["fusion.q_ln.weight"] = np.asarray(f["q_ln"]["scale"])
    sd["fusion.q_ln.bias"] = np.asarray(f["q_ln"]["bias"])
    sd["fusion.kv_ln.weight"] = np.asarray(f["kv_ln"]["scale"])
    sd["fusion.kv_ln.bias"] = np.asarray(f["kv_ln"]["bias"])
    for w in ("Wq", "Wk", "Wv", "Wo"):
        sd[f"fusion.{w}.weight"] = _dense_t2f(np.asarray(f[w]["kernel"]))
    sd["fusion.logit_temp"] = np.asarray(f["logit_temp"])
    sd["fusion.logit_bias"] = np.asarray(f["logit_bias"])
    sd["cls"] = np.asarray(params["cls"])

    for i in range(config.time_layers):
        t = params[f"temporal{i}"]
        p = f"temporal.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = _dense_t2f(np.asarray(t["in_proj"]["kernel"]))
        sd[f"{p}.self_attn.in_proj_bias"] = np.asarray(t["in_proj"]["bias"])
        sd[f"{p}.self_attn.out_proj.weight"] = _dense_t2f(np.asarray(t["out_proj"]["kernel"]))
        sd[f"{p}.self_attn.out_proj.bias"] = np.asarray(t["out_proj"]["bias"])
        sd[f"{p}.linear1.weight"] = _dense_t2f(np.asarray(t["linear1"]["kernel"]))
        sd[f"{p}.linear1.bias"] = np.asarray(t["linear1"]["bias"])
        sd[f"{p}.linear2.weight"] = _dense_t2f(np.asarray(t["linear2"]["kernel"]))
        sd[f"{p}.linear2.bias"] = np.asarray(t["linear2"]["bias"])
        sd[f"{p}.norm1.weight"] = np.asarray(t["ln1"]["scale"])
        sd[f"{p}.norm1.bias"] = np.asarray(t["ln1"]["bias"])
        sd[f"{p}.norm2.weight"] = np.asarray(t["ln2"]["scale"])
        sd[f"{p}.norm2.bias"] = np.asarray(t["ln2"]["bias"])

    # the reference model's state_dict also carries the (deterministic)
    # sinusoidal-PE buffer ``pos_enc.pe`` [1, 5000, d_model] (ref
    # ``model.py:8-16``: max_len=5000, even dims sin / odd dims cos); emit
    # it so exported checkpoints cover the reference's EXACT key set and
    # survive a third-party ``load_state_dict(strict=True)``
    d = config.d_model
    pos = np.arange(5000, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, d, 2, dtype=np.float32) * (-np.log(10000.0) / d)
    )
    pe = np.zeros((5000, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    sd["pos_enc.pe"] = pe[None]

    return sd


def load_torch_checkpoint(
    path: str, config: EncoderConfig, strict: bool = False
) -> FlaxParams:
    """Load a reference ``.pt`` checkpoint (permissive like ref ``eval.py:136-165``:
    accepts ``model_state_dict`` / ``state_dict`` wrappers or a bare dict).
    ``strict=True`` (``--no-bug-compat``) raises on unconsumed keys.

    Deliberately NOT ``pipelines.weights.load_torch_state_dict``: that
    loader is the permissive published-container reader (extra ``model``
    wrapper key, uniform ``module.``/``model.`` prefix strip) — this one
    reproduces the reference's OWN unwrap order and nothing more, so
    encoder-checkpoint loading behaves bit-for-bit like ``eval.py``."""
    import torch  # local import: only needed when actually converting

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return torch_state_dict_to_flax(sd_np, config, strict=strict)
