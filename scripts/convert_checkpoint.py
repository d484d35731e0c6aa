"""Convert checkpoints between the reference's torch format and orbax.

torch -> orbax:  python scripts/convert_checkpoint.py --torch model.pt --out ckpt_dir \
                   [--vit-dim 1024] [--modalities vit,global,pose,beta,kp2d]
orbax -> torch:  python scripts/convert_checkpoint.py --orbax ckpt_dir --out model.pt

The torch side accepts bare state dicts or model_state_dict/state_dict
wrappers (ref eval.py:136-165 permissive loading).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_gen_evals_tpu.core.config import DEFAULT_DIMS_DIFF, DEFAULT_DIMS_RAW
from video_gen_evals_tpu.models import EncoderConfig


def build_config(vit_dim: int, modalities: list) -> EncoderConfig:
    dims_raw = {m: (vit_dim if m == "vit" else DEFAULT_DIMS_RAW[m]) for m in modalities}
    dims_diff = {m: (vit_dim if m == "vit" else DEFAULT_DIMS_DIFF[m]) for m in modalities}
    return EncoderConfig.create(dims_raw, dims_diff)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--torch", dest="torch_path", default=None)
    p.add_argument("--orbax", dest="orbax_path", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--vit-dim", type=int, default=1024)
    p.add_argument("--modalities", default="vit,global,pose,beta,kp2d")
    args = p.parse_args()

    cfg = build_config(args.vit_dim, args.modalities.split(","))
    if args.torch_path:
        from video_gen_evals_tpu.models.torch_compat import load_torch_checkpoint
        from video_gen_evals_tpu.train.checkpoint import save_params

        params = load_torch_checkpoint(args.torch_path, cfg)
        save_params(args.out, params)
        print(f"wrote orbax checkpoint to {args.out}")
    elif args.orbax_path:
        import torch

        from video_gen_evals_tpu.models.torch_compat import (
            flax_params_to_torch_state_dict,
        )
        from video_gen_evals_tpu.train.checkpoint import restore_params

        params = restore_params(args.orbax_path)
        sd = flax_params_to_torch_state_dict(params, cfg)
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.out)
        print(f"wrote torch checkpoint to {args.out}")
    else:
        p.error("one of --torch / --orbax is required")


if __name__ == "__main__":
    main()
