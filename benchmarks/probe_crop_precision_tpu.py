"""On-chip check of the crop-matmul precision claim (PARITY.md).

`crop_resize_matmul` pins both contractions to `Precision.HIGHEST` so the
MXU runs them as bf16_3x dots. PARITY.md claims the on-TPU result stays
within bf16_3x rounding (~1e-5 relative, i.e. <~1e-2 absolute in 0-255
pixel units) of the f32 gather form `crop_resize`. The CPU-backend parity
test cannot see this (CPU matmuls are exact f32) — this probe measures the
actual on-chip deltas, plus what DEFAULT precision would have cost
(the advisor's ~0.5-pixel drift estimate, round 2).

Run (tunnel up, background, long timeout):
    python benchmarks/probe_crop_precision_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from video_gen_evals_tpu.utils.compile_cache import enable_compile_cache
from video_gen_evals_tpu.ops.image import crop_resize, crop_resize_matmul


def main() -> None:
    enable_compile_cache()
    rng = np.random.default_rng(0)
    H, W, out = 384, 512, 192
    img = jnp.asarray(rng.uniform(0, 255, size=(H, W, 3)).astype(np.float32))
    boxes = rng.uniform(0, 1, size=(6, 4)).astype(np.float32)
    # cxcywh: centers anywhere in-frame (one spilling), extents 32..0.6*dim
    boxes = np.stack(
        [
            boxes[:, 0] * W,
            boxes[:, 1] * H,
            32 + boxes[:, 2] * W * 0.6,
            32 + boxes[:, 3] * H * 0.6,
        ],
        axis=1,
    )

    @jax.jit
    def run(img):
        outs = []
        for b in boxes:
            box = tuple(float(v) for v in b)
            g = crop_resize(img, box, (out, out))
            m = crop_resize_matmul(img, box, (out, out))
            outs.append((g, m))
        return outs

    pairs = run(img)
    worst = 0.0
    for g, m in pairs:
        d = float(jnp.max(jnp.abs(g - m)))
        worst = max(worst, d)
    dev = jax.devices()[0].platform
    print(f"backend={dev} crops={len(pairs)} out={out}")
    print(f"max |gather - matmul(HIGHEST)| = {worst:.3e} (0-255 units)")
    budget = 1e-2
    status = "PASS" if worst < budget else "FAIL"
    print(f"{status}: PARITY.md bf16_3x claim budget {budget:.0e}")


if __name__ == "__main__":
    main()
