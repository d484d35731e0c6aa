"""video_gen_evals_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the TAG
("Generative Action Tell-Tales") video-generation evaluation framework.

Reference capability map: XThomasBU/video-gen-evals (see SURVEY.md). This package
is a ground-up TPU-first design, not a port:

- All compute-path math (geometry deltas, fusion encoder, losses, AC/TC metrics)
  is expressed as jittable JAX programs with static shapes and masked semantics.
- Scaling is via ``jax.sharding`` over a device mesh (data-parallel batch axis,
  optional tensor-parallel axis) with XLA collectives over ICI.
- Feature extraction backbones (TokenHMR-equivalent ViT + SMPL token decoder,
  DWPose-equivalent two-stage 2D pose) are Flax modules batched over
  (video, frame) with fixed-shape validity masks instead of frame dropping.

Subpackages
-----------
core      : typed configuration pytrees and run metadata.
ops       : pure array ops — SO(3) maps, Procrustes keypoint velocity, temporal
            deltas, window corruption, Pallas kernels.
models    : fusion encoder (HumanActionScorer), ViT backbone + SMPL token head,
            2D pose estimator, person detector, torch-checkpoint converters.
parallel  : mesh construction and sharding rules (dp / tp axes).
data      : manifests, modality statistics, window enumeration, feature banks,
            PK balanced sampling.
train     : losses, fused jitted train step, experiment harness, checkpointing.
metrics   : AC/TC scoring reducers, centroids, rank correlations.
pipelines : CLI entry points — extract / train / score / leaderboard / bench.
human     : MOS human-score processing pipeline and fixtures.
utils     : name normalization, npz IO, logging.
"""

__version__ = "0.1.0"
