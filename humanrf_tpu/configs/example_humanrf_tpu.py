"""The paper's reference run on the TPU-native fast path.

Same data/schedule/eval protocol as `example_humanrf` (the reference's
`configs/example_humanrf.py:5-39`), with the scene field and sampler swapped
for the TPU flagship validated in PERF.md:

- gather-free interpolating-matmul field through the fused Pallas kernel
  (one-hot rows built in VMEM, fed to the MXU per tile; never touch HBM),
  L8/F4 (same 32 feature channels as the reference's L16/F2;
  quality-equal-or-better on the high-detail sweep), small per-level tables,
- CP-proposal importance sampling (Kc=32 -> Kf=16) on a static lattice with
  2x candidate-ray compaction: every render slot supervised,
- stability defaults (weight decay, exploration floor) are already the CLI
  defaults and are not repeated here.

Measured 58.4k supervised rays/s on v5e-1 (1.17x the estimated A100
reference, BASELINE.md), 0.2 dB below the 2^18 gather field on the quality
sweep (PERF.md).
"""
from humanrf_tpu.configs.example_humanrf import config as _reference_config

config = _reference_config + [
    # fmt: off
    # Field: the matmul backends want small per-level tables; 2^12 scales
    # to 2^11 = 2048 per 50-frame segment (models/humanrf.py scaling).
    "--model.log2_hashmap_size", "12",
    "--model.n_levels", "8",
    "--model.n_features_per_level", "4",
    "--tpu.field_backend", "fused",

    # Sampler: proposal importance sampling, flagship shapes (PERF.md).
    "--tpu.sampling", "proposal",
    "--tpu.proposal_samples_per_ray", "32",
    "--tpu.render_samples_per_ray", "16",
    "--tpu.candidate_rays_factor", "2",
    "--training.rays_initial_batch_size", "16_384",
    # fmt: on
]
