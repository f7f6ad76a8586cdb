"""humanrf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 4D dynamic neural radiance
field framework with the capabilities of synthesiaresearch/humanrf.

Layer map (mirrors the reference's layering, see SURVEY.md §1, but recast
TPU-first):

- ``core``       dataset model & IO (calibration/AABB/occupancy schema,
                 synthetic data generation)                      [ref: actorshq/dataset]
- ``models``     scene representation: multi-resolution hash encoding, 4D
                 decomposition, SH encoding, MLPs                [ref: humanrf/scene_representation]
- ``ops``        ray sampling + volume rendering as static-shape XLA programs
                                                                 [ref: actorshq/dataset/native, humanrf/volume_rendering.py]
- ``parallel``   device mesh / sharding (data parallel over ICI) [new; reference is single-GPU]
- ``train``      trainer, losses, checkpointing                  [ref: humanrf/trainer.py]
- ``data``       streaming pool data loader                      [ref: actorshq/dataset/data_loader.py]
- ``evaluation`` PSNR/SSIM/LPIPS + presets + offline evaluate    [ref: actorshq/evaluation]
- ``toolbox``    occupancy-grid generation, exporters            [ref: actorshq/toolbox]
"""

__version__ = "0.1.0"
