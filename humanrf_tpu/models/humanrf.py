"""The HumanRF scene representation, TPU-native.

Functional re-design of the reference model
(`/root/reference/humanrf/scene_representation/humanrf.py:13-220`): the model is a
frozen config + static routing tables + pure apply functions over a params
pytree, so the whole query path lives inside one jitted XLA program and shards
cleanly under pjit.

Key divergences from the CUDA original, by design (SURVEY.md §7):
- Per-segment feature grids are *device-resident* (TPU HBM is large enough;
  the reference pages inactive segments to CPU, `humanrf.py:171,179`). Frame →
  segment routing is a static lookup table plus per-segment masking — the
  static-shape analog of the reference's boolean-mask indexing
  (`humanrf.py:172-177`).
- MLPs are plain bf16 matmuls (see models/mlp.py); density head stays fp32
  through `truncated_exp` exactly like the reference's fp32 autocast island.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from humanrf_tpu.models.activation import truncated_exp
from humanrf_tpu.models.decomposition4d import (
    Decomposition4DConfig,
    apply_decomposition4d,
    init_decomposition4d,
)
from humanrf_tpu.models.hash_encoding import HashGridConfig
from humanrf_tpu.models.mlp import apply_mlp, init_mlp
from humanrf_tpu.models.proposal import (
    ProposalFieldConfig,
    apply_proposal_field,
    init_proposal_field,
)
from humanrf_tpu.models.sh import sh_encode

# Matches humanrf/adaptive_temporal_partitioning.py:8.
PREDEFINED_SEGMENT_SIZES = [6, 12, 25, 50, 100]

NUM_CAMERAS = 160  # actorshq/dataset/volumetric_dataset.py:78


@dataclass(frozen=True)
class HumanRFConfig:
    sorted_frame_numbers: Tuple[int, ...]
    segment_sizes: Tuple[int, ...]
    density_scale: float = 100.0
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    n_levels: int = 16
    coarsest_resolution: int = 32
    finest_resolution: int = 2048
    geometry_feature_dim: int = 15
    n_neurons: int = 64
    n_hidden_layers_density: int = 1
    n_hidden_layers_color: int = 2
    sh_degree: int = 4
    camera_embedding_dim: int = 0
    # "gather" = exact tcnn-semantics table lookups; "onehot" = gather-free
    # interpolating-matmul backend (use with small log2_hashmap_size, ≤ 12 —
    # see PERF.md for why this exists on TPU); "fused" = onehot math through
    # the VMEM-resident Pallas kernel (fastest on TPU, ops/fused_interp.py).
    field_backend: str = "gather"
    # Proposal density field for importance sampling (models/proposal.py);
    # rank 0 disables it (dense-march pipeline only).
    proposal_rank: int = 0
    proposal_resolution: int = 128

    @property
    def total_feature_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def num_segments(self) -> int:
        return len(self.segment_sizes)


class QueryInput:
    """Mirror of the reference's QueryInput (`query_io.py:6-14`), as plain arrays."""

    def __init__(self, positions, frame_numbers, directions=None, camera_numbers=None, is_training=False):
        self.positions = positions
        self.frame_numbers = frame_numbers
        self.directions = directions
        self.camera_numbers = camera_numbers
        self.is_training = is_training


class QueryOutput:
    """Mirror of the reference's QueryOutput (`query_io.py:16-20`)."""

    def __init__(self, density=None, geometry_features=None, radiance=None):
        self.density = density
        self.geometry_features = geometry_features
        self.radiance = radiance


class HumanRFModel:
    """Owns the static config / routing tables; all compute is in pure fns."""

    def __init__(self, config: HumanRFConfig):
        self.config = config
        cfg = config

        # Per-segment hash-map size scaling (humanrf.py:106-120).
        self.segment_grid_configs: List[Decomposition4DConfig] = []
        for segment_size in cfg.segment_sizes:
            seg_log2 = int(
                np.round(np.log2(segment_size / max(PREDEFINED_SEGMENT_SIZES) * (2**cfg.log2_hashmap_size)))
            )
            self.segment_grid_configs.append(
                Decomposition4DConfig(
                    grid=HashGridConfig(
                        n_levels=cfg.n_levels,
                        n_features_per_level=cfg.n_features_per_level,
                        log2_hashmap_size=seg_log2,
                        base_resolution=cfg.coarsest_resolution,
                        finest_resolution=cfg.finest_resolution,
                    ),
                    vectors_finest_resolution=cfg.finest_resolution,
                    backend=cfg.field_backend,
                    # Pallas compiles only on TPU; tests / --device cpu get the
                    # (slow, correct) interpreter. Decided once at model build —
                    # run.py selects the platform before constructing the model.
                    fused_interpret=(jax.default_backend() != "tpu"),
                )
            )
        if cfg.field_backend == "fused" and jax.default_backend() != "tpu":
            import warnings

            warnings.warn(
                "field_backend='fused' off-TPU runs the Pallas interpreter — "
                "correct but pathologically slow to compile at CLI shapes "
                "(>30 min on CPU). Use --tpu.field_backend onehot for CPU "
                "runs; it is the same math through plain XLA.",
                stacklevel=2,
            )

        # Frame → segment / normalized-local-time lookup tables (humanrf.py:79-103).
        sorted_frames = cfg.sorted_frame_numbers
        num_frames = len(sorted_frames)
        seg_end = np.cumsum(cfg.segment_sizes, dtype=np.int64)
        seg_end[-1] = min(seg_end[-1], num_frames)
        seg_start = np.concatenate((np.zeros(1, dtype=np.int64), seg_end[:-1]))

        frame_to_segment = np.full(sorted_frames[-1] + 1, -1, dtype=np.int32)
        frame_to_local_time = np.full(sorted_frames[-1] + 1, -1.0, dtype=np.float32)
        for s in range(cfg.num_segments):
            seg_frames = [sorted_frames[j] for j in range(seg_start[s], seg_end[s])]
            for local_idx, fn in enumerate(seg_frames):
                frame_to_segment[fn] = s
                frame_to_local_time[fn] = local_idx / len(seg_frames)

        self.frame_to_segment = jnp.asarray(frame_to_segment)
        self.frame_to_local_time = jnp.asarray(frame_to_local_time)

        self.proposal_config: Optional[ProposalFieldConfig] = None
        if cfg.proposal_rank > 0:
            self.proposal_config = ProposalFieldConfig(
                resolution=cfg.proposal_resolution, rank=cfg.proposal_rank
            )

    # ------------------------------------------------------------------ params

    def init_params(self, rng: jax.Array) -> Dict:
        keys = jax.random.split(rng, self.config.num_segments + 3)
        cfg = self.config
        params = {
            "segments": [
                init_decomposition4d(keys[i], seg_cfg)
                for i, seg_cfg in enumerate(self.segment_grid_configs)
            ],
            "sigma_net": init_mlp(
                keys[-3],
                n_input_dims=cfg.total_feature_dim,
                n_output_dims=1 + cfg.geometry_feature_dim,
                n_neurons=cfg.n_neurons,
                n_hidden_layers=cfg.n_hidden_layers_density,
            ),
            "color_net": init_mlp(
                keys[-2],
                n_input_dims=cfg.sh_degree**2 + cfg.geometry_feature_dim + cfg.camera_embedding_dim,
                n_output_dims=3,
                n_neurons=cfg.n_neurons,
                n_hidden_layers=cfg.n_hidden_layers_color,
            ),
        }
        if cfg.camera_embedding_dim > 0:
            params["camera_embeddings"] = jax.random.normal(
                keys[-1], (NUM_CAMERAS, cfg.camera_embedding_dim), dtype=jnp.float32
            )
        if self.proposal_config is not None:
            prop_keys = jax.random.split(keys[-1], cfg.num_segments + 1)[1:]
            params["proposal"] = [
                init_proposal_field(prop_keys[s], self.proposal_config)
                for s in range(cfg.num_segments)
            ]
        return params

    def num_params(self, params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))

    # ----------------------------------------------------------------- queries

    def features(self, params: Dict, positions: jax.Array, frame_numbers: jax.Array) -> jax.Array:
        """positions (N,3) in [-0.5,0.5]; frame_numbers (N,) int32 → (N, L*F).

        Evaluates every segment's grid on its masked subset via where-masking
        (static-shape analog of humanrf.py:169-177). For num_segments == 1 this
        collapses to a single unmasked evaluation.

        The gather/onehot per-segment grid evaluation is wrapped in
        `jax.checkpoint`: storing the per-level gather indices + trilinear
        weights (gather) or the (N, T) one-hot rows XLA would otherwise keep
        (onehot) for backward costs ~40MB × levels × 4 grids per 640k samples
        (OOMs a 16GB chip); remat recomputes them from positions instead — the
        TPU analog of the fused recompute inside tcnn's backward kernels.

        The fused backend is NOT rematted: its custom_vjp residuals are just
        the (P, C, N) corner idx/weights (~0.5GB at bench shapes — fits), and
        remat would replay the expensive VMEM row-build + MXU forward a second
        time inside backward. Measured on v5e-1 (16384 rays × Kf=16 flagship
        step): 341 ms/step rematted → skipping remat removes one full fused
        forward (PERF.md round 3).
        """
        frame_numbers = frame_numbers.astype(jnp.int32)
        xyz01 = positions + 0.5
        times = jnp.take(self.frame_to_local_time, frame_numbers)[:, None]

        def seg_apply(s):
            cfg_s = self.segment_grid_configs[s]
            fn = lambda prm, x, t: apply_decomposition4d(prm, x, t, cfg_s)
            return fn if cfg_s.backend == "fused" else jax.checkpoint(fn)

        if self.config.num_segments == 1:
            return seg_apply(0)(params["segments"][0], xyz01, times)

        segment_ids = jnp.take(self.frame_to_segment, frame_numbers)
        feats = jnp.zeros((positions.shape[0], self.config.total_feature_dim), dtype=jnp.float32)
        for s in range(self.config.num_segments):
            mask = (segment_ids == s)[:, None]

            # Zero out inputs of other segments' samples so their gathers hit a
            # single (cached) table line rather than random HBM locations.
            def _eval(prm, s=s, mask=mask):
                seg_feats = seg_apply(s)(
                    prm,
                    jnp.where(mask, xyz01, 0.0),
                    jnp.where(mask, times, 0.0),
                )
                return jnp.where(mask, seg_feats, 0.0)

            # Skip segments with no samples in this batch entirely: the loader
            # bounds frames-in-flight to a window (max_num_frames_per_batch),
            # so most training batches touch ONE segment — where-masking alone
            # would still run every segment's grid on all N samples (the
            # bench-vs-trainer throughput gap). The skipped branch contributes
            # exact zeros (features AND grads), identical to the masked sum.
            # CAVEAT: under vmap (or any batching transform of features /
            # proposal_density), lax.cond degrades to a both-branches select —
            # correctness is unaffected but every segment's field work runs
            # again, silently re-opening the bench-vs-trainer gap. If a future
            # render path vmaps over this, restructure to batch outside the
            # segment loop.
            feats = feats + jax.lax.cond(
                jnp.any(mask),
                _eval,
                lambda prm: jnp.zeros_like(feats),
                params["segments"][s],
            )
        return feats

    def proposal_density(self, params: Dict, positions: jax.Array, frame_numbers: jax.Array) -> jax.Array:
        """Cheap coarse density for importance sampling (models/proposal.py).

        positions (N, 3) in [-0.5, 0.5]; frame_numbers (N,) → sigma (N,) fp32.
        Per-segment routing mirrors `features`.
        """
        assert self.proposal_config is not None, "model built with proposal_rank=0"
        frame_numbers = frame_numbers.astype(jnp.int32)
        times = jnp.take(self.frame_to_local_time, frame_numbers)[:, None]
        coords = jnp.concatenate([positions + 0.5, times], axis=-1)

        if self.config.num_segments == 1:
            return apply_proposal_field(params["proposal"][0], coords, self.proposal_config)

        segment_ids = jnp.take(self.frame_to_segment, frame_numbers)
        sigma = jnp.zeros(positions.shape[0], dtype=jnp.float32)
        for s in range(self.config.num_segments):
            mask = segment_ids == s

            def _eval(prm, mask=mask):
                seg_sigma = apply_proposal_field(
                    prm, jnp.where(mask[:, None], coords, 0.0), self.proposal_config
                )
                return jnp.where(mask, seg_sigma, 0.0)

            # Same no-samples segment skip as `features` (exact-zero branch).
            sigma = sigma + jax.lax.cond(
                jnp.any(mask), _eval, lambda prm: jnp.zeros_like(sigma), params["proposal"][s]
            )
        return sigma

    def density(self, params: Dict, positions: jax.Array, frame_numbers: jax.Array):
        """→ (density (N,), geometry_features (N, G)). humanrf.py:158-186."""
        feats = self.features(params, positions, frame_numbers)
        h = apply_mlp(params["sigma_net"], feats)
        density = truncated_exp(h[..., 0]) * self.config.density_scale
        return density, h[..., 1:]

    def forward(
        self,
        params: Dict,
        positions: jax.Array,
        directions: jax.Array,
        frame_numbers: jax.Array,
        camera_numbers: Optional[jax.Array] = None,
        is_training: bool = False,
    ):
        """→ (density (N,), radiance (N, 3)). humanrf.py:188-208."""
        cfg = self.config
        density, geo = self.density(params, positions, frame_numbers)

        dirs01 = (directions + 1.0) * 0.5
        color_in = [sh_encode(dirs01, cfg.sh_degree), geo]
        if cfg.camera_embedding_dim > 0:
            if is_training:
                emb = jnp.take(params["camera_embeddings"], camera_numbers.astype(jnp.int32), axis=0)
            else:
                # Zeros at validation/test time (humanrf.py:196-204).
                emb = jnp.zeros((positions.shape[0], cfg.camera_embedding_dim), dtype=jnp.float32)
            color_in.append(emb)

        radiance = apply_mlp(params["color_net"], jnp.concatenate(color_in, axis=-1), output_activation="sigmoid")
        return density, radiance

    def query(self, params: Dict, query: QueryInput) -> QueryOutput:
        """Reference-shaped entry point (`query_io.py:6-20`, `humanrf.py:158,188`):
        density-only when `query.directions is None`, full forward otherwise."""
        if query.directions is None:
            density, geo = self.density(params, query.positions, query.frame_numbers)
            return QueryOutput(density=density, geometry_features=geo)
        density, radiance = self.forward(
            params,
            query.positions,
            query.directions,
            query.frame_numbers,
            camera_numbers=query.camera_numbers,
            is_training=query.is_training,
        )
        return QueryOutput(density=density, radiance=radiance)
