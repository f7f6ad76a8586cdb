"""CLI entry point — orchestrates train / trajectory-test / evaluate phases.

Mirrors `/root/reference/humanrf/run.py:23-205`: parse config (with `--config`
module injection), seed RNGs, dump config.yaml into the workspace, compute
temporal segments, build model + data loaders + optimizer, run the phases.

Usage:
    python -m humanrf_tpu.run --config example_humanrf --dataset.path /data --workspace ws
    python -m humanrf_tpu.run --config example_synthetic --dataset.path <synth_root> --workspace ws
"""
from __future__ import annotations

import dataclasses
import json
import random
from pathlib import Path

import numpy as np
import yaml


def build_pipeline_config(config):
    from humanrf_tpu.train.pipeline import PipelineConfig

    candidate = config.tpu.candidate_budget or 2 * config.training.samples_max_batch_size
    return PipelineConfig(
        num_rays=config.training.rays_initial_batch_size,
        samples_per_ray=config.tpu.samples_per_ray,
        candidate_budget=candidate,
        sample_budget=config.training.samples_max_batch_size,
        space_pruning="occupancy",
        march_grid_factor=config.tpu.march_grid_factor,
        use_visibility_prune=config.tpu.use_visibility_prune,
        bce_loss_weight=config.training.bce_loss_weight,
        sampling=config.tpu.sampling,
        proposal_samples_per_ray=config.tpu.proposal_samples_per_ray,
        render_samples_per_ray=config.tpu.render_samples_per_ray,
        proposal_mid_samples_per_ray=config.tpu.proposal_mid_samples_per_ray,
        proposal_loss_weight=config.tpu.proposal_loss_weight,
        proposal_uniform_bonus=config.tpu.proposal_uniform_bonus,
        candidate_rays_factor=config.tpu.candidate_rays_factor,
    )


def derive_synthetic_presets(dataset) -> dict:
    """Camera splits for synthetic datasets (the frozen ActorsHQ splits assume
    160 cameras). Mirrors the reference's held-out-camera protocol
    (`/root/reference/actorshq/evaluation/presets.py:8-28`: 120 train / 10
    validation / 14 test): the last camera is the test view and, when the rig
    is big enough, THREE validation cameras are spread evenly over the
    remaining ring — so every validation block averages >= 3 viewpoints
    instead of riding on a single held-out image. Small test rigs (< 8
    cameras) keep a single validation camera so the convergence-gated e2e
    fixtures retain their training-view coverage."""
    n = len(dataset.cameras)
    assert n >= 3, "synthetic presets need >= 3 cameras"
    if n < 8:
        # Small rigs: one validation camera (n-2), one test camera (n-1) —
        # unchanged from the calibrated e2e convergence gates.
        val = (n - 2,)
        train = tuple(range(n - 2))
    else:
        # Spread 3 picks over (0, n-1) with endpoints excluded: the first/last
        # cameras are extreme-parallax anchors that should stay in training.
        val = tuple(sorted({int(round((i + 1) * (n - 1) / 4)) for i in range(3)}))
        train = tuple(c for c in range(n - 1) if c not in set(val))
    return {
        "siggraph_train": train,
        "siggraph_train_validation": val,
        "siggraph_test": (n - 1,),
        "siggraph_vmaf": (n - 1,),
    }


def compute_segment_sizes(config, data_folder: Path, frame_numbers):
    from humanrf_tpu.core.dataset import VolumetricDataset
    from humanrf_tpu.train.partitioning import compute_adaptive_segment_sizes

    if config.model.temporal_partitioning == "none":
        return [len(frame_numbers)]
    if config.model.temporal_partitioning == "adaptive":
        return compute_adaptive_segment_sizes(
            dataset=VolumetricDataset(data_folder),
            sorted_frame_numbers=sorted(frame_numbers),
            expansion_factor_threshold=config.model.expansion_factor_threshold,
        )
    if config.model.temporal_partitioning == "fixed":
        fixed = config.model.fixed_segment_size
        return [fixed for _ in range(int(np.ceil(len(frame_numbers) / fixed)))]
    raise NotImplementedError("Unknown temporal partitioning type!")


def main(argv=None) -> None:
    from humanrf_tpu.configs.args import parse_args, warn_pipeline_knobs

    config = parse_args(argv)
    for warning in warn_pipeline_knobs(config.tpu):
        print(f"[WARNING] quality cliff: {warning}")

    if config.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    # Honor the persistent-compile-cache env vars even though the container's
    # sitecustomize imported jax before they could be read at import time
    # (long TPU-tunnel compiles make the cache load-bearing for CLI runs).
    import os as _os

    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 1.0)),
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes",
            int(_os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", 0)),
        )

    import humanrf_tpu.evaluation.presets as presets
    from humanrf_tpu.core.dataset import VolumetricDataset
    from humanrf_tpu.data.loader import DataLoader
    from humanrf_tpu.data.trajectory import (
        get_trajectory_dataloader_from_calibration,
        get_trajectory_dataloader_from_keycams,
    )
    from humanrf_tpu.evaluation.evaluate import evaluate
    from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel
    from humanrf_tpu.train.trainer import Trainer, make_optimizer

    random.seed(config.random_seed)
    np.random.seed(config.random_seed)

    frame_numbers = tuple(config.dataset.frame_numbers)
    assert len(frame_numbers) > 0, "--dataset.frame_numbers is required"

    workspace = Path(config.workspace)
    workspace.mkdir(parents=True, exist_ok=True)

    def _yamlable(obj):
        if isinstance(obj, dict):
            return {k: _yamlable(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [_yamlable(v) for v in obj]
        if isinstance(obj, Path):
            return str(obj)
        return obj

    with open(workspace / "config.yaml", "w") as f:
        yaml.safe_dump(_yamlable(dataclasses.asdict(config)), f, default_flow_style=False, sort_keys=False)

    data_folder = Path(config.dataset.path) / config.dataset.actor / config.dataset.sequence / f"{config.dataset.scale}x"

    segment_sizes = compute_segment_sizes(config, data_folder, frame_numbers)
    print(f"[INFO] segment sizes: {segment_sizes}")

    model = HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=tuple(sorted(frame_numbers)),
            segment_sizes=tuple(segment_sizes),
            density_scale=config.model.density_scale,
            n_features_per_level=config.model.n_features_per_level,
            log2_hashmap_size=config.model.log2_hashmap_size,
            n_levels=config.model.n_levels,
            coarsest_resolution=config.model.coarsest_resolution,
            finest_resolution=config.model.finest_resolution,
            geometry_feature_dim=config.model.geometry_feature_dim,
            n_neurons=config.model.n_neurons,
            n_hidden_layers_density=config.model.n_hidden_layers_density,
            n_hidden_layers_color=config.model.n_hidden_layers_color,
            sh_degree=config.model.sh_degree,
            camera_embedding_dim=config.model.camera_embedding_dim,
            field_backend=config.tpu.field_backend,
            proposal_rank=config.tpu.proposal_rank if config.tpu.sampling == "proposal" else 0,
            proposal_resolution=config.tpu.proposal_resolution,
        )
    )
    pcfg = build_pipeline_config(config)

    camera_configs = presets.camera_configs
    if config.tpu.synthetic_presets:
        camera_configs = derive_synthetic_presets(VolumetricDataset(data_folder))
        split = {k: list(v) for k, v in camera_configs.items()}
        print(f"[INFO] derived synthetic camera split: {split}")
        # The derived split has changed across versions (round 4 moved to 3
        # spread validation cameras on >=8-camera rigs). Resuming a workspace
        # whose checkpoints were trained under a different split silently
        # trains on formerly-held-out views and makes stored best-PSNR /
        # validation history incomparable — stamp the split and warn loudly.
        split_path = Path(config.workspace) / "derived_split.json"
        have_ckpts = any(Path(config.workspace, "checkpoints").glob("*.ckpt"))
        if split_path.exists():
            old = json.loads(split_path.read_text())
            if old != split and have_ckpts:
                print(
                    "[WARNING] this workspace's checkpoints were trained under a "
                    f"DIFFERENT derived camera split ({old}); validation/best-PSNR "
                    "history is not comparable across the split change — use a "
                    "fresh workspace unless you know what you are doing"
                )
        elif have_ckpts:
            print(
                "[WARNING] resuming a workspace with no derived_split.json stamp "
                "(pre-split-change checkpoints?); validation history may not be "
                "comparable to the current camera split"
            )
        split_path.parent.mkdir(parents=True, exist_ok=True)
        split_path.write_text(json.dumps(split))

    if config.train:
        training_data_loader = DataLoader(
            dataset=VolumetricDataset(data_folder, config.dataset.crop_center_square),
            mode=DataLoader.Mode.TRAINING,
            dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
            space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
            batch_size=config.training.rays_initial_batch_size * config.tpu.candidate_rays_factor,
            camera_numbers=camera_configs[config.training.camera_preset],
            frame_numbers=frame_numbers,
            max_buffer_size=config.dataset.max_buffer_size,
            max_num_frames_per_batch=config.dataset.max_num_frames_per_batch,
            use_mask=True,
            filter_light_bloom=config.dataset.filter_light_bloom,
            seed=config.random_seed,
            deterministic=config.dataset.deterministic_loader,
        )
        render_sequence_validation = presets.get_render_sequence(
            coverage=config.validation.coverage,
            camera_preset=config.validation.camera_preset,
            frame_numbers=list(frame_numbers),
            repeat_cameras=config.validation.repeat_cameras,
            camera_configs_override=camera_configs,
        )
        validation_data_loader = DataLoader(
            dataset=VolumetricDataset(data_folder, config.dataset.crop_center_square),
            mode=DataLoader.Mode.VALIDATION,
            dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
            space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
            batch_size=config.validation.rays_batch_size,
            camera_numbers=camera_configs[config.validation.camera_preset],
            frame_numbers=frame_numbers,
            max_buffer_size=1,
            use_mask=True,
            filter_light_bloom=config.dataset.filter_light_bloom,
            render_sequence=render_sequence_validation,
            seed=config.random_seed,
        )

        optimizer = make_optimizer(
            config.training.lr, config.training.lr_decay, config.training.max_steps,
            weight_decay=config.training.weight_decay,
        )
        mesh = None
        if config.tpu.num_devices == 0 or config.tpu.num_devices > 1:
            from humanrf_tpu.parallel.mesh import make_mesh

            n = config.tpu.num_devices or len(jax.devices())
            if n > 1:
                mesh = make_mesh(n)
        trainer = Trainer(
            config=config,
            workspace=workspace,
            checkpoint=config.training.checkpoint,
            model=model,
            pipeline_config=pcfg,
            optimizer=optimizer,
            resolution=training_data_loader.resolution,
            seed=config.random_seed,
            mesh=mesh,
        )
        trainer.train(training_data_loader, validation_data_loader, max_steps=config.training.max_steps)
        # Deterministic teardown: never leave worker threads alive to race the
        # interpreter (or a later phase) inside a JAX call.
        training_data_loader.shutdown()
        validation_data_loader.shutdown()

    results_folder = workspace / "results"

    if config.test.trajectory_via_keycams is not None:
        loader = get_trajectory_dataloader_from_keycams(
            trajectory=config.test.trajectory_via_keycams,
            base_data_folder=data_folder,
            dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
            space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
            batch_size=config.test.rays_batch_size,
            frame_numbers=frame_numbers,
            trajectory_num_cameras=config.test.trajectory_num_cameras,
        )
        trainer = Trainer(
            config=config,
            workspace=workspace,
            checkpoint=config.test.checkpoint,
            model=model,
            pipeline_config=pcfg,
            optimizer=None,
            resolution=loader.resolution,
            seed=config.random_seed,
        )
        trainer.test(loader, results_folder / "test_keycams", True)
        loader.shutdown()

    if config.test.trajectory_via_calibration_file is not None:
        loader = get_trajectory_dataloader_from_calibration(
            calibration_path=config.test.trajectory_via_calibration_file,
            base_data_folder=data_folder,
            dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
            space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
            batch_size=config.test.rays_batch_size,
            frame_numbers=frame_numbers,
        )
        trainer = Trainer(
            config=config,
            workspace=workspace,
            checkpoint=config.test.checkpoint,
            model=model,
            pipeline_config=pcfg,
            optimizer=None,
            resolution=loader.resolution,
            seed=config.random_seed,
        )
        trainer.test(loader, results_folder / "test_calibration_file", True)
        loader.shutdown()

    if config.evaluate:
        eval_frame_numbers = frame_numbers
        if config.evaluation.frame_numbers is not None:
            eval_frame_numbers = tuple(config.evaluation.frame_numbers)
        render_sequence_evaluation = presets.get_render_sequence(
            coverage=config.evaluation.coverage,
            camera_preset=config.evaluation.camera_preset,
            frame_numbers=list(eval_frame_numbers),
            camera_configs_override=camera_configs,
        )
        evaluation_data_loader = DataLoader(
            dataset=VolumetricDataset(data_folder, crop_center_square=False),
            mode=DataLoader.Mode.TEST,
            dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
            space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
            batch_size=config.test.rays_batch_size,
            camera_numbers=camera_configs[config.evaluation.camera_preset],
            frame_numbers=eval_frame_numbers,
            max_buffer_size=1,
            render_sequence=render_sequence_evaluation,
            seed=config.random_seed,
        )
        trainer = Trainer(
            config=config,
            workspace=workspace,
            checkpoint=config.test.checkpoint,
            model=model,
            pipeline_config=pcfg,
            optimizer=None,
            resolution=evaluation_data_loader.resolution,
            seed=config.random_seed,
        )
        trainer.test(evaluation_data_loader, results_folder / "test_frames", False)
        evaluation_data_loader.shutdown()

        evaluate(
            results_directory=results_folder,
            output_directory=results_folder,
            coverage=config.evaluation.coverage,
            camera_preset=config.evaluation.camera_preset,
            frame_numbers=list(eval_frame_numbers),
            data_folder=data_folder,
            result_suffix=".png",
            camera_configs_override=camera_configs if config.tpu.synthetic_presets else None,
        )


if __name__ == "__main__":
    main()
