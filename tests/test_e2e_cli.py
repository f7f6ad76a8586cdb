"""End-to-end convergence smoke through the real CLI (SURVEY.md §4.3):
train a few hundred steps on the synthetic scene via `humanrf_tpu.run.main`,
assert checkpoints/validation artifacts appear and validation PSNR clears a
floor (mirrors BASELINE.json configs[0])."""
import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def e2e_workspace(tmp_path_factory):
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset
    from humanrf_tpu.run import main

    root = tmp_path_factory.mktemp("e2e")
    cfg = SyntheticSceneConfig(
        num_cameras=6, width=40, height=40, num_frames=2, first_frame=0, grid_resolution=32
    )
    generate_synthetic_dataset(root, cfg)
    ws = root / "ws"

    main(
        [
            "--config", "example_synthetic",
            "--dataset.path", str(root),
            "--workspace", str(ws),
            "--training.max_steps", "150",
            "--training.rays_initial_batch_size", "512",
            "--training.samples_max_batch_size", "16_384",
            "--training.save_checkpoint_every_n_steps", "75",
            "--validation.every_n_steps", "150",
            "--validation.rays_batch_size", "512",
            "--model.log2_hashmap_size", "12",
            "--model.n_levels", "4",
            "--model.finest_resolution", "128",
            "--tpu.samples_per_ray", "256",
            "--tpu.candidate_budget", "32_768",
            "--dataset.max_buffer_size", "8",
            "--device", "cpu",
        ]
    )
    return ws


def test_workspace_artifacts(e2e_workspace):
    ws = e2e_workspace
    assert (ws / "config.yaml").exists()
    ckpts = list((ws / "checkpoints").glob("step_*.ckpt"))
    assert len(ckpts) >= 1, "rolling checkpoints missing"
    assert (ws / "validation.txt").exists()
    assert len(list((ws / "validation").glob("*_rgb.png"))) >= 1
    assert len(list((ws / "run").glob("events*"))) >= 1  # tensorboard log


def test_validation_psnr_floor(e2e_workspace):
    txt = (e2e_workspace / "validation.txt").read_text()
    psnrs = [
        float(part.split("=")[1])
        for line in txt.splitlines()
        for part in line.split()
        if part.startswith("psnr=")
    ]
    assert psnrs, f"no psnr entries in validation.txt:\n{txt}"
    # 150 steps on a tiny sphere scene converges well past this floor.
    assert max(psnrs) > 14.0, f"validation PSNR too low: {psnrs}"


def test_resume_from_latest(e2e_workspace, capsys):
    """'latest' checkpoint resolution restores the saved step (trainer.py:583-620)."""
    import jax

    from humanrf_tpu.configs.args import parse_args
    from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel
    from humanrf_tpu.run import build_pipeline_config
    from humanrf_tpu.train.trainer import Trainer, make_optimizer

    config = parse_args(
        [
            "--config", "example_synthetic",
            "--workspace", str(e2e_workspace),
            "--model.log2_hashmap_size", "12",
            "--model.n_levels", "4",
            "--model.finest_resolution", "128",
            "--training.max_steps", "150",
        ]
    )
    model = HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=(0, 1),
            segment_sizes=(2,),
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
        )
    )
    # Must match the CLI's optimizer exactly — the checkpoint's opt_state tree
    # embeds the optimizer structure (adamw's decay stage included).
    optimizer = make_optimizer(1e-2, 0.5, 150, weight_decay=config.training.weight_decay)
    trainer = Trainer(
        config=config,
        workspace=e2e_workspace,
        checkpoint="latest",
        model=model,
        pipeline_config=build_pipeline_config(config),
        optimizer=optimizer,
        resolution=(40, 40),
    )
    assert trainer.step == 150


def test_cli_data_parallel_8_devices(tmp_path):
    """configs[4] analog: multi-chip DP training straight from the CLI on the
    8-virtual-device CPU mesh."""
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset
    from humanrf_tpu.run import main

    root = tmp_path / "data"
    generate_synthetic_dataset(
        root, SyntheticSceneConfig(num_cameras=6, width=40, height=40, num_frames=2, grid_resolution=32)
    )
    ws = tmp_path / "ws"
    main(
        [
            "--config", "example_synthetic",
            "--dataset.path", str(root),
            "--workspace", str(ws),
            "--device", "cpu",
            "--tpu.num_devices", "8",
            "--training.max_steps", "40",
            "--training.rays_initial_batch_size", "512",
            "--training.samples_max_batch_size", "16_384",
            "--training.save_checkpoint_every_n_steps", "40",
            "--validation.every_n_steps", "40",
            "--validation.rays_batch_size", "512",
            "--model.log2_hashmap_size", "12",
            "--model.n_levels", "4",
            "--model.finest_resolution", "128",
            "--tpu.samples_per_ray", "256",
            "--tpu.candidate_budget", "32_768",
            "--dataset.max_buffer_size", "8",
        ]
    )
    assert list((ws / "checkpoints").glob("step_*.ckpt"))
    txt = (ws / "validation.txt").read_text()
    assert "psnr=" in txt


def test_cli_proposal_sampling_end_to_end(tmp_path):
    """--tpu.sampling proposal: CP proposal field + importance resampling
    through the full CLI (train -> validate -> checkpoint)."""
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset
    from humanrf_tpu.run import main

    root = tmp_path / "data"
    generate_synthetic_dataset(
        root, SyntheticSceneConfig(num_cameras=6, width=40, height=40, num_frames=2, grid_resolution=32)
    )
    ws = tmp_path / "ws"
    main(
        [
            "--config", "example_synthetic",
            "--dataset.path", str(root),
            "--workspace", str(ws),
            "--device", "cpu",
            # 300 steps / 1024 rays / bonus 0.1: the reference-parity BCE
            # gradient spends the first ~120 steps building density fog
            # before the photometric carves it. With the free-running
            # replacer the batch stream depends on thread timing, and under
            # full-suite load the 300-step peak had a below-floor tail
            # (observed 12.48 vs floor 13 on a loaded 1-core host). The
            # deterministic loader removes the scheduler from the test: the
            # convergence gate now measures the pipeline, not pytest load.
            "--dataset.deterministic_loader", "true",
            "--training.max_steps", "300",
            "--training.rays_initial_batch_size", "1024",
            "--training.save_checkpoint_every_n_steps", "300",
            "--validation.every_n_steps", "150",
            "--validation.rays_batch_size", "512",
            "--model.log2_hashmap_size", "12",
            "--model.n_levels", "4",
            "--model.finest_resolution", "128",
            "--tpu.sampling", "proposal",
            "--tpu.proposal_samples_per_ray", "32",
            "--tpu.render_samples_per_ray", "16",
            "--tpu.proposal_rank", "8",
            "--tpu.proposal_resolution", "64",
            "--tpu.proposal_uniform_bonus", "0.1",
            "--dataset.max_buffer_size", "8",
        ]
    )
    txt = (ws / "validation.txt").read_text()
    psnrs = [
        float(part.split("=")[1])
        for line in txt.splitlines()
        for part in line.split()
        if part.startswith("psnr=")
    ]
    # Deterministic loader: two independent runs reproduce peak PSNR 18.6318
    # bit-for-bit. Floor 16 leaves slack for cross-arch fp drift only;
    # broken/diverged runs sit at ~8-10.
    assert psnrs and max(psnrs) > 16.0, f"proposal-mode validation PSNR too low: {psnrs}"
    assert list((ws / "checkpoints").glob("step_*.ckpt"))


def test_cli_fsdp_param_sharding(tmp_path):
    """--tpu.param_sharding fsdp: segment tables sharded over the 8-device
    mesh, rays data-parallel, full CLI train -> validate -> checkpoint ->
    resume (checkpoint reload must re-commit the FSDP shardings)."""
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset
    from humanrf_tpu.run import main

    root = tmp_path / "data"
    generate_synthetic_dataset(
        root, SyntheticSceneConfig(num_cameras=6, width=40, height=40, num_frames=2, grid_resolution=32)
    )
    ws = tmp_path / "ws"
    args = [
        "--config", "example_synthetic",
        "--dataset.path", str(root),
        "--workspace", str(ws),
        "--device", "cpu",
        "--tpu.num_devices", "8",
        "--tpu.param_sharding", "fsdp",
        "--training.max_steps", "24",
        "--training.rays_initial_batch_size", "512",
        "--training.samples_max_batch_size", "16_384",
        "--training.save_checkpoint_every_n_steps", "12",
        "--validation.every_n_steps", "24",
        "--validation.rays_batch_size", "512",
        # 2-frame segment scaling: log2=16 -> T=1024 (shardable by 8).
        "--model.log2_hashmap_size", "16",
        "--model.n_levels", "4",
        "--model.finest_resolution", "128",
        "--tpu.samples_per_ray", "256",
        "--tpu.candidate_budget", "32_768",
        "--dataset.max_buffer_size", "8",
    ]
    main(args)
    assert list((ws / "checkpoints").glob("step_*.ckpt"))
    assert "psnr=" in (ws / "validation.txt").read_text()

    # Resume from the rolling checkpoint through the FSDP re-placement path.
    main(args + ["--training.checkpoint", "latest", "--training.max_steps", "28"])
