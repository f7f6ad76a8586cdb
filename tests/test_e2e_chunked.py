"""End-to-end CLI smoke for chunked training (--tpu.steps_per_dispatch > 1):
the trainer's fetch-K/scan-K path must produce the same artifact set and
converge like the per-step path (tests/test_e2e_cli.py), and the cadence
validation must reject misaligned save/validate intervals."""
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def chunked_workspace(tmp_path_factory):
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset
    from humanrf_tpu.run import main

    root = tmp_path_factory.mktemp("e2e_chunked")
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
            "--training.max_steps", "100",
            "--training.rays_initial_batch_size", "512",
            "--training.samples_max_batch_size", "16_384",
            "--training.save_checkpoint_every_n_steps", "50",
            "--validation.every_n_steps", "100",
            "--validation.rays_batch_size", "512",
            "--model.log2_hashmap_size", "12",
            "--model.n_levels", "4",
            "--model.finest_resolution", "128",
            "--tpu.samples_per_ray", "256",
            "--tpu.candidate_budget", "32_768",
            "--tpu.steps_per_dispatch", "5",
            "--dataset.max_buffer_size", "8",
            "--device", "cpu",
        ]
    )
    return ws


def test_chunked_cli_artifacts_and_convergence(chunked_workspace):
    ws = chunked_workspace
    ckpts = list((ws / "checkpoints").glob("step_*.ckpt"))
    assert len(ckpts) >= 1, "rolling checkpoints missing"
    txt = (ws / "validation.txt").read_text()
    psnrs = [
        float(part.split("=")[1])
        for line in txt.splitlines()
        for part in line.split()
        if part.startswith("psnr=")
    ]
    assert psnrs, f"no psnr entries in validation.txt:\n{txt}"
    assert max(psnrs) > 14.0, f"chunked-path validation PSNR too low: {psnrs}"


def test_chunked_rejects_misaligned_cadence(tmp_path):
    """save/validate intervals must be multiples of steps_per_dispatch."""
    import jax

    from humanrf_tpu.configs.args import parse_args
    from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel
    from humanrf_tpu.run import build_pipeline_config
    from humanrf_tpu.train.trainer import Trainer, make_optimizer

    config = parse_args(
        [
            "--config", "example_synthetic",
            "--dataset.path", str(tmp_path),
            "--workspace", str(tmp_path / "ws"),
            "--training.save_checkpoint_every_n_steps", "75",
            "--tpu.steps_per_dispatch", "10",
            "--device", "cpu",
        ]
    )
    model = HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=(0, 1),
            segment_sizes=(2,),
            log2_hashmap_size=8,
            n_levels=2,
            finest_resolution=32,
        )
    )
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        Trainer(
            config=config,
            workspace=tmp_path / "ws",
            checkpoint=None,
            model=model,
            pipeline_config=build_pipeline_config(config),
            optimizer=make_optimizer(1e-2, 0.5, 100),
            resolution=(40, 40),
        )
