"""Multi-segment (adaptive temporal partitioning) end-to-end + offline
evaluation — the configs[2]/[3] analog of BASELINE.json on synthetic data."""
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def moving_dataset(tmp_path_factory):
    """12 frames with a sphere moving far enough that adaptive partitioning
    must split the sequence."""
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset

    root = tmp_path_factory.mktemp("multiseg")
    cfg = SyntheticSceneConfig(
        num_cameras=6,
        width=36,
        height=36,
        num_frames=12,
        first_frame=0,
        sphere_radius=0.25,
        center_start=(-0.35, 0.0, 0.0),
        center_end=(0.35, 0.0, 0.0),
        grid_resolution=32,
        camera_distance=3.2,
    )
    generate_synthetic_dataset(root, cfg)
    return root, cfg


def test_adaptive_partitioning_splits_moving_scene(moving_dataset):
    from humanrf_tpu.core.dataset import VolumetricDataset
    from humanrf_tpu.train.partitioning import compute_adaptive_segment_sizes

    root, cfg = moving_dataset
    ds = VolumetricDataset(root / "SynthActor" / "Sequence1" / "1x")
    sizes = compute_adaptive_segment_sizes(ds, list(range(12)), expansion_factor_threshold=1.25)
    assert len(sizes) >= 2, f"moving scene should split: {sizes}"
    assert sum(sizes) >= 12


def test_multisegment_training_and_evaluate(moving_dataset, tmp_path):
    """Full run: adaptive partitioning → multi-segment model → train → render
    test frames → offline evaluate with metrics.csv/averages.csv."""
    from humanrf_tpu.run import main

    root, cfg = moving_dataset
    ws = tmp_path / "ws"
    main(
        [
            "--config", "example_synthetic",
            "--dataset.path", str(root),
            "--workspace", str(ws),
            "--train", "true",
            "--evaluate", "true",
            "--device", "cpu",
            "--model.temporal_partitioning", "adaptive",
            "--model.log2_hashmap_size", "11",
            "--model.n_levels", "4",
            "--model.finest_resolution", "128",
            "--training.max_steps", "60",
            "--training.rays_initial_batch_size", "512",
            "--training.samples_max_batch_size", "16_384",
            "--training.save_checkpoint_every_n_steps", "60",
            "--validation.every_n_steps", "60",
            "--validation.rays_batch_size", "512",
            "--evaluation.coverage", "uniform",
            "--evaluation.camera_preset", "siggraph_test",
            "--test.rays_batch_size", "512",
            "--test.checkpoint", "latest",
            "--tpu.samples_per_ray", "256",
            "--tpu.candidate_budget", "32_768",
            "--dataset.max_buffer_size", "8",
            "--dataset.max_num_frames_per_batch", "4",
            "--dataset.frame_numbers", *[str(i) for i in range(12)],
        ]
    )
    # Multi-segment model actually trained + checkpointed.
    assert list((ws / "checkpoints").glob("step_*.ckpt"))
    # Test frames rendered + offline metrics written.
    results = ws / "results"
    assert list((results / "test_frames").glob("*.png"))
    metrics = (results / "metrics.csv").read_text().splitlines()
    assert metrics[0].startswith("camera,frame,PSNR")
    assert len(metrics) >= 2
    averages = (results / "averages.csv").read_text().splitlines()
    assert "PSNR" in averages[0]
    psnr = float(averages[1].split(",")[averages[0].split(",").index("PSNR")])
    assert np.isfinite(psnr)
    # The unmasked-ROI companion column (validation-metric style) must be
    # present so evaluate numbers are comparable against validation.txt.
    assert "PSNR_ROI" in averages[0]
    psnr_roi = float(averages[1].split(",")[averages[0].split(",").index("PSNR_ROI")])
    assert np.isfinite(psnr_roi)
