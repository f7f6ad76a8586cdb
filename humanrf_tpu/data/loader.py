"""Streaming multi-view ray-sampling data loader.

The pool-with-replacer design of the reference
(`/root/reference/actorshq/dataset/data_loader.py:54-660`) is kept — the rationale
at `data_loader.py:70-82` (terabytes of frames, sample rays from a live pool of
images while a background thread cycles new (camera, frame) pairs through it)
applies unchanged on TPU hosts. What changes is the *device boundary*
(SURVEY.md §7): the CUDA ray-sampler kernels are gone; the loader only ships
pixel ids + pooled rgba + per-entry camera metadata, and all ray/sample math
happens inside the jitted training step (humanrf_tpu/train/pipeline.py).

Concurrency structure mirrors the reference one-for-one:
- `data_lock` excludes the sampler from the replacer (`data_loader.py:326`)
- `replacer_event` pause/continue around checkpoints/validation (`:328`)
- an `empty/available` semaphore pair implements producer-consumer for
  sequential full-image rendering in VALIDATION/TEST (`:333-335`)

One deliberate divergence: worker threads (replacer, preload pool) are
JAX-FREE — they stage host-side numpy and queue grid uploads; the consumer
thread performs all device dispatch (`_queue_grid_slot` /
`_resolve_pending_grids`). The reference uploads CUDA textures from its
loader thread (`occupancy_grid.cu`); through JAX's experimental remote-TPU
client, concurrent dispatch from two host threads is a wedge hazard.

Occupancy grids live in a device-resident pool of *corner-dilated* boolean
grids (see ops/occupancy.py) — the TPU replacement for the CUDA 3D-texture
ring buffer (`occupancy_grid.cu:8-95`), updated in place via a donated
`.at[slot].set` jit.
"""
from __future__ import annotations

import itertools
import multiprocessing
import threading
import time
from enum import Enum
from multiprocessing.pool import ThreadPool
from typing import Any, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from humanrf_tpu.core.dataset import VolumetricDataset
from humanrf_tpu.ops.occupancy import dilate_grid
from humanrf_tpu.train.pipeline import HostBatch, PoolArrays


@jax.jit
def _dilate(grid_u8):
    return dilate_grid(grid_u8)


@jax.jit
def _set_grid_slot(grids, slot, dilated):
    # NOT donated: batch snapshots taken by the training thread keep references
    # to the previous grids array; donation would delete it under their feet.
    return grids.at[slot].set(dilated)


class BatchInfo:
    """Host-side (untraced) metadata accompanying a HostBatch."""

    def __init__(self, num_real: int, width: int, height: int, camera_number=None, frame_number=None):
        self.num_real = num_real
        self.width = width
        self.height = height
        self.camera_number = camera_number
        self.frame_number = frame_number


class DataLoader:
    class Mode(Enum):
        TRAINING = 0
        VALIDATION = 1
        TEST = 2

    class OutputMode(Enum):
        # Kept for API parity with the reference (`data_loader.py:34-41`);
        # sample generation always happens inside the jitted device pipeline,
        # so both modes yield the same host batch.
        RAYS = 0
        RAYS_AND_SAMPLES = 1

    class SpacePruningMode(Enum):
        AABB = 0
        OCCUPANCY_GRID = 1

    def __init__(
        self,
        dataset: VolumetricDataset,
        mode: "DataLoader.Mode",
        space_pruning_mode: "DataLoader.SpacePruningMode",
        batch_size: int,
        camera_numbers: Tuple[int, ...],
        frame_numbers: Tuple[int, ...],
        max_buffer_size: int,
        dataloader_output_mode: "DataLoader.OutputMode" = None,
        max_num_frames_per_batch: Optional[int] = None,
        use_mask: Optional[bool] = None,
        filter_light_bloom: Optional[bool] = None,
        render_sequence: Optional[List[Tuple[int, int]]] = None,
        seed: int = 0,
        device=None,
        deterministic: bool = False,
    ) -> None:
        self.mode = mode
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.camera_numbers = tuple(camera_numbers)
        if len(set(self.camera_numbers)) != len(self.camera_numbers):
            raise RuntimeError(f"duplicate camera numbers in {self.camera_numbers}")
        self.frame_numbers = tuple(frame_numbers)
        if len(set(self.frame_numbers)) != len(self.frame_numbers):
            raise RuntimeError("duplicate frame numbers in the requested frame set")

        def _check_and_get_arg(arg: Any, name: str, valid_modes, default: Any):
            if self.mode in valid_modes:
                if arg is None:
                    raise RuntimeError(f"{self.mode} requires the '{name}' argument")
                return arg
            if arg is not None:
                raise RuntimeError(f"'{name}' is not a valid argument for {self.mode}")
            return default

        M = DataLoader.Mode
        self.max_num_frames_per_batch = _check_and_get_arg(
            max_num_frames_per_batch, "max_num_frames_per_batch", [M.TRAINING], None
        )
        if self.mode == M.TRAINING:
            if len(self.frame_numbers) > 1 and self.max_num_frames_per_batch < 2:
                raise RuntimeError("multi-frame training needs max_num_frames_per_batch >= 2")
            self.max_num_frames_per_batch = min(self.max_num_frames_per_batch, len(self.frame_numbers))
        self.use_mask = _check_and_get_arg(use_mask, "use_mask", [M.TRAINING, M.VALIDATION], False)
        self.filter_light_bloom = _check_and_get_arg(
            filter_light_bloom, "filter_light_bloom", [M.TRAINING, M.VALIDATION], False
        )
        self.render_sequence = _check_and_get_arg(
            render_sequence, "render_sequence", [M.VALIDATION, M.TEST], None
        )

        if self.mode == M.TRAINING:
            self.num_camera_frame_pairs = len(camera_numbers) * len(frame_numbers)
        else:
            self.num_camera_frame_pairs = len(self.render_sequence)

        self.space_pruning_mode = space_pruning_mode
        self.dataset = dataset

        # Scene normalization into the canonical [-0.5, 0.5] cube
        # (data_loader.py:179-215).
        self.aabb = self.dataset.get_aabb()
        self.scene_offset = -self.aabb.mean(0)
        self.scene_scale = 1.0 / np.max(self.aabb[1] - self.aabb[0])
        self.cameras = self.dataset.get_scaled_cameras(self.scene_offset, self.scene_scale)
        self.all_inverse_krs = np.stack([cam.inverse_kr() for cam in self.cameras]).astype(np.float32)
        self.all_camera_origins = np.stack([cam.translation for cam in self.cameras]).astype(np.float32)
        self.aabb = ((self.aabb + self.scene_offset) * self.scene_scale).astype(np.float32)

        unique_num_pixels = list({self.cameras[cn].width * self.cameras[cn].height for cn in self.camera_numbers})
        if len(unique_num_pixels) != 1:
            raise RuntimeError(f"cameras disagree on pixel count: {sorted(unique_num_pixels)}")
        self.num_pixels_per_camera = unique_num_pixels[0]
        self.num_batches_per_full_image = int(np.ceil(self.num_pixels_per_camera / self.batch_size))

        unique_resolutions = list({(self.cameras[cn].width, self.cameras[cn].height) for cn in self.camera_numbers})
        if len(unique_resolutions) > 2 or (
            len(unique_resolutions) == 2
            and not (
                unique_resolutions[0][0] == unique_resolutions[1][1]
                and unique_resolutions[0][1] == unique_resolutions[1][0]
            )
        ):
            raise RuntimeError(f"mixed resolutions beyond a landscape/portrait swap are unsupported: {unique_resolutions}")
        width = max(unique_resolutions[0][0], unique_resolutions[0][1])
        height = min(unique_resolutions[0][0], unique_resolutions[0][1])
        self.resolution = (width, height)

        self.light_annotations = None
        if self.filter_light_bloom:
            self.light_annotations = self.dataset.get_light_annotations()
            person_border_size = round((80 / 4088) * width)
            self.light_annotations_border_filter = np.ones((person_border_size, person_border_size), np.uint8)

        # Pool sizing (data_loader.py:247-256).
        self.buffer_size = min(max_buffer_size, self.num_camera_frame_pairs)
        if self.mode == M.TRAINING:
            if self.max_num_frames_per_batch > 1:
                max_reasonable = len(camera_numbers) * (self.max_num_frames_per_batch - 1)
                self.buffer_size = min(self.buffer_size, max_reasonable)
            self.occupancy_grids_buffer_size = min(self.buffer_size, self.max_num_frames_per_batch)
        else:
            self.occupancy_grids_buffer_size = min(self.buffer_size, len(self.frame_numbers))

        B = self.buffer_size
        self.pixel_rgba = np.zeros((B, self.num_pixels_per_camera, 4), dtype=np.uint8)
        self.light_ok = np.ones((B, self.num_pixels_per_camera), dtype=bool)
        self.entry_frame_numbers = np.full((B,), -1, dtype=np.int32)
        self.entry_camera_numbers = np.full((B,), -1, dtype=np.int32)
        self.entry_landscape = np.zeros((B,), dtype=bool)
        self.entry_inverse_krs = np.zeros((B, 3, 3), dtype=np.float32)
        self.entry_camera_origins = np.zeros((B, 3), dtype=np.float32)
        self.entry_grid_slots = np.zeros((B,), dtype=np.int32)
        self._pool_version = 0
        self._pool_cache = None

        self.occupancy_grid_resolution = 0
        self.device_grids = None
        if space_pruning_mode == DataLoader.SpacePruningMode.OCCUPANCY_GRID:
            self.occupancy_grid_resolution = int(
                self.dataset.get_occupancy_grid(frame_number=self.frame_numbers[0]).shape[0]
            )
            res = self.occupancy_grid_resolution
            self.device_grids = jnp.zeros((self.occupancy_grids_buffer_size, res, res, res), dtype=bool)
            self.frame_to_grid_slot = {}
            self.grid_slot_cycle = itertools.cycle(range(self.occupancy_grids_buffer_size))
            self.grid_lock = threading.Lock()
        else:
            # A single dummy grid so the pipeline signature stays uniform.
            self.device_grids = jnp.zeros((1, 1, 1, 1), dtype=bool)
            self.frame_to_grid_slot = {}
            self.grid_lock = threading.Lock()

        # Grid uploads queued by producer threads (replacer / preload pool) and
        # executed by the CONSUMER thread: (buffer_index, frame_number) pairs.
        # Worker threads never touch JAX — the remote TPU client only ever sees
        # single-threaded dispatch (see _queue_grid_slot / _resolve_pending_grids).
        self._pending_grid_entries: List[Tuple[int, int]] = []

        self.data_lock = threading.Lock()
        self.replacer_event = threading.Event()
        self.replacer_event.clear()
        self._shutdown = threading.Event()
        self.run_replacer_thread = self.buffer_size < self.num_camera_frame_pairs
        # Deterministic training mode: instead of a free-running replacer
        # thread racing the training loop (the reference's design,
        # data_loader.py:353-354 — batch composition then depends on thread
        # timing), replace exactly ONE pool entry synchronously per __next__.
        # Same schedule, same pool dynamics, reproducible batches — for CI
        # and for bitwise-comparable experiment pairs.
        #
        # Scope: this makes the DATA stream reproducible (unit-tested to
        # bitwise equality). Full run reproducibility additionally depends on
        # the backend: XLA:TPU executions are deterministic; XLA:CPU matmul
        # reductions were measured to vary run-to-run when step dispatch is
        # async under host-thread contention (identical inputs and executable,
        # diverging params; forcing a per-step host sync restores bitwise
        # equality). This is a CPU-backend property, not a pipeline one.
        self.deterministic = bool(deterministic) and self.mode == M.TRAINING

        if self.run_replacer_thread and self.mode != M.TRAINING:
            self.empty_slots_sem = threading.Semaphore(self.buffer_size)
            self.available_slots_sem = threading.Semaphore(0)

        self.camera_frame_pairs = self._camera_frame_pair_generator()
        preload_pairs = [next(self.camera_frame_pairs) for _ in range(self.buffer_size)]
        pool_threads = min(multiprocessing.cpu_count(), self.buffer_size)
        start = time.time()
        with ThreadPool(pool_threads) as pool:
            pool.starmap(
                self._load_and_copy_camera_frame_data,
                zip(preload_pairs, range(self.buffer_size), itertools.repeat(None)),
            )
        print(f"Images are loaded in {time.time() - start:.2f}s by a pool of {pool_threads} threads.")
        self.pair_load_index = self.buffer_size

        self._replacer_thread = None
        if self.run_replacer_thread and not self.deterministic:
            self._replacer_thread = threading.Thread(target=self._replace_next_buffer_entry, daemon=True)
            self._replacer_thread.start()
        import atexit

        atexit.register(self.shutdown)

    # -------------------------------------------------------------- generator

    def _camera_frame_pair_generator(self):
        """(camera, frame) schedule (`data_loader.py:356-394`): cycle the render
        sequence for VALIDATION/TEST; for TRAINING, iterate shuffled frames and
        emit `num_cams_per_frame_in_buffer` shuffled cameras per frame so at
        most `max_num_frames_per_batch` distinct frames coexist in the pool."""
        if self.mode != DataLoader.Mode.TRAINING:
            for pair in itertools.cycle(self.render_sequence):
                yield pair
            return

        if self.max_num_frames_per_batch > 1:
            num_cams_per_frame = int(np.ceil(self.buffer_size / (self.max_num_frames_per_batch - 1)))
        else:
            assert len(self.frame_numbers) == 1
            num_cams_per_frame = len(self.camera_numbers)
        assert num_cams_per_frame <= len(self.camera_numbers)

        per_frame = {
            fn: {"next_yield_index": 0, "camera_numbers": list(self.camera_numbers)}
            for fn in self.frame_numbers
        }
        frame_numbers = list(self.frame_numbers)
        while True:
            self.rng.shuffle(frame_numbers)
            for fn in frame_numbers:
                info = per_frame[fn]
                for _ in range(num_cams_per_frame):
                    if info["next_yield_index"] == 0:
                        self.rng.shuffle(info["camera_numbers"])
                    yield info["camera_numbers"][info["next_yield_index"]], fn
                    info["next_yield_index"] = (info["next_yield_index"] + 1) % len(info["camera_numbers"])

    # --------------------------------------------------------------- replacer

    def shutdown(self):
        """Stop the replacer thread (also called by atexit so the interpreter
        never tears down while a worker thread is inside a JAX call — the
        observed failure mode is a hard `Fatal Python error` when a daemon
        thread holding XLA state is killed mid-call at interpreter exit).

        The replacer is JAX-free (grid uploads are queued for the consumer
        thread, `_queue_grid_slot`) and checks `_shutdown` before every
        blocking wait, so after the event is set it reaches a checkpoint
        within one image load; the join below then completes promptly.
        Idempotent."""
        import atexit

        atexit.unregister(self.shutdown)  # drop the registry's reference
        self._shutdown.set()
        self.replacer_event.set()
        if self.run_replacer_thread and self.mode != DataLoader.Mode.TRAINING:
            # Unblock a replacer waiting for an empty pool slot.
            self.empty_slots_sem.release()
        t = getattr(self, "_replacer_thread", None)
        if t is not None and t.is_alive():
            t.join(timeout=30.0)
            if t.is_alive():
                print("[WARNING] DataLoader.shutdown: replacer thread still alive after 30s")
        self._replacer_thread = None

    def _replace_next_buffer_entry(self):
        for pair in self.camera_frame_pairs:
            while not self.replacer_event.wait(timeout=0.25):
                if self._shutdown.is_set():
                    return
            if self._shutdown.is_set():
                return

            self._evict_stale_grid_slots()
            self._load_and_copy_camera_frame_data(
                camera_frame_pair=pair,
                buffer_index=self.pair_load_index % self.buffer_size,
                data_lock=self.data_lock,
            )
            self.pair_load_index += 1

    def _evict_stale_grid_slots(self):
        if (
            self.space_pruning_mode == DataLoader.SpacePruningMode.OCCUPANCY_GRID
            and self.mode == DataLoader.Mode.TRAINING
        ):
            with self.grid_lock:
                live = set(self.entry_frame_numbers.tolist())
                for fn in [f for f in self.frame_to_grid_slot if f not in live]:
                    self.frame_to_grid_slot.pop(fn)
            assert len(self.frame_to_grid_slot) <= self.occupancy_grids_buffer_size

    def _replace_one_sync(self):
        """Deterministic-mode pool replacement: one entry, caller's thread."""
        pair = next(self.camera_frame_pairs)
        self._evict_stale_grid_slots()
        self._load_and_copy_camera_frame_data(pair, self.pair_load_index % self.buffer_size, None)
        self.pair_load_index += 1

    def _queue_grid_slot(self, buffer_index: int, frame_number: int) -> int:
        """Producer-side grid-slot assignment WITHOUT touching JAX.

        Returns the frame's existing device slot when one is registered
        (training-mode memoization), else queues the upload for the consumer
        thread and returns -1 (pending). `_resolve_pending_grids` — called by
        every consumer fetch under `data_lock` before the pool snapshot — does
        the actual `jnp` upload, so a batch can never observe a -1 slot.

        Rationale: the replacer/preload threads used to call `_upload_grid`
        (jnp.asarray + two jits) directly; through the experimental remote-TPU
        client, device dispatch from a worker thread concurrent with the
        training thread's step dispatch is a wedge hazard (observed: a 50k-step
        run hard-stalled mid-training with both threads busy-polling). With
        this queue, only the consumer thread ever dispatches to the device.
        """
        with self.grid_lock:
            if frame_number in self.frame_to_grid_slot:
                return self.frame_to_grid_slot[frame_number]
            self._pending_grid_entries.append((buffer_index, frame_number))
        return -1

    def _resolve_pending_grids(self) -> None:
        """Consumer-side: upload every queued grid and patch the pool's slot
        column. Called under `data_lock` (so the replacer cannot commit a new
        entry mid-resolve) before `pool_arrays()` snapshots the pool."""
        with self.grid_lock:
            if not self._pending_grid_entries:
                return
            pending, self._pending_grid_entries = self._pending_grid_entries, []
            for _buffer_index, frame_number in pending:
                # The entry (or a sibling with the same frame) may have been
                # replaced since queuing; only upload grids of live frames.
                # Per-frame memoization (all modes) means images sharing a
                # frame share a slot — a fresh-slot-per-image scheme could
                # cycle the small ring past a still-unconsumed image's grid
                # when buffer_size exceeds the ring size.
                live = self.entry_frame_numbers == frame_number
                if not live.any():
                    continue
                self.entry_grid_slots[live] = self._upload_grid(frame_number)
            self._pool_version += 1  # grid-slot column changed

    def _upload_grid(self, frame_number: int) -> int:
        """Upload (and dilate) a grid into a device slot; returns the slot.

        Consumer thread only, caller holds `grid_lock` (JAX dispatch must stay
        single-threaded through the remote client — see `_queue_grid_slot`)."""
        if frame_number in self.frame_to_grid_slot:
            return self.frame_to_grid_slot[frame_number]
        grid = self.dataset.get_occupancy_grid(frame_number)
        dilated = _dilate(jnp.asarray(grid))
        slot = next(self.grid_slot_cycle)
        # Evict whichever frame held this slot.
        for fn, s in list(self.frame_to_grid_slot.items()):
            if s == slot:
                self.frame_to_grid_slot.pop(fn)
        self.device_grids = _set_grid_slot(self.device_grids, slot, dilated)
        # Memoize in every mode: the ring has min(buffer, #frames) slots, so
        # per-frame slots never overflow it, and VALIDATION/TEST images that
        # share a frame share one resident grid instead of cycling the ring
        # over a still-unconsumed image's slot.
        self.frame_to_grid_slot[frame_number] = slot
        return slot

    def _load_and_copy_camera_frame_data(
        self,
        camera_frame_pair: Tuple[int, int],
        buffer_index: int,
        data_lock: Optional[threading.Lock],
    ) -> None:
        camera_number, frame_number = camera_frame_pair
        camera = self.cameras[camera_number]
        if self._shutdown.is_set():
            return

        rgba = None
        light_ok = None
        if self.mode != DataLoader.Mode.TEST:
            rgb = self.dataset.get_rgb(camera_number, frame_number)[..., [2, 1, 0]]  # BGR→RGB
            if self.use_mask:
                mask = self.dataset.get_mask(camera_number, frame_number)
                rgb = rgb * mask
            else:
                mask = np.ones_like(rgb[..., 0:1])
            rgba = (np.concatenate((rgb, mask), axis=-1) * np.float32(255)).astype(np.uint8).reshape(-1, 4)

            if self.light_annotations is not None:
                light_coords = self.light_annotations[camera_number]
                person_border = mask - cv2.erode(mask, self.light_annotations_border_filter)[..., np.newaxis]
                light_mask = np.zeros_like(rgb[..., 0:1], dtype=np.uint8)
                for c in light_coords:
                    light_mask = cv2.circle(light_mask, (c[0], c[1]), c[2], (255), -1)
                light_ok = ~((person_border[..., 0] > 0) & (light_mask[..., 0] > 0)).reshape(-1)

        if self.run_replacer_thread and self.mode != DataLoader.Mode.TRAINING:
            self.empty_slots_sem.acquire()
        # This thread does no JAX work at all (grid uploads are queued for the
        # consumer, `_queue_grid_slot`): the interpreter can never tear down
        # while a worker thread is inside XLA, and the remote-TPU client only
        # ever sees single-threaded dispatch.
        if self._shutdown.is_set():
            return

        if data_lock is not None:
            data_lock.acquire()
        try:
            grid_slot = 0
            if self.space_pruning_mode == DataLoader.SpacePruningMode.OCCUPANCY_GRID:
                grid_slot = self._queue_grid_slot(buffer_index, frame_number)

            if self.mode != DataLoader.Mode.TEST:
                self.pixel_rgba[buffer_index] = rgba
                self.light_ok[buffer_index] = True if light_ok is None else light_ok
            self.entry_frame_numbers[buffer_index] = frame_number
            self.entry_camera_numbers[buffer_index] = camera_number
            self.entry_landscape[buffer_index] = camera.width > camera.height
            self.entry_inverse_krs[buffer_index] = self.all_inverse_krs[camera_number]
            self.entry_camera_origins[buffer_index] = self.all_camera_origins[camera_number]
            self.entry_grid_slots[buffer_index] = grid_slot
            self._pool_version += 1  # invalidates the cached device snapshot
        finally:
            if data_lock is not None:
                data_lock.release()

        if self.run_replacer_thread and self.mode != DataLoader.Mode.TRAINING:
            for _ in range(self.num_batches_per_full_image):
                self.available_slots_sem.release()

    # --------------------------------------------------------------- sampling

    def pause_replacing(self):
        self.replacer_event.clear()

    def continue_replacing(self):
        self.replacer_event.set()

    def __len__(self):
        if self.mode == DataLoader.Mode.TRAINING:
            raise NotImplementedError("the training stream is endless; len() only applies to validation/test")
        return self.num_camera_frame_pairs * self.num_pixels_per_camera

    def __iter__(self):
        self.iternum = 0
        self.continue_replacing()
        return self

    def pool_arrays(self) -> PoolArrays:
        """Snapshot of the per-entry metadata as device arrays. Called under
        data_lock.

        Cached per pool version: the replacer bumps `_pool_version` whenever it
        rewrites an entry, so steps between replacements reuse the same device
        arrays instead of re-shipping the whole pool metadata every step (the
        analog of the reference's persistent CUDA-resident buffer tensors,
        data_loader.py:261-309)."""
        if self._pool_cache is None or self._pool_cache[0] != self._pool_version:
            snapshot = PoolArrays(
                # NB `.copy()` is load-bearing: on the CPU backend jnp.asarray
                # can ALIAS the numpy buffer zero-copy, and the replacer
                # mutates these entry arrays in place after the snapshot is
                # returned — without the copy a consumed pool can observe a
                # mid-commit -1 grid slot or torn camera row (caught by
                # tests/test_loader_paths.py::test_worker_threads_never_dispatch_jax
                # flaking). On TPU the device transfer copies anyway.
                inverse_krs=jnp.asarray(self.entry_inverse_krs.copy()),
                camera_origins=jnp.asarray(self.entry_camera_origins.copy()),
                landscape=jnp.asarray(self.entry_landscape.copy()),
                frame_numbers=jnp.asarray(self.entry_frame_numbers.copy()),
                camera_numbers=jnp.asarray(self.entry_camera_numbers.copy()),
                grid_slots=jnp.asarray(self.entry_grid_slots.copy()),
            )
            self._pool_cache = (self._pool_version, snapshot)
        return self._pool_cache[1]

    def next_training_chunk(self, k: int):
        """K consistent training batches + ONE pool snapshot, for chunked
        dispatch (--tpu.steps_per_dispatch; trainer._fetch_chunk).

        All K batches are drawn under a single `data_lock` hold, so the
        replacer (whose pool writes also take `data_lock`) can never swap an
        entry between two of them — the chunk is exactly as consistent as one
        `__next__` batch, with no replacer pausing (a paused-gate design
        starves: the replacer's seconds-long image load is gated only at its
        loop top, so an in-flight load commits mid-window every time).

        → (HostBatch with leading axis K on every leaf, PoolArrays, grids).
        """
        assert self.mode == DataLoader.Mode.TRAINING, "chunks are a training-stream feature"
        from humanrf_tpu import native

        R = self.batch_size
        buffer_idx = self.rng.integers(0, self.buffer_size, size=k * R).astype(np.int32)
        pixel_idx = self.rng.integers(0, self.num_pixels_per_camera, size=k * R).astype(np.int32)
        with self.data_lock:
            self._resolve_pending_grids()
            rgba, light_ok = native.gather(
                self.pixel_rgba,
                self.light_ok if self.filter_light_bloom else None,
                buffer_idx,
                pixel_idx,
            )
            pool = self.pool_arrays()
            grids = self.device_grids
        batch = HostBatch(
            buffer_idx=jnp.asarray(buffer_idx.reshape(k, R)),
            pixel_idx=jnp.asarray(pixel_idx.reshape(k, R)),
            rgba=jnp.asarray(rgba.reshape(k, R, 4)),
            ray_light_ok=jnp.asarray(light_ok.reshape(k, R)),
        )
        return batch, pool, grids

    def __next__(self):
        """→ (HostBatch, PoolArrays, grids, BatchInfo)."""
        M = DataLoader.Mode
        if self.mode in (M.VALIDATION, M.TEST):
            if self.iternum >= len(self):
                self.pause_replacing()
                raise StopIteration

        width, height = self.resolution
        R = self.batch_size
        if self.mode == M.TRAINING:
            from humanrf_tpu import native

            # replacer_event doubles as the pause gate (trainer checkpoints /
            # validation), so deterministic replacement honors it too.
            if self.deterministic and self.run_replacer_thread and self.replacer_event.is_set():
                self._replace_one_sync()

            buffer_idx = self.rng.integers(0, self.buffer_size, size=R).astype(np.int32)
            pixel_idx = self.rng.integers(0, self.num_pixels_per_camera, size=R).astype(np.int32)
            with self.data_lock:
                self._resolve_pending_grids()
                rgba, light_ok = native.gather(
                    self.pixel_rgba,
                    self.light_ok if self.filter_light_bloom else None,
                    buffer_idx,
                    pixel_idx,
                )
                pool = self.pool_arrays()
                grids = self.device_grids
            info = BatchInfo(num_real=R, width=width, height=height)
            num_real = R
        else:
            ray_start = self.iternum % self.num_pixels_per_camera
            ray_end = min(ray_start + R, self.num_pixels_per_camera)
            num_real = ray_end - ray_start

            image_num = self.iternum // self.num_pixels_per_camera
            camera_number, frame_number = self.render_sequence[image_num]
            buffer_index = image_num % self.buffer_size

            if self.run_replacer_thread:
                self.available_slots_sem.acquire()

            with self.data_lock:
                self._resolve_pending_grids()
                if not self.entry_landscape[buffer_index]:
                    width, height = height, width  # portrait image
                pixel_idx = np.arange(ray_start, ray_end, dtype=np.int32)
                pixel_idx = np.concatenate([pixel_idx, np.zeros(R - num_real, dtype=np.int32)])
                buffer_idx = np.full(R, buffer_index, dtype=np.int32)
                if self.mode == M.VALIDATION:
                    rgba = self.pixel_rgba[buffer_idx, pixel_idx].astype(np.float32) / 255.0
                else:
                    rgba = np.zeros((R, 4), dtype=np.float32)
                light_ok = (
                    self.light_ok[buffer_idx, pixel_idx]
                    if self.filter_light_bloom
                    else np.ones(R, dtype=bool)
                )
                pool = self.pool_arrays()
                grids = self.device_grids

            if self.run_replacer_thread and ray_end == self.num_pixels_per_camera:
                # Last batch of this image consumed → its pool slot is free for
                # the replacer. (Explicit end-of-image accounting; an earlier
                # version peeked at the semaphore's CPython-private `_value`.)
                self.empty_slots_sem.release()

            info = BatchInfo(
                num_real=num_real,
                width=width,
                height=height,
                camera_number=camera_number,
                frame_number=frame_number,
            )

        self.iternum += num_real

        batch = HostBatch(
            buffer_idx=jnp.asarray(buffer_idx),
            pixel_idx=jnp.asarray(pixel_idx),
            rgba=jnp.asarray(rgba),
            ray_light_ok=jnp.asarray(light_ok),
        )
        return batch, pool, grids, info
