"""Training/validation/test orchestration.

Mirrors the reference `Trainer` (`/root/reference/humanrf/trainer.py:49-620`)
with the TPU-native step underneath:

- the dynamic ray-batch-growing loop (`trainer.py:139-163`) is replaced by the
  static-shape pipeline whose sample *budget* caps per-step work (SURVEY §7);
- AMP GradScaler is intentionally absent: bf16 has fp32 exponent range, so no
  loss scaling is needed (`scaler_growth_interval` is accepted and inert);
- checkpointing keeps the latest/best + rolling-prune semantics
  (`trainer.py:528-620`) via train/checkpoint.py;
- adds first-class throughput instrumentation (rays/sec, samples/sec) — the
  reference only showed tqdm it/s (SURVEY §6).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from humanrf_tpu.data.loader import DataLoader
from humanrf_tpu.evaluation.metrics import LpipsModel, compute_psnr, compute_ssim
from humanrf_tpu.models.humanrf import HumanRFModel
from humanrf_tpu.train.checkpoint import (
    CHECKPOINT_SUFFIX,
    load_checkpoint,
    resolve_checkpoint,
    save_checkpoint,
)
from humanrf_tpu.train.pipeline import PipelineConfig, make_render_fn, make_train_step


def make_lr_schedule(lr: float, lr_decay: float, max_steps: int):
    """LambdaLR equivalent: lr · decay^min(step/max_steps, 1) (run.py:102-104)."""

    def schedule(step):
        return lr * lr_decay ** jnp.minimum(step / max_steps, 1.0)

    return schedule


def make_optimizer(
    lr: float, lr_decay: float, max_steps: int, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Adam(β=0.9/0.99, eps=1e-15) (run.py:101), with non-finite-update skipping.

    The reference trains under `torch.cuda.amp.GradScaler`, whose `step()`
    SKIPS the optimizer update whenever the gradients contain inf/NaN
    (trainer.py:250-252) — that skip is load-bearing: one overflowing batch
    (e.g. fp32 `exp` overflow in the density head on an unlucky sample) must
    not poison the parameters. bf16 needs no loss *scaling*, but it needs the
    same skip semantics; `apply_if_finite` is exactly that. Skips never raise:
    a persistently non-finite run stalls visibly (the trainer logs the skip
    counter from the optimizer state every 500 steps) instead of poisoning.

    ``weight_decay`` (decoupled, AdamW-style, scaled by the lr schedule)
    defaults to 0 here for reference parity — but note the CLI default is
    0.03 (`configs/args.py`), the stability-validated TPU flagship setting
    (PERF.md round-2b A/B); pass ``--training.weight_decay 0`` for a
    bit-parity Adam run. It is the one restoring force that
    still acts where volume-rendering gradients are dead: a region whose
    density saturated alpha (σ·dt ≳ 17) gets exp(−σ·dt)-attenuated — i.e.
    zero — gradients, so a wrongly-opaque floater can otherwise never be
    drained. Decay shrinks it unconditionally; correctly-opaque geometry is
    re-pushed by the photometric loss every step, floaters are not.
    """
    schedule = make_lr_schedule(lr, lr_decay, max_steps)
    if weight_decay:
        inner = optax.adamw(schedule, b1=0.9, b2=0.99, eps=1e-15, weight_decay=weight_decay)
    else:
        inner = optax.adam(schedule, b1=0.9, b2=0.99, eps=1e-15)
    # NB apply_if_finite's max_consecutive_errors is a GIVE-UP threshold: once
    # exceeded it applies the non-finite update anyway (observed poisoning
    # every parameter at exactly skip-step 100+ before the density-head
    # overflow clamp landed). A persistently-NaN regime should stall visibly,
    # never poison — so the threshold is effectively infinite.
    return optax.apply_if_finite(inner, max_consecutive_errors=10**9)


class Trainer:
    def __init__(
        self,
        config,  # the parsed run args (humanrf_tpu/configs/args.py)
        workspace: Path,
        checkpoint: Optional[str],
        model: HumanRFModel,
        pipeline_config: PipelineConfig,
        optimizer: Optional[optax.GradientTransformation],
        resolution,
        max_num_checkpoints: int = 2,
        store_visualization_hd: bool = True,
        store_visualization_tb: bool = True,
        seed: int = 123,
        mesh=None,
    ) -> None:
        self.config = config
        self.workspace = Path(workspace)
        self.model = model
        self.pcfg = pipeline_config
        self.optimizer = optimizer
        self.max_num_checkpoints = max_num_checkpoints
        self.store_visualization_hd = store_visualization_hd
        self.store_visualization_tb = store_visualization_tb
        self.resolution = resolution
        width, height = resolution

        self.params = model.init_params(jax.random.PRNGKey(seed))
        self.opt_state = optimizer.init(self.params) if optimizer is not None else None
        self.rng = jax.random.PRNGKey(seed + 1)

        self.train_step_fn = None
        self.steps_per_dispatch = 1
        if optimizer is not None:
            param_sharding = getattr(getattr(config, "tpu", None), "param_sharding", "replicated")
            k = int(getattr(getattr(config, "tpu", None), "steps_per_dispatch", 1) or 1)
            if k > 1:
                save_every = config.training.save_checkpoint_every_n_steps
                validate_every = config.validation.every_n_steps
                if save_every % k or validate_every % k:
                    raise ValueError(
                        f"--tpu.steps_per_dispatch {k} must divide "
                        f"--training.save_checkpoint_every_n_steps ({save_every}) and "
                        f"--validation.every_n_steps ({validate_every}) so chunks never "
                        "cross a checkpoint/validation boundary"
                    )
            if mesh is not None and mesh.devices.size > 1 and param_sharding == "fsdp":
                from humanrf_tpu.parallel.fsdp import make_fsdp_train_step

                self._log_info(
                    f"FSDP training over {mesh.devices.size} devices: segment tables "
                    "(and Adam moments) sharded on the table axis, rays data-parallel"
                    + (f", {k} steps per dispatch (lax.scan, sharded carry)" if k > 1 else "")
                )
                self.train_step_fn, init_state = make_fsdp_train_step(
                    self.pcfg, model, optimizer, width, height, mesh, k=k
                )
                self.params, self.opt_state = init_state(self.params)
                self._fsdp_init_state = init_state
                self.steps_per_dispatch = k
            elif mesh is not None and mesh.devices.size > 1:
                from humanrf_tpu.parallel.mesh import make_sharded_train_step

                self._log_info(
                    f"data-parallel training over {mesh.devices.size} devices"
                    + (f", {k} steps per dispatch (lax.scan inside shard_map)" if k > 1 else "")
                )
                self.train_step_fn = make_sharded_train_step(
                    self.pcfg, model, optimizer, width, height, mesh, k=k
                )
                self.steps_per_dispatch = k
            else:
                if k > 1:
                    from humanrf_tpu.train.pipeline import make_chunked_train_step

                    self._log_info(f"chunked training: {k} steps per device dispatch (lax.scan)")
                    self.train_step_fn = make_chunked_train_step(
                        self.pcfg, model, optimizer, width, height, k
                    )
                else:
                    self.train_step_fn = make_train_step(self.pcfg, model, optimizer, width, height)
                self.steps_per_dispatch = k
        # Validation/test loaders use their own (smaller) ray batch sizes; jitted
        # render fns are cached per batch size.
        self._render_fns = {}

        self.lpips = LpipsModel.load_or_init()
        if not self.lpips.is_pretrained:
            self._log_warning(
                "No pretrained LPIPS weights found (set HUMANRF_TPU_LPIPS_WEIGHTS to a "
                "converted lpips_alex.npz). The random-feature perceptual proxy is reported "
                f"as '{self.lpips.metric_name}' — NOT comparable to reference lpips — and "
                "best-checkpoint selection falls back to PSNR."
            )

        self.step = 0
        self.val_step = 0
        self.stats = {
            "lpips_vals": [],
            "psnr_vals": [],
            "ssim_vals": [],
            "checkpoints": [],
            "best_lpips": float("inf"),
            "best_psnr": 0.0,
            "best_ssim": 0.0,
        }

        self.checkpoints_dir = self.workspace / "checkpoints"
        self.checkpoints_dir.mkdir(parents=True, exist_ok=True)
        self.best_checkpoint_path = self.checkpoints_dir / f"best{CHECKPOINT_SUFFIX}"

        n_params = self.model.num_params(self.params)
        self._log_info(f"# parameters: {n_params / 1e6:.3f} million")

        self.load(full_state=True, checkpoint=checkpoint)

        self.writer = None

    def _get_render_fn(self, batch_size: int):
        if batch_size not in self._render_fns:
            import dataclasses

            width, height = self.resolution
            # Scale the sample budgets to the render batch size so full-image
            # rendering never silently truncates a ray's samples (the budgets
            # in pcfg are per-training-batch; the per-ray sample density is a
            # scene property, so scale proportionally, 128-aligned).
            def scale(budget):
                per_ray = max(budget // max(self.pcfg.num_rays, 1), 1)
                return max(128, ((per_ray * batch_size + 127) // 128) * 128)

            pcfg = dataclasses.replace(
                self.pcfg,
                num_rays=batch_size,
                candidate_budget=scale(self.pcfg.candidate_budget),
                sample_budget=scale(self.pcfg.sample_budget),
            )
            self._render_fns[batch_size] = make_render_fn(pcfg, self.model, width, height)
        return self._render_fns[batch_size]

    # ------------------------------------------------------------ HBM preflight

    def _preflight_hbm_check(self, *step_args) -> None:
        """Refuse loudly (instead of a hard device crash) when the compiled
        train step cannot fit device memory.

        Reference-exact dense/gather configurations at protocol batch sizes
        (e.g. `--config example_humanrf` verbatim, 16,384 rays) exceed a
        v5e-16GB chip's HBM and previously died mid-step with an opaque TPU
        `UNAVAILABLE` error (PERF.md "dense mode"). The step is already jitted,
        so AOT-compile it on the first batch (the identical executable the
        first dispatch would build — no extra compile) and read XLA's exact
        `memory_analysis()` before anything executes. Over-limit → RuntimeError
        with the measured footprint and the two validated downshifts.
        """
        fn = self.train_step_fn
        if not hasattr(fn, "lower"):
            return  # wrapped multi-device steps (FSDP closure) — not the crash path
        try:
            compiled = fn.lower(*step_args).compile()
            ma = compiled.memory_analysis()
            need = int(ma.temp_size_in_bytes) + int(ma.argument_size_in_bytes)
        except Exception as e:  # memory_analysis unsupported on some backends
            self._log_info(f"HBM preflight unavailable on this backend ({type(e).__name__}); skipping")
            return
        dev = jax.devices()[0]
        gib = 1 << 30
        try:
            limit = int(dev.memory_stats()["bytes_limit"])
        except Exception:
            # memory_stats is unavailable through some device clients (the
            # axon tunnel); fall back to the device kind's HBM size so the
            # fence still works where the crash actually happens.
            kind = getattr(dev, "device_kind", "") or ""
            by_kind = {"TPU v5 lite": 16, "TPU v5e": 16, "TPU v5p": 96, "TPU v4": 32, "TPU v6": 32}
            limit = next(
                (s * gib for k, s in by_kind.items() if kind.startswith(k)), None
            )
            if limit is not None:
                self._log_info(f"device memory limit inferred from kind '{kind}': {limit // gib} GiB")
        if limit is None:
            self._log_info(
                f"train step footprint: {need / gib:.2f} GiB "
                "(device memory limit unknown — no fence applied)"
            )
            return
        self._log_info(
            f"train step footprint: {need / gib:.2f} GiB of {limit / gib:.2f} GiB HBM "
            f"(temp {int(ma.temp_size_in_bytes) / gib:.2f} + args {int(ma.argument_size_in_bytes) / gib:.2f})"
        )
        if need > limit:
            raise RuntimeError(
                f"compiled train step needs {need / gib:.2f} GiB but the device has "
                f"{limit / gib:.2f} GiB HBM — refusing before the opaque device crash. "
                f"Measured at num_rays={self.pcfg.num_rays}, sampling={self.pcfg.sampling}, "
                f"backend={self.model.config.field_backend}. Validated downshifts: "
                "--tpu.sampling proposal (reference-capacity gather trains at 5.8x the "
                "dense floor, PERF.md), or halve --training.rays_initial_batch_size "
                "(8,192 rays is the validated gather shape on v5e-16GB)."
            )
        if need > 0.92 * limit:
            self._log_warning(
                f"train step uses {100 * need / limit:.0f}% of HBM — transient "
                "allocations (validation renders, checkpoint saves) may still abort; "
                "consider --tpu.sampling proposal or a smaller rays batch"
            )

    # ----------------------------------------------------------------- logging

    def _log_info(self, text: str) -> None:
        print(f"[INFO] {text}")

    def _log_warning(self, text: str) -> None:
        print(f"[WARNING] {text}")

    # ------------------------------------------------------------------ train

    def train(self, training_data_loader: DataLoader, validation_data_loader: DataLoader, max_steps: int) -> None:
        import tensorboardX

        tb_path = self.workspace / "run"
        tb_path.mkdir(exist_ok=True)
        self.writer = tensorboardX.SummaryWriter(str(tb_path))

        loss_ema = 0.0
        aabb = jnp.asarray(training_data_loader.aabb)
        loader_iter = iter(training_data_loader)

        save_every = self.config.training.save_checkpoint_every_n_steps
        validate_every = self.config.validation.every_n_steps

        window_start = time.time()
        last_log = self.step
        # Supervised-ray counter, accumulated device-side between TB logs so
        # the host never forces a per-step sync. "Supervised" = rays that
        # actually contribute to the loss (valid ∩ fully-budgeted), the honest
        # companion to the nominal rays/s number (VERDICT weak #5).
        supervised_accum = jnp.zeros((), dtype=jnp.float32)
        # Wall-time attribution for the bench-vs-trainer throughput gap:
        # host batch assembly (loader fetch under data_lock) vs everything
        # else in the window (device step + dispatch), plus validation/
        # checkpoint pauses — so a slow run says WHERE it is slow.
        fetch_accum = 0.0
        pause_accum = 0.0

        profile_dir = getattr(getattr(self.config, "tpu", None), "profile_dir", None)
        trace_active = False

        k = self.steps_per_dispatch
        if k > 1 and getattr(training_data_loader, "deterministic", False):
            raise ValueError(
                "--tpu.steps_per_dispatch > 1 is incompatible with "
                "--dataset.deterministic_loader: the deterministic loader replaces pool "
                "entries synchronously inside __next__ gated on the (paused) replacer "
                "event, so chunked fetches would never refresh the pool"
            )
        if k > 1 and max_steps % k:
            self._log_warning(
                f"max_steps {max_steps} rounded down to {max_steps - max_steps % k} "
                f"(a multiple of --tpu.steps_per_dispatch {k})"
            )
            max_steps -= max_steps % k

        while self.step < max_steps + (1 if k == 1 else 0):
            self.step += k
            if profile_dir is not None:
                if self.step >= 20 and not trace_active and self.step < 20 + 2 * k + 5:
                    jax.profiler.start_trace(str(profile_dir))
                    trace_active = True
                    trace_stop_at = self.step + max(5, 2 * k)
                elif trace_active and self.step >= trace_stop_at:
                    jax.profiler.stop_trace()
                    trace_active = False
                    self._log_info(f"profiler trace written to {profile_dir}")
                    profile_dir = None  # one trace per run
            self.rng, step_rng = jax.random.split(self.rng)
            t_fetch = time.perf_counter()
            if k == 1:
                batch, pool, grids, info = next(loader_iter)
                fetch_accum += time.perf_counter() - t_fetch
                if not getattr(self, "_preflight_done", False):
                    self._preflight_hbm_check(
                        self.params, self.opt_state, batch, pool, grids, aabb, step_rng
                    )
                    self._preflight_done = True
                self.params, self.opt_state, loss, aux = self.train_step_fn(
                    self.params, self.opt_state, batch, pool, grids, aabb, step_rng
                )
                supervised_step = aux["num_rays_supervised"]
            else:
                # One data_lock hold fetches K batches sharing a consistent
                # pool snapshot (data/loader.py:next_training_chunk): the
                # replacer keeps running at full rate yet can never swap a
                # pool entry mid-chunk.
                batch, pool, grids = training_data_loader.next_training_chunk(k)
                fetch_accum += time.perf_counter() - t_fetch
                if not getattr(self, "_preflight_done", False):
                    self._preflight_hbm_check(
                        self.params, self.opt_state, batch, pool, grids, aabb, step_rng
                    )
                    self._preflight_done = True
                self.params, self.opt_state, losses, auxs = self.train_step_fn(
                    self.params, self.opt_state, batch, pool, grids, aabb, step_rng
                )
                loss = losses[-1]
                aux = jax.tree_util.tree_map(lambda v: v[-1], auxs)
                supervised_step = jnp.sum(auxs["num_rays_supervised"])
            supervised_accum = supervised_accum + supervised_step

            if self.step % 20 == 0 or self.step <= 1:
                step_loss = float(loss)
                loss_ema = 0.95 * loss_ema + 0.05 * step_loss
                self.writer.add_scalar("photometric/training", float(aux["photometric"]), self.step)
                self.writer.add_scalar("psnr/training", -10 * np.log10(max(float(aux["mse"]), 1e-12)), self.step)
                if "mask_loss" in aux:
                    self.writer.add_scalar("mask_loss/training", float(aux["mask_loss"]), self.step)
                elapsed = time.time() - window_start
                if elapsed > 0:
                    total_rays = self.pcfg.num_rays * (self.step - last_log)
                    # Train-only rate excludes validation/checkpoint pauses —
                    # the number to compare against bench.py's (which never
                    # validates); the wall rate includes them.
                    train_elapsed = max(elapsed - pause_accum, 1e-9)
                    self.writer.add_scalar("throughput/rays_per_sec", total_rays / train_elapsed, self.step)
                    self.writer.add_scalar("throughput/rays_per_sec_wall", total_rays / elapsed, self.step)
                    self.writer.add_scalar(
                        "throughput/supervised_rays_per_sec", float(supervised_accum) / train_elapsed, self.step
                    )
                    self.writer.add_scalar("throughput/steps_per_sec", (self.step - last_log) / train_elapsed, self.step)
                    self.writer.add_scalar("throughput/host_fetch_fraction", fetch_accum / max(elapsed, 1e-9), self.step)
                supervised_accum = jnp.zeros((), dtype=jnp.float32)
                if self.step % 500 == 0:
                    skipped = getattr(self.opt_state, "total_notfinite", None)
                    train_elapsed = max(elapsed - pause_accum, 1e-9)
                    self._log_info(
                        f"step {self.step}: loss={step_loss:.5f} ema={loss_ema:.5f} "
                        f"samples={int(aux['num_samples'])} "
                        f"rays/s={self.pcfg.num_rays * (self.step - last_log) / train_elapsed:.0f}"
                        f" [fetch {100 * fetch_accum / max(elapsed, 1e-9):.0f}% device+dispatch "
                        f"{100 * (elapsed - pause_accum - fetch_accum) / max(elapsed, 1e-9):.0f}%"
                        + (f" val/ckpt {pause_accum:.0f}s" if pause_accum > 0 else "")
                        + "]"
                        + (f" skipped_nonfinite={int(skipped)}" if skipped is not None else "")
                    )
                    if skipped is not None and int(skipped) > 0:
                        self.writer.add_scalar("stability/skipped_nonfinite_updates", int(skipped), self.step)
                window_start = time.time()
                last_log = self.step
                fetch_accum = 0.0
                pause_accum = 0.0

            if self.step > 0:
                if self.step % save_every == 0 or self.step % validate_every == 0:
                    t_pause = time.perf_counter()
                    training_data_loader.pause_replacing()
                    if self.step % save_every == 0:
                        self.save(full_state=True, best=False)
                    if self.step % validate_every == 0:
                        self.validate(validation_data_loader)
                        self.save(full_state=True, best=True)
                    training_data_loader.continue_replacing()
                    pause_accum += time.perf_counter() - t_pause

        if trace_active:
            jax.profiler.stop_trace()
        self.writer.close()

    # --------------------------------------------------------------- validate

    def validate(self, data_loader: DataLoader) -> None:
        self._log_info(f"===== Validation at step {self.step} =====")
        total_loss: Dict[str, float] = {}

        path_validation = self.workspace / "validation"
        path_validation.mkdir(exist_ok=True)
        log_path = self.workspace / "validation.txt"
        with open(log_path, "a") as f:
            f.write(f"Step: {self.step}\n")

        background_rgb = 0.0
        val_img_step = 0
        aabb = jnp.asarray(data_loader.aabb)

        metric_counts: Dict[str, int] = {}
        partial_colors: List[np.ndarray] = []
        partial_rgba: List[np.ndarray] = []
        for data_idx, (batch, pool, grids, info) in enumerate(data_loader):
            render_fn = self._get_render_fn(data_loader.batch_size)
            out, valid = render_fn(self.params, batch, pool, grids, aabb, background_rgb)
            partial_colors.append(np.asarray(out.color)[: info.num_real])
            partial_rgba.append(np.asarray(batch.rgba)[: info.num_real])

            if (data_idx + 1) % data_loader.num_batches_per_full_image != 0:
                continue

            colors = np.concatenate(partial_colors, axis=0)
            rgba = np.concatenate(partial_rgba, axis=0)
            partial_colors, partial_rgba = [], []

            losses_info, comparison = self._evaluate_one_image(
                colors, rgba, info.width, info.height, background_rgb
            )
            val_img_step += 1
            for k, v in losses_info.items():
                if not np.isfinite(v):
                    self._log_warning(
                        f"validation metric '{k}' is non-finite for image {val_img_step}; "
                        "excluded from averages"
                    )
                    continue
                total_loss[k] = total_loss.get(k, 0.0) + v
                metric_counts[k] = metric_counts.get(k, 0) + 1

            tag = f"step_{self.step:04d}_{val_img_step:04d}"
            if self.store_visualization_hd:
                pred_img = (np.clip(colors.reshape(info.height, info.width, 3), 0, 1) * 255).astype(np.uint8)
                cv2.imwrite(str(path_validation / f"{tag}_rgb.png"), cv2.cvtColor(pred_img, cv2.COLOR_RGB2BGR))
                comp = (np.clip(comparison, 0, 1) * 255).astype(np.uint8)
                cv2.imwrite(str(path_validation / f"{tag}_comparison.png"), cv2.cvtColor(comp, cv2.COLOR_RGB2BGR))
            if self.store_visualization_tb and self.writer is not None:
                self.writer.add_image(
                    f"comp_{val_img_step:04d}",
                    (np.clip(comparison, 0, 1) * 255).astype(np.uint8).transpose(2, 0, 1),
                    self.step,
                )

            desc = " ".join(
                f"{k}={v:.4f}" for k, v in losses_info.items() if k not in ("mask_loss", "photometric")
            )
            with open(log_path, "a") as f:
                f.write(f"image_id: {val_img_step} --- {desc}\n")

        for k in total_loss:
            total_loss[k] /= max(metric_counts.get(k, 0), 1)

        self.stats["lpips_vals"].append(total_loss.get("lpips", float("inf")))
        self.stats["psnr_vals"].append(total_loss.get("psnr", 0.0))
        self.stats["ssim_vals"].append(total_loss.get("ssim", 0.0))

        if self.writer is not None:
            for k, v in total_loss.items():
                self.writer.add_scalar(f"{k}/validation", v, self.step)
        self._log_info(
            "validation: " + " ".join(f"{k}={v:.4f}" for k, v in total_loss.items())
        )
        self.val_step += 1

    def _evaluate_one_image(self, colors, rgba, width, height, background_rgb):
        """ROI-cropped PSNR/SSIM/LPIPS on an assembled image (trainer.py:372-419)."""
        gt_rgb = rgba[:, 0:3] * rgba[:, 3:4] + background_rgb * (1 - rgba[:, 3:4])
        gt_mask = rgba[:, 3]

        pred_img = colors.reshape(height, width, 3)
        gt_img = gt_rgb.reshape(height, width, 3)
        mask_img = gt_mask.reshape(height, width)

        x, y, w, h = cv2.boundingRect(((mask_img > 0) * 255).astype(np.uint8))
        if w == 0 or h == 0:
            x, y, w, h = 0, 0, width, height
        pred_roi = pred_img[y : y + h, x : x + w]
        gt_roi = gt_img[y : y + h, x : x + w]

        losses_info = {
            "psnr": compute_psnr(pred_roi, gt_roi),
            "ssim": compute_ssim(pred_roi, gt_roi, data_range=1.0),
        }
        # Only real LPIPS reaches the headline metrics. The random-feature
        # fallback proxy has near-zero dynamic range (1e-4–2.5e-3 while PSNR
        # swings 6 dB on the r4 50k run) — it decorated every table without
        # informing any decision, so it is no longer logged (VERDICT r4 #8);
        # best-checkpoint gating already falls back to PSNR.
        if self.lpips.is_pretrained:
            losses_info[self.lpips.metric_name] = self.lpips(pred_roi, gt_roi, normalize=True)
        comparison = np.concatenate([pred_roi, gt_roi], axis=1)
        return losses_info, comparison

    # ------------------------------------------------------------------- test

    def test(self, data_loader: DataLoader, save_path: Path, render_video: bool = False) -> None:
        self._log_info(f"===== Test → {save_path} =====")
        save_path = Path(save_path)
        save_path.mkdir(exist_ok=True, parents=True)

        background_rgb = 0.0
        aabb = jnp.asarray(data_loader.aabb)
        test_img_step = 0
        partial_colors: List[np.ndarray] = []
        for data_idx, (batch, pool, grids, info) in enumerate(data_loader):
            render_fn = self._get_render_fn(data_loader.batch_size)
            out, _ = render_fn(self.params, batch, pool, grids, aabb, background_rgb)
            partial_colors.append(np.asarray(out.color)[: info.num_real])

            if (data_idx + 1) % data_loader.num_batches_per_full_image != 0:
                continue

            colors = np.concatenate(partial_colors, axis=0)
            partial_colors = []
            img = (np.clip(colors.reshape(info.height, info.width, 3), 0, 1) * 255).astype(np.uint8)

            camera_number, frame_number = data_loader.render_sequence[test_img_step]
            if render_video:
                filename = f"{test_img_step:06d}"
            else:
                filename = data_loader.dataset.filepaths.get_rgb_path(
                    data_loader.cameras[camera_number].name, frame_number
                ).stem
            cv2.imwrite(str(save_path / f"{filename}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            test_img_step += 1

        if render_video:
            import subprocess

            try:
                subprocess.run(
                    # fmt: off
                    [
                        "ffmpeg", "-r", "25", "-i", str(save_path / "%06d.png"),
                        "-filter_complex", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
                        "-loglevel", "error", "-c:v", "libx264", "-crf", "14",
                        "-profile:v", "baseline", "-level", "3.0",
                        "-pix_fmt", "yuv420p", "-movflags", "faststart", "-y",
                        str(save_path.parent / f"video_{save_path.stem}.mp4"),
                    ],
                    # fmt: on
                    check=False,
                )
            except FileNotFoundError:
                # check=False guards a failing encode, not a missing binary —
                # without this, an ffmpeg-less image loses the whole run phase
                # AFTER every frame was already rendered to disk.
                self._log_warning("ffmpeg not found; skipping video encode (frames are on disk)")

    # ------------------------------------------------------------- checkpoint

    def save(self, full_state: bool, best: bool) -> None:
        if not best:
            filepath = self.checkpoints_dir / f"step_{self.step:08d}{CHECKPOINT_SUFFIX}"
            self.stats["checkpoints"].append(str(filepath))
            if len(self.stats["checkpoints"]) > self.max_num_checkpoints:
                oldest = Path(self.stats["checkpoints"].pop(0))
                if oldest.exists():
                    oldest.unlink()
            save_checkpoint(filepath, self.params, self.opt_state, self.step, self.val_step, self.stats)
        elif len(self.stats["psnr_vals"]) > 0:
            self.stats["best_lpips"] = min(self.stats["best_lpips"], self.stats["lpips_vals"][-1])
            self.stats["best_psnr"] = max(self.stats["best_psnr"], self.stats["psnr_vals"][-1])
            self.stats["best_ssim"] = max(self.stats["best_ssim"], self.stats["ssim_vals"][-1])
            lpips_part = (
                f"lpips={self.stats['lpips_vals'][-1]:.4f} " if self.lpips.is_pretrained else ""
            )
            self._log_info(
                f"step {self.step}: {lpips_part}"
                f"psnr={self.stats['psnr_vals'][-1]:.2f} ssim={self.stats['ssim_vals'][-1]:.4f} | "
                f"best: psnr={self.stats['best_psnr']:.2f} ssim={self.stats['best_ssim']:.4f}"
            )
            # The reference gates best.pth on validation LPIPS
            # (trainer.py:552-581). Without pretrained LPIPS weights that
            # metric does not exist, so gate on PSNR instead — loudly.
            if self.lpips.is_pretrained:
                is_best = self.stats["lpips_vals"][-1] == self.stats["best_lpips"]
                gate = "LPIPS"
            else:
                is_best = self.stats["psnr_vals"][-1] == self.stats["best_psnr"]
                gate = "PSNR (no pretrained LPIPS weights)"
            if is_best:
                self._log_info(f"validation {gate} improved on the previous best -> writing best checkpoint")
                save_checkpoint(
                    self.best_checkpoint_path, self.params, self.opt_state, self.step, self.val_step, self.stats
                )

    def load(self, full_state: bool, checkpoint: Optional[str]) -> None:
        if checkpoint is None:
            self._log_warning("no checkpoint requested (pass --training.checkpoint to resume)")
            return
        path = resolve_checkpoint(self.checkpoints_dir, checkpoint)
        if path is None:
            self._log_warning(f"checkpoint '{checkpoint}' matched nothing under {self.checkpoints_dir}; starting from random init")
            return
        self._log_info(f"restoring checkpoint {path}")
        params, opt_state, step, val_step, stats = load_checkpoint(path, self.params, self.opt_state)
        self.params = params
        if getattr(self, "_fsdp_init_state", None) is not None:
            # Re-commit loaded (host) arrays with the FSDP table shardings; the
            # optimizer moments are re-placed below via the same sharding rule.
            self.params, fresh_opt = self._fsdp_init_state(self.params)
            if opt_state is not None:
                opt_state = jax.device_put(
                    opt_state, jax.tree_util.tree_map(lambda x: x.sharding, fresh_opt)
                )
        if not full_state:
            self._log_info(f"restored model parameters only (step counter stays at {self.step})")
            return
        if self.opt_state is not None and opt_state is not None:
            self.opt_state = opt_state
        self.step = step
        self.val_step = val_step
        self.stats = stats
        self._log_info(f"restored model + optimizer + stats; resuming from step {self.step}")
