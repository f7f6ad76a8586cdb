"""Quality metrics: masked PSNR, SSIM, LPIPS.

The reference relies on external packages (`skimage.metrics.structural_similarity`
and `lpips==0.1.4`, see `/root/reference/actorshq/evaluation/evaluate.py:66-85` and
`/root/reference/humanrf/trainer.py:404-416`); neither is available here, so both
are implemented natively:

- `compute_ssim` reproduces skimage's default algorithm (uniform 7×7 window,
  K1=0.01, K2=0.03, sample covariance N/(N-1), per-channel mean) to numerical
  precision.
- `compute_lpips` implements the LPIPS-v0.1 architecture (AlexNet features →
  unit-normalize → squared diff → 1×1 linear heads → spatial mean → sum).
  Pretrained AlexNet/LPIPS weights cannot be downloaded in this environment;
  `LpipsModel.load_or_init` uses a weights file when present
  (`HUMANRF_TPU_LPIPS_WEIGHTS` env var or ~/.cache/humanrf_tpu/lpips_alex.npz,
  convertible from the pip `lpips` package via `lpips_convert_weights`) and
  otherwise falls back to a fixed-seed random feature network. The fallback is
  a perceptual *proxy*, NOT comparable to the reference's lpips==0.1.4 numbers:
  callers must report it under `metric_name` ("lpips_randfeat" when falling
  back) — no metric named "lpips" is ever produced from random weights — and
  best-checkpoint selection falls back to PSNR (train/trainer.py).
"""
from __future__ import annotations

import os
from functools import partial
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- PSNR


def compute_psnr(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray | None = None) -> float:
    """Masked PSNR matching `evaluate.py:80-85`: per-pixel channel-mean MSE,
    restricted to mask>0 pixels, then −10·log10."""
    mse = np.square(pred.astype(np.float64) - gt.astype(np.float64)).mean(axis=-1).reshape(-1)
    if mask is not None:
        mse = mse[np.asarray(mask).reshape(-1) > 0]
    return float(-10.0 * np.log10(mse.mean()))


# --------------------------------------------------------------------- SSIM


def _uniform_filter(img: np.ndarray, size: int) -> np.ndarray:
    """scipy.ndimage.uniform_filter with mode='reflect' semantics, separable."""
    from scipy.ndimage import uniform_filter

    return uniform_filter(img, size=size, mode="reflect")


def compute_ssim(im1: np.ndarray, im2: np.ndarray, data_range: float = 1.0, win_size: int = 7) -> float:
    """skimage.metrics.structural_similarity(channel_axis=2) reproduction.

    ROIs smaller than the window (possible on tiny masks — skimage would raise,
    and a naive crop yields a NaN "mean of empty slice") shrink the window to
    the largest odd size that fits, emitting a warning; degenerate <3px ROIs
    are edge-padded to 3px first.
    """
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    assert im1.ndim == 3, "expected HWC"

    min_dim = min(im1.shape[0], im1.shape[1])
    if min_dim < 3:
        pad_h = max(3 - im1.shape[0], 0)
        pad_w = max(3 - im1.shape[1], 0)
        pad = ((0, pad_h), (0, pad_w), (0, 0))
        im1 = np.pad(im1, pad, mode="edge")
        im2 = np.pad(im2, pad, mode="edge")
        min_dim = 3
    if min_dim < win_size:
        shrunk = min_dim if min_dim % 2 == 1 else min_dim - 1
        import warnings

        warnings.warn(
            f"SSIM ROI {im1.shape[:2]} smaller than win_size={win_size}; using {shrunk}"
        )
        win_size = shrunk

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size**2
    cov_norm = NP / (NP - 1)

    ssims = []
    pad = (win_size - 1) // 2
    for c in range(im1.shape[2]):
        x, y = im1[..., c], im2[..., c]
        ux = _uniform_filter(x, win_size)
        uy = _uniform_filter(y, win_size)
        uxx = _uniform_filter(x * x, win_size)
        uyy = _uniform_filter(y * y, win_size)
        uxy = _uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)

        A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
        B1, B2 = ux**2 + uy**2 + C1, vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        ssims.append(S[pad:-pad, pad:-pad].mean() if pad > 0 else S.mean())
    return float(np.mean(ssims))


# -------------------------------------------------------------------- LPIPS

# AlexNet feature extractor layout: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX_LAYERS = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
# LPIPS input normalization (lpips.LPIPS scaling_layer constants).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def _default_weights_path() -> Path:
    env = os.environ.get("HUMANRF_TPU_LPIPS_WEIGHTS")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "humanrf_tpu" / "lpips_alex.npz"


def lpips_convert_weights(out_path: Path | None = None) -> Path:
    """Convert pretrained weights from the pip `lpips` package (if installed)
    into our npz format. Run on a machine with torch+lpips available."""
    import lpips as lpips_pkg  # noqa: F401  (optional dependency)
    import torch

    model = lpips_pkg.LPIPS(net="alex", version="0.1")
    arrays = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
            [m for m in model.net.slice3] + [m for m in model.net.slice4] + [m for m in model.net.slice5]
    conv_idx = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            arrays[f"conv{conv_idx}_w"] = m.weight.detach().numpy()
            arrays[f"conv{conv_idx}_b"] = m.bias.detach().numpy()
            conv_idx += 1
    for i, lin in enumerate(model.lins):
        arrays[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()[:, :, 0, 0].reshape(-1)
    out_path = out_path or _default_weights_path()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path


class LpipsModel:
    """LPIPS-v0.1 (AlexNet) in JAX."""

    def __init__(self, weights: Dict[str, np.ndarray], is_pretrained: bool):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()}
        self.is_pretrained = is_pretrained
        # Honest metric naming: random-feature scores are NOT lpips numbers.
        self.metric_name = "lpips" if is_pretrained else "lpips_randfeat"
        self._fn = jax.jit(partial(_lpips_forward, self.weights))

    @classmethod
    def load_or_init(cls, weights_path: Path | None = None, seed: int = 0) -> "LpipsModel":
        path = weights_path or _default_weights_path()
        if Path(path).exists():
            data = dict(np.load(path))
            return cls(data, is_pretrained=True)
        # Deterministic random fallback (documented divergence).
        rng = np.random.default_rng(seed)
        weights = {}
        in_ch = 3
        for i, (out_ch, k, _, _, _) in enumerate(_ALEX_LAYERS):
            std = np.sqrt(2.0 / (in_ch * k * k))
            weights[f"conv{i}_w"] = (std * rng.standard_normal((out_ch, in_ch, k, k))).astype(np.float32)
            weights[f"conv{i}_b"] = np.zeros(out_ch, dtype=np.float32)
            weights[f"lin{i}_w"] = np.abs(rng.standard_normal(out_ch)).astype(np.float32) / out_ch
            in_ch = out_ch
        return cls(weights, is_pretrained=False)

    # Below this size AlexNet's stride-4 conv + two pools yield empty feature
    # maps (NaN means). Real ActorsHQ ROIs are hundreds of px; tiny synthetic
    # ROIs are edge-padded up to this size.
    MIN_SIZE = 64

    def __call__(self, pred: np.ndarray, gt: np.ndarray, normalize: bool = True) -> float:
        """pred/gt: (H, W, 3) in [0,1] (normalize=True, the reference's usage)."""
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        h, w = pred.shape[:2]
        if h < self.MIN_SIZE or w < self.MIN_SIZE:
            pad_h = max(self.MIN_SIZE - h, 0)
            pad_w = max(self.MIN_SIZE - w, 0)
            pad = ((0, pad_h), (0, pad_w), (0, 0))
            pred = np.pad(pred, pad, mode="edge")
            gt = np.pad(gt, pad, mode="edge")
        x = jnp.asarray(pred, dtype=jnp.float32).transpose(2, 0, 1)[None]
        y = jnp.asarray(gt, dtype=jnp.float32).transpose(2, 0, 1)[None]
        if normalize:
            x = x * 2.0 - 1.0
            y = y * 2.0 - 1.0
        return float(self._fn(x, y))


def _alex_features(weights, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (N, 3, H, W) in [-1, 1] → list of 5 post-ReLU feature maps."""
    shift = jnp.asarray(_LPIPS_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_LPIPS_SCALE).reshape(1, 3, 1, 1)
    h = (x - shift) / scale

    feats = []
    for i, (_, k, stride, pad, pool_before) in enumerate(_ALEX_LAYERS):
        if pool_before:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
        h = jax.lax.conv_general_dilated(
            h,
            weights[f"conv{i}_w"],
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + weights[f"conv{i}_b"].reshape(1, -1, 1, 1)
        h = jax.nn.relu(h)
        feats.append(h)
    return feats


def _lpips_forward(weights, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    fx = _alex_features(weights, x)
    fy = _alex_features(weights, y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt((a * a).sum(1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt((b * b).sum(1, keepdims=True) + 1e-10)
        d = (a - b) ** 2  # (N, C, H, W)
        lin = weights[f"lin{i}_w"].reshape(1, -1, 1, 1)
        total = total + (d * lin).sum(1).mean()
    return total
