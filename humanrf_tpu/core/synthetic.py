"""Synthetic ActorsHQ-format dataset generator.

The reference dataset is gated behind credentials
(`/root/reference/actorshq/dataset/download_manager.py`, `README.md:84-97`), and the
reference ships no test fixtures (SURVEY.md §4). This module procedurally
generates a tiny scene — a colored sphere "actor" that can drift over time,
observed by cameras on a circle — written in the exact on-disk schema of
`actorshq/dataset/volumetric_dataset.py:16-73`, so the full pipeline
(data loader → sampling → rendering → training → evaluation) runs hermetically.
"""
from __future__ import annotations

import functools
import json
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np

from humanrf_tpu.core.aabb import AabbData, write_aabbs_csv
from humanrf_tpu.core.camera import CameraData, write_calibration_csv


# Bump on any renderer-behavior change (pixel values, mask carving, camera
# minting) so parameter-keyed scene caches regenerate deterministically:
# scripts/driver_common.py::ensure_scene stamps this into scene_meta.json.
# History: 2 = numpy truncation cast; 3 = fused JAX renderer with round()
# quantization (see _render_batch_jax NOTE).
GENERATOR_VERSION = 3


@dataclass
class SyntheticSceneConfig:
    num_cameras: int = 8
    width: int = 64
    height: int = 64
    num_frames: int = 2
    first_frame: int = 0
    sphere_radius: float = 0.35
    # Sphere center drifts linearly from `center_start` to `center_end` over the frames.
    center_start: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    center_end: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    camera_distance: float = 3.0
    grid_resolution: int = 64
    # World-space half-extent of per-frame AABBs around the sphere.
    aabb_margin: float = 0.1
    focal: float = 1.2  # normalized focal length
    # Camera indices whose width/height are swapped (portrait orientation),
    # exercising the loader's landscape/portrait handling like ActorsHQ's
    # mixed rigs.
    portrait_camera_indices: Tuple[int, ...] = ()
    # Explicit camera azimuths in radians (overrides the uniform ring when
    # set; num_cameras is ignored). Elevation keeps the standard
    # 0.4·sin(2·angle + 0.5) formula so a probe camera minted at a training
    # azimuth is bit-identical to the training rig's camera there — used by
    # scripts/parallax_probe.py to mint held-out views at controlled angular
    # distance from the training ring.
    camera_angles: Optional[Tuple[float, ...]] = None
    # --- detail controls (quality/capacity experiments, PERF.md) -------------
    # Spatial frequency of the procedural surface texture; ~6 is smooth, ≥30
    # produces the high-frequency detail that separates field capacities.
    texture_frequency: float = 6.0
    # Thin capsule "spikes" radiating from the sphere: sub-voxel structures
    # that stress both sampling density and grid resolution.
    num_rods: int = 0
    rod_radius: float = 0.02
    rod_length: float = 0.3


def _look_at_cam2world(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """RDF camera-to-world rotation: camera +z looks from eye toward target,
    +x right, +y down (COLMAP convention, `camera_data.py:17-29`)."""
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    world_up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(forward, world_up)) > 0.99:
        world_up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, -world_up)
    right = right / np.linalg.norm(right)
    down = np.cross(forward, right)
    R = np.stack([right, down, forward], axis=1)  # columns are camera axes in world
    return R


def make_cameras(cfg: SyntheticSceneConfig) -> List[CameraData]:
    from scipy.spatial.transform import Rotation

    cameras = []
    center = np.array([0.0, 0.0, 0.0])
    angles = (
        list(cfg.camera_angles)
        if cfg.camera_angles is not None
        else [2 * np.pi * i / cfg.num_cameras for i in range(cfg.num_cameras)]
    )
    for i, angle in enumerate(angles):
        # Alternate slightly in elevation so the visual hull is well-constrained.
        z = 0.4 * np.sin(2 * angle + 0.5)
        eye = np.array(
            [cfg.camera_distance * np.cos(angle), cfg.camera_distance * np.sin(angle), z]
        )
        R = _look_at_cam2world(eye, center)
        portrait = i in cfg.portrait_camera_indices
        width = cfg.height if portrait else cfg.width
        height = cfg.width if portrait else cfg.height
        cameras.append(
            CameraData(
                name=f"Cam{i + 1:03d}",
                width=width,
                height=height,
                rotation_axisangle=Rotation.from_matrix(R).as_rotvec(),
                translation=eye,
                focal_length=np.array([cfg.focal, cfg.focal * width / height]),
                principal_point=np.array([0.5, 0.5]),
            )
        )
    return cameras


def _sphere_center(cfg: SyntheticSceneConfig, frame_idx: int) -> np.ndarray:
    t = frame_idx / max(cfg.num_frames - 1, 1)
    return (1 - t) * np.asarray(cfg.center_start) + t * np.asarray(cfg.center_end)


def _rod_directions(num_rods: int) -> np.ndarray:
    """Evenly-spread unit directions (golden-spiral) for the capsule spikes."""
    k = np.arange(num_rods) + 0.5
    phi = np.arccos(1 - 2 * k / num_rods)
    theta = np.pi * (1 + 5**0.5) * k
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], axis=-1
    )


def _intersect_sphere(origin, dirs, center, radius):
    """Ray-sphere. Returns (t_hit [H,W], hit [H,W], normals [H,W,3])."""
    oc = origin - center
    b = 2.0 * dirs @ oc
    c = float(oc @ oc) - radius * radius
    disc = b * b - 4 * c
    sqrt_disc = np.sqrt(np.maximum(disc, 0.0))
    t_hit = (-b - sqrt_disc) / 2.0
    hit = (disc > 0) & (t_hit > 0)
    points = origin + dirs * t_hit[..., None]
    normals = (points - center) / radius
    return t_hit, hit, normals


def _intersect_capsule(origin, dirs, p0, p1, radius):
    """Ray-capsule (cylinder body + end spheres), vectorized over (H, W) rays."""
    axis = p1 - p0
    length = float(np.linalg.norm(axis))
    axis = axis / length

    # Infinite cylinder |(q − p0) ⊥ axis| = r.
    oc = origin - p0
    d_perp = dirs - (dirs @ axis)[..., None] * axis
    oc_perp = oc - (oc @ axis) * axis
    a = (d_perp * d_perp).sum(-1)
    b = 2.0 * (d_perp @ oc_perp)
    c = float(oc_perp @ oc_perp) - radius * radius
    disc = b * b - 4 * a * c
    sqrt_disc = np.sqrt(np.maximum(disc, 0.0))
    t_cyl = (-b - sqrt_disc) / np.maximum(2 * a, 1e-12)
    along = (origin + dirs * t_cyl[..., None] - p0) @ axis
    hit_cyl = (disc > 0) & (t_cyl > 0) & (along >= 0) & (along <= length)

    t_best = np.where(hit_cyl, t_cyl, np.inf)
    # End caps.
    for cap in (p0, p1):
        t_s, hit_s, _ = _intersect_sphere(origin, dirs, cap, radius)
        t_best = np.where(hit_s & (t_s < t_best), t_s, t_best)

    hit = np.isfinite(t_best)
    points = origin + dirs * np.where(hit, t_best, 0.0)[..., None]
    along = np.clip((points - p0) @ axis, 0.0, length)
    normals = points - (p0 + along[..., None] * axis)
    normals = normals / np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    return t_best, hit, normals


def _render_scene(
    cfg: SyntheticSceneConfig, camera: CameraData, center: np.ndarray, frame_phase: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Analytically ray-trace the actor (sphere + optional thin capsule spikes).
    Returns (rgb [H,W,3] in [0,1], mask [H,W])."""
    H, W = camera.height, camera.width
    inv_kr = camera.inverse_kr()
    xs = np.arange(W) + 0.5
    ys = np.arange(H) + 0.5
    px, py = np.meshgrid(xs, ys)
    pix = np.stack([px, py, np.ones_like(px)], axis=-1)  # (H, W, 3)
    dirs = pix @ inv_kr.T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = camera.translation

    # Nearest hit over all primitives.
    t_best, hit_any, normals = _intersect_sphere(origin, dirs, center, cfg.sphere_radius)
    t_best = np.where(hit_any, t_best, np.inf)
    for rod_dir in _rod_directions(cfg.num_rods) if cfg.num_rods else []:
        p0 = center + rod_dir * cfg.sphere_radius * 0.8
        p1 = center + rod_dir * (cfg.sphere_radius + cfg.rod_length)
        t_r, hit_r, n_r = _intersect_capsule(origin, dirs, p0, p1, cfg.rod_radius)
        closer = hit_r & (t_r < t_best)
        t_best = np.where(closer, t_r, t_best)
        normals = np.where(closer[..., None], n_r, normals)
        hit_any = hit_any | hit_r
    hit = hit_any & np.isfinite(t_best)

    points = origin + dirs * np.where(hit, t_best, 0.0)[..., None]
    # View-independent volumetric color pattern, evaluated at the surface point
    # (so all cameras must agree); `texture_frequency` sets the detail scale
    # and the phase animates it over frames.
    f = cfg.texture_frequency
    local = (points - center) / cfg.sphere_radius
    rgb = 0.5 + 0.5 * np.stack(
        [
            np.sin(f * local[..., 0] + frame_phase) * np.cos(0.7 * f * local[..., 1]),
            np.sin(f * local[..., 1] + 2.0 + frame_phase) * np.cos(0.9 * f * local[..., 2]),
            np.sin(f * local[..., 2] + 4.0) * np.cos(0.8 * f * local[..., 0]),
        ],
        axis=-1,
    )
    # Gentle lambertian shading from a fixed light.
    light = np.array([0.5, 0.5, 0.7])
    light = light / np.linalg.norm(light)
    shade = np.clip(normals @ light, 0.2, 1.0)
    rgb = np.clip(rgb * shade[..., None], 0.0, 1.0)
    rgb = np.where(hit[..., None], rgb, 0.0)
    return rgb.astype(np.float32), hit.astype(np.uint8)


def _render_batch_jax(cfg: SyntheticSceneConfig, H: int, W: int):
    """Jitted (and camera-batched) version of `_render_scene`.

    Same math as the numpy path but fused by XLA in float32 — the numpy
    renderer allocates ~30 full-frame float64 temporaries per primitive,
    which at 748² × 12 rods costs seconds per image; the fused version is
    bandwidth-minimal and renders a whole frame (all same-shape cameras) per
    dispatch. Returns fn(inv_krs (C,3,3), origins (C,3), center (3,),
    frame_phase ()) -> (rgb (C,H,W,3) u8 in [0,255], mask (C,H,W) u8) — rgb is
    round(rgb*255) on device to keep a tunnelled device's download at 1 B/px.
    NOTE: round() differs from the retired numpy generator's truncation cast
    by up to 1 LSB/channel, so scenes regenerated under a changed scene_meta
    are not bit-identical to pre-round-3 caches (ensure_scene regenerates on
    any meta change, so stale caches never mix).
    """
    import jax
    import jax.numpy as jnp

    radius = float(cfg.sphere_radius)
    rod_dirs = _rod_directions(cfg.num_rods) if cfg.num_rods else []
    f = float(cfg.texture_frequency)

    def sphere(origin, dirs, center, r):
        oc = origin - center
        b = 2.0 * dirs @ oc
        c = oc @ oc - r * r
        disc = b * b - 4 * c
        sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_hit = (-b - sqrt_disc) / 2.0
        hit = (disc > 0) & (t_hit > 0)
        points = origin + dirs * t_hit[..., None]
        normals = (points - center) / r
        return t_hit, hit, normals

    def capsule(origin, dirs, p0, p1, r):
        axis = p1 - p0
        length = jnp.linalg.norm(axis)
        axis = axis / length
        oc = origin - p0
        d_perp = dirs - (dirs @ axis)[..., None] * axis
        oc_perp = oc - (oc @ axis) * axis
        a = (d_perp * d_perp).sum(-1)
        b = 2.0 * (d_perp @ oc_perp)
        c = oc_perp @ oc_perp - r * r
        disc = b * b - 4 * a * c
        sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_cyl = (-b - sqrt_disc) / jnp.maximum(2 * a, 1e-12)
        along = (origin + dirs * t_cyl[..., None] - p0) @ axis
        hit_cyl = (disc > 0) & (t_cyl > 0) & (along >= 0) & (along <= length)
        t_best = jnp.where(hit_cyl, t_cyl, jnp.inf)
        for cap in (p0, p1):
            t_s, hit_s, _ = sphere(origin, dirs, cap, r)
            t_best = jnp.where(hit_s & (t_s < t_best), t_s, t_best)
        hit = jnp.isfinite(t_best)
        points = origin + dirs * jnp.where(hit, t_best, 0.0)[..., None]
        along = jnp.clip((points - p0) @ axis, 0.0, length)
        normals = points - (p0 + along[..., None] * axis)
        normals = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        return t_best, hit, normals

    def one(inv_kr, origin, center, frame_phase):
        # Ground-truth images must not inherit the TPU's bf16 default matmul
        # precision (the 3-vector camera dots would pick up ~1e-3 direction
        # error → visible texture-phase error at high texture_frequency).
        with jax.default_matmul_precision("highest"):
            return _one(inv_kr, origin, center, frame_phase)

    def _one(inv_kr, origin, center, frame_phase):
        xs = jnp.arange(W, dtype=jnp.float32) + 0.5
        ys = jnp.arange(H, dtype=jnp.float32) + 0.5
        px, py = jnp.meshgrid(xs, ys)
        pix = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
        dirs = pix @ inv_kr.T
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        t_best, hit_any, normals = sphere(origin, dirs, center, radius)
        t_best = jnp.where(hit_any, t_best, jnp.inf)
        for rod_dir in rod_dirs:
            rd = jnp.asarray(rod_dir, dtype=jnp.float32)
            p0 = center + rd * radius * 0.8
            p1 = center + rd * (radius + cfg.rod_length)
            t_r, hit_r, n_r = capsule(origin, dirs, p0, p1, cfg.rod_radius)
            closer = hit_r & (t_r < t_best)
            t_best = jnp.where(closer, t_r, t_best)
            normals = jnp.where(closer[..., None], n_r, normals)
            hit_any = hit_any | hit_r
        hit = hit_any & jnp.isfinite(t_best)

        points = origin + dirs * jnp.where(hit, t_best, 0.0)[..., None]
        local = (points - center) / radius
        rgb = 0.5 + 0.5 * jnp.stack(
            [
                jnp.sin(f * local[..., 0] + frame_phase) * jnp.cos(0.7 * f * local[..., 1]),
                jnp.sin(f * local[..., 1] + 2.0 + frame_phase) * jnp.cos(0.9 * f * local[..., 2]),
                jnp.sin(f * local[..., 2] + 4.0) * jnp.cos(0.8 * f * local[..., 0]),
            ],
            axis=-1,
        )
        light = jnp.asarray([0.5, 0.5, 0.7])
        light = light / jnp.linalg.norm(light)
        shade = jnp.clip(normals @ light, 0.2, 1.0)
        rgb = jnp.clip(rgb * shade[..., None], 0.0, 1.0)
        rgb = jnp.where(hit[..., None], rgb, 0.0)
        # uint8 on-device: the caller JPEG-quantizes to 8 bits anyway, and a
        # remote (tunnelled) device would otherwise ship 4× the bytes home.
        return jnp.round(rgb * 255.0).astype(jnp.uint8), hit.astype(jnp.uint8)

    # Runs on the default backend (TPU when present): the compute is ~free
    # there and the uint8 outputs keep a tunnelled device's download small.
    # The single-core CPU backend measured 13× slower at 748² (40 s/frame).
    return jax.jit(jax.vmap(one, in_axes=(0, 0, None, None)))


def _occupancy_grid(
    cfg: SyntheticSceneConfig, center_scaled: np.ndarray, scene_scale: float
) -> np.ndarray:
    """Occupancy grid over the canonical [-0.5, 0.5] cube: 255 where inside the
    (slightly dilated) actor — sphere plus any capsule spikes — matching the
    visual-hull-carved grids the reference's toolbox produces: values {0, 255},
    stored [z][y][x] with corner-aligned voxel coords i/(res-1) − 0.5
    (`occupancy_grid_generation.cu:37,81`)."""
    res = cfg.grid_resolution
    coords = np.arange(res) / (res - 1) - 0.5
    gz, gy, gx = np.meshgrid(coords, coords, coords, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).astype(np.float32)  # [z][y][x] of (x,y,z)
    dilation = 1.5 / res
    radius_scaled = cfg.sphere_radius * scene_scale

    rod_dirs = _rod_directions(cfg.num_rods) if cfg.num_rods else np.zeros((0, 3))
    p0s = (center_scaled + rod_dirs * radius_scaled * 0.8).astype(np.float32)
    p1s = (center_scaled + rod_dirs * (cfg.sphere_radius + cfg.rod_length) * scene_scale).astype(
        np.float32
    )
    flat = pts.reshape(-1, 3)
    grid = _occupancy_builder()(
        flat,
        center_scaled.astype(np.float32),
        p0s,
        p1s,
        np.float32(radius_scaled + dilation),
        np.float32(cfg.rod_radius * scene_scale + dilation),
    )
    return np.asarray(grid).reshape(res, res, res)


@functools.lru_cache(maxsize=None)
def _occupancy_builder():
    """One jitted voxel-carver shared by every frame/config: the radii arrive
    as traced scalars and the rod count as a static shape, so re-tracing only
    happens per distinct (num_voxels, num_rods) shape — not per call (a
    per-call `@jax.jit` on a fresh closure recompiles every frame).

    Distance tests fused on the accelerator (a res³ × num_rods numpy sweep
    costs seconds per frame at res=128); float32 suffices — the grid is
    dilated by 1.5 voxels, dwarfing rounding error on the inequality edge."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def build(flat, center, rod_p0s, rod_p1s, sphere_r, rod_r):
        dist = jnp.linalg.norm(flat - center, axis=-1)
        inside = dist <= sphere_r
        for i in range(rod_p0s.shape[0]):  # static unroll, num_rods is small
            p0, p1 = rod_p0s[i], rod_p1s[i]
            axis = p1 - p0
            denom = jnp.maximum((axis * axis).sum(), 1e-12)
            along = jnp.clip(((flat - p0) * axis).sum(-1) / denom, 0.0, 1.0)
            seg_dist = jnp.linalg.norm(flat - (p0 + along[:, None] * axis), axis=-1)
            inside |= seg_dist <= rod_r
        return jnp.where(inside, jnp.uint8(255), jnp.uint8(0))

    return build


def generate_synthetic_dataset(
    root: Path,
    cfg: SyntheticSceneConfig | None = None,
    actor: str = "SynthActor",
    sequence: str = "Sequence1",
    scale: int = 1,
) -> Path:
    """Writes the dataset under root/<actor>/<sequence>/{<scale>x, aabbs.csv,
    occupancy_grids, scene.json}. Returns the `<scale>x` data folder."""
    cfg = cfg or SyntheticSceneConfig()
    seq_dir = Path(root) / actor / sequence
    data_dir = seq_dir / f"{scale}x"
    data_dir.mkdir(parents=True, exist_ok=True)
    (seq_dir / "occupancy_grids").mkdir(exist_ok=True)

    cameras = make_cameras(cfg)
    write_calibration_csv(cameras, data_dir / "calibration.csv")

    frame_numbers = list(range(cfg.first_frame, cfg.first_frame + cfg.num_frames))

    # Per-frame AABBs around the moving sphere (world units).
    aabbs = []
    actor_extent = cfg.sphere_radius + (cfg.rod_length + cfg.rod_radius if cfg.num_rods else 0.0)
    for fi, fn in enumerate(frame_numbers):
        center = _sphere_center(cfg, fi)
        r = actor_extent + cfg.aabb_margin
        aabbs.append(AabbData(frame_number=fn, aabb=np.stack([center - r, center + r], axis=0)))
    write_aabbs_csv(aabbs, seq_dir / "aabbs.csv")

    # Scene normalization (same formula as the data loader) to place occupancy
    # grids in the canonical cube.
    all_aabbs = np.stack([a.aabb for a in aabbs], axis=0)
    union = np.stack((all_aabbs[:, 0].min(0), all_aabbs[:, 1].max(0)), axis=0)
    scene_offset = -union.mean(0)
    scene_scale = 1.0 / np.max(union[1] - union[0])

    # Render camera-batched per (H, W) group through the jitted renderer
    # (`_render_batch_jax`): one dispatch per frame per shape group instead of
    # ~30 float64 numpy temporaries per primitive per image. Dispatches run
    # LOOKAHEAD frames ahead of the host's JPEG encoding so the (possibly
    # remote) device computes/downloads while the host writes.
    shape_groups: dict[Tuple[int, int], list] = {}
    for cam in cameras:
        shape_groups.setdefault((cam.height, cam.width), []).append(cam)
    renderers = {hw: _render_batch_jax(cfg, hw[0], hw[1]) for hw in shape_groups}
    group_inv = {
        hw: np.stack([c.inverse_kr() for c in cams]).astype(np.float32)
        for hw, cams in shape_groups.items()
    }
    group_org = {
        hw: np.stack([c.translation for c in cams]).astype(np.float32)
        for hw, cams in shape_groups.items()
    }

    def _dispatch(fi: int):
        center = _sphere_center(cfg, fi).astype(np.float32)
        return {
            hw: renderers[hw](group_inv[hw], group_org[hw], center, 0.5 * fi)
            for hw in shape_groups
        }

    LOOKAHEAD = 3
    pending = [_dispatch(fi) for fi in range(min(LOOKAHEAD, len(frame_numbers)))]
    for fi, fn in enumerate(frame_numbers):
        outs = pending.pop(0)
        if fi + LOOKAHEAD < len(frame_numbers):
            pending.append(_dispatch(fi + LOOKAHEAD))
        center = _sphere_center(cfg, fi)
        for hw, cams in shape_groups.items():
            rgbs, masks = (np.asarray(a) for a in outs[hw])
            for ci, cam in enumerate(cams):
                rgb, mask = rgbs[ci], masks[ci]
                rgb_dir = data_dir / "rgbs" / cam.name
                mask_dir = data_dir / "masks" / cam.name
                rgb_dir.mkdir(parents=True, exist_ok=True)
                mask_dir.mkdir(parents=True, exist_ok=True)
                bgr = rgb[..., ::-1]  # already uint8 from the renderer
                cv2.imwrite(str(rgb_dir / f"{cam.name}_rgb{fn:06d}.jpg"), bgr, [cv2.IMWRITE_JPEG_QUALITY, 98])
                cv2.imwrite(str(mask_dir / f"{cam.name}_mask{fn:06d}.png"), mask * 255)

        center_scaled = (center + scene_offset) * scene_scale
        grid = _occupancy_grid(cfg, center_scaled, scene_scale)
        np.savez_compressed(str(seq_dir / "occupancy_grids" / f"occupancy_grid{fn:06d}.npz"), occupancy_grid=grid)

    # Empty light annotations (schema presence only).
    with open(data_dir / "light_annotations.csv", "w") as f:
        f.write("camera,x,y,r\n")

    with open(seq_dir / "scene.json", "w") as f:
        json.dump({"name": actor, "num_frames": cfg.num_frames, "synthetic": True}, f)

    return data_dir
