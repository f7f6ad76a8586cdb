"""The jitted batch renderer must reproduce the numpy reference renderer.

The synthetic scene is the ground truth every quality number is measured
against, so the fast (JAX, camera-batched, uint8) path is validated against
the original per-camera float64 numpy path pixel-for-pixel here.
"""
import numpy as np

from humanrf_tpu.core.synthetic import (
    SyntheticSceneConfig,
    _render_batch_jax,
    _render_scene,
    _sphere_center,
    make_cameras,
)


def _assert_masks_match_up_to_silhouette(mask: np.ndarray, mask_ref: np.ndarray, budget: int = 4):
    """Masks must agree except for a handful of silhouette-boundary pixels:
    near-tangent rays (discriminant ≈ 0) can legitimately flip between the
    float32 JAX path and the float64 numpy path, and between backends (TPU vs
    CPU). Interior flips are real bugs and get no budget."""
    mismatch = mask.astype(bool) != mask_ref.astype(bool)
    n_bad = int(mismatch.sum())
    assert n_bad <= budget, f"{n_bad} mask mismatches (budget {budget})"
    if n_bad == 0:
        return
    # A boundary pixel has both values within its 3x3 neighborhood in the
    # reference mask (i.e. it touches the silhouette edge).
    m = mask_ref.astype(bool)
    pad_t = np.pad(m, 1, constant_values=True)
    pad_f = np.pad(m, 1, constant_values=False)
    any_true = np.zeros_like(m)
    any_false = np.zeros_like(m)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            any_true |= pad_f[dy : dy + m.shape[0], dx : dx + m.shape[1]]
            any_false |= ~pad_t[dy : dy + m.shape[0], dx : dx + m.shape[1]]
    boundary = any_true & any_false
    assert bool(boundary[mismatch].all()), "mask mismatch away from the silhouette boundary"


def _assert_rgb_close_u8(rgb_u8: np.ndarray, rgb_ref_f: np.ndarray, mask_ok: np.ndarray):
    """Colors agree to float32 rounding + uint8 quantization. Both paths are
    8-bit before hitting disk (the JAX path rounds on device; the numpy path
    is quantized by the JPEG writer), so ±2 LSB covers the float32 texture
    phase error without hiding a swapped-axis bug. Pixels whose mask
    legitimately flipped (silhouette budget) are excluded."""
    ref_u8 = np.round(rgb_ref_f * 255.0)
    diff = np.abs(rgb_u8.astype(np.float64) - ref_u8)
    diff = np.where(mask_ok[..., None], diff, 0.0)
    assert diff.max() <= 2.0, f"max u8 diff {diff.max()}"


def test_jax_renderer_matches_numpy_reference():
    cfg = SyntheticSceneConfig(
        num_cameras=4,
        width=48,
        height=40,
        num_frames=3,
        texture_frequency=30.0,
        num_rods=6,
        center_end=(0.3, 0.1, 0.0),
    )
    cams = make_cameras(cfg)
    center = _sphere_center(cfg, 1)
    phase = 0.5

    render = _render_batch_jax(cfg, cams[0].height, cams[0].width)
    inv = np.stack([c.inverse_kr() for c in cams]).astype(np.float32)
    org = np.stack([c.translation for c in cams]).astype(np.float32)
    rgbs, masks = render(inv, org, center.astype(np.float32), phase)
    rgbs, masks = np.asarray(rgbs), np.asarray(masks)
    assert rgbs.dtype == np.uint8 and masks.dtype == np.uint8
    assert rgbs.shape == (4, 40, 48, 3) and masks.shape == (4, 40, 48)

    for ci, cam in enumerate(cams):
        rgb_ref, mask_ref = _render_scene(cfg, cam, center, phase)
        _assert_masks_match_up_to_silhouette(masks[ci], mask_ref)
        mask_ok = masks[ci].astype(bool) == mask_ref.astype(bool)
        _assert_rgb_close_u8(rgbs[ci], rgb_ref, mask_ok)


def test_jax_renderer_groups_mixed_portrait_shapes():
    # Portrait cameras have swapped width/height; the generator groups by
    # (H, W), so each group renders with its own jitted shape. RGB parity is
    # asserted for every camera — a transposed texture or swapped focal
    # specific to the portrait (H, W) group must not pass on shapes alone.
    cfg = SyntheticSceneConfig(
        num_cameras=3, width=32, height=24, num_frames=1, portrait_camera_indices=(1,)
    )
    cams = make_cameras(cfg)
    shapes = {(c.height, c.width) for c in cams}
    assert shapes == {(24, 32), (32, 24)}
    center = _sphere_center(cfg, 0)
    for cam in cams:
        render = _render_batch_jax(cfg, cam.height, cam.width)
        rgbs, masks = render(
            cam.inverse_kr().astype(np.float32)[None],
            cam.translation.astype(np.float32)[None],
            center.astype(np.float32),
            0.0,
        )
        assert rgbs.shape == (1, cam.height, cam.width, 3)
        rgb_ref, mask_ref = _render_scene(cfg, cam, center, 0.0)
        mask = np.asarray(masks)[0]
        _assert_masks_match_up_to_silhouette(mask, mask_ref)
        mask_ok = mask.astype(bool) == mask_ref.astype(bool)
        _assert_rgb_close_u8(np.asarray(rgbs)[0], rgb_ref, mask_ok)


def test_camera_angles_override_matches_ring():
    """Explicit camera_angles (scripts/parallax_probe.py): a probe camera
    minted at a uniform-ring azimuth must be bit-identical to the ring
    camera there, and arbitrary azimuths must land where requested."""
    import math

    import numpy as np

    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, make_cameras

    ring = make_cameras(SyntheticSceneConfig(num_cameras=12))
    probe = make_cameras(
        SyntheticSceneConfig(
            num_cameras=3,
            camera_angles=(2 * math.pi * 2 / 12, math.radians(75.0), 2 * math.pi * 11 / 12),
        )
    )
    assert len(probe) == 3
    np.testing.assert_array_equal(probe[0].translation, ring[2].translation)
    np.testing.assert_array_equal(probe[0].rotation_axisangle, ring[2].rotation_axisangle)
    np.testing.assert_array_equal(probe[2].translation, ring[11].translation)
    # The off-ring azimuth lands at the requested angle/elevation.
    a = math.radians(75.0)
    expect = np.array([3.0 * math.cos(a), 3.0 * math.sin(a), 0.4 * math.sin(2 * a + 0.5)])
    np.testing.assert_allclose(probe[1].translation, expect, rtol=1e-12)
