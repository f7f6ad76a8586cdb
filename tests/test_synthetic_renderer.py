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
        # Masks must agree exactly: a mask flip moves supervision labels.
        np.testing.assert_array_equal(masks[ci], mask_ref)
        # Colors agree to float32-rounding + uint8 quantization (the numpy
        # path quantizes identically when written to JPEG).
        ref_u8 = np.round(rgb_ref * 255.0)
        diff = np.abs(rgbs[ci].astype(np.float64) - ref_u8)
        assert diff.max() <= 2.0, f"camera {ci}: max u8 diff {diff.max()}"


def test_jax_renderer_groups_mixed_portrait_shapes():
    # Portrait cameras have swapped width/height; the generator groups by
    # (H, W), so each group renders with its own jitted shape.
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
        np.testing.assert_array_equal(np.asarray(masks)[0], mask_ref)
