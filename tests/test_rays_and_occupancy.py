import jax.numpy as jnp
import numpy as np

from humanrf_tpu.core.camera import CameraData
from humanrf_tpu.ops.occupancy import dilate_grid, occupancy_ray_minmax, sample_occupancy
from humanrf_tpu.ops.rays import aabb_intersect, decode_pixel_indices, pixel_to_ray


def test_aabb_intersect_basic():
    aabb = jnp.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
    origins = jnp.array([[0.0, 0.0, -2.0], [2.0, 2.0, -2.0]])
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tmin, tmax = aabb_intersect(origins, dirs, aabb)
    np.testing.assert_allclose(np.asarray(tmin[0]), 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tmax[0]), 2.5, rtol=1e-6)
    assert float(tmin[1]) >= float(tmax[1])  # miss


def test_pixel_ray_hits_projected_point(rng):
    """A ray through the projection of a world point must pass near that point."""
    from scipy.spatial.transform import Rotation

    from humanrf_tpu.core.synthetic import _look_at_cam2world

    eye = np.array([0.5, -2.0, 0.3])
    point = np.array([0.1, 0.4, 0.2])
    cam = CameraData(
        name="c",
        width=100,
        height=80,
        rotation_axisangle=Rotation.from_matrix(_look_at_cam2world(eye, point)).as_rotvec(),
        translation=eye,
        focal_length=np.array([1.1, 1.4]),
        principal_point=np.array([0.52, 0.48]),
    )
    proj = cam.projection_matrix_world2pixel() @ np.array([*point, 1.0])
    assert proj[2] > 0  # in front of the camera
    px, py = proj[0] / proj[2], proj[1] / proj[2]

    origins, dirs = pixel_to_ray(
        jnp.asarray(cam.inverse_kr()[None]),
        jnp.asarray(cam.translation[None]),
        jnp.zeros((1,), dtype=jnp.int32),
        jnp.asarray([px]),
        jnp.asarray([py]),
    )
    o, d = np.asarray(origins[0]), np.asarray(dirs[0])
    # Distance from `point` to the ray line.
    to_p = point - o
    dist = np.linalg.norm(to_p - (to_p @ d) * d)
    assert dist < 1e-4
    assert (to_p @ d) > 0  # in front of the camera


def test_decode_pixel_indices_portrait_swap():
    landscape = jnp.array([True, False])
    # Image 0 (landscape 4x2), image 1 (portrait 2x4): flat pixel 5 of each.
    idx = jnp.array([5, 8 + 5])
    img, px, py = decode_pixel_indices(idx, landscape, width=4, height=2)
    np.testing.assert_array_equal(np.asarray(img), [0, 1])
    np.testing.assert_allclose(np.asarray(px), [1.5, 1.5])  # 5 % 4, 5 % 2 → 1
    np.testing.assert_allclose(np.asarray(py), [1.5, 2.5])  # 5 // 4, 5 // 2


def test_dilate_grid_matches_trilinear_positive():
    rng = np.random.default_rng(1)
    res = 8
    grid = (rng.uniform(size=(res, res, res)) < 0.2).astype(np.uint8) * 255
    dil = np.asarray(dilate_grid(jnp.asarray(grid)))

    # Oracle: trilinear > 0 at p ⟺ any of the 8 clamped corner voxels occupied.
    pts = rng.uniform(0, 1, size=(200, 3))
    want = []
    for p in pts:
        c0 = np.clip(np.floor(p * res - 0.5).astype(int), 0, res - 1)
        c1 = np.clip(c0 + 1, 0, res - 1)
        # grids are stored [z][y][x] (reference convention)
        want.append(
            any(grid[k, j, i] > 0 for i in (c0[0], c1[0]) for j in (c0[1], c1[1]) for k in (c0[2], c1[2]))
        )
    got = np.asarray(
        sample_occupancy(jnp.asarray(dil[None]), jnp.zeros((len(pts),), jnp.int32), jnp.asarray(pts))
    )
    np.testing.assert_array_equal(got, np.asarray(want))


def test_occupancy_ray_minmax_finds_slab():
    """Occupied slab z ∈ [0.25, 0.5] (canonical coords z∈[-0.25, 0.0]);
    a +z ray must march to enter/exit near the slab boundaries."""
    res = 32
    grid = np.zeros((res, res, res), dtype=np.uint8)
    grid[res // 4 : res // 2, :, :] = 255  # z-slab ([z][y][x] storage)
    dil = dilate_grid(jnp.asarray(grid))[None]

    origins = jnp.array([[0.0, 0.0, -2.0]])
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    tmin_aabb = jnp.array([1.5])  # enters cube at z=-0.5
    tmax_aabb = jnp.array([2.5])
    tmin, tmax = occupancy_ray_minmax(origins, dirs, tmin_aabb, tmax_aabb, dil, jnp.zeros((1,), jnp.int32))
    # Slab starts at z=-0.25 (t=1.75) and ends at z=0.0 (t=2.0).
    voxel = 1.0 / res
    assert abs(float(tmin[0]) - 1.75) < 2 * voxel
    assert abs(float(tmax[0]) - 2.0) < 2 * voxel
    assert float(tmin[0]) < float(tmax[0])


def test_occupancy_ray_minmax_miss():
    res = 16
    grid = np.zeros((res, res, res), dtype=np.uint8)
    dil = dilate_grid(jnp.asarray(grid))[None]
    origins = jnp.array([[0.0, 0.0, -2.0]])
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    tmin, tmax = occupancy_ray_minmax(
        origins, dirs, jnp.array([1.5]), jnp.array([2.5]), dil, jnp.zeros((1,), jnp.int32)
    )
    assert float(tmin[0]) >= float(tmax[0])
