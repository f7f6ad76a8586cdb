"""Ray generation + AABB intersection as XLA ops.

Replaces the pixel→ray and slab-test part of the reference's CUDA ray sampler
(`/root/reference/actorshq/dataset/native/ray_sampler.cu:11-26,96-147`): flat pixel
indices over an image pool are decoded to (image, x, y), rays are built from
per-image inverse-KR matrices, and intersected with the scene AABB.
"""
from __future__ import annotations

import jax.numpy as jnp


def decode_pixel_indices(pixel_indices, landscape_modes, width: int, height: int):
    """pixel_indices: (R,) flat indices into (pool_size * W * H).

    Returns (image_number (R,), pixel_x (R,), pixel_y (R,)) with the +0.5
    pixel-center offset. `width`/`height` are the landscape resolution; portrait
    images swap them (ray_sampler.cu:104-114).
    """
    num_pixels = width * height
    image_number = pixel_indices // num_pixels
    local = pixel_indices % num_pixels

    is_landscape = jnp.take(landscape_modes, image_number)
    w = jnp.where(is_landscape, width, height)
    h = jnp.where(is_landscape, height, width)

    pixel_x = (local % w).astype(jnp.float32) + 0.5
    pixel_y = ((local // w) % h).astype(jnp.float32) + 0.5
    return image_number, pixel_x, pixel_y


def pixel_to_ray(inverse_krs, camera_origins, image_number, pixel_x, pixel_y):
    """→ (origins (R,3), normalized directions (R,3)).

    dir = normalize(inv(KR) @ (x, y, 1)) — ray_sampler.cu:116-119.
    """
    inv_kr = jnp.take(inverse_krs, image_number, axis=0)  # (R, 3, 3)
    pix = jnp.stack([pixel_x, pixel_y, jnp.ones_like(pixel_x)], axis=-1)  # (R, 3)
    dirs = jnp.einsum("rij,rj->ri", inv_kr, pix)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.take(camera_origins, image_number, axis=0)
    return origins, dirs


def aabb_intersect(origins, dirs, aabb):
    """Slab test (ray_sampler.cu:11-26). aabb: (2, 3). → (tmin (R,), tmax (R,)).

    A ray misses iff tmin >= tmax (the reference's ray_mask, ray_sampler.cu:146).
    """
    inv_d = 1.0 / dirs
    t0 = (aabb[0][None] - origins) * inv_d
    t1 = (aabb[1][None] - origins) * inv_d
    tmin = jnp.minimum(t0, t1).max(-1)
    tmax = jnp.maximum(t0, t1).min(-1)
    return tmin, tmax
