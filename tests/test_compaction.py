"""Candidate-ray compaction (train/pipeline.py:compact_rays) — the
static-shape analog of the reference's ray-mask compaction
(`ray_sampler.cu:258-260`): the host ships factor × R candidate pixels, the
step compacts hull-hitting rays into the R render slots."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from humanrf_tpu.models.humanrf import HumanRFModel
from humanrf_tpu.parallel.mesh import make_mesh, make_sharded_train_step
from humanrf_tpu.train.pipeline import (
    HostBatch,
    RayData,
    build_rays,
    compact_rays,
    make_train_step,
    training_loss,
)

from test_parallel import _tiny_setup


def test_compact_rays_orders_valid_first_and_keeps_fields_aligned():
    C, R = 16, 8
    valid = np.zeros(C, dtype=bool)
    valid[[1, 3, 4, 7, 9, 14]] = True
    rays = RayData(
        origins=jnp.arange(C * 3, dtype=jnp.float32).reshape(C, 3),
        directions=jnp.ones((C, 3)),
        tmin=jnp.arange(C, dtype=jnp.float32),
        tmax=jnp.arange(C, dtype=jnp.float32) + 1,
        valid=jnp.asarray(valid),
        frame_numbers=jnp.arange(C, dtype=jnp.int32),
        camera_numbers=jnp.arange(C, dtype=jnp.int32) * 2,
    )
    batch = HostBatch(
        buffer_idx=jnp.arange(C, dtype=jnp.int32),
        pixel_idx=jnp.arange(C, dtype=jnp.int32) * 3,
        rgba=jnp.arange(C * 4, dtype=jnp.float32).reshape(C, 4),
        ray_light_ok=jnp.asarray(valid),
    )
    ids = jnp.arange(C, dtype=jnp.int32) + 100

    rays2, batch2, ids2 = compact_rays(rays, batch, ids, R)

    # Valid candidates first in original order, then invalid ones (stable).
    expect = np.array([1, 3, 4, 7, 9, 14, 0, 2])
    np.testing.assert_array_equal(np.asarray(rays2.frame_numbers), expect)
    np.testing.assert_array_equal(np.asarray(rays2.camera_numbers), expect * 2)
    np.testing.assert_array_equal(np.asarray(ids2), expect + 100)
    np.testing.assert_array_equal(np.asarray(batch2.pixel_idx), expect * 3)
    np.testing.assert_array_equal(
        np.asarray(batch2.rgba), np.arange(C * 4, dtype=np.float32).reshape(C, 4)[expect]
    )
    assert np.asarray(rays2.valid)[:6].all()
    assert not np.asarray(rays2.valid)[6:].any()


def _proposal_cfg(cfg, model):
    model = HumanRFModel(dataclasses.replace(model.config, proposal_rank=8, proposal_resolution=32))
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = dataclasses.replace(
        cfg, sampling="proposal", proposal_samples_per_ray=16, render_samples_per_ray=8
    )
    return model, params, cfg


def test_pipeline_compaction_matches_manual_oracle():
    """The factor-2 step's loss equals `training_loss` on a numpy-compacted
    batch carrying the original candidate identities — compaction changes
    WHERE a ray sits, never its noise or its loss contribution."""
    model, params, cfg, pool, grids, aabb, batch = _tiny_setup(num_rays=64)
    model, params, cfg = _proposal_cfg(cfg, model)
    cfg = dataclasses.replace(cfg, num_rays=32, candidate_rays_factor=2)
    rng = jax.random.PRNGKey(7)

    rays = build_rays(cfg, batch, pool, grids, aabb, 16, 16)
    raysA, batchA, idsA = compact_rays(rays, batch, jnp.arange(64, dtype=jnp.int32), 32)
    lossA, auxA = training_loss(
        cfg, model, params, raysA, None, batchA.rgba, rng, ray_ids=idsA,
        pool=pool, grids=grids, buffer_idx=batchA.buffer_idx,
    )

    valid = np.asarray(rays.valid)
    order = np.concatenate([np.nonzero(valid)[0], np.nonzero(~valid)[0]])[:32]
    take = lambda x: jnp.asarray(np.asarray(x)[order])
    raysB = RayData(*(take(f) for f in rays))
    batchB = HostBatch(*(take(f) for f in batch))
    lossB, auxB = training_loss(
        cfg, model, params, raysB, None, batchB.rgba, rng,
        ray_ids=jnp.asarray(order.astype(np.int32)),
        pool=pool, grids=grids, buffer_idx=batchB.buffer_idx,
    )
    np.testing.assert_allclose(float(lossA), float(lossB), rtol=1e-6)
    assert int(auxA["num_rays_supervised"]) == int(auxB["num_rays_supervised"]) == min(int(valid.sum()), 32)


def test_loss_independent_of_dropped_candidates():
    """Perturbing the rgba of candidates that compaction drops must not change
    the loss (they contribute nothing — the whole point of compaction)."""
    model, params, cfg, pool, grids, aabb, batch = _tiny_setup(num_rays=64)
    model, params, cfg = _proposal_cfg(cfg, model)
    num_valid = int(np.asarray(build_rays(cfg, batch, pool, grids, aabb, 16, 16).valid).sum())
    R = 16
    assert num_valid >= R, "setup must oversubscribe the render slots"
    cfg = dataclasses.replace(cfg, num_rays=R, candidate_rays_factor=4)
    opt = optax.sgd(1e-2)
    step = make_train_step(cfg, model, opt, 16, 16)

    _, _, loss1, aux1 = step(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, pool, grids, aabb, jax.random.PRNGKey(3)
    )
    assert int(aux1["num_rays_supervised"]) == R

    # Identify the dropped candidates and scramble their ground truth.
    rays = build_rays(cfg, batch, pool, grids, aabb, 16, 16)
    order = np.asarray(jnp.argsort(jnp.where(rays.valid, 0, 1).astype(jnp.int32), stable=True))
    dropped = order[R:]
    rgba = np.asarray(batch.rgba).copy()
    rgba[dropped] = 0.123
    batch2 = batch._replace(rgba=jnp.asarray(rgba))
    _, _, loss2, _ = step(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch2, pool, grids, aabb, jax.random.PRNGKey(3)
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_sharded_step_with_compaction():
    """factor=2 under the 8-device mesh: each shard compacts its own candidate
    block; supervised count equals the per-shard sum of min(R/8, valid)."""
    model, params, cfg, pool, grids, aabb, batch = _tiny_setup(num_rays=128)
    model, params, cfg = _proposal_cfg(cfg, model)
    # Kf=16 keeps per-shard sample counts a multiple of the 128-lane layout.
    cfg = dataclasses.replace(
        cfg, num_rays=64, candidate_rays_factor=2, render_samples_per_ray=16
    )
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)
    step = make_sharded_train_step(cfg, model, opt, 16, 16, mesh)
    params2, _, loss, aux = step(params, opt.init(params), batch, pool, grids, aabb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    valid = np.asarray(build_rays(cfg, batch, pool, grids, aabb, 16, 16).valid)
    per_shard = valid.reshape(8, 16).sum(axis=1)  # 16 candidates → 8 slots each
    assert int(aux["num_rays_supervised"]) == int(np.minimum(per_shard, 8).sum())
    for leaf in jax.tree_util.tree_leaves(params2):
        assert bool(jnp.isfinite(leaf).all())
