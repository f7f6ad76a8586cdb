"""K-steps-per-dispatch chunked training step (train/pipeline.py
make_chunked_train_step): scanning K stacked host batches inside one jitted
program must be bit-identical to K raw-step dispatches with the same
fold_in(rng, i) keys. The chunking exists to amortize remote-TPU tunnel
dispatch RTT (PERF.md round 3); correctness must not depend on K."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from humanrf_tpu.train.pipeline import make_chunked_train_step, make_train_step
from tests.test_parallel import _tiny_setup

K = 4


def _stack_batches(batches):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def _make_batches(num_rays, n):
    rng = np.random.default_rng(7)
    from humanrf_tpu.train.pipeline import HostBatch

    out = []
    for _ in range(n):
        out.append(
            HostBatch(
                buffer_idx=jnp.asarray(rng.integers(0, 2, num_rays).astype(np.int32)),
                pixel_idx=jnp.asarray(rng.integers(0, 256, num_rays).astype(np.int32)),
                rgba=jnp.asarray(rng.uniform(0, 1, (num_rays, 4)).astype(np.float32)),
                ray_light_ok=jnp.ones(num_rays, dtype=bool),
            )
        )
    return out


def test_chunked_step_matches_k_raw_steps():
    model, params, cfg, pool, grids, aabb, _ = _tiny_setup()
    opt = optax.adam(1e-3)

    batches = _make_batches(cfg.num_rays, K)
    base_rng = jax.random.PRNGKey(42)

    def fresh(tree):
        # Both step fns donate (params, opt_state); give each path its own copy.
        return jax.tree_util.tree_map(jnp.array, tree)

    # Reference: K independent dispatches with the chunk's per-step keys.
    raw = make_train_step(cfg, model, opt, 16, 16)
    p_ref, o_ref = fresh(params), opt.init(fresh(params))
    losses_ref = []
    for i, b in enumerate(batches):
        p_ref, o_ref, loss, aux = raw(p_ref, o_ref, b, pool, grids, aabb, jax.random.fold_in(base_rng, i))
        losses_ref.append(float(loss))

    chunked = make_chunked_train_step(cfg, model, opt, 16, 16, K)
    p_chk, o_chk, losses, auxs = chunked(
        fresh(params), opt.init(fresh(params)), _stack_batches(batches), pool, grids, aabb, base_rng
    )

    assert losses.shape == (K,)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref), rtol=1e-6)
    assert auxs["num_rays_supervised"].shape == (K,)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_chk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_chunked_step_proposal_sampling():
    import dataclasses

    from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel

    _, _, cfg, pool, grids, aabb, _ = _tiny_setup()
    cfg = dataclasses.replace(
        cfg, sampling="proposal", proposal_samples_per_ray=8, render_samples_per_ray=4
    )
    model = HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=(0, 1),
            segment_sizes=(2,),
            log2_hashmap_size=8,
            n_levels=2,
            finest_resolution=32,
            camera_embedding_dim=2,
            proposal_rank=4,
            proposal_resolution=16,
        )
    )
    params = model.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)

    batches = _make_batches(cfg.num_rays, K)
    chunked = make_chunked_train_step(cfg, model, opt, 16, 16, K)
    p, o, losses, auxs = chunked(
        params, opt.init(params), _stack_batches(batches), pool, grids, aabb, jax.random.PRNGKey(1)
    )
    assert bool(jnp.isfinite(losses).all())
    for leaf in jax.tree_util.tree_leaves(p):
        assert bool(jnp.isfinite(leaf).all())
