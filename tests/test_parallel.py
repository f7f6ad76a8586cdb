"""Multi-device DP tests on the 8-device virtual CPU mesh (SURVEY.md §4.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from humanrf_tpu.models.humanrf import HumanRFConfig, HumanRFModel
from humanrf_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_pipeline_config
from humanrf_tpu.train.pipeline import HostBatch, PipelineConfig, PoolArrays, make_train_step


def _tiny_setup(num_rays=64, budget=16384):
    # Budgets are deliberately non-binding (64 rays × 64 samples/ray = 4096 max
    # candidates << budget) so single-device and 8-shard runs see identical
    # sample sets; when budgets bind, per-shard truncation legitimately differs
    # from global truncation.
    model = HumanRFModel(
        HumanRFConfig(
            sorted_frame_numbers=(0, 1),
            segment_sizes=(2,),
            log2_hashmap_size=8,
            n_levels=2,
            finest_resolution=32,
            camera_embedding_dim=2,
        )
    )
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = PipelineConfig(
        num_rays=num_rays,
        samples_per_ray=64,
        candidate_budget=budget,
        sample_budget=budget // 2,
        space_pruning="aabb",
        use_visibility_prune=False,
    )
    # Two pool entries looking at the origin from +x / -x.
    def look_at_inv_kr(sign):
        # Simple orthonormal camera: forward along -sign*x.
        from humanrf_tpu.core.camera import CameraData
        from humanrf_tpu.core.synthetic import _look_at_cam2world
        from scipy.spatial.transform import Rotation

        eye = np.array([2.0 * sign, 0.1, 0.1])
        cam = CameraData(
            name="c",
            width=16,
            height=16,
            rotation_axisangle=Rotation.from_matrix(_look_at_cam2world(eye, np.zeros(3))).as_rotvec(),
            translation=eye,
            focal_length=np.array([1.0, 1.0]),
            principal_point=np.array([0.5, 0.5]),
        )
        return cam.inverse_kr().astype(np.float32), eye.astype(np.float32)

    kr0, o0 = look_at_inv_kr(1)
    kr1, o1 = look_at_inv_kr(-1)
    pool = PoolArrays(
        inverse_krs=jnp.asarray(np.stack([kr0, kr1])),
        camera_origins=jnp.asarray(np.stack([o0, o1])),
        landscape=jnp.ones(2, dtype=bool),
        frame_numbers=jnp.asarray([0, 1], dtype=jnp.int32),
        camera_numbers=jnp.asarray([0, 1], dtype=jnp.int32),
        grid_slots=jnp.zeros(2, dtype=jnp.int32),
    )
    grids = jnp.ones((1, 4, 4, 4), dtype=bool)
    aabb = jnp.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], dtype=jnp.float32)

    rng = np.random.default_rng(0)
    batch = HostBatch(
        buffer_idx=jnp.asarray(rng.integers(0, 2, num_rays).astype(np.int32)),
        pixel_idx=jnp.asarray(rng.integers(0, 256, num_rays).astype(np.int32)),
        rgba=jnp.asarray(rng.uniform(0, 1, (num_rays, 4)).astype(np.float32)),
        ray_light_ok=jnp.ones(num_rays, dtype=bool),
    )
    return model, params, cfg, pool, grids, aabb, batch


def test_sharded_step_runs_on_8_devices():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"
    model, params, cfg, pool, grids, aabb, batch = _tiny_setup()
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_sharded_train_step(cfg, model, opt, 16, 16, mesh)
    params2, opt_state2, loss, aux = step(params, opt_state, batch, pool, grids, aabb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(aux["num_rays_supervised"]) > 0
    for leaf in jax.tree_util.tree_leaves(params2):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.parametrize("use_prune", [False, True, "proposal"])
def test_sharded_matches_single_device_grads(use_prune):
    """DP over 8 shards must produce the same loss AND the same post-SGD-step
    parameters as the single-device step on the same batch: noise is keyed by
    global ray identity (utils/rngs.py), loss normalization is psum'd, and the
    psum'd gradients must therefore equal the global gradient. A broken psum
    (or shard-dependent noise) turns this red."""
    import dataclasses

    model, params, cfg, pool, grids, aabb, batch = _tiny_setup()
    if use_prune == "proposal":
        from humanrf_tpu.models.humanrf import HumanRFModel

        model = HumanRFModel(dataclasses.replace(model.config, proposal_rank=8, proposal_resolution=32))
        params = model.init_params(jax.random.PRNGKey(0))
        cfg = dataclasses.replace(
            cfg, sampling="proposal", proposal_samples_per_ray=32, render_samples_per_ray=16
        )
    elif use_prune:
        cfg = dataclasses.replace(cfg, use_visibility_prune=True)
    opt = optax.sgd(1e-2)  # no adam-eps nonlinearity → clean comparison

    single = make_train_step(cfg, model, opt, 16, 16)
    p1, _, loss1, aux1 = single(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, pool, grids, aabb, jax.random.PRNGKey(0)
    )

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(cfg, model, opt, 16, 16, mesh)
    p8, _, loss8, aux8 = sharded(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params), batch, pool, grids, aabb, jax.random.PRNGKey(0)
    )

    assert int(aux1["num_samples"]) == int(aux8["num_samples"])
    assert int(aux1["num_rays_supervised"]) == int(aux8["num_rays_supervised"])
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(p8))
    assert len(flat1) == len(flat8)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(params))
    # fp reassociation across different gradient-sum groupings gives noise
    # proportional to the update magnitude. On top of that, a sample sitting
    # exactly on a voxel boundary can flip its floor() under the different
    # fusion of the sharded program: the forward value is continuous there
    # (the flipping corner has ~zero interpolation weight — the loss above
    # still matches to 1e-5) but the GRADIENT relocates to the neighboring
    # hash entries, perturbing a handful of grid-table elements at the
    # update scale. A broken psum or shard-keyed noise instead perturbs
    # essentially every touched entry of every leaf — in particular the
    # dense MLP leaves, where every element gets gradient from every sample.
    # So: MLP/vector-free dense leaves (ndim ≤ 2) must match element-wise;
    # grid-table leaves (ndim ≥ 3) get a small boundary-flip budget.
    for path, leaf1 in flat1:
        leaf8 = np.asarray(flat8[path])
        leaf1 = np.asarray(leaf1)
        update_scale = float(np.abs(leaf1 - np.asarray(flat0[path])).max())
        atol = 3e-5 + 2e-2 * update_scale
        bad = np.abs(leaf1 - leaf8) > (atol + 1e-3 * np.abs(leaf8))
        budget = max(8, leaf1.size // 20) if leaf1.ndim >= 3 else 0
        assert int(bad.sum()) <= budget, (
            f"params diverge at {jax.tree_util.keystr(path)}: "
            f"{int(bad.sum())}/{leaf1.size} elements beyond tolerance (budget {budget})"
        )


def test_make_mesh_raises_on_underprovision():
    """A job configured for more devices than the backend has must fail loudly,
    never silently fall back to host CPUs (VERDICT weak #7)."""
    with pytest.raises(RuntimeError, match="refusing to under-provision"):
        make_mesh(jax.device_count() + 1)
    # Explicit fallback keeps working for hermetic dryruns.
    mesh = make_mesh(8, allow_cpu_fallback=True)
    assert mesh.devices.size == 8


def test_shard_pipeline_config_divides():
    cfg = PipelineConfig(num_rays=64, candidate_budget=2048, sample_budget=1024)
    s = shard_pipeline_config(cfg, 8)
    assert s.num_rays == 8 and s.candidate_budget == 256 and s.sample_budget == 128
    with pytest.raises(AssertionError):
        shard_pipeline_config(PipelineConfig(num_rays=65), 8)


def test_chunked_dp_matches_sequential_dp_steps():
    """K-steps-per-dispatch composed with DP (the lax.scan moved inside the
    shard_map) must match K sequential dispatches of the k=1 sharded step with
    fold_in(rng, i) keys, per leaf, to fp-reassociation tolerance — the same
    contract (and tolerance) the single-device chunked path pins in
    tests/test_chunked_step.py."""
    model, params, cfg, pool, grids, aabb, _ = _tiny_setup()
    mesh = make_mesh(8)
    opt = optax.adam(1e-3)
    K, num_rays = 3, cfg.num_rays

    rng_host = np.random.default_rng(7)
    def one_batch():
        return HostBatch(
            buffer_idx=jnp.asarray(rng_host.integers(0, 2, num_rays).astype(np.int32)),
            pixel_idx=jnp.asarray(rng_host.integers(0, 256, num_rays).astype(np.int32)),
            rgba=jnp.asarray(rng_host.uniform(0, 1, (num_rays, 4)).astype(np.float32)),
            ray_light_ok=jnp.ones(num_rays, dtype=bool),
        )
    batches = [one_batch() for _ in range(K)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    key = jax.random.PRNGKey(3)

    seq_step = make_sharded_train_step(cfg, model, opt, 16, 16, mesh)
    p_seq = jax.tree_util.tree_map(jnp.copy, params)
    o_seq = opt.init(params)
    seq_losses = []
    for i in range(K):
        p_seq, o_seq, loss, _ = seq_step(
            p_seq, o_seq, batches[i], pool, grids, aabb, jax.random.fold_in(key, i)
        )
        seq_losses.append(float(loss))

    chunk_step = make_sharded_train_step(cfg, model, opt, 16, 16, mesh, k=K)
    p_chunk, o_chunk, losses, auxs = chunk_step(
        jax.tree_util.tree_map(jnp.copy, params), opt.init(params),
        stacked, pool, grids, aabb, key,
    )
    assert losses.shape == (K,)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq_losses), rtol=1e-6)
    assert auxs["num_rays_supervised"].shape == (K,)

    flat_seq = jax.tree_util.tree_leaves_with_path(p_seq)
    flat_chunk = dict(jax.tree_util.tree_leaves_with_path(p_chunk))
    for path, leaf in flat_seq:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_chunk[path]), rtol=1e-6, atol=1e-7,
            err_msg=f"chunked-DP diverges from sequential DP at {jax.tree_util.keystr(path)}",
        )
