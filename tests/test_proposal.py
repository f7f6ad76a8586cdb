"""Proposal (importance-sampling) pipeline: resampling oracles, grid-layout
rendering vs the flat path, and end-to-end convergence."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from humanrf_tpu.models.humanrf import HumanRFModel
from humanrf_tpu.ops.render import (
    render_weights_from_density,
    render_weights_grid,
)
from humanrf_tpu.ops.resample import (
    histogram_outer_mass,
    sample_intervals,
    stratified_bins,
    weights_to_cdf,
)
from humanrf_tpu.ops.sampling import SampleSet
from humanrf_tpu.train.pipeline import make_render_fn, make_train_step

from test_parallel import _tiny_setup


def _numpy_inverse_cdf(edges, cdf, pos):
    """Loopy piecewise-linear CDF inversion oracle."""
    out = np.zeros_like(pos)
    for r in range(pos.shape[0]):
        for j, p in enumerate(pos[r]):
            k = np.searchsorted(cdf[r], p, side="right") - 1
            k = min(max(k, 0), len(edges[r]) - 2)
            c0, c1 = cdf[r][k], cdf[r][k + 1]
            frac = (p - c0) / max(c1 - c0, 1e-12)
            out[r, j] = edges[r][k] + frac * (edges[r][k + 1] - edges[r][k])
    return out


def test_sample_intervals_matches_numpy_oracle(rng):
    num_rays, k_coarse, k_fine = 4, 8, 16
    edges = np.sort(rng.uniform(0, 1, (num_rays, k_coarse + 1)), axis=1)
    weights = rng.uniform(0, 1, (num_rays, k_coarse)).astype(np.float32)
    cdf = np.asarray(weights_to_cdf(jnp.asarray(weights)))
    u = rng.uniform(0, 1, (num_rays, k_fine + 1)).astype(np.float32)

    t_mid, dt = sample_intervals(jnp.asarray(edges, jnp.float32), jnp.asarray(cdf), k_fine, jnp.asarray(u))

    j = np.arange(k_fine + 1)[None, :]
    pos = np.clip((j + u - 0.5) / k_fine, 1e-6, 1 - 1e-6)
    t_edges = _numpy_inverse_cdf(edges, cdf, pos)
    np.testing.assert_allclose(np.asarray(t_mid), 0.5 * (t_edges[:, 1:] + t_edges[:, :-1]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dt), np.diff(t_edges, axis=1), rtol=1e-4, atol=1e-5)
    # Intervals tile [tmin, tmax]-ish: non-negative, within the coarse range.
    assert (np.asarray(dt) >= 0).all()
    assert (np.asarray(t_mid) >= edges[:, :1] - 1e-5).all()
    assert (np.asarray(t_mid) <= edges[:, -1:] + 1e-5).all()


def test_sample_intervals_concentrates_on_heavy_bins():
    """All mass in one coarse bin → (almost) all fine intervals inside it."""
    edges = jnp.asarray(np.linspace(0, 1, 9)[None].repeat(2, 0), jnp.float32)
    w = np.zeros((2, 8), np.float32)
    w[0, 3] = 1.0  # ray 0: bin [0.375, 0.5)
    w[1, 7] = 1.0  # ray 1: bin [0.875, 1.0)
    cdf = weights_to_cdf(jnp.asarray(w), uniform_bonus=1e-4)
    t_mid, _ = sample_intervals(edges, cdf, 16, None)
    t = np.asarray(t_mid)
    # The two outermost interval midpoints straddle the bin by construction
    # (edge variates at ~0 and ~1), so expect ≥ 14/16 inside.
    assert (np.abs(t[0] - 0.4375) < 0.08).mean() >= 14 / 16
    assert (np.abs(t[1] - 0.9375) < 0.08).mean() >= 14 / 16


def test_render_weights_grid_matches_flat_path(rng):
    """The (R, K) cumsum renderer must agree with the flat segmented-scan
    renderer on the same samples (uniform dt)."""
    num_rays, k = 6, 32
    dt_val = 4e-4
    density = rng.uniform(0, 3000, (num_rays, k)).astype(np.float32)

    w_grid = render_weights_grid(jnp.asarray(density), jnp.full((num_rays, k), dt_val), None)

    flat = SampleSet(
        t=jnp.zeros(num_rays * k),
        ray=jnp.repeat(jnp.arange(num_rays, dtype=jnp.int32), k),
        valid=jnp.ones(num_rays * k, dtype=bool),
        ray_included=jnp.ones(num_rays, dtype=bool),
        num_valid=jnp.asarray(num_rays * k),
    )
    w_flat = render_weights_from_density(jnp.asarray(density).reshape(-1), flat, num_rays, dt_val)
    np.testing.assert_allclose(np.asarray(w_grid).reshape(-1), np.asarray(w_flat), rtol=2e-5, atol=1e-7)


def test_histogram_outer_mass_cases():
    edges = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    weights = jnp.asarray([[0.2, 0.5, 0.3]])
    t0 = jnp.asarray([[0.0, 1.0, 0.5, 2.5, 3.5]])
    t1 = jnp.asarray([[3.0, 2.0, 1.5, 3.5, 4.0]])
    mass = np.asarray(histogram_outer_mass(edges, weights, t0, t1))[0]
    np.testing.assert_allclose(mass, [1.0, 0.5, 0.35, 0.15, 0.0], rtol=1e-5, atol=1e-6)


def _proposal_setup(num_rays=64):
    model, params, cfg, pool, grids, aabb, batch = _tiny_setup(num_rays=num_rays)
    model = HumanRFModel(dataclasses.replace(model.config, proposal_rank=8, proposal_resolution=32))
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = dataclasses.replace(
        cfg, sampling="proposal", proposal_samples_per_ray=32, render_samples_per_ray=16,
        space_pruning="aabb",
        # The default exploration floor (5e-2) trades early-convergence speed
        # for long-horizon stability (PERF.md round-2b); these short-horizon
        # mechanics tests pin the low floor so convergence thresholds are
        # about the sampler, not the stabilizer.
        proposal_uniform_bonus=1e-2,
    )
    return model, params, cfg, pool, grids, aabb, batch


def test_proposal_mode_trains_and_renders():
    model, params, cfg, pool, grids, aabb, batch = _proposal_setup()
    opt = optax.adam(1e-2)
    step = make_train_step(cfg, model, opt, 16, 16)
    opt_state = opt.init(params)

    history = []
    # 240 steps: the reference-parity BCE gradient (1/(p+1e-10), huge on
    # empty rays early) spends the first ~120 steps building density fog
    # before the photometric loss carves it — measured mse 0.059 → 0.015 and
    # proposal loss 0.86 → 0.035 by step 240.
    for i in range(240):
        params, opt_state, loss, aux = step(params, opt_state, batch, pool, grids, aabb, jax.random.PRNGKey(i))
        history.append((float(aux["mse"]), float(aux["proposal_loss"])))
    assert np.isfinite(history[-1]).all()
    # Both the photometric fit and the distillation improve substantially.
    assert np.mean([m for m, _ in history[-10:]]) < 0.5 * history[0][0]
    assert np.mean([p for _, p in history[-10:]]) < 0.3 * history[0][1]
    # Every valid (AABB-hitting, light-ok) ray is supervised — no budget
    # truncation in proposal mode.
    from humanrf_tpu.train.pipeline import build_rays

    rays = build_rays(cfg, batch, pool, grids, aabb, 16, 16)
    assert int(aux["num_rays_supervised"]) == int(np.asarray(rays.valid).sum()) > 0

    out, valid = make_render_fn(cfg, model, 16, 16)(params, batch, pool, grids, aabb, 0.0)
    assert np.isfinite(np.asarray(out.color)).all()
    assert np.asarray(out.weights_sum).max() <= 1.0 + 1e-5


def test_two_level_proposal_cascade_trains_and_renders():
    """proposal_mid_samples_per_ray > 0 inserts a second (cheap) proposal
    level; training must converge with few render samples (Kf=8) and the
    rendered output must stay a valid compositing result."""
    model, params, cfg, pool, grids, aabb, batch = _proposal_setup()
    cfg = dataclasses.replace(cfg, proposal_mid_samples_per_ray=16, render_samples_per_ray=8)
    opt = optax.adam(1e-2)
    step = make_train_step(cfg, model, opt, 16, 16)
    opt_state = opt.init(params)

    history = []
    for i in range(240):  # same horizon/rationale as the single-level test
        params, opt_state, loss, aux = step(params, opt_state, batch, pool, grids, aabb, jax.random.PRNGKey(i))
        history.append(float(aux["mse"]))
    assert np.isfinite(history[-1])
    assert np.mean(history[-10:]) < 0.5 * history[0]

    out, valid = make_render_fn(cfg, model, 16, 16)(params, batch, pool, grids, aabb, 0.0)
    assert np.isfinite(np.asarray(out.color)).all()
    assert np.asarray(out.weights_sum).max() <= 1.0 + 1e-5


def test_sample_intervals_edges_are_contiguous(rng):
    """return_edges: midpoints/dt derive from the returned edges, and the
    edges tile the range monotonically (the lattice a second level refines)."""
    edges = np.sort(rng.uniform(0, 1, (3, 9)), axis=1).astype(np.float32)
    w = rng.uniform(0, 1, (3, 8)).astype(np.float32)
    cdf = weights_to_cdf(jnp.asarray(w))
    u = rng.uniform(0, 1, (3, 13)).astype(np.float32)
    t_mid, dt, t_edges = sample_intervals(jnp.asarray(edges), cdf, 12, jnp.asarray(u), return_edges=True)
    e = np.asarray(t_edges)
    assert (np.diff(e, axis=1) >= 0).all()
    np.testing.assert_allclose(np.asarray(t_mid), 0.5 * (e[:, 1:] + e[:, :-1]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dt), np.diff(e, axis=1), rtol=1e-5, atol=1e-6)


def test_proposal_mode_with_occupancy_pruning():
    """space_pruning='occupancy' + proposal_use_occupancy masks coarse bins."""
    model, params, cfg, pool, grids, aabb, batch = _proposal_setup()
    cfg = dataclasses.replace(cfg, space_pruning="occupancy")
    opt = optax.adam(1e-2)
    step = make_train_step(cfg, model, opt, 16, 16)
    params2, _, loss, aux = step(params, opt.init(params), batch, pool, grids, aabb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(params2):
        assert bool(jnp.isfinite(leaf).all())
