import jax
import jax.numpy as jnp
import numpy as np

from humanrf_tpu.ops.render import (
    accumulate_along_rays,
    render_visibility,
    render_weights_from_density,
    segmented_cumsum,
)
from humanrf_tpu.ops.sampling import SampleSet, compact_flat_samples, compact_samples, generate_samples


def _naive_weights(density_by_ray, step):
    """Per-ray python-loop oracle for nerfacc.render_weight_from_density."""
    out = []
    for sigmas in density_by_ray:
        T = 1.0
        ws = []
        for s in sigmas:
            alpha = 1.0 - np.exp(-s * step)
            ws.append(T * alpha)
            T *= np.exp(-s * step)
        out.append(ws)
    return out


def test_segmented_cumsum():
    vals = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    seg = jnp.array([0, 0, 1, 1, 1, 2])
    got = np.asarray(segmented_cumsum(vals, seg))
    np.testing.assert_allclose(got, [1, 3, 3, 7, 12, 6])


def test_compact_samples_order_and_budget():
    t = jnp.array([[0.1, 0.2, 0.3], [1.1, 1.2, 1.3]])
    valid = jnp.array([[True, False, True], [True, True, True]])
    s = compact_samples(t, valid, budget=4)
    np.testing.assert_allclose(np.asarray(s.t), [0.1, 0.3, 1.1, 1.2])
    np.testing.assert_array_equal(np.asarray(s.ray), [0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(s.valid), [True] * 4)
    # Ray 1's third sample fell past the budget → not fully included.
    np.testing.assert_array_equal(np.asarray(s.ray_included), [True, False])
    assert int(s.num_valid) == 4


def test_compact_samples_empty_tail():
    t = jnp.array([[0.1, 0.2]])
    valid = jnp.array([[True, False]])
    s = compact_samples(t, valid, budget=4)
    np.testing.assert_array_equal(np.asarray(s.valid), [True, False, False, False])
    np.testing.assert_array_equal(np.asarray(s.ray), [0, 1, 1, 1])  # sentinel == num_rays
    assert bool(s.ray_included[0])


def test_render_weights_match_naive_loop():
    rng = np.random.default_rng(3)
    density_by_ray = [rng.uniform(0, 3000, size=rng.integers(1, 6)) for _ in range(4)]
    step = 4e-4

    flat_sigma, flat_ray = [], []
    for r, sigmas in enumerate(density_by_ray):
        flat_sigma += list(sigmas)
        flat_ray += [r] * len(sigmas)
    budget = 24
    n = len(flat_sigma)
    pad = budget - n
    sigma = jnp.asarray(flat_sigma + [0.0] * pad, dtype=jnp.float32)
    samples = SampleSet(
        t=jnp.zeros(budget),
        ray=jnp.asarray(flat_ray + [4] * pad, dtype=jnp.int32),
        valid=jnp.asarray([True] * n + [False] * pad),
        ray_included=jnp.ones(4, dtype=bool),
        num_valid=jnp.asarray(n),
    )
    w = np.asarray(render_weights_from_density(sigma, samples, num_rays=4, render_step_size=step))

    want = _naive_weights(density_by_ray, step)
    idx = 0
    for r, ws in enumerate(want):
        for wi in ws:
            np.testing.assert_allclose(w[idx], wi, rtol=2e-5, atol=1e-7)
            idx += 1
    np.testing.assert_allclose(w[n:], 0.0)

    # Accumulation sums weights per ray.
    wsum = np.asarray(accumulate_along_rays(jnp.asarray(w), samples.ray, num_rays=4))
    for r in range(4):
        np.testing.assert_allclose(wsum[r, 0], np.sum(want[r]), rtol=2e-5)


def test_render_visibility_semantics():
    # Ray 0: [opaque, behind-opaque] → second sample invisible (T too small).
    # Ray 1: [transparent (alpha below threshold), opaque] → first culled by alpha.
    alphas = jnp.array([0.9999999, 0.5, 1e-6, 0.5])
    samples = SampleSet(
        t=jnp.zeros(4),
        ray=jnp.array([0, 0, 1, 1], dtype=jnp.int32),
        valid=jnp.ones(4, dtype=bool),
        ray_included=jnp.ones(2, dtype=bool),
        num_valid=jnp.asarray(4),
    )
    vis = np.asarray(render_visibility(alphas, samples, num_rays=2))
    np.testing.assert_array_equal(vis, [True, False, False, True])


def test_compact_flat_samples_prune():
    samples = SampleSet(
        t=jnp.array([0.1, 0.2, 0.3, 0.4, 0.0]),
        ray=jnp.array([0, 0, 1, 1, 2], dtype=jnp.int32),
        valid=jnp.array([True, True, True, True, False]),
        ray_included=jnp.ones(2, dtype=bool),
        num_valid=jnp.asarray(4),
    )
    keep = jnp.array([True, False, True, True, False])
    out = compact_flat_samples(samples, keep, budget=3)
    np.testing.assert_allclose(np.asarray(out.t), [0.1, 0.3, 0.4])
    np.testing.assert_array_equal(np.asarray(out.ray), [0, 1, 1])
    assert int(out.num_valid) == 3
    np.testing.assert_array_equal(np.asarray(out.ray_included), [True, True])


def test_generate_samples_aabb_mode():
    origins = jnp.array([[0.0, 0.0, -2.0]])
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    tmin = jnp.array([1.5])
    tmax = jnp.array([1.508])
    step = 4e-4
    s = generate_samples(
        tmin, tmax, jnp.array([True]), origins, dirs, step_size=step, samples_per_ray=32, budget=64
    )
    # floor((1.508-1.5)/4e-4) = 20 samples
    assert int(s.num_valid) == 20
    np.testing.assert_allclose(np.asarray(s.t[:20]), 1.5 + step * np.arange(20), rtol=1e-5)
    assert bool(s.ray_included[0])
