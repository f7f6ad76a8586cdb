import numpy as np

from humanrf_tpu import native


def test_gather_matches_numpy(rng):
    pool = rng.integers(0, 256, (4, 100, 4)).astype(np.uint8)
    light = rng.uniform(size=(4, 100)) > 0.5
    bidx = rng.integers(0, 4, 64).astype(np.int32)
    pidx = rng.integers(0, 100, 64).astype(np.int32)

    rgba, got_light = native.gather(pool, light, bidx, pidx)
    np.testing.assert_allclose(rgba, pool[bidx, pidx].astype(np.float32) / 255.0, rtol=1e-6)
    np.testing.assert_array_equal(got_light, light[bidx, pidx])

    rgba2, light2 = native.gather(pool, None, bidx, pidx)
    np.testing.assert_allclose(rgba2, rgba)
    assert light2.all()


def test_native_lib_builds():
    """The C extension should actually build in this environment (g++ exists);
    fall back silently only where no compiler is available."""
    import shutil

    if shutil.which("cc") or shutil.which("gcc"):
        assert native._load() is not None
