import numpy as np
import optax
import pytest

from humanrf_tpu.train.partitioning import (
    PREDEFINED_SEGMENT_SIZES,
    compute_adaptive_segment_sizes,
    get_final_segment_size,
    get_segment_size,
)


class _FakeDataset:
    """Dataset stub exposing only get_occupancy_grid."""

    def __init__(self, grids):
        self.grids = grids

    def get_occupancy_grid(self, frame_number):
        return self.grids[frame_number]


def _grid_with_occupancy(n_voxels, res=8):
    g = np.zeros((res, res, res), dtype=np.uint8)
    g.reshape(-1)[:n_voxels] = 255
    return g


def test_segment_size_ladder():
    assert get_segment_size(6) == 6
    assert get_segment_size(11) == 6
    assert get_segment_size(12) == 12
    assert get_segment_size(30) == 25
    assert get_segment_size(100) == 100
    assert get_segment_size(250) == 100
    assert get_final_segment_size(3) == 6
    assert get_final_segment_size(26) == 50


def test_static_scene_single_segment():
    # Identical grids → expansion factor 1.0 forever → one max-size segment
    # per 100 frames.
    grids = {i: _grid_with_occupancy(50) for i in range(12)}
    sizes = compute_adaptive_segment_sizes(_FakeDataset(grids), list(range(12)), 1.25)
    assert sizes == [12]
    assert sum(sizes) >= 12


def test_expanding_scene_splits():
    # Occupancy doubles at frame 6 (expansion 2.0 > 1.25 once min size reached)
    grids = {}
    for i in range(12):
        grids[i] = _grid_with_occupancy(50 if i < 6 else 100)
    sizes = compute_adaptive_segment_sizes(_FakeDataset(grids), list(range(12)), 1.25)
    assert sizes[0] == 6
    assert sum(sizes) >= 12
    for s in sizes:
        assert s in PREDEFINED_SEGMENT_SIZES


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from humanrf_tpu.train.checkpoint import load_checkpoint, resolve_checkpoint, save_checkpoint

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "nested": {"b": jnp.ones(4)}}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    stats = {"lpips_vals": [0.5], "best_lpips": 0.5, "checkpoints": []}

    path = tmp_path / "step_00000010.ckpt"
    save_checkpoint(path, params, opt_state, step=10, val_step=1, stats=stats)

    p2, o2, step, val_step, stats2 = load_checkpoint(path, params, opt_state)
    assert step == 10 and val_step == 1
    assert stats2["best_lpips"] == 0.5
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(params["w"]))
    chex_leaves = jax.tree_util.tree_leaves(o2)
    assert len(chex_leaves) == len(jax.tree_util.tree_leaves(opt_state))

    # latest resolution
    save_checkpoint(tmp_path / "step_00000020.ckpt", params, opt_state, 20, 2, stats)
    assert resolve_checkpoint(tmp_path, "latest").name == "step_00000020.ckpt"
    assert resolve_checkpoint(tmp_path, "best") is None
    assert resolve_checkpoint(tmp_path, str(path)) == path
    assert resolve_checkpoint(tmp_path, None) is None


def test_checkpoint_chunked_sections(tmp_path, monkeypatch):
    """Sections larger than the chunk limit round-trip as chunk lists.

    Reference-capacity models (~537M params) produce >4 GiB opt_state blobs
    which exceed msgpack's 2**32-1 single-bin cap; save_checkpoint splits any
    oversized section. Shrink the limit so the path is exercised cheaply.
    """
    import jax.numpy as jnp

    from humanrf_tpu.train import checkpoint as ckpt

    monkeypatch.setattr(ckpt, "_MAX_SECTION", 64)
    params = {"w": jnp.arange(128, dtype=jnp.float32)}  # 512B blob > 64B limit
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    path = tmp_path / "step_00000005.ckpt"
    ckpt.save_checkpoint(path, params, opt_state, step=5, val_step=0, stats={})

    # the on-disk payload really is chunked
    from flax import serialization

    payload = serialization.msgpack_restore(path.read_bytes())
    assert isinstance(payload["params"], (list, tuple)) and len(payload["params"]) > 1

    p2, o2, step, _, _ = ckpt.load_checkpoint(path, params, opt_state)
    assert step == 5
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(params["w"]))

    # and an unchunked file written by the old format still loads
    monkeypatch.setattr(ckpt, "_MAX_SECTION", 1 << 30)
    ckpt.save_checkpoint(path, params, opt_state, step=6, val_step=0, stats={})
    payload = serialization.msgpack_restore(path.read_bytes())
    assert isinstance(payload["params"], bytes)
    p3, _, step6, _, _ = ckpt.load_checkpoint(path, params, opt_state)
    assert step6 == 6
