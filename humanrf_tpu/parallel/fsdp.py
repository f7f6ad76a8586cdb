"""Segment-table parameter sharding (FSDP/ZeRO-style) over the device mesh.

The reference cannot hold every temporal segment's feature grids on one GPU,
so it pages inactive segments to CPU between steps
(`/root/reference/humanrf/scene_representation/humanrf.py:171,179`) — a
host-device transfer on the critical path every time the frame window moves.
The TPU-native answer for long sequences is to *shard the tables over the
mesh* and let XLA materialize them on use:

- every hash table (L, F, T) is sharded on its table axis T across the
  'data' mesh axis — parameters and Adam moments cost 1/D of HBM per device;
- rays stay data-parallel on the same 1-D mesh (batch leaves sharded on the
  ray axis);
- inside the jitted step, XLA's SPMD partitioner inserts an all-gather of the
  active segments' tables for the encoding and a reduce-scatter of their
  gradients — both ride ICI (~1.3 ms for a 134 MB reference-capacity segment
  at v4 ICI bandwidth), replacing the reference's PCIe paging;
- small leaves (1-D vectors, MLPs, embeddings, proposal factors) stay
  replicated.

This is plain `jax.jit` over the *unmodified* single-program train step
(`train/pipeline.py::make_train_step`) with sharding-annotated arguments —
the global program is identical to the single-device one, so all
identity-keyed training noise (utils/rngs.py) matches by construction. The
explicit `shard_map` DP step (parallel/mesh.py) remains the compute-scaling
flagship; this module is the *memory*-scaling story (SURVEY.md §5
long-context scaling, §2.5 segment "EP").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from humanrf_tpu.models.humanrf import HumanRFModel
from humanrf_tpu.train.pipeline import HostBatch, PipelineConfig, make_train_step

AXIS = "data"

_TABLE_KEYS = ("xyz", "xyt", "yzt", "xzt")


def param_shardings(model: HumanRFModel, params, mesh: Mesh):
    """Sharding tree for a HumanRF params pytree: hash tables split on the
    table axis (when it divides the mesh), everything else replicated."""
    replicated = NamedSharding(mesh, P())
    table = NamedSharding(mesh, P(None, None, AXIS))
    num_devices = mesh.devices.size

    def seg_shardings(seg_params):
        out = {}
        for k, v in seg_params.items():
            if k in _TABLE_KEYS and v.shape[-1] % num_devices == 0:
                out[k] = table
            else:
                out[k] = replicated
        return out

    shardings = jax.tree_util.tree_map(lambda _: replicated, params)
    shardings["segments"] = [seg_shardings(s) for s in params["segments"]]
    return shardings


def place_params(model: HumanRFModel, params, mesh: Mesh):
    """Commit the params pytree to the mesh with FSDP table shardings."""
    return jax.device_put(params, param_shardings(model, params, mesh))


def opt_state_shardings(optimizer, params, p_shardings, mesh: Mesh):
    """Sharding tree for the optimizer state: any leaf shaped like a sharded
    table (Adam mu/nu mirror the params tree) shards the same way.

    Sharding cannot be left to propagation: ``optimizer.init`` builds moments
    with ``zeros_like``, which reads only the *shape* of its input, so XLA has
    no data flow to anchor the moment sharding to and would place them on a
    single device — silently forfeiting the 1/D optimizer-memory saving.
    """
    replicated = NamedSharding(mesh, P())
    table = NamedSharding(mesh, P(None, None, AXIS))
    table_shapes = {
        leaf.shape
        for leaf, sh in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p_shardings))
        if sh.spec == table.spec
    }
    shapes = jax.eval_shape(optimizer.init, params)
    return jax.tree_util.tree_map(
        lambda s: table if s.shape in table_shapes else replicated, shapes
    )


def batch_sharding(mesh: Mesh, chunked: bool = False) -> HostBatch:
    """Ray-axis sharding for HostBatch leaves; ``chunked`` adds the leading
    K (steps-per-dispatch) axis, which stays unsharded."""
    spec = P(None, AXIS) if chunked else P(AXIS)
    ray_sharded = NamedSharding(mesh, spec)
    return HostBatch(*([ray_sharded] * len(HostBatch._fields)))


def make_fsdp_train_step(
    cfg: PipelineConfig,
    model: HumanRFModel,
    optimizer,
    width: int,
    height: int,
    mesh: Mesh,
    k: int = 1,
):
    """Returns (step, init_state) where

    - ``init_state(params, rng=None) -> (placed_params, opt_state)`` commits
      the params with table shardings and builds a *sharded* optimizer state
      (Adam moments inherit the param shardings);
    - ``step(params, opt_state, batch, pool, grids, aabb, rng)`` has the
      single-device signature; batch leaves are re-committed ray-sharded, and
      XLA partitions the whole program from the argument shardings.

    ``k > 1`` composes K-steps-per-dispatch with FSDP the same way the DP
    path does (parallel/mesh.py): a `lax.scan` over K stacked host batches
    (leading K axis on every HostBatch leaf, rays still sharded) runs inside
    the one jitted program. The scan carry is (params, opt_state); XLA's SPMD
    partitioner keeps the carry's table shardings step-to-step, so nothing is
    re-gathered between the K steps. Step i uses `fold_in(rng, i)` — equal to
    K sequential dispatches of the k=1 FSDP step with those keys to
    fp-reassociation tolerance
    (tests/test_fsdp.py::test_fsdp_chunked_matches_sequential).
    Returns (params, opt_state, losses[K], auxs[K-stacked scalars]).
    """
    if k == 1:
        jit_step = make_train_step(cfg, model, optimizer, width, height)
    else:
        raw_step = make_train_step(cfg, model, optimizer, width, height, jit=False)

        def chunk(params, opt_state, batches: HostBatch, pool, grids, aabb, rng):
            def body(carry, xs):
                p, o = carry
                b, i = xs
                p, o, loss, aux = raw_step(p, o, b, pool, grids, aabb, jax.random.fold_in(rng, i))
                return (p, o), (loss, aux)

            (params, opt_state), (losses, auxs) = jax.lax.scan(
                body, (params, opt_state), (batches, jnp.arange(k, dtype=jnp.uint32))
            )
            return params, opt_state, losses, auxs

        jit_step = jax.jit(chunk, donate_argnums=(0, 1))
    b_shard = batch_sharding(mesh, chunked=k > 1)
    replicated = NamedSharding(mesh, P())

    def init_state(params):
        p_shardings = param_shardings(model, params, mesh)
        placed = jax.device_put(params, p_shardings)
        o_shardings = opt_state_shardings(optimizer, placed, p_shardings, mesh)
        opt_state = jax.jit(optimizer.init, out_shardings=o_shardings)(placed)
        return placed, opt_state

    def step(params, opt_state, batch: HostBatch, pool, grids, aabb, rng):
        batch = jax.device_put(batch, b_shard)
        pool, grids, aabb = jax.device_put((pool, grids, aabb), replicated)
        return jit_step(params, opt_state, batch, pool, grids, aabb, rng)

    return step, init_state
