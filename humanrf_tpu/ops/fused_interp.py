"""Fused interpolating-matmul: the one-hot hash-table lookup as a Pallas kernel.

The gather-free "onehot" field backend (models/hash_encoding.py) computes

    out[p, f, n] = Σ_c  w[p, c, n] · tables[p, f, idx[p, c, n]]

by materializing, per (p)air, an (N, T) one-hot row matrix in HBM and feeding
it to the MXU. PERF.md's step decomposition shows those rows are the training
step's dominant HBM traffic (≈2·N·T·2B per pair per pass — the same role
tcnn's fused kernels play for the reference,
`/root/reference/humanrf/scene_representation/decomposition4d.py:79-122`).

This kernel builds the rows **in VMEM only**, tile by tile, and contracts them
immediately: per grid cell (pair p, sample-tile i) it constructs the
transposed one-hot block M (T, TN) from the (C, TN) corner indices/weights and
performs one MXU dot `tab (F, T) @ M (T, TN)`. The backward pass rebuilds M
(cheaper than storing it) and accumulates `dtab += g (F, TN) @ Mᵀ` across
sample tiles — also a single MXU contraction, no scatter.

Orientation is chosen so nothing is ever transposed inside the kernel:
samples ride the lane axis (128 lanes) end to end; the table axis T rides
sublanes. Two row-construction variants exist (selected by `variant`):

- "direct":  per corner, compare a (T, 1) iota against the (1, TN) index
  vector and select-accumulate — C full-width passes.
- "twolevel": split t = s·128 + lo; per corner build a 128-wide lo-one-hot
  once, then accumulate it into slab s with the corner weight masked by
  (hi == s) — the compare width drops from T to 128 per corner, with the
  per-slab accumulation a single fma. Fewer VPU ops for T ≥ 512.

Gradients: tables only. Sample positions are produced by stop-gradient'd
resampling (train/pipeline.py), so the interpolation weights carry no
parameter gradients — idx/w are treated as non-differentiable inputs, which
matches what XLA's DCE leaves of the unfused path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Default sample-tile width (lanes per grid cell). Swept on v5e-1 at flagship
# shapes (N=262144, P=32, T=2048): 256→118.5, 512→114.4, 1024→112.1,
# 2048→111.1 ms fwd+bwd — 1024 takes the plateau without 2048's 7× compile
# cost (424s vs 27s through the tunnel).
DEFAULT_TILE_N = 1024


def _build_m(idx, w, table_size: int, variant: str):
    """idx (C, TN) int32, w (C, TN) f32 → M (T, TN) bf16 (VMEM-resident value).

    M[t, n] = Σ_c w[c, n] · [idx[c, n] == t]
    """
    C, TN = idx.shape
    T = table_size
    if variant == "direct":
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        acc = jnp.zeros((T, TN), jnp.float32)
        for c in range(C):
            eq = iota_t == idx[c : c + 1, :]
            acc = acc + jnp.where(eq, w[c : c + 1, :], 0.0)
        return acc.astype(jnp.bfloat16)

    assert variant == "twolevel", variant
    assert T % LANES == 0, T
    S = T // LANES
    lo = idx & (LANES - 1)
    hi = idx >> 7
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
    # Per-corner 128-wide lo one-hots, built once and reused by every slab.
    b = [(iota_lo == lo[c : c + 1, :]).astype(jnp.float32) for c in range(C)]
    slabs = []
    for s in range(S):
        slab = jnp.zeros((LANES, TN), jnp.float32)
        for c in range(C):
            a = jnp.where(hi[c : c + 1, :] == s, w[c : c + 1, :], 0.0)  # (1, TN)
            slab = slab + b[c] * a
        slabs.append(slab.astype(jnp.bfloat16))
    return jnp.concatenate(slabs, axis=0)


def _fwd_kernel(idx_ref, w_ref, tab_ref, out_ref, *, table_size, variant):
    m = _build_m(idx_ref[0], w_ref[0].astype(jnp.float32), table_size, variant)
    out_ref[0] = jax.lax.dot_general(
        tab_ref[0].astype(jnp.bfloat16),
        m,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(idx_ref, w_ref, g_ref, dtab_ref, *, table_size, variant):
    i = pl.program_id(1)
    m = _build_m(idx_ref[0], w_ref[0].astype(jnp.float32), table_size, variant)
    # dtab (F, T) += g (F, TN) @ M (T, TN)ᵀ — contract the sample axis.
    part = jax.lax.dot_general(
        g_ref[0].astype(jnp.bfloat16),
        m,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    dtab_ref[0] += part


def _pad_n(x, tile_n):
    n = x.shape[-1]
    pad = (-n) % tile_n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def fused_interp(tables, idx, w, variant="twolevel", tile_n=DEFAULT_TILE_N, interpret=False):
    """out[p, f, n] = Σ_c w[p, c, n] · tables[p, f, idx[p, c, n]].

    tables: (P, F, T) float32 — T a multiple of 128.
    idx:    (P, C, N) int32 in [0, T).
    w:      (P, C, N) float32 (interpolation weights; non-differentiable).
    → (P, F, N) float32. Differentiable in `tables` only.
    """
    return _fused_interp_fwd_impl(tables, idx, w, variant, tile_n, interpret)


def _fused_interp_fwd_impl(tables, idx, w, variant, tile_n, interpret):
    P, F, T = tables.shape
    _, C, N = idx.shape
    assert T % LANES == 0, f"table size {T} must be a multiple of {LANES}"
    idx = _pad_n(idx, tile_n)
    w = _pad_n(w, tile_n)
    n_pad = idx.shape[-1]
    grid = (P, n_pad // tile_n)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, table_size=T, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, tile_n), lambda p, i: (p, 0, i)),
            pl.BlockSpec((1, C, tile_n), lambda p, i: (p, 0, i)),
            pl.BlockSpec((1, F, T), lambda p, i: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, F, tile_n), lambda p, i: (p, 0, i)),
        out_shape=jax.ShapeDtypeStruct((P, F, n_pad), jnp.float32),
        interpret=interpret,
    )(idx, w, tables)
    return out[:, :, :N]


def _fused_interp_fwd(tables, idx, w, variant, tile_n, interpret):
    out = _fused_interp_fwd_impl(tables, idx, w, variant, tile_n, interpret)
    return out, (tables.shape, idx, w)


def _fused_interp_bwd(variant, tile_n, interpret, res, g):
    (P, F, T), idx, w = res
    _, C, N = idx.shape
    idx_p = _pad_n(idx, tile_n)
    w_p = _pad_n(w, tile_n)
    g_p = _pad_n(g, tile_n)
    n_pad = idx_p.shape[-1]
    grid = (P, n_pad // tile_n)
    dtab = pl.pallas_call(
        functools.partial(_bwd_kernel, table_size=T, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, tile_n), lambda p, i: (p, 0, i)),
            pl.BlockSpec((1, C, tile_n), lambda p, i: (p, 0, i)),
            pl.BlockSpec((1, F, tile_n), lambda p, i: (p, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, F, T), lambda p, i: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((P, F, T), jnp.float32),
        interpret=interpret,
    )(idx_p, w_p, g_p)
    # Cotangents must carry the PRIMAL shapes (not the tile-padded ones) —
    # int32 idx gets a float0 cotangent per the custom_vjp convention.
    import numpy as _np

    didx = _np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dtab, didx, jnp.zeros_like(w)


fused_interp.defvjp(_fused_interp_fwd, _fused_interp_bwd)


def fused_interp_reference(tables, idx, w):
    """Pure-jnp oracle for tests: gathers + weighted sum."""
    # tables (P, F, T), idx/w (P, C, N) → (P, F, N)
    gathered = jnp.take_along_axis(
        tables[:, None, :, :], idx[:, :, None, :], axis=-1
    )  # (P, C, F, N)
    return (gathered * w[:, :, None, :]).sum(axis=1)


def verify_on_device(
    n: int = 65536,
    seed: int = 0,
    tol: float = 2e-2,
    P: int = 32,
    F: int = 4,
    T: int = 2048,
    C: int = 8,
    tile_n: int = DEFAULT_TILE_N,
) -> dict:
    """Asserted numerical parity of the COMPILED kernel against the jnp oracle
    on the current default device — both variants, forward AND backward.

    Shapes default to the flagship (P=32 pairs, F=4, T=2048, C=8 corners),
    but callers that compile *different* shapes must pass them through: a
    Mosaic miscompile can be shape-specific, so the gate must exercise the
    same (P, F, T, tile) tilings that get timed/trained (bench.py derives
    these from the constructed model's table leaves).

    The interpreter-mode unit tests (tests/test_fused_interp.py) validate the
    kernel *logic* on CPU; this validates the Mosaic *compilation* on the chip
    that actually trains — a miscompile or tile-boundary bug would otherwise
    surface as quietly-wrong training, not a failure. bench.py runs this gate
    before timing anything, so every recorded bench re-proves the kernel.

    Tolerance is bf16-scaled (the kernel builds rows and feeds the MXU in
    bf16 with fp32 accumulation): max|err| / max|ref| < tol per output.
    Returns {variant: {"fwd": err, "bwd": err}} on success; raises
    AssertionError with the offending variant/pass otherwise.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    tables = jnp.asarray(rng.normal(size=(P, F, T)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (P, C, n)).astype(np.int32))
    # Realistic corner weights: per sample the 8 trilinear weights sum to 1.
    w_raw = rng.uniform(0, 1, (P, C, n)).astype(np.float32)
    w = jnp.asarray(w_raw / w_raw.sum(axis=1, keepdims=True))
    g = jnp.asarray(rng.normal(size=(P, F, n)).astype(np.float32))

    ref = np.asarray(jax.jit(fused_interp_reference)(tables, idx, w))
    dt_ref = np.asarray(
        jax.jit(jax.grad(lambda t: (fused_interp_reference(t, idx, w) * g).sum()))(tables)
    )
    fwd_scale = np.max(np.abs(ref)) + 1e-9
    bwd_scale = np.max(np.abs(dt_ref)) + 1e-9

    errs = {}
    for variant in ("twolevel", "direct"):
        out = np.asarray(
            jax.jit(lambda t, i, ww: fused_interp(t, i, ww, variant, tile_n))(
                tables, idx, w
            )
        )
        e_fwd = float(np.max(np.abs(out - ref)) / fwd_scale)
        dt = np.asarray(
            jax.jit(
                jax.grad(
                    lambda t: (fused_interp(t, idx, w, variant, tile_n) * g).sum()
                )
            )(tables)
        )
        e_bwd = float(np.max(np.abs(dt - dt_ref)) / bwd_scale)
        assert e_fwd < tol, f"fused_interp[{variant}] forward miscompiles on {jax.devices()[0]}: scaled err {e_fwd:.3e} >= {tol}"
        assert e_bwd < tol, f"fused_interp[{variant}] backward miscompiles on {jax.devices()[0]}: scaled err {e_bwd:.3e} >= {tol}"
        errs[variant] = {"fwd": e_fwd, "bwd": e_bwd}
    return errs
