#!/usr/bin/env python3
"""Microbenchmark: fused Pallas interpolating-matmul vs the XLA one-hot path.

Flagship shapes (PERF.md): P=32 (4 grids x 8 levels), F=4, T=2048, C=8
corners, N=262144 samples (16384 rays x Kf=16). Timed fwd-only and
fwd+bwd(tables), K chained iterations per dispatch (tunnel-proof timing).

Usage: python scripts/bench_fused.py [direct|twolevel|xla] [tile_n] [K]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from humanrf_tpu.ops.fused_interp import fused_interp  # noqa: E402

P, F, T, C = 32, 4, 2048, 8
N = int(os.environ.get("BF_N", str(262144)))


def xla_onehot(tables, idx, w):
    """The current backend's math: materialized (N, T) bf16 rows per pair."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    outs = []
    for p in range(P):
        oh = jnp.zeros((N, T), dtype=jnp.bfloat16)
        for c in range(C):
            oh = oh + jnp.where(idx[p, c][:, None] == iota, w[p, c][:, None].astype(jnp.bfloat16), jnp.bfloat16(0))
        outs.append(
            jnp.dot(oh, tables[p].T.astype(jnp.bfloat16), preferred_element_type=jnp.float32).T
        )
    return jnp.stack(outs)  # (P, F, N)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "twolevel"
    tile_n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    if which != "xla":
        # Asserted on-device parity (both variants, both passes) before any
        # timing — a printed checksum is not a correctness gate.
        from humanrf_tpu.ops.fused_interp import verify_on_device

        errs = verify_on_device()
        print(f"# kernel gate PASS on {jax.devices()[0]}: {errs}", flush=True)

    rng = np.random.default_rng(0)
    tables = jnp.asarray(rng.normal(size=(P, F, T)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (P, C, N)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (P, C, N)).astype(np.float32))

    if which == "xla":
        f = xla_onehot
    else:
        f = lambda t, i, ww: fused_interp(t, i, ww, which, tile_n, False)

    @jax.jit
    def fwd_k(tables, idx, w):
        def body(carry, _):
            out = f(carry, idx, w)
            # fold a (cheap) function of the output back into the carry so the
            # iterations chain and none can be dead-code-eliminated
            return carry + 1e-20 * out.sum(axis=-1, keepdims=True), out.sum()
        c, sums = jax.lax.scan(body, tables, jnp.arange(k))
        return sums.sum() + c.sum()

    @jax.jit
    def fwdbwd_k(tables, idx, w):
        def one(t):
            return f(t, idx, w).sum()
        def body(carry, _):
            val, grad = jax.value_and_grad(one)(carry)
            return carry + 1e-12 * grad, val
        c, vals = jax.lax.scan(body, tables, jnp.arange(k))
        return c.sum() + vals.sum()

    for name, fn in (("fwd", fwd_k), ("fwd+bwd", fwdbwd_k)):
        t0 = time.time()
        r = float(fn(tables, idx, w))
        compile_s = time.time() - t0
        t0 = time.time()
        r = float(fn(tables, idx, w))
        elapsed = time.time() - t0
        per_iter = elapsed / k
        print(
            f"{which:9s} tile_n={tile_n:5d} {name:8s} compile={compile_s:7.1f}s "
            f"{per_iter*1e3:8.2f} ms/iter  ({N/per_iter/1e6:.1f} M samples/s)  check={r:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
