"""Micro-benchmark for the fused typed-message Pallas kernel at flagship
shapes (HRNet-w48 640 bench: N=5440 nodes, C=80 slots, T=17 types, D=64).

Usage: PEMP_TILE_SUB=2 python tools/kernel_microbench.py [fwd|bwd]

Times ONE kernel invocation (the bench pipeline runs it STEPS=10 times per
batch), so variants can be compared without recompiling the whole pipeline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pemp_tpu.ops.pallas.fused_typed_message import (
        fused_typed_message_aggregate,
    )

    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    n, c, t, de, d = 5440, 80, 17, 64, 64
    rng = np.random.RandomState(0)
    ef = jnp.asarray(rng.randn(n * c, de), jnp.bfloat16)
    a = jnp.asarray(rng.randn(n, t, d), jnp.bfloat16)
    types = jnp.asarray(rng.randint(0, t, n * c), jnp.int32).reshape(n * c, 1)
    valid = jnp.asarray(rng.rand(n * c) < 0.9, jnp.int32).reshape(n * c, 1)
    we = jnp.asarray(rng.randn(de, t * d) * 0.1, jnp.bfloat16)
    wa = jnp.asarray(rng.randn(de, 1) * 0.1, jnp.bfloat16)

    # chain STEPS kernel calls inside ONE jit (like the pipeline's scan):
    # per-dispatch tunnel latency (~20ms through axon) would otherwise
    # swamp a ~3ms kernel
    steps = int(os.environ.get("MB_STEPS", 10))

    if mode == "fwd":
        def chained(ef, a):
            out = jnp.zeros((n, t, d), jnp.float32)
            for _ in range(steps):
                out = fused_typed_message_aggregate(
                    ef, a + 1e-6 * out.astype(a.dtype), types, valid, we, wa, n, t
                )
            return out

        fn = jax.jit(chained)
        args = (ef, a)
    else:
        def loss(ef, a):
            s = 0.0
            for _ in range(steps):
                out = fused_typed_message_aggregate(
                    ef, a + 1e-6 * s, types, valid, we, wa, n, t
                )
                s = s + jnp.sum(out * out).astype(a.dtype)
            return s.astype(jnp.float32)

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        args = (ef, a)

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    iters = int(os.environ.get("MB_ITERS", 50))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(
        f"mode={mode} sub={os.environ.get('PEMP_TILE_SUB', '1')} "
        f"tile={os.environ.get('PEMP_NODE_TILE', '8')} "
        f"{dt * 1e3 / steps:.3f} ms/step ({dt * 1e3:.1f} ms per {steps}-step chain)"
    )


if __name__ == "__main__":
    main()
