"""Probe whether jnp.int4 matmul works through the current TPU backend.

Round-1 attempt failed with "Recursively calling jit" through the axon
remote-compile tunnel (ROADMAP.md). This probe re-checks, at tiny shapes:
  1. int4 array creation + device put
  2. dot_general int4 x int4 -> int32
  3. a (D, tile) x (Q, D) scan-shaped matmul

Exit code 0 + "int4 OK" means the scan path can be built; any failure is
printed with the backend error.
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    a = rng.integers(-7, 8, (8, 256)).astype(np.int8)
    b = rng.integers(-7, 8, (256, 512)).astype(np.int8)
    try:
        a4 = jnp.asarray(a, dtype=jnp.int4)
        b4 = jnp.asarray(b, dtype=jnp.int4)
        jax.block_until_ready((a4, b4))
        print("int4 device arrays: OK")
    except Exception as e:
        print("int4 array creation FAILED:", type(e).__name__, str(e)[:300])
        return 1

    try:
        @jax.jit
        def dot(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        out = dot(a4, b4)
        jax.block_until_ready(out)
        ref = a.astype(np.int32) @ b.astype(np.int32)
        ok = np.array_equal(np.asarray(out), ref)
        print("int4 dot_general: OK, exact:", ok)
    except Exception as e:
        print("int4 dot_general FAILED:", type(e).__name__, str(e)[:300])
        return 1

    # scan-shaped: (Q=8, D=1152) x (D, N=24576)
    try:
        q = jnp.asarray(rng.integers(-7, 8, (8, 1152)).astype(np.int8), jnp.int4)
        m = jnp.asarray(rng.integers(-7, 8, (1152, 24576)).astype(np.int8), jnp.int4)

        @jax.jit
        def scan(q, m):
            acc = jax.lax.dot_general(
                q, m, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jax.lax.top_k(acc.astype(jnp.float32), 20)

        s, i = scan(q, m)
        jax.block_until_ready((s, i))
        print("int4 scan-shape matmul+topk: OK")
        print("int4 OK")
    except Exception as e:
        print("int4 scan-shape FAILED:", type(e).__name__, str(e)[:300])
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
