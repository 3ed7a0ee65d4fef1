"""Measure formulations of the post-sort parameter gather.

The binning's dominant cost at 1M splats is `packed[src].T` — 11 ms for
a [1.5M] row-gather from [N+1, 16] into a transposed [16, M] matrix
(benchmarks/render_stage_tpu.py).  96 MB of useful output at 11 ms is
~9 GB/s — an order of magnitude under HBM speed, suggesting the [M, 16]
intermediate materializes lane-padded ([M, 128] physical = 768 MB).

Variants:
  A  packed[src].T            (current)
  B  packed[src]              (no transpose — is the .T the cost?)
  C  packed_t[:, src]         (gather along the lane axis of [16, N+1])
  D  16 per-field 1-D gathers (each [N+1] -> [M], stacked)
  E  8x2 paired columns       (gather [N+1, 2] rows -> reshape trick)

Run on the TPU chip:  python benchmarks/gather_variants_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

K = 20


def loop_time(make_body, init_carry):
    @jax.jit
    def run(c0):
        return jax.lax.fori_loop(0, K, make_body, c0)

    out = run(init_carry)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.time()
    out = run(init_carry)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.time() - t0) / K * 1e3


def main():
    n = 1_000_000
    m = 1_500_768
    f = 16
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.random((n + 1, f)), jnp.float32)
    packed_t = jnp.asarray(np.asarray(packed).T.copy())
    # realistic src: sorted-by-tile entries hit nearby splats in runs
    src = jnp.asarray(rng.integers(0, n, size=m, dtype=np.int32))

    def body_a(i, c):
        g = (packed + c * 0)[src].T
        return g[0, 0] * 1e-20

    def body_b(i, c):
        g = (packed + c * 0)[src]
        return g[0, 0] * 1e-20

    def body_c(i, c):
        g = jnp.take(packed_t + c * 0, src, axis=1)
        return g[0, 0] * 1e-20

    def body_d(i, c):
        pt = packed_t + c * 0
        g = jnp.stack([pt[j][src] for j in range(f)])
        return g[0, 0] * 1e-20

    ms_a = loop_time(body_a, jnp.float32(0))
    print(f"A packed[src].T        : {ms_a:7.2f} ms")
    ms_b = loop_time(body_b, jnp.float32(0))
    print(f"B packed[src]          : {ms_b:7.2f} ms")
    ms_c = loop_time(body_c, jnp.float32(0))
    print(f"C packed_t[:, src]     : {ms_c:7.2f} ms")
    ms_d = loop_time(body_d, jnp.float32(0))
    print(f"D 16x 1-D gathers      : {ms_d:7.2f} ms")


def scaling():
    """Does row-gather cost scale with row width? (8/9/16/32 cols)"""
    n, m = 1_000_000, 1_500_768
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, n, size=m, dtype=np.int32))
    for f in (4, 8, 9, 16, 32):
        packed = jnp.asarray(rng.random((n + 1, f)), jnp.float32)

        def body(i, c, packed=packed):
            g = (packed + c * 0)[src].T
            return g[0, 0] * 1e-20

        ms = loop_time(body, jnp.float32(0))
        print(f"width {f:3d}: {ms:7.2f} ms")


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
