"""Compare pose_scene SH-rotation formulations on TPU.

pose_scene costs 28.5 ms/frame at 210k splats (benchmarks/
frame_stage_tpu.py) — all of it per-splat gathered batched-tiny-matmul
einsums.  Candidates per band (N splats, B bodies, d = band dim):

  A (current)  D_g = D[bid]            [N,d,d] gather
               einsum('nij,njc->nic')  batched d x d matmuls, N batch
  B  tmp = einsum('bij,njc->bnic')     one big MXU matmul per band
     out = einsum('nb,bnic->nic')      one-hot combine ([B,N,d,c] blowup)
  C  einsum('nb,bij,njc->nic')         XLA chooses the path
  D  Dg2 = onehot @ D.reshape(B,d*d)   [N,d*d] via MXU
     out_i = sum_j Dg2[:, i*d+j, None] * block[:, j]   unrolled VPU MACs

Run: python benchmarks/pose_variants_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.lax import Precision

P = Precision.HIGHEST
N = 256_000
B = 8
C = 3


def timeit(fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3, out


def variant_a(D, bid, block):
    D_g = D[bid]
    return jnp.einsum("nij,njc->nic", D_g, block, precision=P)


def variant_b(D, onehot, block):
    tmp = jnp.einsum("bij,njc->bnic", D, block, precision=P)
    return jnp.einsum("nb,bnic->nic", onehot, tmp, precision=P)


def variant_c(D, onehot, block):
    return jnp.einsum("nb,bij,njc->nic", onehot, D, block, precision=P)


def variant_d(D, onehot, block):
    d = D.shape[-1]
    Dg2 = jnp.einsum("nb,bk->nk", onehot, D.reshape(B, d * d), precision=P)
    rows = [
        sum(Dg2[:, i * d + j, None] * block[:, j] for j in range(d))
        for i in range(d)
    ]
    return jnp.stack(rows, axis=1)


def main():
    rng = np.random.default_rng(0)
    bid = jnp.asarray(rng.integers(0, B, N), jnp.int32)
    onehot = jax.nn.one_hot(bid, B, dtype=jnp.float32)

    for d in (3, 5, 7):
        D = jnp.asarray(rng.standard_normal((B, d, d)), jnp.float32)
        block = jnp.asarray(rng.standard_normal((N, d, C)), jnp.float32)
        fa = jax.jit(variant_a)
        fb = jax.jit(variant_b)
        fc = jax.jit(variant_c)
        fd = jax.jit(variant_d)
        ms_a, oa = timeit(fa, D, bid, block)
        ms_b, ob = timeit(fb, D, onehot, block)
        ms_c, oc = timeit(fc, D, onehot, block)
        ms_d, od = timeit(fd, D, onehot, block)
        err = lambda o: float(jnp.abs(o - oa).max())
        print(
            f"band d={d}:  A {ms_a:6.2f}  B {ms_b:6.2f} (err {err(ob):.2e})"
            f"  C {ms_c:6.2f} (err {err(oc):.2e})"
            f"  D {ms_d:6.2f} (err {err(od):.2e})"
        )

    # xyz transform variants
    R = jnp.asarray(rng.standard_normal((B, 3, 3)), jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    def xyz_a(R, bid, xyz):
        return jnp.einsum("nij,nj->ni", R[bid], xyz, precision=P)

    def xyz_d(R, onehot, xyz):
        Rg = jnp.einsum("nb,bk->nk", onehot, R.reshape(B, 9), precision=P)
        return jnp.stack(
            [
                sum(Rg[:, i * 3 + j] * xyz[:, j] for j in range(3))
                for i in range(3)
            ],
            axis=1,
        )

    ms_a, oa = timeit(jax.jit(xyz_a), R, bid, xyz)
    ms_d, od = timeit(jax.jit(xyz_d), R, onehot, xyz)
    print(f"xyz:  A {ms_a:6.2f}  D {ms_d:6.2f} (err {float(jnp.abs(od-oa).max()):.2e})")


if __name__ == "__main__":
    main()
