"""Microbenchmark: XLA TPU gather cost vs table shape/dtype/packing.

The op profile showed the (R,16) f32 texture row gathers cost ~28 ms each
per bounce at 921600 lanes (layout {0,1} makes a 16-wide row slice 16
STRIDED reads + a relayout). This measures the alternatives so the texture
encoding is chosen on data:
  a) f32[R,16] row gather      (current packed 2x2 texel rows)
  b) u32[R] 1-D gather x4      (one u32 RGB texel per word, 4 bilinear taps)
  c) u32[R,4] row gather       (2x2 neighborhood in 4 words)
  d) u32[R] 1-D gather x1      (lower bound for one tap)
  e) (N,16) f32 permutation row gather (compaction-style, near-sorted idx)
  f) 12 separate (N,) permutation gathers (current compaction)

Each timed under one jit with a trailing cheap reduce; RTT floor ~30 ms
applies equally, so DIFFS between entries are the signal.

Usage: python tools/profile_gather_shapes.py [reps]
"""
from __future__ import annotations

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

import numpy as np
import jax
import jax.numpy as jnp

N = 921600
R = 6_016_000  # the big veach-ajar texture's row count


def timeit(label, fn, reps):
    out = fn()
    float(jnp.sum(out))  # D2H fetch: the axon backend is lazy until D2H
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    print(f"{label:58s} med {np.median(ts)*1e3:8.2f} ms", flush=True)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, N, dtype=np.int32))
    idx2 = jnp.asarray(rng.integers(0, R, N, dtype=np.int32))
    tbl_f32 = jnp.asarray(rng.random((R, 16), dtype=np.float32))
    tbl_u32 = jnp.asarray(rng.integers(0, 2**30, R, dtype=np.uint32))
    tbl_u32x4 = jnp.asarray(rng.integers(0, 2**30, (R, 4), dtype=np.uint32))

    @jax.jit
    def row16(t, i):
        return jnp.sum(t[i], axis=-1)

    @jax.jit
    def oneD_x4(t, i, j):
        a = t[i]
        b = t[jnp.minimum(i + 1, R - 1)]
        c = t[j]
        d = t[jnp.minimum(j + 1, R - 1)]
        return (a ^ b ^ c ^ d).astype(jnp.float32)

    @jax.jit
    def rowu4(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    @jax.jit
    def oneD_x1(t, i):
        return t[i].astype(jnp.float32)

    timeit("a) f32[R,16] row gather", lambda: row16(tbl_f32, idx), reps)
    timeit("b) u32[R] 1-D gather x4 (bilinear taps)",
           lambda: oneD_x4(tbl_u32, idx, idx2), reps)
    timeit("c) u32[R,4] row gather", lambda: rowu4(tbl_u32x4, idx), reps)
    timeit("d) u32[R] 1-D gather x1", lambda: oneD_x1(tbl_u32, idx), reps)

    # compaction-style: permutation indices (nearly sorted)
    perm = jnp.asarray(np.sort(rng.permutation(N)[: N].astype(np.int32)))
    state16 = jnp.asarray(rng.random((N, 16), dtype=np.float32))
    cols = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(12)]

    @jax.jit
    def perm_row16(t, i):
        return jnp.sum(t[i], axis=-1)

    @jax.jit
    def perm_12x(i, *cs):
        return sum(c[i] for c in cs)

    @jax.jit
    def perm_pack_unpack(i, *cs):
        packed = jnp.stack(cs, axis=-1)  # (N,12)
        g = packed[i]
        return sum(g[:, k] for k in range(12))

    timeit("e) (N,16) f32 permutation row gather",
           lambda: perm_row16(state16, perm), reps)
    timeit("f) 12 separate (N,) permutation gathers",
           lambda: perm_12x(perm, *cols), reps)
    timeit("g) stack->(N,12) row gather->unstack",
           lambda: perm_pack_unpack(perm, *cols), reps)


def width_sweep(reps=6):
    """f32[R,W] row gather cost vs row width W (in-jit, random idx)."""
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, N, dtype=np.int32))
    for W in (1, 2, 4, 8, 16, 32, 42):
        tbl = jnp.asarray(rng.random((R, W), dtype=np.float32))

        @jax.jit
        def rowg(t, i):
            return jnp.sum(t[i], axis=-1)

        timeit(f"f32[R,{W:2d}] row gather", lambda: rowg(tbl, idx), reps)
        del tbl


if __name__ == "__main__":
    if "width" in sys.argv:
        width_sweep()
    else:
        main()
