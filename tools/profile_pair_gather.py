"""Paired-tap gather shapes: the quad pdf chain reads [pdf, node] pairs
from interleaved flat tables as TWO 1-D gathers per level. Measure
whether ONE narrow row gather (reshape (-1, 2), f32 or u32 bitcast)
reaches the single-gather floor — at the bounce-chain scale (2N =
1.84 M lanes) and the splat scale (23.9 M lanes), against the current
two-tap pattern. Run on the real TPU.

Usage: python tools/profile_pair_gather.py
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

ROWS = 8192 * 4096 // 8  # ~4.2M pair rows (~33 MB f32 pairs)


def timeit(label, fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} med {np.median(ts)*1e3:8.2f} ms  min {min(ts)*1e3:7.2f}",
          flush=True)
    return float(np.median(ts))


def main():
    key = jax.random.PRNGKey(0)
    flat = jax.random.uniform(key, (ROWS * 2,), jnp.float32)
    pair_f = flat.reshape(-1, 2)
    pair_u = jax.lax.bitcast_convert_type(flat, jnp.uint32).reshape(-1, 2)
    quad_u = jnp.concatenate(
        [pair_u, jnp.zeros_like(pair_u)], axis=-1
    )  # (rows,4) u32 — 2x memory variant
    jax.block_until_ready((flat, pair_f, pair_u, quad_u))

    for n in (921600 * 2, 23_900_000):
        idx = jax.random.randint(jax.random.PRNGKey(n), (n,), 0, ROWS)
        idx = jax.block_until_ready(idx)
        print(f"--- {n} lanes ---")

        @jax.jit
        def two_taps(i):
            v = flat[2 * i]
            g = flat[2 * i + 1]
            return v + g

        @jax.jit
        def one_tap(i):
            return flat[2 * i]

        @jax.jit
        def row_f(i):
            r = pair_f[i]
            return r[..., 0] + r[..., 1]

        @jax.jit
        def row_u(i):
            r = pair_u[i]
            return (r[..., 0] + r[..., 1]).astype(jnp.float32)

        @jax.jit
        def row_q(i):
            r = quad_u[i]
            return (r[..., 0] + r[..., 1]).astype(jnp.float32)

        timeit("single 1-D tap (floor)", lambda: one_tap(idx))
        timeit("two 1-D taps [2i, 2i+1] (current)", lambda: two_taps(idx))
        timeit("one f32[R,2] row gather", lambda: row_f(idx))
        timeit("one u32[R,2] row gather", lambda: row_u(idx))
        timeit("one u32[R,4] row gather (2x mem)", lambda: row_q(idx))


if __name__ == "__main__":
    main()
