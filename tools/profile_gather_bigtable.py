"""Microbenchmark: XLA TPU gather cost vs TABLE SIZE into the 100 MB-GB
regime. Round-4 measured gathers "independent of table size (512 -> 16M
entries)" — 64 MB max. The deep-tree profile (round 5) shows the grid/sub
pair taps costing ~150 ms each at 268 MB / ~1 GB tables, ~10x the small-
table cost: this measures where the cliff is, for uniform-random vs
spatially-clustered indices, 1-D taps vs (M,2) row gathers.

Usage: python tools/profile_gather_bigtable.py [reps]
"""
from __future__ import annotations

import sys
import time
import warnings

warnings.simplefilter("ignore")

import numpy as np
import jax
import jax.numpy as jnp

N = 921600


def timeit(label, fn, *args, reps=6):
    out = fn(*args)
    float(jnp.sum(out))  # D2H fetch: axon is lazy until first D2H
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {label:<46s} {np.median(ts)*1e3:8.2f} ms", flush=True)
    return float(np.median(ts))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rng = np.random.default_rng(0)

    @jax.jit
    def chain4(tbl, idx):
        # 4 dependent 1-D gathers (values are valid indices)
        acc = jnp.zeros(idx.shape, jnp.float32)
        cur = idx
        r = tbl.shape[0]
        for _ in range(4):
            v = tbl[cur]
            acc = acc + v
            cur = jnp.clip(v.astype(jnp.int32), 0, r - 1)
        return acc

    @jax.jit
    def chain4_row2(tbl2, idx):
        acc = jnp.zeros(idx.shape, jnp.float32)
        cur = idx
        r = tbl2.shape[0]
        for _ in range(4):
            row = tbl2[cur]
            acc = acc + row[..., 0]
            cur = jnp.clip(row[..., 1].astype(jnp.int32), 0, r - 1)
        return acc

    print("== 4 dependent 1-D f32 gathers, 921600 lanes, UNIFORM idx ==")
    for r in (1 << 22, 1 << 24, 1 << 26, 1 << 27, 1 << 28):
        tbl = jnp.asarray(
            rng.integers(0, r, size=r).astype(np.float32)
        )
        idx = jnp.asarray(rng.integers(0, r, size=N), jnp.int32)
        timeit(f"1-D table {r>>20}M entries ({r*4>>20} MB)",
               chain4, tbl, idx, reps=reps)
        del tbl, idx

    print("== same, CLUSTERED idx (all lanes within a 1M-entry window) ==")
    for r in (1 << 26, 1 << 28):
        base = rng.integers(0, r - (1 << 20))
        tblc = jnp.asarray(
            (base + rng.integers(0, 1 << 20, size=r)).astype(np.float32)
            % np.float32(r)
        )
        idxc = jnp.asarray(
            base + rng.integers(0, 1 << 20, size=N), jnp.int32
        )
        timeit(f"1-D table {r>>20}M entries, clustered",
               chain4, tblc, idxc, reps=reps)
        del tblc, idxc

    print("== (M,2) row gather chains ==")
    for r in (1 << 22, 1 << 25, 1 << 27):
        tbl2 = jnp.asarray(
            rng.integers(0, r, size=(r, 2)).astype(np.float32)
        )
        idx = jnp.asarray(rng.integers(0, r, size=N), jnp.int32)
        timeit(f"(M,2) rows {r>>20}M ({r*8>>20} MB)",
               chain4_row2, tbl2, idx, reps=reps)
        del tbl2, idx


if __name__ == "__main__":
    main()
