"""Decompose process_and_splat cost at real shapes (veach-ajar: D=13,
N=921600 -> V=12M vertices, 2V=24M quad-splat lanes).

Times each phase: L gather + reconstruct (elementwise), kd_lookup_grid at
V, kd scatter-add at V, quad leaf lookup at 2V, quad scatter-add at 2V —
plus the live-vertex fraction, to judge compaction vs record-time leaf
capture.

Usage: python tools/profile_splat.py [reps]
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


def _force(out):
    """Force execution on the lazy axon backend: D2H-fetch one element of
    every array leaf (block_until_ready alone is a no-op until first D2H)."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "shape"):
            np.asarray(jax.lax.slice(leaf.reshape(-1), (0,), (1,)))


def timeit(label, fn, reps=4):
    _force(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} med {np.median(ts)*1e3:8.1f} ms  "
          f"min {min(ts)*1e3:7.1f}", flush=True)
    return float(np.median(ts))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from practical_path_guiding_lab_tpu.guiding import sdtree as sd

    tree_h = sd.SDTree.load(
        "debug_r2/veach-ajar/tree-data/veach-ajar_iter-3.npz")
    tree = tree_h.to_device()
    print(f"tree: kd={tree_h.kd_count} quad={tree_h.q_count}", flush=True)

    D, N = 13, 921600
    V = D * N
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    lo = np.asarray(tree_h.bbox_lo)
    hi = np.asarray(tree_h.bbox_hi)
    p = jax.random.uniform(ks[0], (V, 3)) * (hi - lo) + lo
    xy = jax.random.uniform(ks[1], (V, 2), minval=0.0, maxval=1.0 - 1e-6)
    nee_xy = jax.random.uniform(ks[2], (V, 2), minval=0.0, maxval=1.0 - 1e-6)
    value = jax.random.uniform(ks[3], (V,))
    lane = jnp.tile(jnp.arange(N, dtype=jnp.int32), D)
    Lf = jax.random.uniform(ks[4], (N, 3))
    mask = jax.random.uniform(ks[5], (V,)) < 0.4

    jax.block_until_ready((p, xy, value, mask))

    kd_jit = jax.jit(sd.kd_lookup_grid)
    timeit("L gather (V x3 by lane)", lambda: Lf[jnp.maximum(lane, 0)], reps)
    kd_leaf, slot, _ = kd_jit(tree, p)
    jax.block_until_ready(slot)
    timeit("kd_lookup_grid (V)", lambda: kd_jit(tree, p), reps)

    @jax.jit
    def kd_scatter(t, leaf, w):
        return t.kd_vert_acc.at[leaf].add(w)

    timeit("kd scatter-add (V)", lambda: kd_scatter(tree, kd_leaf, value),
           reps)

    slot2 = jnp.concatenate([slot, slot])
    xy2 = jnp.concatenate([xy, nee_xy], axis=0)
    leaf_jit = jax.jit(sd.quad_leaf_lookup_fast2)
    q2 = leaf_jit(tree, slot2, xy2)
    jax.block_until_ready(q2)
    timeit("quad leaf lookup (2V)", lambda: leaf_jit(tree, slot2, xy2), reps)

    vals2 = jnp.concatenate([value, value])

    @jax.jit
    def q_scatter(t, leaf, v):
        return t.q_irr_acc.at[leaf].add(v)

    timeit("quad scatter-add (2V)", lambda: q_scatter(tree, q2, vals2), reps)

    # compacted variants at 40% live
    K = int(V * 0.45)

    @jax.jit
    def compact_ids(m):
        return jnp.nonzero(m, size=K, fill_value=0)[0]

    ids = compact_ids(mask)
    jax.block_until_ready(ids)
    timeit("nonzero(size=0.45V)", lambda: compact_ids(mask), reps)
    timeit("compact gather p (V->K x3)", lambda: p[ids], reps)

    full = timeit(
        "FULL splat (lookup fallback, point splats)",
        lambda: jax.jit(sd.splat)(tree, p, xy, value,
                                  jnp.ones(V, jnp.float32),
                                  nee_xy=nee_xy, nee_value=value, mask=mask),
        reps,
    )

    # trace-time-captured ids: the production path for guided iterations
    kd_cap, slot_cap, _ = kd_jit(tree, p)
    q_cap = leaf_jit(tree, slot_cap, xy)
    qn_cap = leaf_jit(tree, slot_cap, nee_xy)
    jax.block_until_ready((kd_cap, q_cap, qn_cap))
    cap = timeit(
        "FULL splat (captured ids)",
        lambda: jax.jit(sd.splat)(tree, p, xy, value,
                                  jnp.ones(V, jnp.float32),
                                  nee_xy=nee_xy, nee_value=value, mask=mask,
                                  cap_kd=kd_cap, cap_q=q_cap,
                                  cap_q_nee=qn_cap),
        reps,
    )
    print(f"\nfull(lookups)={full:.0f} ms  full(captured)={cap:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
