"""Microbench the guided-pass SD-tree ops at real wavefront sizes on the
live device, using a trained tree from debug_r2 (veach-ajar iter-3).

Times each fast2 op separately (kd_lookup_grid, quad_pdf_fast2,
quad_sample_fast2, hemisphere_fast) plus raw gather cost at N and 2N
lanes — decides where the guided-vs-PT per-bounce tree overhead lives.

Usage: python tools/profile_tree_ops.py [reps]
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


def timeit(label, fn, reps=6):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} med {np.median(ts)*1e3:8.1f} ms  "
          f"min {min(ts)*1e3:7.1f}", flush=True)
    return float(np.median(ts))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from practical_path_guiding_lab_tpu.guiding import sdtree as sd

    tree_h = sd.SDTree.load("debug_r2/veach-ajar/tree-data/veach-ajar_iter-3.npz")
    tree = tree_h.to_device()
    print(f"tree: kd={tree_h.kd_count} quad={tree_h.q_count}", flush=True)

    N = 921600
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lo = np.asarray(tree_h.bbox_lo)
    hi = np.asarray(tree_h.bbox_hi)
    p = jax.random.uniform(k1, (N, 3)) * (hi - lo) + lo
    xy = jax.random.uniform(k2, (N, 2), minval=0.0, maxval=1.0 - 1e-6)
    xy2 = jnp.concatenate([xy, xy[::-1]], axis=0)
    u1 = jax.random.uniform(k3, (N,))
    u2 = jax.random.uniform(k4, (N,))
    ns = jax.random.normal(k1, (N, 3))
    ns = ns / jnp.linalg.norm(ns, axis=-1, keepdims=True)

    kd_jit = jax.jit(sd.kd_lookup_grid)
    leaf, slot, srow = kd_jit(tree, p)
    _ = float(np.asarray(leaf[0]))  # defeat laziness
    slot2 = jnp.concatenate([slot, slot])
    srow2 = jnp.concatenate([srow, srow], axis=0)

    pdf_jit = jax.jit(sd.quad_pdf_fast2)
    samp_jit = jax.jit(sd.quad_sample_fast2)
    hemi_jit = jax.jit(sd.hemisphere_fast)

    timeit("kd_lookup_grid (N)", lambda: kd_jit(tree, p), reps)
    timeit("quad_pdf_fast2 (2N)", lambda: pdf_jit(tree, slot2, srow2, xy2), reps)
    timeit("quad_pdf_fast2 (N)", lambda: pdf_jit(tree, slot, srow, xy), reps)
    timeit("quad_sample_fast2 (N)", lambda: samp_jit(tree, srow, u1, u2), reps)
    timeit("hemisphere_fast (N)", lambda: hemi_jit(tree, slot, ns), reps)

    # raw gather cost scaling: 1 gather instruction at N and 2N lanes,
    # 1-wide and 16-wide rows
    tbl1 = tree.grid_v
    tbl16 = tree.q_pack
    idxN = jax.random.randint(k1, (N,), 0, tbl1.shape[0])
    idx2N = jnp.concatenate([idxN, idxN[::-1]])

    def chain(tbl, idx, k):
        def f(idx):
            acc = jnp.zeros(idx.shape[:1] + tbl.shape[1:], tbl.dtype)
            i = idx
            for _ in range(k):
                v = tbl[i]
                acc = acc + v
                i = (i + (v.reshape(v.shape[0], -1)[:, 0] > 1e30).astype(jnp.int32))
            return acc
        return jax.jit(f)

    g1 = chain(tbl1, idxN, 4)
    g2 = chain(tbl1, idx2N, 4)
    g16 = chain(tbl16, idxN, 4)
    t1 = timeit("4 dependent 1-wide gathers (N)", lambda: g1(idxN), reps)
    t2 = timeit("4 dependent 1-wide gathers (2N)", lambda: g2(idx2N), reps)
    t3 = timeit("4 dependent 16-wide gathers (N)", lambda: g16(idxN), reps)
    print(f"\nper-gather: 1w/N {t1/4*1e3:.1f} ms  1w/2N {t2/4*1e3:.1f} ms  "
          f"16w/N {t3/4*1e3:.1f} ms")


if __name__ == "__main__":
    main()
