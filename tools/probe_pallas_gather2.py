"""Probe 2: which 2-D gather forms does Mosaic lower, and how fast?

"Only 2D gather is supported" (probe 1) implies a 2-D path exists.
Candidate forms (tile = (8,1024) lanes):
  A. take_along_axis(tbl (R,128),  idx (8,128),  axis=0)  per-lane column select
  B. take_along_axis(tbl (R,1024), idx (8,1024), axis=0)  per-lane column select, wide
  C. take_along_axis(tbl (8,R),    idx (8,R),    axis=1)  full-width lane select
  D. tbl[idx] with tbl (R,128): rows gathered by 2-D idx

Chains are DEPENDENT (idx_{k+1} = f(val_k)) so XLA/Mosaic cannot CSE.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("jax", jax.__version__, jax.devices(), flush=True)


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps


def run_case(name, shape_tbl, shape_idx, body, R, chain=8):
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(
        rng.integers(0, R, size=shape_tbl).astype(np.float32)
    )  # values are themselves valid indices -> dependent chain
    idx = jnp.asarray(rng.integers(0, R, size=shape_idx), jnp.int32)

    def kern(tbl_ref, idx_ref, out_ref):
        tbl_v = tbl_ref[:]
        idx_v = idx_ref[:]
        acc = jnp.zeros(shape_idx, jnp.float32)
        cur = idx_v
        for _ in range(chain):
            v = body(tbl_v, cur)
            acc = acc + v
            cur = jnp.clip(v.astype(jnp.int32), 0, R - 1)
        out_ref[:] = acc

    f = jax.jit(
        lambda tbl, idx: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape_idx, jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)
    )
    try:
        out = f(tbl, idx)
        out.block_until_ready()
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"  {name} R={R}: FAIL {type(e).__name__}: {msg}", flush=True)
        return
    # numpy oracle
    tn, cn = np.asarray(tbl), np.asarray(idx)
    acc = np.zeros(shape_idx, np.float32)
    cur = cn
    for _ in range(chain):
        v = np_body[name](tn, cur)
        acc += v
        cur = np.clip(v.astype(np.int64), 0, R - 1)
    ok = np.allclose(np.asarray(out), acc)
    dt = bench(f, tbl, idx)
    lanes = int(np.prod(shape_idx))
    per = dt / chain / lanes * 1e9
    print(f"  {name} R={R}: OK correct={ok} {dt*1e3:.3f} ms chain={chain} "
          f"lanes={lanes} -> {per:.2f} ns/lane/gather", flush=True)


np_body = {
    "A": lambda t, c: np.take_along_axis(t, c, axis=0),
    "B": lambda t, c: np.take_along_axis(t, c, axis=0),
    "C": lambda t, c: np.take_along_axis(t, c, axis=1),
    "D": lambda t, c: t[c, 0],
}


def main():
    for R in (256, 2048, 16384):
        run_case("A", (R, 128), (8, 128),
                 lambda t, c: jnp.take_along_axis(t, c, axis=0), R)
    for R in (256, 2048, 16384):
        run_case("B", (R, 1024), (8, 1024),
                 lambda t, c: jnp.take_along_axis(t, c, axis=0), R)
    for R in (2048, 16384, 131072):
        run_case("C", (8, R), (8, R),
                 lambda t, c: jnp.take_along_axis(t, c, axis=1), R)
    for R in (256, 2048):
        run_case("D", (R, 128), (8, 128), lambda t, c: t[c, 0], R)


if __name__ == "__main__":
    main()
