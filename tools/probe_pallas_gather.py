"""Probe: can Mosaic (jax 0.9.0) lower per-lane dynamic gathers from a
VMEM-resident table inside a Pallas TPU kernel, and at what throughput?

Round-2 measured (older jax): take_along_axis lowers only when table
shape == index shape (one vreg); two-step compositions reach 1024
entries. If newer Mosaic lifts this, the fused guided megakernel's
in-kernel tree tables become possible (VERDICT round-4 item 1).

Run ON TPU (the default env): python tools/probe_pallas_gather.py
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("jax", jax.__version__, jax.devices(), flush=True)
print([n for n in dir(pltpu) if "gath" in n.lower() or "scat" in n.lower()
       or "dyn" in n.lower() or "take" in n.lower()], flush=True)

ROWS, LANES = 8, 1024
N = ROWS * LANES


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps


def try_kernel(name, make_kernel, R, chain=8):
    """Compile + run a kernel that performs ``chain`` dependent gathers
    from an (R,)-f32 VMEM table with (8,1024) int32 lane indices."""
    tbl = jnp.arange(R, dtype=jnp.float32) * 0.5
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, R, size=(ROWS, LANES)), jnp.int32
    )

    kern = make_kernel(R, chain)
    f = jax.jit(
        lambda tbl, idx: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
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
        msg = str(e).split("\n")[0][:140]
        print(f"  {name} R={R}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None
    # correctness: chain of idx2 = (idx + val?) .. keep simple: repeated
    # same gather; expected value = tbl[idx] each time, sum = chain*tbl[idx]
    expect = np.asarray(tbl)[np.asarray(idx)] * chain
    got = np.asarray(out)
    ok = np.allclose(got, expect)
    dt = bench(f, tbl, idx)
    print(f"  {name} R={R}: OK correct={ok} {dt*1e3:.3f} ms "
          f"({chain} gathers x {N} lanes)", flush=True)
    return dt


def mk_take(R, chain):
    def kern(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros((ROWS, LANES), jnp.float32)
        for _ in range(chain):
            acc = acc + jnp.take(tbl, idx, axis=0)
        out_ref[:] = acc
    return kern


def mk_tala_lane(R, chain):
    # table replicated per sublane: (ROWS, R); take_along_axis on axis 1
    def kern(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]
        tbl2 = jnp.broadcast_to(tbl[None, :], (ROWS, R))
        idx = idx_ref[:]
        acc = jnp.zeros((ROWS, LANES), jnp.float32)
        for _ in range(chain):
            acc = acc + jnp.take_along_axis(tbl2, idx, axis=1)
        out_ref[:] = acc
    return kern


def main():
    sizes = [256, 1024, 8192, 65536, 1 << 20]
    print("== in-kernel jnp.take(tbl (R,), idx (8,1024)) ==", flush=True)
    for R in sizes:
        try_kernel("take", mk_take, R)
    print("== in-kernel take_along_axis((8,R), idx, axis=1) ==", flush=True)
    for R in sizes:
        try_kernel("tala", mk_tala_lane, R)

    # XLA gather baseline at same scale (8 dependent gathers, 8192 lanes)
    print("== XLA gather baseline (jit, same shapes) ==", flush=True)
    for R in sizes:
        tbl = jnp.arange(R, dtype=jnp.float32)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, R, size=(ROWS, LANES)),
            jnp.int32,
        )

        @jax.jit
        def f(tbl, idx):
            acc = jnp.zeros((ROWS, LANES), jnp.float32)
            for _ in range(8):
                acc = acc + tbl[idx]
            return acc

        dt = bench(f, tbl, idx)
        print(f"  xla R={R}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
