"""Probe: does a complex64 1-D gather cost ONE gather instruction on TPU
(interleaved 8-byte elements), or two (planar re/im)?

If one: the interleaved [pdf, node] pair tables (grid_pl/sub_pl) can be
fetched in HALF the gather instructions — ~300 ms/pass at the deep tree
(4 taps -> 2), ~60 ms at the small tree.

Usage: python tools/probe_complex_gather.py
"""
import time
import warnings

warnings.simplefilter("ignore")

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 21  # ~2M lanes (the (2N) pdf chain width)


def timeit(label, fn, *args, reps=8):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        ts.append(time.perf_counter() - t0)
    print(f"  {label:<44s} {np.median(ts)*1e3:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    for rows in (1 << 22, 1 << 26):
        v = rng.integers(0, rows, size=rows).astype(np.float32)
        g = rng.integers(0, rows, size=rows).astype(np.float32)
        inter = np.empty(2 * rows, np.float32)
        inter[0::2] = v
        inter[1::2] = g
        tbl_f = jnp.asarray(inter)
        idx0 = jnp.asarray(rng.integers(0, rows, size=N), jnp.int32)

        @jax.jit
        def taps2(tbl, idx):
            acc = jnp.zeros(idx.shape, jnp.float32)
            cur = idx
            for _ in range(4):
                vv = tbl[2 * cur]
                gg = tbl[2 * cur + 1]
                acc = acc + vv
                cur = jnp.clip(gg.astype(jnp.int32), 0, rows - 1)
            return acc

        @jax.jit
        def tapc(tbl, idx):
            acc = jnp.zeros(idx.shape, jnp.float32)
            cur = idx
            for _ in range(4):
                z = tbl[cur]
                acc = acc + jnp.real(z)
                cur = jnp.clip(jnp.imag(z).astype(jnp.int32), 0, rows - 1)
            return acc

        a = np.asarray(taps2(tbl_f, idx0))
        timeit("2x f32 taps (chain of 4 pairs)", taps2, tbl_f, idx0)
        try:
            # build complex ON DEVICE from the f32 table (H2D of complex
            # may be unimplemented on this backend)
            mk = jax.jit(lambda t: jax.lax.complex(t[0::2], t[1::2]))
            tbl_c = mk(tbl_f)
            b = np.asarray(tapc(tbl_c, idx0))
            print(f"  complex==taps {np.array_equal(a, b)}", flush=True)
            timeit("1x complex64 gather (chain of 4)", tapc, tbl_c, idx0)
            del tbl_c
        except Exception as e:
            print(f"  complex64 FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        del tbl_f


if __name__ == "__main__":
    main()
