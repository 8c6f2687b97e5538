"""Microbench: TPU scatter-add cost vs (n_updates, width, target size).

Decides the splat restructuring (round-3 guided-pass gap): is scatter-add
cost per-update flat, per-channel, or dominated by a fixed per-instruction
sort? Candidate layouts measured:
  A. three separate 1-ch scatters (current splat: kd + q + q_nee)
  B. one dual-channel scatter [value, count] into (T, 2) + nee 1-ch
  C. one concatenated 1-ch scatter (q + q_nee indices stacked)
Also times the Lv row gather (V,3) from (N,3) vs 3x 1-D taps vs (N,4).

Run on the real TPU (no args): python tools/profile_scatter.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def _force(out):
    # axon is lazy until a D2H fetch (docs/PERF_NOTES.md): a scalar pull
    # on every output leaf is the only honest end-of-computation marker
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=8):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    rng = np.random.default_rng(0)
    V = 7_500_000          # post-cascade splat lanes on veach-ajar
    T_Q = 1 << 21          # quad pool capacity tier
    T_KD = 1 << 15
    idx_q = jnp.asarray(rng.integers(0, 60_000, V, dtype=np.int32))
    idx_nee = jnp.asarray(rng.integers(0, 60_000, V, dtype=np.int32))
    idx_kd = jnp.asarray(rng.integers(0, 9_000, V, dtype=np.int32))
    val = jnp.asarray(rng.random(V, dtype=np.float32))
    nee = jnp.asarray(rng.random(V, dtype=np.float32))
    one = jnp.ones((V,), jnp.float32)

    @jax.jit
    def scat3(iq, inee, ikd, v, nv, w):
        q = jnp.zeros((T_Q,), jnp.float32).at[iq].add(v)
        q = q.at[inee].add(nv)
        kd = jnp.zeros((T_KD,), jnp.float32).at[ikd].add(w)
        return q, kd

    @jax.jit
    def scat_dual(iq, inee, v, nv, w):
        # [value, count] channels ride one scatter; kd counts recovered
        # later by a per-root segment sum over the leaf lists
        upd = jnp.stack([v, w], axis=-1)
        q = jnp.zeros((T_Q, 2), jnp.float32).at[iq].add(upd)
        q = q.at[inee, 0].add(nv)
        return q

    @jax.jit
    def scat_concat(iq, inee, v, nv):
        i2 = jnp.concatenate([iq, inee])
        v2 = jnp.concatenate([v, nv])
        return jnp.zeros((T_Q,), jnp.float32).at[i2].add(v2)

    @jax.jit
    def scat1(iq, v):
        return jnp.zeros((T_Q,), jnp.float32).at[iq].add(v)

    @jax.jit
    def scat1_kd(ikd, w):
        return jnp.zeros((T_KD,), jnp.float32).at[ikd].add(w)

    print("A scat3 (q + nee + kd)  :", timeit(scat3, idx_q, idx_nee, idx_kd, val, nee, one), "ms")
    print("B dual [v,c] + nee      :", timeit(scat_dual, idx_q, idx_nee, val, nee, one), "ms")
    print("C concat q+nee 1-ch     :", timeit(scat_concat, idx_q, idx_nee, val, nee), "ms")
    print("  single q 1-ch         :", timeit(scat1, idx_q, val), "ms")
    print("  single kd 1-ch        :", timeit(scat1_kd, idx_kd, one), "ms")

    # does update count scale linearly?
    for frac in (2, 4):
        v = V // frac
        print(f"  single q 1-ch V/{frac}    :", timeit(scat1, idx_q[:v], val[:v]), "ms")

    # Lv gather layouts
    N = 921_600
    L3 = jnp.asarray(rng.random((N, 3), dtype=np.float32))
    L4 = jnp.concatenate([L3, jnp.zeros((N, 1), jnp.float32)], axis=-1)
    Lf = L3.T.reshape(-1)  # channel-major flat
    lanes = jnp.asarray(rng.integers(0, N, V, dtype=np.int32))

    @jax.jit
    def g3(L, i):
        return L[i]

    @jax.jit
    def g_flat(Lf, i):
        return jnp.stack([Lf[i], Lf[N + i], Lf[2 * N + i]], axis=-1)

    print("Lv (N,3) row gather     :", timeit(g3, L3, lanes), "ms")
    print("Lv (N,4) row gather     :", timeit(g3, L4, lanes), "ms")
    print("Lv 3x 1-D taps          :", timeit(g_flat, Lf, lanes), "ms")


if __name__ == "__main__":
    main()
