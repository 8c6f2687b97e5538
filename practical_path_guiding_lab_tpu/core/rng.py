"""Counter-based random numbers for the wavefront renderer.

The reference uses Mitsuba's stateful ``independent`` sampler with
``seed = seed0 + cumulative_spp`` per pass (main.py:218). Here every draw is
a pure function of (seed0, pass_index, bounce, purpose, lane_id): one
Threefry-2x32 block with key (seed0, pass_index) over the counter
(lane_id, stream_id). This makes draws *shard-invariant* — a device
rendering lanes [k, k+m) produces exactly the numbers the full wavefront
would — and single-chip vs sharded renders are bit-identical.

Implementation note: everything is kept in vector registers; the axon TPU
compiler hangs on long *scalar* uint32 dependency chains feeding vector
ops, so counters are broadcast to lane shape before the cipher runs.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class PurposeId:
    """Stable stream ids so adding draws never perturbs other streams."""

    CAMERA = 0
    NEE_SELECT = 1
    NEE_POS = 2
    BSDF_SAMPLE = 3
    GUIDE_SELECT = 4
    GUIDE_DIR = 5
    RR = 6
    FILTER = 7
    LOBE = 8
    SPLAT_JITTER = 9

    COUNT = 16  # reserved slots per bounce


_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32 (20 rounds). Inputs/outputs uint32 arrays."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks2 = k0 ^ k1 ^ np.uint32(0x1BD11BDA)
    ks = (k0, k1, ks2)
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for block in range(5):
        for r in range(4):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROT[(block % 2) * 4 + r])
            x1 = x1 ^ x0
        inj = block + 1
        x0 = x0 + ks[inj % 3]
        x1 = x1 + ks[(inj + 1) % 3] + np.uint32(inj)
    return x0, x1


def _to_unit(bits):
    """uint32 -> float32 in [0, 1)."""
    return (bits >> np.uint32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _draw(seed0, pass_index, bounce, purpose, lane_ids, slot):
    """One threefry block -> two uint32 words per lane. All vector ops."""
    lanes = lane_ids.astype(jnp.uint32)
    stream = (
        jnp.asarray(bounce, jnp.uint32) * np.uint32(PurposeId.COUNT * 4)
        + np.uint32(purpose * 4)
        + np.uint32(slot)
    )
    # broadcast the stream id to lane shape so no scalar u32 chain forms
    x1 = jnp.broadcast_to(stream, lanes.shape) ^ (lanes * np.uint32(0x9E3779B9))
    k0 = jnp.asarray(seed0, jnp.uint32) ^ np.uint32(0x85EBCA6B)
    k1 = jnp.asarray(pass_index, jnp.uint32)
    return threefry2x32(k0, k1, lanes, x1)


def spp_fold(pass_index, lane_ids, n_film):
    """Key multi-spp single-dispatch wavefronts per spp-slice.

    Lane ``i`` of slice ``s`` (global lane ``s*n_film + i``) draws from the
    stream ``(pass_index + s, i)`` — exactly the stream a sequential 1-spp
    pass at ``pass_index + s`` would use. A k-spp dispatch is therefore
    bitwise-identical to k sequential passes (and to the sharded per-pass
    path). No-op for lanes < n_film."""
    lane = lane_ids.astype(jnp.uint32)
    n = jnp.uint32(n_film)
    return pass_index + (lane // n).astype(jnp.int32), (lane % n).astype(
        jnp.int32
    )


def uniform1(seed0, pass_index, bounce, purpose, lane_ids):
    a, _ = _draw(seed0, pass_index, bounce, purpose, lane_ids, 0)
    return _to_unit(a)


def uniform2(seed0, pass_index, bounce, purpose, lane_ids):
    a, b = _draw(seed0, pass_index, bounce, purpose, lane_ids, 0)
    return _to_unit(a), _to_unit(b)


def uniform3(seed0, pass_index, bounce, purpose, lane_ids):
    a, b = _draw(seed0, pass_index, bounce, purpose, lane_ids, 0)
    c, _ = _draw(seed0, pass_index, bounce, purpose, lane_ids, 1)
    return _to_unit(a), _to_unit(b), _to_unit(c)
