"""The adaptive SD-tree (Mueller et al. 2017): a spatial binary tree whose
leaves own directional quadtrees over the cylindrical-equal-area square.

TPU-first split of responsibilities (vs the reference's all-device dynamic
arrays, kdtree.py / quadtree.py):

* **Host (numpy, this module's ``SDTree``)** — authoritative structure.
  Refinement (kd split at vertCount > c*sqrt(2^k), c=12000, kdtree.py:327-330;
  quad merge-then-split at 1% of root flux, quadtree.py:512-637), compaction,
  copy prev<-current, resets, npz save/load (the reference's exact 23-key
  schema, kdtree.py:575-602). Runs once per training iteration — cheap.

* **Device (jit, ``SDTreeDevice`` + functions below)** — fixed-capacity
  array mirrors used inside the render pass: stack-free kd descent, quadtree
  CDF sampling, pdf descent, and leaf-level splatting (scatter-add).

Key semantic simplification with identical results: the reference splats
irradiance into *every node on the root->leaf path* (quadtree.py:389-464)
and vertCount likewise (kdtree.py:199). Because every splat terminates at a
leaf, node sums equal the sum over contained leaves — so the device only
scatter-adds at leaves and the host propagates sums bottom-up before
refinement. Quadrant convention matches the reference (quadtree.py:150-186):
child 0 = (x>=mid, y>=mid), 1 = (x<mid, y>=mid), 2 = (x<mid, y<mid),
3 = (x>=mid, y<mid).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from .. import knobs

KD_SPLIT_C = 12000.0  # reference kdtree.py:329-330
QUAD_FLUX_FRACTION = 0.01  # reference quadtree.py:519
GRID_L = 5  # point-location grid depth (32x32 cells per tree)
SUB_L = 4  # per-cell subgrid depth: level-2 resolves leaves to GRID_L+SUB_L
INV_FOUR_PI = 1.0 / (4.0 * np.pi)


@struct.dataclass
class SDTreeDevice:
    """Fixed-capacity device mirror of one SD-tree (read + splat)."""

    # kd structure (NK,)
    kd_axis: jnp.ndarray      # int32, depth % 3
    kd_split: jnp.ndarray     # float32 split position
    kd_left: jnp.ndarray      # int32 left child (right = left + 1); -1 at leaf
    kd_leaf: jnp.ndarray      # bool
    kd_quad_root: jnp.ndarray # int32 quadtree root node (leaves)
    # quad structure (NQ, ...)
    q_child: jnp.ndarray      # (NQ, 4) int32, -1 if leaf
    q_irr: jnp.ndarray        # (NQ,) float32 — full node sums (prev tree)
    q_depth_dev: jnp.ndarray  # (NQ,) int32 node depths
    # splat accumulators (leaf-level)
    kd_vert_acc: jnp.ndarray  # (NK,) float32
    q_irr_acc: jnp.ndarray    # (NQ,) float32
    # bounds
    bbox_lo: jnp.ndarray      # (3,)
    bbox_inv_size: jnp.ndarray  # (3,)
    # flattened lookup tables (exact equivalents of the tree distribution):
    # per-root DFS leaf list with CDF + a 2^GRID_L square grid of covering
    # nodes for O(1)-ish point location (built host-side each iteration)
    root_slot: jnp.ndarray      # (NQ,) int32 root node -> slot, else -1
    grid_node: jnp.ndarray      # (R, 4^GRID_L) int32
    leaf_node: jnp.ndarray      # (NQ,) int32
    leaf_cdf: jnp.ndarray       # (NQ,) float32 inclusive per-tree CDF
    leaf_lo: jnp.ndarray        # (NQ, 2) float32
    leaf_depth: jnp.ndarray     # (NQ,) int32
    root_leaf_off: jnp.ndarray  # (R,) int32
    root_leaf_cnt: jnp.ndarray  # (R,) int32
    # --- gather-diet tables (XLA TPU gathers cost ~7-19 ms per instruction
    # at ~1M lanes, and wide rows cost ~2x narrow ones — measured round 3:
    # 1-wide 18.7 ms, 16-wide 41.7 ms at 921600 lanes — so every tree op is
    # restructured to one or two NARROW row gathers) ---
    # dense 3-D point-location grid: exact because the reference kd-tree
    # splits midpoints on axis = depth % 3 (kdtree.py:277) — an octree in
    # disguise; cell bits per axis cover kd_max_depth levels. One packed
    # (G, 2) int32 row [kd leaf, root slot] = one gather instruction.
    kd_grid2: jnp.ndarray = None      # (GX*GY*GZ, 2) int32 [leaf, slot]
    # per-slot packed row: [root_f, leaf_off_f, leaf_cnt_f, root_irr, ...]
    slot_row: jnp.ndarray = None      # (R, 8) float32
    # hemisphere-mass per 27 quantized normals (adaptive fraction)
    hemi_tab: jnp.ndarray = None      # (R, 32) float32
    # Walker alias table over each root's leaf list (exact distribution);
    # 16-wide rows carry BOTH candidates' geometry so sampling is ONE
    # gather: [prob, other_local_f, self_geom(5), other_geom(5), pad]
    alias_ab: jnp.ndarray = None      # (NQ, 2) f32 [prob, other_glob_row]
    leaf_geomp: jnp.ndarray = None    # (NQ, 4) f32 [u32(lo_x_q|d<<20),
    #   u32(lo_y_q), pdf, node_f] — lo quantized at 2^-20 (EXACT: leaf
    #   origins are multiples of 2^-depth, depth <= 20)
    # fused kd point-location row, built ON DEVICE in to_device (2 setup
    # gathers per refine): [leaf_f, slot_f, slot_row(8), hemi(32)] — the
    # trace's kd lookup + maturity + hemisphere mass in ONE gather
    kd_grid_f: jnp.ndarray = None     # (GX*GY*GZ, 8) float32
    hemi_flat: jnp.ndarray = None     # (R*32,) float32 — 1-D hemi view
    # per-leaf-list-slot geometry row: [lo_x, lo_y, size, pdf, node_f]
    # (node_f: the leaf's quad NODE id as f32 — exact below 2^24 — so the
    # sampler returns the leaf it picked for free, for splat capture)
    leaf_geom: jnp.ndarray = None     # (NQ, 5) float32
    # per-(slot, grid cell) [pdf_enc, node_enc] pair in TWO flat 1-D
    # tables (SPLIT, round 5): 1-D gathers only — an (M,2) row gather
    # gets XLA layout {1,0:T(8,128)} (64x last-dim padding -> multi-GB
    # temps at splat scale), and the formerly-interleaved single table
    # crossed the >=256 MB gather cliff (~1.65x per tap,
    # tools/profile_gather_bigtable.py) at deep trees while the engine
    # exploits no cache locality anyway (clustered == uniform indices) —
    # two half-size tables keep each tap below the cliff.
    # enc >= 0 -> final value (covering node is a leaf); enc < 0 ->
    # -(sub_idx+1) into the level-2 subgrid pool. The zero-flux
    # uniform-pdf fallback is applied at query time from srow's root_irr
    # (the leaf id stays structural).
    grid_v: jnp.ndarray = None        # (R * 4^GRID_L,) float32 pdf_enc
    grid_g: jnp.ndarray = None        # (R * 4^GRID_L,) float32 node_enc
    # level-2 subgrid pool (4^SUB_L cells per entry, covering quad depths
    # (GRID_L, GRID_L+SUB_L]): same encoding, < 0 -> -(node+1) residual
    # descent from depth GRID_L+SUB_L (rare)
    sub_v: jnp.ndarray = None         # (SUBCAP * 4^SUB_L,) float32
    sub_g: jnp.ndarray = None         # (SUBCAP * 4^SUB_L,) float32
    # packed quad node row for residual descents:
    # [c0..c3, irr_kid0..3, depth, irr]
    q_pack: jnp.ndarray = None        # (NQ, 10) float32
    # per-kd-node world-space extents (for stochastic spatial splat
    # filtering, Mueller's practical improvement): derivable from depth
    # alone since axis = depth % 3
    kd_ext: jnp.ndarray = None        # (NK, 4) float32
    # kd leaf -> root slot (tiny; replaces the splat's root_slot chain so
    # the (NQ,)-sized root_slot can be dropped from slim mirrors)
    kd_slot_dev: jnp.ndarray = None   # (NK,) int32
    kd_max_depth: int = struct.field(pytree_node=False, default=20)
    quad_max_depth: int = struct.field(pytree_node=False, default=20)
    grid_l: int = struct.field(pytree_node=False, default=GRID_L)
    sub_l: int = struct.field(pytree_node=False, default=SUB_L)
    kd_grid_bits: tuple = struct.field(pytree_node=False, default=(7, 7, 6))
    # isStoreNEERadiance: gate for the NEE irradiance splat stream
    # (reference quadtree.py:455-464); static so the splat specializes
    store_nee: bool = struct.field(pytree_node=False, default=True)


def kd_lookup(tree: SDTreeDevice, p):
    """Point query: world positions (N,3) -> (kd leaf index, quad root)."""
    x = (p - tree.bbox_lo) * tree.bbox_inv_size  # normalized [0,1]^3
    node = jnp.zeros(p.shape[:-1], jnp.int32)

    def cond(state):
        i, node = state
        return (i < tree.kd_max_depth) & jnp.any(~tree.kd_leaf[node])

    def body(state):
        i, node = state
        leaf = tree.kd_leaf[node]
        axis = tree.kd_axis[node]
        split = tree.kd_split[node]
        v = jnp.take_along_axis(x, axis[..., None], axis=-1)[..., 0]
        left = tree.kd_left[node]
        nxt = jnp.where(v < split, left, left + 1)
        return i + 1, jnp.where(leaf, node, nxt)

    # early-exit descent: trees are much shallower than the static cap in
    # early iterations, and XLA gathers are the hot cost on TPU
    _, node = jax.lax.while_loop(cond, body, (jnp.int32(0), node))
    return node, tree.kd_quad_root[node]


def _quadrant(px, py, mx, my):
    """Child index of a point: 0=(x>=m,y>=m) 1=(x<m,y>=m) 2=(x<m,y<m)
    3=(x>=m,y<m) — must match the bbox-update tables below and the
    reference's quadrant order (quadtree.py:150-186)."""
    right = px >= mx
    top = py >= my
    return jnp.where(
        top, jnp.where(right, 0, 1), jnp.where(right, 3, 2)
    ).astype(jnp.int32)


def quad_leaf_lookup_descent(tree: SDTreeDevice, root, xy):
    """Descend to the leaf containing canonical coords xy (N,2)."""
    node = root
    lo = jnp.zeros_like(xy)
    size = jnp.ones_like(xy)

    def cond(carry):
        i, node, lo, size = carry
        return (i < tree.quad_max_depth) & jnp.any(tree.q_child[node, 0] >= 0)

    def body(carry):
        i, node, lo, size = carry
        leaf = tree.q_child[node, 0] < 0
        mid = lo + 0.5 * size
        c = _quadrant(xy[..., 0], xy[..., 1], mid[..., 0], mid[..., 1])
        child = tree.q_child[node, c]
        new_lo = jnp.stack(
            [
                jnp.where((c == 0) | (c == 3), mid[..., 0], lo[..., 0]),
                jnp.where(c <= 1, mid[..., 1], lo[..., 1]),
            ],
            axis=-1,
        )
        node2 = jnp.where(leaf, node, child)
        lo2 = jnp.where(leaf[..., None], lo, new_lo)
        size2 = jnp.where(leaf[..., None], size, 0.5 * size)
        return i + 1, node2, lo2, size2

    _, node, lo, size = jax.lax.while_loop(
        cond, body, (jnp.int32(0), node, lo, size)
    )
    return node


def quad_pdf_descent(tree: SDTreeDevice, root, xy):
    """Solid-angle pdf of the guiding distribution at canonical coords xy:
    1/(4 pi) * prod(4 * irr_child / irr_parent) down the containment path
    (reference quadtree.py:1001-1101, NaN->0 guard at :1090-1092)."""
    node = root
    lo = jnp.zeros_like(xy)
    size = jnp.ones_like(xy)
    pdf = jnp.full(xy.shape[:-1], 1.0 / (4.0 * np.pi), jnp.float32)

    def cond(carry):
        i, node, lo, size, pdf = carry
        return (i < tree.quad_max_depth) & jnp.any(tree.q_child[node, 0] >= 0)

    def body(carry):
        i, node, lo, size, pdf = carry
        leaf = tree.q_child[node, 0] < 0
        mid = lo + 0.5 * size
        c = _quadrant(xy[..., 0], xy[..., 1], mid[..., 0], mid[..., 1])
        kids = tree.q_child[node]  # (N,4)
        irr_kids = jnp.where(kids >= 0, tree.q_irr[jnp.maximum(kids, 0)], 0.0)
        total = jnp.sum(irr_kids, axis=-1)
        irr_c = jnp.take_along_axis(irr_kids, c[..., None], axis=-1)[..., 0]
        ratio = jnp.where(total > 0, 4.0 * irr_c / jnp.maximum(total, 1e-30), 1.0)
        child = tree.q_child[node, c]
        new_lo = jnp.stack(
            [
                jnp.where((c == 0) | (c == 3), mid[..., 0], lo[..., 0]),
                jnp.where(c <= 1, mid[..., 1], lo[..., 1]),
            ],
            axis=-1,
        )
        pdf2 = jnp.where(leaf, pdf, pdf * ratio)
        node2 = jnp.where(leaf, node, child)
        lo2 = jnp.where(leaf[..., None], lo, new_lo)
        size2 = jnp.where(leaf[..., None], size, 0.5 * size)
        return i + 1, node2, lo2, size2, pdf2

    _, node, lo, size, pdf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), node, lo, size, pdf)
    )
    # zero-irradiance subtree -> pdf collapses to uniform contributions; the
    # reference returns NaN->0 there; emulate: if the *root* has zero flux,
    # pdf = uniform (handled by ratio=1 path -> 1/4pi), which the sampler
    # also uses, keeping sample/pdf consistent.
    return jnp.where(jnp.isfinite(pdf), pdf, 0.0)


def quad_sample_descent(tree: SDTreeDevice, root, u1, u2):
    """Sample canonical coords from the quadtree CDF descent
    (reference quadtree.py:931-998). Returns (xy, pdf)."""
    node = root
    n = u1.shape
    lo = jnp.zeros(n + (2,), jnp.float32)
    size = jnp.ones(n + (2,), jnp.float32)
    pdf = jnp.full(n, 1.0 / (4.0 * np.pi), jnp.float32)
    # mutable uniforms for reuse down the tree (rescaled each level)
    state = (jnp.int32(0), node, lo, size, pdf, u1, u2)

    def cond(carry):
        i, node = carry[0], carry[1]
        return (i < tree.quad_max_depth) & jnp.any(tree.q_child[node, 0] >= 0)

    def body(carry):
        i, node, lo, size, pdf, u1, u2 = carry
        leaf = tree.q_child[node, 0] < 0
        kids = tree.q_child[node]
        irr = jnp.where(kids >= 0, tree.q_irr[jnp.maximum(kids, 0)], 0.0)
        total = jnp.sum(irr, axis=-1)
        prob = jnp.where(
            (total > 0)[..., None], irr / jnp.maximum(total[..., None], 1e-30), 0.25
        )
        c0 = prob[..., 0]
        c1 = c0 + prob[..., 1]
        c2 = c1 + prob[..., 2]
        # pick child by u1, then rescale u1 within the chosen segment
        c = jnp.where(
            u1 < c0, 0, jnp.where(u1 < c1, 1, jnp.where(u1 < c2, 2, 3))
        ).astype(jnp.int32)
        seg_lo = jnp.where(c == 0, 0.0, jnp.where(c == 1, c0, jnp.where(c == 2, c1, c2)))
        p_c = jnp.take_along_axis(prob, c[..., None], axis=-1)[..., 0]
        u1n = jnp.clip((u1 - seg_lo) / jnp.maximum(p_c, 1e-12), 0.0, 1.0 - 1e-7)
        mid = lo + 0.5 * size
        new_lo = jnp.stack(
            [
                jnp.where((c == 0) | (c == 3), mid[..., 0], lo[..., 0]),
                jnp.where(c <= 1, mid[..., 1], lo[..., 1]),
            ],
            axis=-1,
        )
        child = tree.q_child[node, c]
        pdf2 = jnp.where(leaf, pdf, pdf * 4.0 * p_c)
        node2 = jnp.where(leaf, node, child)
        lo2 = jnp.where(leaf[..., None], lo, new_lo)
        size2 = jnp.where(leaf[..., None], size, 0.5 * size)
        u1b = jnp.where(leaf, u1, u1n)
        return i + 1, node2, lo2, size2, pdf2, u1b, u2

    _, node, lo, size, pdf, u1, u2 = jax.lax.while_loop(cond, body, state)
    # uniform position within the leaf cell
    xy = lo + size * jnp.stack([u1, u2], axis=-1)
    xy = jnp.clip(xy, 0.0, 1.0 - 1e-7)
    return xy, pdf


# quadrant -> (ox, oy) of the child's lower corner in units of child size
# (must match _quadrant: 0=(x>=m,y>=m) 1=(x<m,y>=m) 2=(x<m,y<m) 3=(x>=m,y<m))
_QUAD_OFF = np.array([[1, 1], [0, 1], [0, 0], [1, 0]], np.float32)


def _depth2_cell_dirs():
    """World directions of the 16 depth-2 canonical cell centers, indexed
    [child_quadrant, grandchild_quadrant]. Pure numpy (called at trace
    time) with the canonical map convention of core.sphere_map."""
    xy = np.zeros((4, 4, 2), np.float32)
    for c in range(4):
        for g in range(4):
            xy[c, g] = _QUAD_OFF[c] * 0.5 + _QUAD_OFF[g] * 0.25 + 0.125
    xy = xy.reshape(16, 2)
    cos_t = 2.0 * xy[:, 1] - 1.0
    phi = 2.0 * np.pi * xy[:, 0]
    sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
    return np.stack(
        [sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t], axis=-1
    ).astype(np.float32)


_CELL_DIRS = None


def _cell_dirs():
    global _CELL_DIRS
    if _CELL_DIRS is None:
        _CELL_DIRS = _depth2_cell_dirs()  # (16,3) numpy — safe under traces
    return _CELL_DIRS


_CELL_DIRS_L = {}


def _cell_dirs_at(L: int):
    """World dirs of the 4^L canonical cell centers; index digits base-4
    coarse->fine (finest least significant), matching quadrant expansion
    child-last reshape order."""
    if L not in _CELL_DIRS_L:
        n = 4 ** L
        xy = np.zeros((n, 2), np.float32)
        for i in range(n):
            v = i
            digs = []
            for _ in range(L):
                digs.append(v % 4)
                v //= 4
            digs.reverse()  # coarse first
            pos = np.zeros(2, np.float32)
            for lvl, d in enumerate(digs):
                pos += _QUAD_OFF[d] * (0.5 ** (lvl + 1))
            xy[i] = pos + 0.5 ** (L + 1)
        cos_t = 2.0 * xy[:, 1] - 1.0
        phi = 2.0 * np.pi * xy[:, 0]
        sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
        _CELL_DIRS_L[L] = np.stack(
            [sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t], axis=-1
        ).astype(np.float32)
    return _CELL_DIRS_L[L]


def hemisphere_mass(tree: SDTreeDevice, root, n):
    """Approximate fraction of the tree's directional mass above the
    horizon of normal ``n`` (N,3): expand the root two levels (16 canonical
    cells of ~0.8 sr), classify each cell by its center direction.

    Drives the adaptive per-lane bsdfSamplingFraction: spatial cells that
    straddle differently-oriented surfaces (e.g. the veach-ajar partition
    wall) hold most of their flux below a given surface's horizon —
    measured 16-86% wasted tree samples on ajar first hits — and sampling
    them at the fixed 0.5 fraction costs more variance than it saves."""
    kids = tree.q_child[root]                      # (N,4)
    kids_valid = kids >= 0
    kidsc = jnp.maximum(kids, 0)
    gk = tree.q_child[kidsc]                       # (N,4,4)
    gk_valid = (gk >= 0) & kids_valid[..., None]
    gk_irr = jnp.where(gk_valid, tree.q_irr[jnp.maximum(gk, 0)], 0.0)
    # leaf child: uniform over its box -> 4 equal virtual quarters
    kid_irr = jnp.where(kids_valid, tree.q_irr[kidsc], 0.0)
    child_is_leaf = ~gk_valid.any(axis=-1)         # (N,4)
    gk_mass = jnp.where(
        child_is_leaf[..., None], (kid_irr / 4.0)[..., None], gk_irr
    )
    above = (jnp.einsum("kd,nd->nk", _cell_dirs(),
                        n).reshape(n.shape[0], 4, 4) > 0.0)
    total = jnp.sum(gk_mass, axis=(1, 2))
    up = jnp.sum(jnp.where(above, gk_mass, 0.0), axis=(1, 2))
    h = jnp.where(total > 0, up / jnp.maximum(total, 1e-30), 0.5)
    # root itself a leaf (untrained cell): uniform sphere -> h = 0.5
    root_leaf = tree.q_child[root, 0] < 0
    return jnp.where(root_leaf, 0.5, h)


def _dir_jitter(tree: SDTreeDevice, xy, cap_q, u):
    """Jitter a canonical direction within its quad leaf's extent.

    Stochastic DIRECTIONAL box filter (the directional half of Mueller's
    stochastic splat filtering): in expectation each record's energy is
    box-filtered over the neighboring directional cells. Unlike the
    spatial filter this cannot leak energy through geometry — the
    position is untouched. The jitter radius is the captured leaf's
    width; records without capture (unguided iterations 0-1) keep their
    exact direction (radius 0). x wraps (azimuth), y clamps (poles)."""
    d = tree.q_depth_dev[jnp.maximum(cap_q, 0)].astype(jnp.float32)
    size = jnp.where(cap_q >= 0, jnp.exp2(-d), 0.0)
    jx = xy[..., 0] + (u[..., 0] - 0.5) * size
    jy = xy[..., 1] + (u[..., 1] - 0.5) * size
    return jnp.stack(
        [jx - jnp.floor(jx), jnp.clip(jy, 0.0, 1.0 - 1e-7)], axis=-1
    )


def _fused_splat_add(tree: SDTreeDevice, kd_leaf, q_leaf, q_leaf_nee,
                     value_m, nee_value_m, weight_m):
    """All splat streams in ONE scatter-add on the concatenated
    [q_irr_acc | kd_vert_acc] accumulator. Measured (tools/
    profile_scatter.py, real TPU): a scatter instruction costs ~20 ms
    fixed + ~7 ms per million updates at splat scale, a (T,2)
    dual-channel target costs 2.2x MORE, and update streams concatenate
    for free — so fusing the q / q_nee / kd streams saves two
    per-instruction fixed costs (~40 ms/pass). ``q_leaf_nee``/
    ``nee_value_m`` may be None (store_nee off)."""
    nq = tree.q_irr_acc.shape[0]
    idx = [q_leaf, kd_leaf + nq]
    val = [value_m, weight_m]
    if q_leaf_nee is not None:
        idx.insert(1, q_leaf_nee)
        val.insert(1, nee_value_m)
    acc = jnp.concatenate([tree.q_irr_acc, tree.kd_vert_acc])
    acc = acc.at[jnp.concatenate(idx)].add(jnp.concatenate(val))
    return tree.replace(kd_vert_acc=acc[nq:], q_irr_acc=acc[:nq])


def splat(tree: SDTreeDevice, p, xy, value, weight, nee_xy=None, nee_value=None,
          mask=None, jitter_u=None, cap_kd=None, cap_q=None, cap_q_nee=None,
          dir_jitter_u=None):
    """Accumulate training records into the leaf accumulators.

    p: (V,3) world positions; xy: (V,2) canonical directions;
    value: (V,) irradiance estimate (radiance / woPdf, quadtree.py:449-453);
    weight: (V,) statistical weight -> kd vertCount;
    nee_*: optional NEE stream (luminance(nee_radiance)/woPdf at the NEE
    direction, quadtree.py:455-464).
    cap_*: optional TRACE-TIME-CAPTURED leaf ids (kd leaf, quad leaf of
    the recorded dir, quad leaf of the NEE dir), -1 where not captured.
    The trace locates every vertex/direction anyway (sampling + pdf), so
    captured ids turn the splat's 12-24M-lane lookup chain into plain
    scatter-adds; a lax.cond re-runs the lookups only when some masked
    lane lacks capture (unguided iterations 0-1).
    jitter_u: (V,3) uniforms -> spatial box filter (jitter within the kd
    leaf extent; can leak through thin geometry, default off).
    dir_jitter_u: (V,4) uniforms -> directional box filter (jitter each
    direction within its quad leaf's width; non-leaking). Requires cap_*.
    Returns updated tree (functional).
    """
    if mask is None:
        mask = jnp.ones(value.shape, bool)
    if not tree.store_nee:
        # isStoreNEERadiance off: only the path-irradiance stream is
        # splatted (reference quadtree.py:455-464 gates the NEE block)
        nee_xy = None
    if jitter_u is not None:
        # stochastic spatial splat filter (Mueller's practical improvement):
        # jitter each record within its kd leaf's extent — a box filter
        # over neighboring spatial cells in expectation. Affects only the
        # guiding distribution's smoothness, never estimator bias. The
        # jittered position lands in a different cell, so captured ids
        # don't apply on this path.
        kd_leaf0, _, _ = kd_lookup_grid(tree, p)
        ext = tree.kd_ext[kd_leaf0]  # (V, 4)
        p = p + (jitter_u - 0.5) * ext[..., 0:3]
        cap_kd = None
    if dir_jitter_u is not None and cap_kd is not None:
        # directional filter: jittered directions usually land in a
        # sibling leaf, so the quad captures are dropped and the (cheap,
        # grid-based) directional point location re-runs; the kd capture
        # stays valid (position untouched) and recovers the slot via
        # root_slot[kd_quad_root[kd]].
        xy = _dir_jitter(tree, xy, cap_q, dir_jitter_u[..., 0:2])
        if nee_xy is not None:
            nee_xy = _dir_jitter(
                tree, nee_xy, cap_q_nee, dir_jitter_u[..., 2:4]
            )

        def q_lookups(_):
            kd_missing = jnp.any(mask & (cap_kd < 0))
            kd_leaf, slot = jax.lax.cond(
                kd_missing,
                lambda _: kd_lookup_grid(tree, p)[:2],
                lambda _: (
                    jnp.maximum(cap_kd, 0),
                    tree.kd_slot_dev[jnp.maximum(cap_kd, 0)],
                ),
                None,
            )
            if nee_xy is not None:
                q2 = quad_leaf_lookup_fast2(
                    tree,
                    jnp.concatenate([slot, slot]),
                    jnp.concatenate([xy, nee_xy], axis=0),
                )
                n = xy.shape[0]
                return kd_leaf, q2[:n], q2[n:]
            q = quad_leaf_lookup_fast2(tree, slot, xy)
            return kd_leaf, q, q

        kd_leaf, q_leaf, q_leaf_nee = q_lookups(None)
        return _fused_splat_add(
            tree, kd_leaf, q_leaf,
            q_leaf_nee if nee_xy is not None else None,
            jnp.where(mask, value, 0.0),
            jnp.where(mask & (nee_value > 0), nee_value, 0.0)
            if nee_xy is not None else None,
            jnp.where(mask, weight, 0.0),
        )

    def lookups(_):
        kd_leaf, slot, _srow = kd_lookup_grid(tree, p)
        if nee_xy is not None:
            # path + NEE directions share one batched leaf location
            q2 = quad_leaf_lookup_fast2(
                tree,
                jnp.concatenate([slot, slot]),
                jnp.concatenate([xy, nee_xy], axis=0),
            )
            n = xy.shape[0]
            return kd_leaf, q2[:n], q2[n:]
        q = quad_leaf_lookup_fast2(tree, slot, xy)
        return kd_leaf, q, q

    if cap_kd is None:
        kd_leaf, q_leaf, q_leaf_nee = lookups(None)
    else:
        nee_live = (
            mask & (nee_value > 0) if nee_xy is not None
            else jnp.zeros_like(mask)
        )
        missing = jnp.any(
            (mask & (cap_q < 0)) | (nee_live & (cap_q_nee < 0))
        )
        kd_leaf, q_leaf, q_leaf_nee = jax.lax.cond(
            missing,
            lookups,
            lambda _: (
                jnp.maximum(cap_kd, 0),
                jnp.maximum(cap_q, 0),
                jnp.maximum(cap_q_nee, 0),
            ),
            None,
        )
    return _fused_splat_add(
        tree, kd_leaf, q_leaf,
        q_leaf_nee if nee_xy is not None else None,
        jnp.where(mask, value, 0.0),
        jnp.where(mask & (nee_value > 0), nee_value, 0.0)
        if nee_xy is not None else None,
        jnp.where(mask, weight, 0.0),
    )


from functools import partial


def _derive_device_tables(
    qc_flat, q_irr, q_depth, grid_node, leaf_cdf, leaf_node, leaf_lo,
    leaf_depth, root_leaf_off, slot_row, n_slots, *, sub_cap, sub_l,
    want_leaf_geom=True,
):
    """Device-side derivation of the five LARGE gather-diet tables
    (q_pack, leaf_geom, leaf_geomp, grid_v/g, sub_v/g) from the minimal
    structural arrays.

    Rationale (measured, docs/PERF_NOTES.md): these tables are ~550 MB of
    the ~750 MB device mirror on a trained full-res veach-ajar tree, and
    the mirror is rebuilt + re-uploaded EVERY refine — 80-90 s per
    iteration over the remote link, ~35% of the whole training run's
    wall-clock. Deriving them on device from the ~200 MB of structural
    arrays turns that into a few ms of gathers. The host builder
    (``SDTree._build_fast2(big=True)``) is kept as the differential-test
    reference (host computes in f64, device in f32 — pdf columns agree to
    f32 rounding; structural columns are exact).

    Split into THREE jit programs (quad pack / leaf geometry / grid+sub)
    so XLA's peak temporary allocation is the max over the three, not
    their sum: as ONE program the derive wanted 18.65 G of 15.75 G HBM at
    the 16.7M-quad-node kd-C=2000 tree and the refine had to be reverted.
    """
    out = dict(_derive_qpack(qc_flat, q_irr, q_depth))
    out.update(
        _derive_leaf_tables(
            leaf_cdf, leaf_node, leaf_lo, leaf_depth, root_leaf_off,
            n_slots, want_leaf_geom=want_leaf_geom,
        )
    )
    if not want_leaf_geom:
        out["leaf_geom"] = None
    out.update(
        _derive_grid_sub(
            qc_flat, q_irr, q_depth, grid_node, slot_row, n_slots,
            sub_cap=sub_cap, sub_l=sub_l,
        )
    )
    return out


@jax.jit
def _derive_qpack(qc_flat, q_irr, q_depth):
    # FLAT q_child input + 1-D gathers only: a gather with (2^25, 4)-
    # shaped indices (and any >= ~2^25-row minor-dim-4 intermediate)
    # crashes the TPU compile helper outright — isolated round 4 as the
    # kd-C=2000 iteration-4 refine failure. 1-D index gathers compile at
    # any size tested (up to 2^28 indices over 2^26-row tables).
    f32 = jnp.float32
    # packed quad node rows: [c0..3, irr_kid0..3, depth, irr]
    kid_flat = jnp.where(
        qc_flat >= 0, q_irr[jnp.maximum(qc_flat, 0)], 0.0
    ).astype(f32)
    cols = [qc_flat[k::4].astype(f32) for k in range(4)]
    kcols = [kid_flat[k::4] for k in range(4)]
    q_pack = jnp.stack(
        cols + kcols + [q_depth.astype(f32), q_irr.astype(f32)], axis=-1
    )
    return dict(q_pack=q_pack)


@partial(jax.jit, static_argnames=("want_leaf_geom",))
def _derive_leaf_tables(
    leaf_cdf, leaf_node, leaf_lo, leaf_depth, root_leaf_off, n_slots,
    want_leaf_geom=True,
):
    f32 = jnp.float32
    nq_cap = leaf_cdf.shape[0]
    max_roots = root_leaf_off.shape[0]

    # per-leaf-slot geometry rows (p_i = cdf_i - cdf_{i-1} per segment)
    leaf_p = jnp.concatenate([leaf_cdf[:1], leaf_cdf[1:] - leaf_cdf[:-1]])
    seg_start = jnp.where(
        jnp.arange(max_roots) < n_slots, root_leaf_off, nq_cap
    )
    leaf_p = leaf_p.at[seg_start].set(
        leaf_cdf[jnp.minimum(seg_start, nq_cap - 1)], mode="drop"
    )
    sizes = jnp.exp2(-leaf_depth.astype(f32))
    pdf_col = (
        jnp.maximum(leaf_p, 0.0)
        * jnp.exp2(2.0 * leaf_depth.astype(f32))
        * f32(INV_FOUR_PI)
    )
    node_col = leaf_node.astype(f32)
    leaf_geom = None
    if want_leaf_geom:
        leaf_geom = jnp.stack(
            [leaf_lo[:, 0], leaf_lo[:, 1], sizes, pdf_col, node_col],
            axis=-1,
        )

    # bit-packed variant: [u32(lo_x_q | depth<<20), u32(lo_y_q), pdf, node].
    # Bit 30 is ALWAYS set on both words: the payload only spans bits
    # 0..24, so without it any packed value < 2^23 is a DENORMAL when
    # bitcast to f32, and the TPU flushes denormals to zero when this
    # table is materialized to HBM as a jit output (sampled xy collapsed
    # to the unit square / wrong pdf on every depth<8 leaf — measured,
    # docs/PERF_NOTES.md round-3 session 4). Bit 30 forces a normal
    # exponent (and can never combine with the payload into Inf/NaN);
    # the decode masks (& 0xFFFFF, >>20 & 0x1F) never see it.
    hi_bit = jnp.uint32(0x40000000)
    lo_q = jnp.round(leaf_lo * f32(1 << 20)).astype(jnp.uint32)
    d_q = jnp.clip(leaf_depth, 0, 31).astype(jnp.uint32)
    w0 = jax.lax.bitcast_convert_type(hi_bit | lo_q[:, 0] | (d_q << 20), f32)
    w1 = jax.lax.bitcast_convert_type(hi_bit | lo_q[:, 1], f32)
    leaf_geomp = jnp.stack([w0, w1, pdf_col, node_col], axis=-1)
    if leaf_geom is None:
        return dict(leaf_geomp=leaf_geomp)
    return dict(leaf_geom=leaf_geom, leaf_geomp=leaf_geomp)


# grid-derive chunk rows: bounds per-chunk temps to ~chunk*4096*4 B each;
# 16384 keeps the plan under ~2.5 G at any slot tier (tests can lower it
# to exercise the multi-chunk path on small trees)
_GRID_CHUNK_ROWS = 16384


@partial(jax.jit, static_argnames=("sub_cap", "sub_l"))
def _derive_grid_sub(
    qc_flat, q_irr, q_depth, grid_node, slot_row, n_slots, *, sub_cap,
    sub_l,
):
    f32 = jnp.float32
    max_roots, cells = grid_node.shape
    root_irr = slot_row[:, 3]
    zero = jnp.zeros((), f32)

    # per-(slot, cell) interleaved [pdf_enc, node_enc] grid, CHUNKED over
    # slot rows: at a 78.9k-kd-leaf kd-C=2000 tree the slot tier reaches
    # 131072 and the unchunked form materializes ~8 (131072, 4096) temps
    # — a 20.02 G compile plan on a 15.75 G chip (measured, the REAL
    # iteration-4 refine wall after the flat-index fix). Each chunk's
    # temps are bounded; the running `carry` keeps the global sub-pool
    # cumsum exact across chunks.
    # (qc_flat: row-major flat q_child — see _derive_qpack for why)
    chunk = min(max_roots, _GRID_CHUNK_ROWS)
    n_chunks = (max_roots + chunk - 1) // chunk
    g_pieces = []
    carry = jnp.zeros((), jnp.int32)
    # sub-pool source info, built incrementally by per-chunk scatters
    start = jnp.zeros((sub_cap,), jnp.int32)
    slot_of_sub = jnp.zeros((sub_cap,), jnp.int32)
    for c in range(n_chunks):
        r0 = c * chunk
        gn_c = jnp.maximum(grid_node[r0 : r0 + chunk], 0)
        rows_c = gn_c.shape[0]
        node_leaf = qc_flat[gn_c * 4] < 0
        pdf_leaf = (
            q_irr[gn_c]
            * jnp.exp2(2.0 * q_depth[gn_c].astype(f32))
            * f32(INV_FOUR_PI)
            / jnp.maximum(root_irr[r0 : r0 + chunk, None], 1e-30)
        )
        live_row = (r0 + jnp.arange(rows_c) < n_slots)[:, None]
        internal = (~node_leaf) & live_row
        flat_int = internal.reshape(-1)
        sub_of_cell = (
            (jnp.cumsum(flat_int.astype(jnp.int32)) - 1 + carry)
            .reshape(internal.shape)
        )
        g_val = jnp.where(
            node_leaf, jnp.nan_to_num(pdf_leaf),
            -(sub_of_cell.astype(f32) + 1.0),
        )
        g_node = jnp.where(
            node_leaf, gn_c.astype(f32), -(sub_of_cell.astype(f32) + 1.0)
        )
        g_val = jnp.where(live_row, g_val, zero)
        g_node = jnp.where(live_row, g_node, zero)
        g_pieces.append((g_val.reshape(-1), g_node.reshape(-1)))
        # scatter this chunk's internal cells into the sub-pool sources
        sub_idx = jnp.where(flat_int, sub_of_cell.reshape(-1), sub_cap)
        start = start.at[sub_idx].set(gn_c.reshape(-1), mode="drop")
        slot_of_sub = slot_of_sub.at[sub_idx].set(
            r0 + jnp.arange(rows_c * cells, dtype=jnp.int32) // cells,
            mode="drop",
        )
        carry = carry + jnp.sum(flat_int.astype(jnp.int32))
    if n_chunks == 1:
        grid_v, grid_g = g_pieces[0]
    else:
        grid_v = jnp.concatenate([v for v, _ in g_pieces])
        grid_g = jnp.concatenate([g for _, g in g_pieces])

    # level-2 subgrids: expand each internal covering node down sub_l
    # levels, spatial [y][x] layout; quadrant of sub-half (hx, hy):
    # 0=(1,1) 1=(0,1) 2=(0,0) 3=(1,0).
    # FLAT-CELL bit descent, 1-D gathers only: the earlier tensor
    # expansion (stack to (B, r, 2, r, 2) + (B, r, r, 4) child-row
    # gathers) materializes minor-dim-2/4 temps that the T(8,128) tile
    # layout pads 32-64x — at the C=4000 post-denormal-fix tree the sub
    # pool reaches 524288 rows and the stack temp alone is 34 GB (compile
    # OOM, measured). Each of the 256 final cells instead descends by its
    # own (y, x) bits: sub_l iterations of one (B, 256) 1-D gather.
    pad = jnp.arange(sub_cap) >= carry
    start = jnp.where(pad, 0, start)
    slot_of_sub = jnp.minimum(
        jnp.where(pad, 0, slot_of_sub), max_roots - 1
    )
    # FULLY-1-D expansion: the (sub_cap, 16) form's T(8,128) tiling pads
    # the 16-minor to 128 — nine 2.00 G temps at the kd-C=2000 tree's
    # sub_cap = 2^22 (measured, the post-chunking residual of the
    # iteration-4 refine wall). Flat (sub_cap*16,) arrays stay linear.
    sres = 1 << sub_l
    ncell = sres * sres
    flat_n = sub_cap * ncell
    fi = jnp.arange(flat_n, dtype=jnp.int32)
    ci = fi % ncell
    cy, cx = ci // sres, ci % sres
    cur = start[fi // ncell]
    for level in range(sub_l):
        bit = sub_l - 1 - level
        hy = (cy >> bit) & 1
        hx = (cx >> bit) & 1
        # (hy,hx) -> quadrant: (0,0)=2 (0,1)=3 (1,0)=1 (1,1)=0
        q = (1 - hy) * 2 + (hx ^ hy)
        isleaf = qc_flat[cur * 4] < 0  # leaves self-propagate to all cells
        child = qc_flat[cur * 4 + q]
        cur = jnp.where(isleaf, cur, child)
    leaf_s = qc_flat[cur * 4] < 0
    root_irr_f = root_irr[slot_of_sub][fi // ncell]
    pdf_s = (
        q_irr[cur]
        * jnp.exp2(2.0 * q_depth[cur].astype(f32))
        * f32(INV_FOUR_PI)
        / jnp.maximum(root_irr_f, 1e-30)
    )
    curf = cur.astype(f32)
    s_val = jnp.where(leaf_s, jnp.nan_to_num(pdf_s), -(curf + 1.0))
    s_node = jnp.where(leaf_s, curf, -(curf + 1.0))
    live_sub = ~pad[fi // ncell]
    s_val = jnp.where(live_sub, s_val, zero)
    s_node = jnp.where(live_sub, s_node, zero)
    return dict(grid_v=grid_v, grid_g=grid_g, sub_v=s_val, sub_g=s_node)


# ===========================================================================
# Host-side authoritative tree
# ===========================================================================


class SDTree:
    """Host (numpy) SD-tree with reference-equivalent refinement semantics."""

    def __init__(
        self,
        bbox_lo,
        bbox_hi,
        kd_max_depth: int = 20,
        quad_max_depth: int = 20,
        kd_capacity: int = 1 << 15,
        quad_capacity: int = 1 << 21,
        store_nee: bool = True,
        max_leaf_size: float = 1.0,
    ):
        self.bbox_lo = np.asarray(bbox_lo, np.float64)
        self.bbox_hi = np.asarray(bbox_hi, np.float64)
        self.kd_max_depth = kd_max_depth
        self.quad_max_depth = quad_max_depth
        self.kd_capacity = kd_capacity
        self.quad_capacity = quad_capacity
        self.store_nee = store_nee
        self.max_leaf_size = max_leaf_size

        # kd arrays (only [:kd_count] live)
        self.kd_count = 1
        self.kd_axis = np.zeros(kd_capacity, np.int32)
        self.kd_split = np.full(kd_capacity, 0.5, np.float32)  # normalized coords
        self.kd_left = np.full(kd_capacity, -1, np.int32)
        self.kd_leaf = np.zeros(kd_capacity, bool)
        self.kd_leaf[0] = True
        self.kd_depth = np.zeros(kd_capacity, np.int32)
        self.kd_vert = np.zeros(kd_capacity, np.float64)
        self.kd_quad_root = np.full(kd_capacity, -1, np.int32)
        self.kd_quad_root[0] = 0

        # quad arrays
        self.q_count = 1
        self.q_child = np.full((quad_capacity, 4), -1, np.int32)
        self.q_irr = np.zeros(quad_capacity, np.float64)
        self.q_depth = np.zeros(quad_capacity, np.int32)
        self.q_threshold = np.zeros(quad_capacity, np.float32)

        self.kd_threshold = KD_SPLIT_C  # updated per iteration
        self.last_refine_seconds = 0.0  # wall-clock of the last refine()

    # ------------------------------------------------------------------ #
    # device sync
    # ------------------------------------------------------------------ #

    def _kd_grid_bits(self):
        """Splits per axis along any root->leaf path (axis = depth % 3)."""
        d = self.kd_max_depth
        return tuple(len(range(a, d, 3)) for a in range(3))

    def _build_kd_grid(self, root_slot):
        """Dense 3-D point-location grid (exact: midpoint splits on
        axis = depth % 3 make the kd-tree an octree in disguise)."""
        bx, by, bz = self._kd_grid_bits()
        gx, gy, gz = 1 << bx, 1 << by, 1 << bz
        gl = np.zeros((gx, gy, gz), np.int32)
        gs = np.full((gx, gy, gz), -1, np.int32)
        stack = [(0, 0, gx, 0, gy, 0, gz)]
        while stack:
            i, x0, x1, y0, y1, z0, z1 = stack.pop()
            if self.kd_leaf[i]:
                gl[x0:x1, y0:y1, z0:z1] = i
                root = int(self.kd_quad_root[i])
                gs[x0:x1, y0:y1, z0:z1] = root_slot[root] if root >= 0 else -1
                continue
            ax = int(self.kd_axis[i])
            l = int(self.kd_left[i])
            if ax == 0:
                m = (x0 + x1) // 2
                stack.append((l, x0, m, y0, y1, z0, z1))
                stack.append((l + 1, m, x1, y0, y1, z0, z1))
            elif ax == 1:
                m = (y0 + y1) // 2
                stack.append((l, x0, x1, y0, m, z0, z1))
                stack.append((l + 1, x0, x1, m, y1, z0, z1))
            else:
                m = (z0 + z1) // 2
                stack.append((l, x0, x1, y0, y1, z0, m))
                stack.append((l + 1, x0, x1, y0, y1, m, z1))
        return gl.reshape(-1), gs.reshape(-1), (bx, by, bz)

    # 27 quantized normals for the hemisphere table: code = (sx+1) +
    # 3*(sy+1) + 9*(sz+1), s in {-1,0,1}^3; (0,0,0) -> h = 0.5
    @staticmethod
    def _quant_normals():
        dirs = np.zeros((27, 3), np.float32)
        for q in range(27):
            s = np.array([q % 3 - 1, q // 3 % 3 - 1, q // 9 - 1], np.float32)
            n = np.linalg.norm(s)
            dirs[q] = s / n if n > 0 else 0.0
        return dirs

    def _build_fast2(self, tables, big: bool = True):
        """Gather-diet tables: per-slot rows, hemisphere table, alias
        tables, leaf geometry rows, per-cell pdf grid, packed quad rows.

        ``big=False`` skips the five LARGE tables (leaf_geom, leaf_geomp,
        q_pack, grid_v/g, sub_v/g — ~550 MB of the ~750 MB mirror on a
        trained full-res tree) and returns only the small host-built
        tables plus the counts/tier the device-side deriver
        (``_derive_device_tables``) needs. The host build of the big
        tables is kept as the differential-test reference."""
        max_roots = self.slot_capacity
        res = 1 << GRID_L
        cells = res * res
        root_slot = tables["root_slot"]
        off = tables["root_leaf_off"]
        cnt = tables["root_leaf_cnt"]
        leaf_cdf = tables["leaf_cdf"]
        leaf_node = tables["leaf_node"]
        leaf_lo = tables["leaf_lo"]
        leaf_depth = tables["leaf_depth"]
        grid_node = tables["grid_node"]

        # slot -> root node id
        live = root_slot >= 0
        roots_of_slot = np.zeros(max_roots, np.int32)
        roots_of_slot[root_slot[live]] = np.nonzero(live)[0].astype(np.int32)
        n_slots = int(live.sum())
        slots = np.arange(n_slots)
        roots = roots_of_slot[:n_slots]
        root_irr = self.q_irr[roots].astype(np.float32)

        slot_row = np.zeros((max_roots, 8), np.float32)
        slot_row[:n_slots, 0] = roots
        slot_row[:n_slots, 1] = off[:n_slots]
        slot_row[:n_slots, 2] = cnt[:n_slots]
        slot_row[:n_slots, 3] = root_irr
        # field 4: training-record count of the kd leaf owning this root
        # (tree maturity — drives the optional "m" fraction policies)
        kd_ids = np.nonzero(self.kd_leaf[: self.kd_count])[0]
        r_of_leaf = self.kd_quad_root[kd_ids]
        ok = r_of_leaf >= 0
        s_of_leaf = root_slot[r_of_leaf[ok]]
        sv = s_of_leaf >= 0
        slot_row[s_of_leaf[sv], 4] = self.kd_vert[kd_ids[ok][sv]]

        # hemisphere table: depth-3 cell masses (64 cells of ~0.2 sr,
        # vectorized level expansion over slots; leaf subtrees split their
        # mass uniformly among virtual sub-cells)
        HEMI_L = 3
        nodes = roots[:, None].astype(np.int64)         # (S,1)
        mass = self.q_irr[roots][:, None]
        for _ in range(HEMI_L):
            kids = np.where(
                nodes[:, :, None] >= 0,
                self.q_child[np.maximum(nodes, 0)],
                -1,
            )                                           # (S,C,4)
            valid = kids >= 0
            kmass = np.where(
                valid, self.q_irr[np.maximum(kids, 0)], mass[:, :, None] / 4.0
            )
            nodes = kids.reshape(nodes.shape[0], -1)
            mass = kmass.reshape(mass.shape[0], -1)
        masses = mass                                   # (S, 64)
        qn = self._quant_normals()                      # (27,3)
        above = (_cell_dirs_at(HEMI_L) @ qn.T) > 0.0    # (64,27)
        tot = masses.sum(axis=1)
        up = masses @ above                             # (S,27)
        with np.errstate(invalid="ignore", divide="ignore"):
            h = np.where(tot[:, None] > 0, up / np.maximum(tot[:, None], 1e-30), 0.5)
        h[:, 13] = 0.5  # (0,0,0) code
        root_is_leaf = self.q_child[roots, 0] < 0
        h[root_is_leaf] = 0.5
        hemi = np.zeros((max_roots, 32), np.float32)
        hemi[:n_slots, :27] = h

        # alias tables (host Walker build — C++ engine or python fallback)
        nq_cap = self.quad_capacity
        from . import native

        al = native.build_alias(leaf_cdf, n_slots, off, cnt)
        if al is None:
            al = _alias_python(leaf_cdf, n_slots, off, cnt)
        alias_prob, alias_other = al
        if n_slots:
            seg_off = np.zeros(nq_cap, np.int64)
            for s in range(n_slots):
                o, c = int(off[s]), int(cnt[s])
                seg_off[o : o + c] = o
            other_glob = (seg_off + alias_other.astype(np.int64)).clip(
                0, nq_cap - 1
            )
        # narrow-row alias: W=2 [prob, other_glob] + W=4 packed geometry
        # (row-gather cost grows with width; <=4-wide is free, 16-wide is
        # +19 ms per 1M-lane gather — tools/profile_gather_shapes.py)
        alias_ab = np.zeros((nq_cap, 2), np.float32)
        alias_ab[:, 0] = alias_prob
        if n_slots:
            alias_ab[:, 1] = other_glob.astype(np.float32)

        # covering-node leaf/internal masks drive both the pdf grid and the
        # level-2 subgrid tier — computed here because the DEVICE deriver
        # needs n_sub/sub_cap even when the big tables stay host-unbuilt
        gn = grid_node[:n_slots] if n_slots else grid_node[:0]
        node_leaf = self.q_child[gn, 0] < 0
        internal = ~node_leaf                       # (S, cells)
        n_sub = int(internal.sum())
        sres = 1 << SUB_L
        # x4 tier growth: same recompile-avoidance rationale as
        # slot_capacity (each new shape recompiles the bounce program)
        sub_cap = 2048
        while sub_cap < max(n_sub, 1):
            sub_cap *= 4

        gl, gs, bits = self._build_kd_grid(root_slot)
        kd_grid2 = np.stack([gl, gs], axis=-1).astype(np.int32)

        # per-kd-node extents: axis a halves len(range(a, depth, 3)) times
        size = np.maximum(self.bbox_hi - self.bbox_lo, 1e-9)
        d = self.kd_depth.astype(np.int64)
        kd_ext = np.zeros((self.kd_capacity, 4), np.float32)
        for a in range(3):
            halvings = (d - a + 2) // 3
            halvings = np.maximum(halvings, 0)
            kd_ext[:, a] = size[a] * np.exp2(-halvings.astype(np.float32))

        out = dict(
            kd_grid2=kd_grid2, kd_grid_bits=bits,
            slot_row=slot_row, hemi_tab=hemi,
            alias_ab=alias_ab, kd_ext=kd_ext,
            n_slots=n_slots, n_sub=n_sub, sub_cap=sub_cap,
        )
        if not big:
            return out

        # ---- big tables (host reference; production derives on device) ----
        leaf_p = leaf_cdf.copy()
        # p_i = cdf_i - cdf_{i-1} within each segment
        leaf_p[1:] -= leaf_cdf[:-1]
        if n_slots:
            leaf_p[off[:n_slots]] = leaf_cdf[off[:n_slots]]
        leaf_geom = np.zeros((nq_cap, 5), np.float32)
        sizes = np.exp2(-leaf_depth.astype(np.float32))
        leaf_geom[:, 0] = leaf_lo[:, 0]
        leaf_geom[:, 1] = leaf_lo[:, 1]
        leaf_geom[:, 2] = sizes
        leaf_geom[:, 3] = (
            np.maximum(leaf_p, 0.0)
            * np.exp2(2.0 * leaf_depth.astype(np.float32))
            * INV_FOUR_PI
        )
        leaf_geom[:, 4] = tables["leaf_node"].astype(np.float32)
        lo_q = np.round(leaf_geom[:, 0:2] * (1 << 20)).astype(np.int64)
        assert np.all(np.abs(lo_q * (1.0 / (1 << 20)) - leaf_geom[:, 0:2]) == 0.0), \
            "leaf origins must be exact multiples of 2^-20"
        d_q = np.round(-np.log2(np.maximum(leaf_geom[:, 2], 1e-30))).astype(np.int64)
        d_q = np.clip(d_q, 0, 31)
        # bit 30 set on both words to keep the f32 bit pattern a NORMAL
        # float (TPU flushes denormals to zero on HBM materialization —
        # see _derive_device_tables); the decode masks never see it.
        leaf_geomp = np.zeros((nq_cap, 4), np.float32)
        leaf_geomp[:, 0] = (
            (0x40000000 | lo_q[:, 0] | (d_q << 20))
            .astype(np.uint32).view(np.float32)
        )
        leaf_geomp[:, 1] = (
            (0x40000000 | lo_q[:, 1]).astype(np.uint32).view(np.float32)
        )
        leaf_geomp[:, 2] = leaf_geom[:, 3]
        leaf_geomp[:, 3] = leaf_geom[:, 4]

        # packed quad node rows: [c0..3, irr_kid0..3, depth, irr, ...]
        q_pack = np.zeros((nq_cap, 10), np.float32)
        qc = self.q_child
        q_pack[:, 0:4] = qc
        q_pack[:, 4:8] = np.where(qc >= 0, self.q_irr[np.maximum(qc, 0)], 0.0)
        q_pack[:, 8] = self.q_depth
        q_pack[:, 9] = self.q_irr

        # per-(slot, cell) pdf grid: covering node leaf -> final pdf;
        # internal -> -(sub_idx+1) into the level-2 subgrid pool; zero-flux
        # root -> uniform 1/4pi. The subgrid resolves point location to
        # depth GRID_L+SUB_L so pdf/leaf queries are 2 narrow gathers with
        # the residual descent lax.cond-skipped (leaves deeper than 9 are
        # rare: ajar-trained trees max out at depth 8-9).
        with np.errstate(invalid="ignore", divide="ignore"):
            pdf_leaf = (
                self.q_irr[gn]
                * np.exp2(2.0 * self.q_depth[gn])
                * INV_FOUR_PI
                / np.maximum(root_irr[:, None], 1e-30)
            )
        sub_of_cell = np.cumsum(internal.reshape(-1)).reshape(internal.shape)
        sub_of_cell = (sub_of_cell - 1).astype(np.int64)
        # packed [pdf_enc, node_enc] rows; the zero-flux uniform-pdf
        # fallback moved to query time (keeps node_enc structural)
        val = np.where(node_leaf, np.nan_to_num(pdf_leaf),
                       -(sub_of_cell + 1.0))
        grid_v = np.zeros((max_roots, cells), np.float32)
        grid_g = np.zeros((max_roots, cells), np.float32)
        if n_slots:
            grid_v[:n_slots] = val
            grid_g[:n_slots] = np.where(
                node_leaf, gn, -(sub_of_cell + 1.0)
            )

        # level-2 subgrids: expand each internal covering node (depth
        # exactly GRID_L) down SUB_L levels, spatial [y][x] layout. Child
        # quadrant of sub-half (hx, hy): 0=(1,1) 1=(0,1) 2=(0,0) 3=(1,0).
        sub_v = np.zeros((sub_cap, sres * sres), np.float32)
        sub_g = np.zeros((sub_cap, sres * sres), np.float32)
        if n_sub:
            cur = gn[internal].reshape(n_sub, 1, 1)
            for _ in range(SUB_L):
                isleaf = self.q_child[cur, 0] < 0
                kids = self.q_child[cur]            # (n_sub, r, r, 4)
                r = cur.shape[1]
                new = np.empty((n_sub, 2 * r, 2 * r), np.int32)
                for (hx, hy), q in (
                    ((1, 1), 0), ((0, 1), 1), ((0, 0), 2), ((1, 0), 3),
                ):
                    new[:, hy::2, hx::2] = np.where(isleaf, cur, kids[..., q])
                cur = new
            leaf_s = self.q_child[cur, 0] < 0       # (n_sub, sres, sres)
            slot_of_sub = np.nonzero(internal)[0]   # row-major = cumsum order
            with np.errstate(invalid="ignore", divide="ignore"):
                pdf_s = (
                    self.q_irr[cur]
                    * np.exp2(2.0 * self.q_depth[cur])
                    * INV_FOUR_PI
                    / np.maximum(root_irr[slot_of_sub][:, None, None], 1e-30)
                )
            sub_v[:n_sub] = np.where(
                leaf_s, np.nan_to_num(pdf_s), -(cur + 1.0)
            ).reshape(n_sub, -1)
            sub_g[:n_sub] = np.where(leaf_s, cur, -(cur + 1.0)).reshape(
                n_sub, -1
            )

        out.update(
            leaf_geomp=leaf_geomp, leaf_geom=leaf_geom,
            grid_v=grid_v.reshape(-1), grid_g=grid_g.reshape(-1),
            sub_v=sub_v.reshape(-1), sub_g=sub_g.reshape(-1),
            q_pack=q_pack,
        )
        return out

    def to_device(self) -> SDTreeDevice:
        import os as _os

        size = np.maximum(self.bbox_hi - self.bbox_lo, 1e-9)
        tables = self._build_lookup_tables()
        derive = knobs.get_bool("PPG_DEVICE_TABLES")
        fast2 = self._build_fast2(tables, big=not derive)
        kd_grid2_d = jnp.asarray(fast2["kd_grid2"])
        slot_row_d = jnp.asarray(fast2["slot_row"])
        hemi_d = jnp.asarray(fast2["hemi_tab"])
        gs_safe = jnp.maximum(kd_grid2_d[:, 1], 0)
        # NARROW row: [kd_leaf, slot, root, off, cnt, root_irr, vert_cnt,
        # pad]. Row-gather cost grows with width on TPU (42-wide cost
        # +45 ms per 1M-lane gather vs +0 for <=4, tools/
        # profile_gather_shapes.py width sweep); the hemisphere moved to a
        # 1-D flat gather (hemisphere_flat).
        kd_grid_f = jnp.concatenate(
            [kd_grid2_d.astype(jnp.float32), slot_row_d[gs_safe][:, :6]],
            axis=-1,
        )
        # upload the structural arrays ONCE; the five big tables are
        # derived from them on device (see _derive_device_tables)
        slim_knob = knobs.get("PPG_SLIM_MIRROR")
        slim = derive and USE_FAST_TREE and (
            slim_knob == "1"
            or (slim_knob == "auto" and self.q_count >= (1 << 21))
        )
        q_child_d = None if slim else jnp.asarray(self.q_child)
        q_irr_d = jnp.asarray(self.q_irr.astype(np.float32))
        q_depth_d = jnp.asarray(self.q_depth)
        grid_node_d = jnp.asarray(tables["grid_node"])
        leaf_node_d = jnp.asarray(tables["leaf_node"])
        leaf_cdf_d = jnp.asarray(tables["leaf_cdf"])
        leaf_lo_d = jnp.asarray(tables["leaf_lo"])
        leaf_depth_d = jnp.asarray(tables["leaf_depth"])
        root_leaf_off_d = jnp.asarray(tables["root_leaf_off"])
        if derive:
            qc_flat_d = jnp.asarray(
                np.ascontiguousarray(self.q_child).reshape(-1)
            )
            big = _derive_device_tables(
                qc_flat_d, q_irr_d, q_depth_d, grid_node_d, leaf_cdf_d,
                leaf_node_d, leaf_lo_d, leaf_depth_d, root_leaf_off_d,
                slot_row_d, jnp.int32(fast2["n_slots"]),
                sub_cap=fast2["sub_cap"], sub_l=SUB_L,
                want_leaf_geom=not slim,
            )
        else:
            big = {
                k: jnp.asarray(fast2[k])
                for k in ("q_pack", "leaf_geom", "leaf_geomp", "grid_v",
                          "grid_g", "sub_v", "sub_g")
            }
        # slim production mirror (HBM diet, round-4 verdict item 2): every
        # table below is consumed ONLY by the descent oracles / hemisphere
        # oracle / legacy fast paths / device-derive inputs — the
        # production trace+splat run entirely on kd_grid_f / slot_row /
        # hemi / alias_ab / leaf_geomp / grid_v/g / sub_v/g / q_pack /
        # kd_slot_dev / accumulators. Dropping them saves ~1.3 GB at a
        # 16.7M-node kd-C=2000 veach-ajar tree (q_child 268 MB, leaf_geom
        # 335 MB, leaf_lo 134 MB, grid_node 134 MB, ...). Gated to BIG
        # trees so tests/oracles on small trees are untouched;
        # PPG_SLIM_MIRROR=0/1 forces it off/on.
        keep_depth = (not slim) or knobs.get("PPG_SPLAT_FILTER") == "dir"
        root_slot_np = tables["root_slot"]
        kd_slot_np = np.where(
            self.kd_quad_root >= 0,
            root_slot_np[np.maximum(self.kd_quad_root, 0)],
            -1,
        ).astype(np.int32)
        return SDTreeDevice(
            kd_axis=jnp.asarray(self.kd_axis),
            kd_split=jnp.asarray(self.kd_split),
            kd_left=jnp.asarray(self.kd_left),
            kd_leaf=jnp.asarray(self.kd_leaf),
            kd_quad_root=jnp.asarray(self.kd_quad_root),
            q_child=None if slim else q_child_d,
            q_irr=None if slim else q_irr_d,
            q_depth_dev=q_depth_d if keep_depth else None,
            kd_vert_acc=jnp.zeros(self.kd_capacity, jnp.float32),
            q_irr_acc=jnp.zeros(self.quad_capacity, jnp.float32),
            bbox_lo=jnp.asarray(self.bbox_lo, jnp.float32),
            bbox_inv_size=jnp.asarray(1.0 / size, jnp.float32),
            root_slot=None if slim else jnp.asarray(root_slot_np),
            grid_node=None if slim else grid_node_d,
            leaf_node=None if slim else leaf_node_d,
            leaf_cdf=None if slim else leaf_cdf_d,
            leaf_lo=None if slim else leaf_lo_d,
            leaf_depth=None if slim else leaf_depth_d,
            root_leaf_off=root_leaf_off_d,
            root_leaf_cnt=jnp.asarray(tables["root_leaf_cnt"]),
            kd_grid2=None if slim else kd_grid2_d,
            slot_row=slot_row_d,
            hemi_tab=hemi_d,
            hemi_flat=hemi_d.reshape(-1),
            kd_grid_f=kd_grid_f,
            alias_ab=jnp.asarray(fast2["alias_ab"]),
            leaf_geomp=big["leaf_geomp"],
            leaf_geom=None if slim else big.get("leaf_geom"),
            grid_v=big["grid_v"],
            grid_g=big["grid_g"],
            sub_v=big["sub_v"],
            sub_g=big["sub_g"],
            q_pack=big["q_pack"],
            kd_ext=jnp.asarray(fast2["kd_ext"]),
            kd_slot_dev=jnp.asarray(kd_slot_np),
            kd_max_depth=self.kd_max_depth,
            quad_max_depth=self.quad_max_depth,
            grid_l=GRID_L,
            sub_l=SUB_L,
            kd_grid_bits=fast2["kd_grid_bits"],
            store_nee=bool(self.store_nee),
        )

    @property
    def max_roots(self) -> int:
        return self.kd_capacity // 2 + 2

    @property
    def slot_capacity(self) -> int:
        """Coarsely-quantized capacity for slot-indexed device tables.

        Sizing them at ``max_roots`` (kd CAPACITY) made the per-(slot,
        cell) pdf grid a 134 MB table of which only the first ~n_slots*64
        rows were ever touched — and gathers over huge tables are
        HBM-latency-bound. But TIGHT pow2 sizing changed the table shapes
        after almost every refine, and each new shape recompiles the
        fused bounce + splat programs (~80-90 s each on the remote
        backend — measured 6x ~90 s per full-res training run, more wall
        than all the passes). The tier ladder {64, 2048, 8192, x4...}
        keeps tests/tiny scenes small while a full-res veach-ajar run
        sees at most two shapes (iters 0-3 at 2048, 4+ at 8192)."""
        live = self.kd_leaf[: self.kd_count] & (
            self.kd_quad_root[: self.kd_count] >= 0
        )
        n = int(np.asarray(live).sum()) + 1
        cap = 64
        if n > cap:
            cap = 2048
        while cap < n:
            # x4 up to 8192 (few shapes for small scenes), then x2: the
            # grid tables scale with this tier (rows x 4096 cells), and
            # the 32768 -> 131072 x4 jump at a 78.9k-leaf kd-C=2000 tree
            # put a 4.3 GB grid_pl + a 20 G derive plan on a 15.75 G chip
            cap *= 4 if cap < 8192 else 2
        return min(cap, self.max_roots)

    def _build_lookup_tables(self):
        """Flattened leaf-CDF + point-location grid (see fast paths below).
        Native C++ when available; numpy/python reference otherwise."""
        from . import native

        t = native.build_lookup(self, GRID_L, self.slot_capacity)
        if t is not None:
            return t
        # --- python fallback (reference implementation) ---
        res = 1 << GRID_L
        cells = res * res
        max_roots = self.slot_capacity
        root_slot = np.full(self.quad_capacity, -1, np.int32)
        grid_node = np.zeros((max_roots, cells), np.int32)
        leaf_node = np.zeros(self.quad_capacity, np.int32)
        leaf_cdf = np.ones(self.quad_capacity, np.float32)
        leaf_lo = np.zeros((self.quad_capacity, 2), np.float32)
        leaf_depth = np.zeros(self.quad_capacity, np.int32)
        root_leaf_off = np.zeros(max_roots, np.int32)
        root_leaf_cnt = np.zeros(max_roots, np.int32)
        slot = 0
        pos = 0
        for i in range(self.kd_count):
            if not self.kd_leaf[i]:
                continue
            root = int(self.kd_quad_root[i])
            if root < 0 or root_slot[root] >= 0:
                continue
            root_slot[root] = slot
            root_leaf_off[slot] = pos
            root_irr = self.q_irr[root]
            acc = 0.0
            cnt = 0
            stack = [(root, 0.0, 0.0, 1.0, 0)]
            while stack:
                node, lx, ly, sz, d = stack.pop()
                c = self.q_child[node]
                is_leaf = c[0] < 0
                # stamp only nodes covering >= 1 full cell (deeper leaves
                # would clobber their cell's covering ancestor)
                if (is_leaf and d <= GRID_L) or d == GRID_L:
                    x0 = int(round(lx * res))
                    y0 = int(round(ly * res))
                    span = 1 if d >= GRID_L else res >> d
                    grid_node[slot,
                              [yy * res + xx
                               for yy in range(y0, min(y0 + span, res))
                               for xx in range(x0, min(x0 + span, res))]] = node
                if is_leaf:
                    acc += self.q_irr[node] / root_irr if root_irr > 0 else 0.0
                    leaf_node[pos] = node
                    leaf_cdf[pos] = acc
                    leaf_lo[pos] = (lx, ly)
                    leaf_depth[pos] = d
                    pos += 1
                    cnt += 1
                    continue
                h = sz * 0.5
                mx, my = lx + h, ly + h
                stack.append((int(c[0]), mx, my, h, d + 1))
                stack.append((int(c[1]), lx, my, h, d + 1))
                stack.append((int(c[2]), lx, ly, h, d + 1))
                stack.append((int(c[3]), mx, ly, h, d + 1))
            if cnt:
                leaf_cdf[pos - 1] = 1.0
            root_leaf_cnt[slot] = cnt
            slot += 1
        return dict(
            root_slot=root_slot, grid_node=grid_node, leaf_node=leaf_node,
            leaf_cdf=leaf_cdf, leaf_lo=leaf_lo, leaf_depth=leaf_depth,
            root_leaf_off=root_leaf_off, root_leaf_cnt=root_leaf_cnt,
        )

    def absorb_accumulators(self, dev: SDTreeDevice):
        """Pull leaf accumulators from device and propagate sums bottom-up
        (equivalent to the reference's on-path splatting)."""
        from . import native

        kd_acc = np.ascontiguousarray(np.asarray(dev.kd_vert_acc, np.float64))
        q_acc = np.ascontiguousarray(np.asarray(dev.q_irr_acc, np.float64))
        kd = native.kd_propagate(kd_acc, self.kd_left, self.kd_count)
        qd = native.quad_propagate(q_acc, self.q_child, self.q_count)
        self.kd_vert += kd if kd is not None else self._kd_propagate(kd_acc)
        self.q_irr += qd if qd is not None else self._quad_propagate(q_acc)

    def _kd_propagate(self, leaf_vals):
        out = leaf_vals.copy()
        # children always have larger indices -> reverse sweep
        for i in range(self.kd_count - 1, -1, -1):
            l = self.kd_left[i]
            if l >= 0:
                out[i] += out[l] + out[l + 1]
        return out

    def _quad_propagate(self, leaf_vals):
        out = leaf_vals.copy()
        for i in range(self.q_count - 1, -1, -1):
            c = self.q_child[i]
            if c[0] >= 0:
                out[i] += out[c].sum()
        return out

    # ------------------------------------------------------------------ #
    # refinement (reference semantics)
    # ------------------------------------------------------------------ #

    def set_refinement_threshold(self, iteration: int):
        """maxLeafSize = c * sqrt(2^k) (reference kdtree.py:327-330).

        c defaults to the reference's 12000 but is overridable via
        PPG_KD_SPLIT_C: the constant is RESOLUTION-ABSOLUTE (record count
        scales with image pixels x spp), so low-res runs starve the
        spatial tree and high-res runs may benefit from a finer one —
        the knob makes the threshold experimentable without forking
        semantics (round-2 verdict item 4)."""
        import os

        c = knobs.get_float("PPG_KD_SPLIT_C")
        self.kd_threshold = c * np.sqrt(2.0**iteration)

    def refine(self):
        """Refine with automatic capacity growth: split/merge can need more
        node slots than preallocated (the reference grows its Dr.Jit arrays
        on demand, common.py:161-189); on overflow we restore the pre-refine
        state, double the overflowing pool, and retry."""
        import time as _time
        import os as _os

        if knobs.get_bool("PPG_DEBUG_REFINE"):
            _p = f"/tmp/refine_dump_kd{self.kd_count}_q{self.q_count}.npz"
            np.savez_compressed(
                _p,
                kd_left=self.kd_left, kd_leaf=self.kd_leaf,
                kd_depth=self.kd_depth, kd_vert=self.kd_vert,
                kd_quad_root=self.kd_quad_root, kd_count=self.kd_count,
                q_child=self.q_child, q_irr=self.q_irr,
                q_depth=self.q_depth, q_count=self.q_count,
                kd_threshold=self.kd_threshold,
            )
            print(f"[debug] pre-refine state -> {_p}", flush=True)

        t0 = _time.perf_counter()
        for _ in range(8):  # up to 256x growth
            snap = self._snapshot_mutable()
            try:
                from . import native

                if native.refine(self):  # C++ engine; Python is the reference
                    self.last_refine_seconds = _time.perf_counter() - t0
                    return
                if self.q_count > 50_000:
                    import sys

                    print(
                        "WARNING: SD-tree refinement running on the Python "
                        f"fallback with {self.q_count} quad nodes — expect "
                        "minutes (C++ engine failed to load; see earlier "
                        "warning).",
                        file=sys.stderr,
                        flush=True,
                    )
                self._kd_refine()
                self._quad_refine()
                self._compact_quad()
                self.last_refine_seconds = _time.perf_counter() - t0
                return
            except RuntimeError as e:
                self._restore_mutable(snap)
                if "quad capacity" in str(e):
                    self._grow_quad()
                elif "kd capacity" in str(e):
                    self._grow_kd()
                else:
                    raise
        raise RuntimeError("SD-tree refinement exceeded growth limit")

    _MUTABLE = (
        "kd_axis", "kd_split", "kd_left", "kd_leaf", "kd_depth", "kd_vert",
        "kd_quad_root", "q_child", "q_irr", "q_depth", "q_threshold",
    )

    def _snapshot_mutable(self):
        s = {k: getattr(self, k).copy() for k in self._MUTABLE}
        s["kd_count"] = self.kd_count
        s["q_count"] = self.q_count
        return s

    def _restore_mutable(self, s):
        for k in self._MUTABLE:
            setattr(self, k, s[k])
        self.kd_count = s["kd_count"]
        self.q_count = s["q_count"]

    def _grow_quad(self):
        old = self.quad_capacity
        self.quad_capacity = old * 2
        print(f"[sdtree] quad pool grown {old} -> {self.quad_capacity}", flush=True)
        grow = lambda a, fill: np.concatenate(
            [a, np.full((old,) + a.shape[1:], fill, a.dtype)]
        )
        self.q_child = grow(self.q_child, -1)
        self.q_irr = grow(self.q_irr, 0)
        self.q_depth = grow(self.q_depth, 0)
        self.q_threshold = grow(self.q_threshold, 0)

    def _grow_kd(self):
        old = self.kd_capacity
        self.kd_capacity = old * 2
        print(f"[sdtree] kd pool grown {old} -> {self.kd_capacity}", flush=True)
        grow = lambda a, fill: np.concatenate(
            [a, np.full((old,) + a.shape[1:], fill, a.dtype)]
        )
        self.kd_axis = grow(self.kd_axis, 0)
        self.kd_split = grow(self.kd_split, 0.5)
        self.kd_left = grow(self.kd_left, -1)
        self.kd_leaf = grow(self.kd_leaf, False)
        self.kd_depth = grow(self.kd_depth, 0)
        self.kd_vert = grow(self.kd_vert, 0)
        self.kd_quad_root = grow(self.kd_quad_root, -1)

    def _kd_split_node(self, i):
        if self.kd_count + 2 > self.kd_capacity:
            raise RuntimeError("kd capacity exceeded; raise kd_capacity")
        l = self.kd_count
        self.kd_count += 2
        axis = self.kd_depth[i] % 3  # reference kdtree.py:277
        self.kd_left[i] = l
        self.kd_leaf[i] = False
        self.kd_axis[i] = axis
        # midpoint split in normalized coords: each kd node's extent along
        # its axis halves per level along that axis
        for c, ci in ((0, l), (1, l + 1)):
            self.kd_leaf[ci] = True
            self.kd_left[ci] = -1
            self.kd_depth[ci] = self.kd_depth[i] + 1
            self.kd_vert[ci] = self.kd_vert[i] / 2.0  # kdtree.py:261-263
            self.kd_quad_root[ci] = -1
        # children split positions are set lazily when they split; store
        # node bboxes implicitly via (depth, path) — we track explicit bboxes:
        # handled by _kd_recompute_geometry below.

    def _kd_refine(self):
        """Iterated split while vertCount > threshold and depth < maxDepth
        (kdtree.py:333-358). Left child inherits the quadtree; right child
        gets a deep copy (kdtree.py:310-323)."""
        self._kd_recompute_geometry()
        work = [i for i in range(self.kd_count) if self.kd_leaf[i]]
        while work:
            nxt = []
            for i in work:
                if (
                    self.kd_leaf[i]
                    and self.kd_vert[i] > self.kd_threshold * self.max_leaf_size
                    and self.kd_depth[i] < self.kd_max_depth
                ):
                    root = self.kd_quad_root[i]
                    self._kd_split_node(i)
                    l = self.kd_left[i]
                    self.kd_quad_root[l] = root
                    self.kd_quad_root[i] = -1  # internal nodes own no tree
                    self.kd_quad_root[l + 1] = self._quad_deep_copy(root)
                    nxt += [l, l + 1]
            work = nxt
        self._kd_recompute_geometry()

    def _kd_recompute_geometry(self):
        """Set kd_split of internal nodes from implied bboxes (midpoint
        splits on axis = depth % 3, kdtree.py:266-304)."""
        lo = np.zeros((self.kd_count, 3))
        hi = np.ones((self.kd_count, 3))
        # BFS from root computing child bboxes
        for i in range(self.kd_count):
            l = self.kd_left[i]
            if l < 0:
                continue
            axis = self.kd_depth[i] % 3
            self.kd_axis[i] = axis
            mid = 0.5 * (lo[i, axis] + hi[i, axis])
            self.kd_split[i] = mid
            lo[l] = lo[i]
            hi[l] = hi[i]
            hi[l, axis] = mid
            lo[l + 1] = lo[i]
            lo[l + 1, axis] = mid
            hi[l + 1] = hi[i]
        self._kd_lo, self._kd_hi = lo, hi

    def _quad_alloc(self, n):
        if self.q_count + n > self.quad_capacity:
            raise RuntimeError("quad capacity exceeded; raise quad_capacity")
        base = self.q_count
        self.q_count += n
        return base

    def _quad_deep_copy(self, root) -> int:
        """Copy a whole quadtree (kd right-child split, kdtree.py:310-323 via
        quadtree copyTree/appendQuadTreeNode)."""
        if root < 0:
            return -1
        # iterative BFS copy
        new_root = self._quad_alloc(1)
        self.q_child[new_root] = -1
        self.q_irr[new_root] = self.q_irr[root]
        self.q_depth[new_root] = 0
        self.q_threshold[new_root] = self.q_threshold[root]
        stack = [(root, new_root)]
        while stack:
            src, dst = stack.pop()
            if self.q_child[src, 0] < 0:
                continue
            base = self._quad_alloc(4)
            for c in range(4):
                sc = self.q_child[src, c]
                dc = base + c
                self.q_child[dst, c] = dc
                self.q_child[dc] = -1
                self.q_irr[dc] = self.q_irr[sc]
                self.q_depth[dc] = self.q_depth[dst] + 1
                self.q_threshold[dc] = self.q_threshold[sc]
                stack.append((sc, dc))
        return new_root

    def _quad_refine(self):
        """Per root: threshold = total flux * 1% pushed to all nodes
        (quadtree.py:512-560); BFS merge pass (internal node irradiance <
        threshold -> merge, :574-611) then iterated split pass (leaf
        irradiance > threshold and depth < maxDepth, :617-637).
        Irradiance of new children = parent / 4 (:134)."""
        roots = np.unique(self.kd_quad_root[: self.kd_count][self.kd_leaf[: self.kd_count]])
        roots = roots[roots >= 0]
        for root in roots:
            thresh = self.q_irr[root] * QUAD_FLUX_FRACTION
            # merge pass (BFS)
            stack = [int(root)]
            while stack:
                i = stack.pop()
                if self.q_child[i, 0] < 0:
                    continue
                if self.q_irr[i] < thresh and i != root:
                    self._quad_merge(i)
                else:
                    stack += [int(c) for c in self.q_child[i]]
            # split pass (iterate until stable)
            stack = [int(root)]
            while stack:
                i = stack.pop()
                if self.q_child[i, 0] >= 0:
                    stack += [int(c) for c in self.q_child[i]]
                    continue
                if self.q_irr[i] > thresh and self.q_depth[i] < self.quad_max_depth:
                    base = self._quad_alloc(4)
                    self.q_child[i] = base + np.arange(4)
                    for c in range(4):
                        ci = base + c
                        self.q_child[ci] = -1
                        self.q_irr[ci] = self.q_irr[i] / 4.0
                        self.q_depth[ci] = self.q_depth[i] + 1
                        self.q_threshold[ci] = thresh
                        stack.append(ci)
            self.q_threshold[root] = thresh

    def _quad_merge(self, i):
        """Collapse node i's subtree into a leaf (quadtree.py:194-213)."""
        self.q_child[i] = -1

    def _compact_quad(self):
        """Drop unreachable quad nodes (clearTreeUnusedNode,
        quadtree.py:844-851) and renumber depth-first."""
        roots = self.kd_quad_root[: self.kd_count]
        live_roots = [
            int(r)
            for r, leaf in zip(roots, self.kd_leaf[: self.kd_count])
            if leaf and r >= 0
        ]
        remap = {}
        new_child = np.full((self.quad_capacity, 4), -1, np.int32)
        new_irr = np.zeros(self.quad_capacity, np.float64)
        new_depth = np.zeros(self.quad_capacity, np.int32)
        new_thresh = np.zeros(self.quad_capacity, np.float32)
        count = 0
        for root in live_roots:
            if root in remap:
                continue
            stack = [int(root)]
            remap[root] = count
            count += 1
            while stack:
                i = stack.pop()
                ni = remap[i]
                new_irr[ni] = self.q_irr[i]
                new_depth[ni] = self.q_depth[i]
                new_thresh[ni] = self.q_threshold[i]
                if self.q_child[i, 0] >= 0:
                    for c in range(4):
                        ci = int(self.q_child[i, c])
                        remap[ci] = count
                        new_child[ni, c] = count
                        count += 1
                        stack.append(ci)
        self.q_child = new_child
        self.q_irr = new_irr
        self.q_depth = new_depth
        self.q_threshold = new_thresh
        self.q_count = max(count, 1)
        for i in range(self.kd_count):
            r = self.kd_quad_root[i]
            if r >= 0 and r in remap:
                self.kd_quad_root[i] = remap[r]

    # ------------------------------------------------------------------ #
    # iteration plumbing
    # ------------------------------------------------------------------ #

    def validate(self):
        """Structural invariant checks, the always-available analog of the
        reference's validateTreeNodeBBox (kdtree.py:361-398,
        quadtree.py:468-509): every live quadtree is acyclic, disjoint
        between roots, children are in-range, and node sums conserve."""
        nk, nq = self.kd_count, self.q_count
        owner = {}
        for i in range(nk):
            if not self.kd_leaf[i]:
                l = self.kd_left[i]
                assert 0 < l < nk and l + 1 < nk, f"kd child out of range at {i}"
                continue
            root = int(self.kd_quad_root[i])
            if root < 0:
                continue
            stack = [root]
            while stack:
                n = stack.pop()
                assert 0 <= n < nq, f"quad node {n} out of range"
                assert n not in owner or owner[n] == i, (
                    f"quad node {n} shared between kd leaves {owner[n]} and {i}"
                )
                owner[n] = i
                c = self.q_child[n]
                if c[0] >= 0:
                    assert (c >= 0).all() and (c < nq).all()
                    s = self.q_irr[c].sum()
                    assert abs(s - self.q_irr[n]) <= 1e-3 * max(
                        self.q_irr[n], 1e-9
                    ) + 1e-9, f"conservation violated at quad node {n}"
                    stack += [int(x) for x in c]
        return True

    def copy(self) -> "SDTree":
        import copy as _copy

        t = _copy.copy(self)
        for k, v in list(t.__dict__.items()):
            if isinstance(v, np.ndarray):
                setattr(t, k, v.copy())
        return t

    def reset_counters(self):
        """Zero vertCount and irradiance, keep structure
        (kdtree.py:401-432, quadtree.py:640-683)."""
        self.kd_vert[:] = 0.0
        self.q_irr[:] = 0.0

    # ------------------------------------------------------------------ #
    # serialization — the reference's 23-key npz schema (kdtree.py:575-602)
    # ------------------------------------------------------------------ #

    def save(self, path):
        nk, nq = self.kd_count, self.q_count
        self._kd_recompute_geometry()
        size = self.bbox_hi - self.bbox_lo
        kd_lo = self._kd_lo[:nk] * size + self.bbox_lo
        kd_hi = self._kd_hi[:nk] * size + self.bbox_lo
        q_lo, q_hi = self._quad_bboxes()
        # Reference indirection (kdtree.py:556, quadtree rootNodeIndex):
        # kd leaves store a SLOT into quadtree_rootNodeIndex; the table maps
        # slots -> quad node ids.
        roots = []
        slot_of = {}
        kd_root_slots = np.zeros(nk, np.uint32)
        for i in range(nk):
            r = int(self.kd_quad_root[i])
            if r < 0:
                continue
            if r not in slot_of:
                slot_of[r] = len(roots)
                roots.append(r)
            kd_root_slots[i] = slot_of[r]
        roots = np.asarray(roots if roots else [0], np.uint32)
        np.savez_compressed(
            path,
            kdtree_maxLeafSize=self.max_leaf_size,
            kdtree_maxDepth=self.kd_max_depth,
            kdtree_bbox_min=kd_lo.astype(np.float32),
            kdtree_bbox_max=kd_hi.astype(np.float32),
            kdtree_depth=self.kd_depth[:nk].astype(np.uint32),
            kdtree_vertCount=self.kd_vert[:nk].astype(np.float32),
            kdtree_isLeaf=self.kd_leaf[:nk],
            kdtree_quadTreeRootIndex=kd_root_slots,
            kdtree_child_left_index=np.maximum(self.kd_left[:nk], 0).astype(np.uint32),
            kdtree_child_right_index=np.maximum(
                np.where(self.kd_left[:nk] >= 0, self.kd_left[:nk] + 1, 0), 0
            ).astype(np.uint32),
            quadtree_maxDepth=self.quad_max_depth,
            quadtree_isStoreNEERadiance=self.store_nee,
            quadtree_rootNodeIndex=roots,
            quadtree_bbox_min=q_lo.astype(np.float32),
            quadtree_bbox_max=q_hi.astype(np.float32),
            quadtree_depth=self.q_depth[:nq].astype(np.uint32),
            quadtree_irradiance=self.q_irr[:nq].astype(np.float32),
            quadtree_isLeaf=self.q_child[:nq, 0] < 0,
            quadtree_refinementThreshold=self.q_threshold[:nq],
            quadtree_child_1_index=np.maximum(self.q_child[:nq, 0], 0).astype(np.uint32),
            quadtree_child_2_index=np.maximum(self.q_child[:nq, 1], 0).astype(np.uint32),
            quadtree_child_3_index=np.maximum(self.q_child[:nq, 2], 0).astype(np.uint32),
            quadtree_child_4_index=np.maximum(self.q_child[:nq, 3], 0).astype(np.uint32),
        )

    def _quad_bboxes(self):
        lo = np.zeros((self.q_count, 2))
        hi = np.ones((self.q_count, 2))
        # quadrants: 0=(x>=m,y>=m) 1=(x<m,y>=m) 2=(x<m,y<m) 3=(x>=m,y<m)
        for i in range(self.q_count):
            c = self.q_child[i]
            if c[0] < 0:
                continue
            mid = 0.5 * (lo[i] + hi[i])
            for ci, (xlo, ylo) in zip(c, [(1, 1), (0, 1), (0, 0), (1, 0)]):
                lo[ci] = [mid[0] if xlo else lo[i][0], mid[1] if ylo else lo[i][1]]
                hi[ci] = [hi[i][0] if xlo else mid[0], hi[i][1] if ylo else mid[1]]
        return lo, hi

    @classmethod
    def load(cls, path, kd_capacity=1 << 15, quad_capacity=1 << 21) -> "SDTree":
        z = np.load(path)
        nk = len(z["kdtree_depth"])
        nq = len(z["quadtree_depth"])
        lo = z["kdtree_bbox_min"][0]
        hi = z["kdtree_bbox_max"][0]
        t = cls(
            lo,
            hi,
            kd_max_depth=int(z["kdtree_maxDepth"]),
            quad_max_depth=int(z["quadtree_maxDepth"]),
            kd_capacity=max(kd_capacity, nk),
            quad_capacity=max(quad_capacity, nq),
            store_nee=bool(z["quadtree_isStoreNEERadiance"]),
            max_leaf_size=float(z["kdtree_maxLeafSize"]),
        )
        t.kd_count = nk
        t.kd_leaf[:nk] = z["kdtree_isLeaf"]
        t.kd_depth[:nk] = z["kdtree_depth"]
        t.kd_vert[:nk] = z["kdtree_vertCount"]
        root_table = z["quadtree_rootNodeIndex"].astype(np.int32)
        slots = z["kdtree_quadTreeRootIndex"].astype(np.int32)
        t.kd_quad_root[:nk] = np.where(
            t.kd_leaf[:nk], root_table[np.clip(slots, 0, len(root_table) - 1)], -1
        )
        left = z["kdtree_child_left_index"].astype(np.int32)
        t.kd_left[:nk] = np.where(t.kd_leaf[:nk], -1, left)
        t.q_count = nq
        t.q_irr[:nq] = z["quadtree_irradiance"]
        t.q_depth[:nq] = z["quadtree_depth"]
        t.q_threshold[:nq] = z["quadtree_refinementThreshold"]
        qleaf = z["quadtree_isLeaf"]
        for c in range(4):
            ci = z[f"quadtree_child_{c+1}_index"].astype(np.int32)
            t.q_child[:nq, c] = np.where(qleaf, -1, ci)
        t._kd_recompute_geometry()
        return t

    # ------------------------------------------------------------------ #
    # OBJ export of kd leaf bboxes (kdtree.py:605-663)
    # ------------------------------------------------------------------ #

    def save_obj(self, path):
        self._kd_recompute_geometry()
        size = self.bbox_hi - self.bbox_lo
        lines = []
        verts = []
        for i in range(self.kd_count):
            if not self.kd_leaf[i]:
                continue
            lo = self._kd_lo[i] * size + self.bbox_lo
            hi = self._kd_hi[i] * size + self.bbox_lo
            base = len(verts)
            for zz in (lo[2], hi[2]):
                for yy in (lo[1], hi[1]):
                    for xx in (lo[0], hi[0]):
                        verts.append((xx, yy, zz))
            for a, b in [
                (0, 1), (1, 3), (3, 2), (2, 0),
                (4, 5), (5, 7), (7, 6), (6, 4),
                (0, 4), (1, 5), (2, 6), (3, 7),
            ]:
                lines.append((base + a + 1, base + b + 1))
        with open(path, "w") as f:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for a, b in lines:
                f.write(f"l {a} {b}\n")


# ===========================================================================
# Flattened-table fast paths (exactly the same distribution; the tables are
# rebuilt host-side each iteration — see native.build_lookup). Descent
# versions above remain the reference implementations (PPG_TPU_FAST_TREE=0).
# ===========================================================================

import os as _os

USE_FAST_TREE = knobs.get_bool("PPG_TPU_FAST_TREE")


def _locate_leaf_fast(tree: SDTreeDevice, root, xy):
    """Point location: 32x32 grid jump, then a short descent for leaves
    deeper than the grid."""
    res = 1 << tree.grid_l
    slot = tree.root_slot[root]
    cx = jnp.clip((xy[..., 0] * res).astype(jnp.int32), 0, res - 1)
    cy = jnp.clip((xy[..., 1] * res).astype(jnp.int32), 0, res - 1)
    node = tree.grid_node[jnp.maximum(slot, 0), cy * res + cx]

    def cond(carry):
        i, node = carry
        return (i < tree.quad_max_depth) & jnp.any(tree.q_child[node, 0] >= 0)

    def body(carry):
        i, node = carry
        leaf = tree.q_child[node, 0] < 0
        # the node containing xy at depth d has lo = floor(xy * 2^d) / 2^d
        d = tree.q_depth_dev[node]
        scale = jnp.exp2(d.astype(jnp.float32))
        mx = (jnp.floor(xy[..., 0] * scale) + 0.5) / scale
        my = (jnp.floor(xy[..., 1] * scale) + 0.5) / scale
        c = _quadrant(xy[..., 0], xy[..., 1], mx, my)
        nxt = tree.q_child[node, c]
        return i + 1, jnp.where(leaf, node, nxt)

    _, node = jax.lax.while_loop(cond, body, (jnp.int32(0), node))
    return node


def _pdf_at_leaf(tree: SDTreeDevice, root, leaf):
    """pdf = irr_leaf * 4^depth / (4 pi * irr_root); uniform (1/4pi) for
    zero-flux roots — identical to the ratio-product of the descent."""
    root_irr = tree.q_irr[root]
    irr = tree.q_irr[leaf]
    d = tree.q_depth_dev[leaf].astype(jnp.float32)
    pdf = irr * jnp.exp2(2.0 * d) * INV_FOUR_PI / jnp.maximum(root_irr, 1e-30)
    return jnp.where(root_irr > 0, pdf, INV_FOUR_PI)


def quad_leaf_lookup_fast(tree: SDTreeDevice, root, xy):
    return _locate_leaf_fast(tree, root, xy)


def quad_pdf_fast(tree: SDTreeDevice, root, xy):
    leaf = _locate_leaf_fast(tree, root, xy)
    pdf = _pdf_at_leaf(tree, root, leaf)
    return jnp.where(jnp.isfinite(pdf), pdf, 0.0)


def quad_sample_fast(tree: SDTreeDevice, root, u1, u2):
    """Leaf-CDF sampling: binary search over the tree's DFS leaf list."""
    slot = jnp.maximum(tree.root_slot[root], 0)
    off = tree.root_leaf_off[slot]
    cnt = tree.root_leaf_cnt[slot]

    # first index in [0, cnt) with leaf_cdf[off + i] > u1
    lo = jnp.zeros_like(off)
    hi = cnt

    def cond(carry):
        i, lo, hi = carry
        return (i < 24) & jnp.any(lo < hi)

    def body(carry):
        i, lo, hi = carry
        mid = (lo + hi) // 2
        v = tree.leaf_cdf[off + mid]
        gt = v > u1
        hi2 = jnp.where(gt, mid, hi)
        lo2 = jnp.where(gt, lo, mid + 1)
        keep = lo < hi
        return i + 1, jnp.where(keep, lo2, lo), jnp.where(keep, hi2, hi)

    _, idx, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), lo, hi))
    idx = jnp.clip(idx, 0, jnp.maximum(cnt - 1, 0))
    gidx = off + idx
    leaf = tree.leaf_node[gidx]
    cdf_hi = tree.leaf_cdf[gidx]
    cdf_lo = jnp.where(idx > 0, tree.leaf_cdf[jnp.maximum(gidx - 1, 0)], 0.0)
    p_leaf = jnp.maximum(cdf_hi - cdf_lo, 1e-12)
    u1r = jnp.clip((u1 - cdf_lo) / p_leaf, 0.0, 1.0 - 1e-7)
    d = tree.leaf_depth[gidx].astype(jnp.float32)
    size = jnp.exp2(-d)
    llo = tree.leaf_lo[gidx]
    xy = jnp.stack(
        [llo[..., 0] + size * u1r, llo[..., 1] + size * u2], axis=-1
    )
    pdf = _pdf_at_leaf(tree, root, leaf)

    # zero-flux root: uniform over the canonical square (matches the
    # descent's uniform fallback)
    root_irr = tree.q_irr[root]
    uni = root_irr <= 0
    xy = jnp.where(uni[..., None], jnp.stack([u1, u2], axis=-1), xy)
    xy = jnp.clip(xy, 0.0, 1.0 - 1e-7)
    pdf = jnp.where(uni, INV_FOUR_PI, pdf)
    return xy, pdf


def quad_leaf_lookup(tree, root, xy):
    if USE_FAST_TREE:
        return quad_leaf_lookup_fast(tree, root, xy)
    return quad_leaf_lookup_descent(tree, root, xy)


def quad_pdf(tree, root, xy):
    if USE_FAST_TREE:
        return quad_pdf_fast(tree, root, xy)
    return quad_pdf_descent(tree, root, xy)


def quad_sample(tree, root, u1, u2):
    if USE_FAST_TREE:
        return quad_sample_fast(tree, root, u1, u2)
    return quad_sample_descent(tree, root, u1, u2)


def _alias_python(leaf_cdf, n_slots, off, cnt):
    """Python Vose alias construction (reference for the C++ path)."""
    cap = len(leaf_cdf)
    prob = np.ones(cap, np.float32)
    other = np.zeros(cap, np.int32)
    for s in range(n_slots):
        o, c = int(off[s]), int(cnt[s])
        if c <= 0:
            continue
        seg = leaf_cdf[o : o + c].astype(np.float64)
        p = np.diff(np.concatenate([[0.0], seg])) * c
        other[o : o + c] = np.arange(c)
        small = [i for i in range(c) if p[i] < 1.0]
        large = [i for i in range(c) if p[i] >= 1.0]
        while small and large:
            si = small.pop()
            li = large.pop()
            prob[o + si] = p[si]
            other[o + si] = li
            p[li] = p[li] + p[si] - 1.0
            (small if p[li] < 1.0 else large).append(li)
    return prob, other


# ===========================================================================
# Gather-diet device paths: every op is 1-3 packed row gathers
# ===========================================================================


def _kd_grid_row(tree: SDTreeDevice, p, ok=None):
    """ONE narrow-row gather: (..., 8) [leaf_f, slot_f, srow(6)].

    Exact equivalent of the kd descent (midpoint splits on axis = depth%3)
    followed by the slot-row gather — merged into one instruction. ``ok``:
    lanes not needing the lookup (dead/missed, STALE positions) read row 0
    instead of issuing a random HBM access (the gather is latency-bound).
    """
    bx, by, bz = tree.kd_grid_bits
    x = (p - tree.bbox_lo) * tree.bbox_inv_size
    ix = jnp.clip((x[..., 0] * (1 << bx)).astype(jnp.int32), 0, (1 << bx) - 1)
    iy = jnp.clip((x[..., 1] * (1 << by)).astype(jnp.int32), 0, (1 << by) - 1)
    iz = jnp.clip((x[..., 2] * (1 << bz)).astype(jnp.int32), 0, (1 << bz) - 1)
    cell = (ix << (by + bz)) | (iy << bz) | iz
    if ok is not None:
        cell = jnp.where(ok, cell, 0)
    return tree.kd_grid_f[cell]


def kd_lookup_grid(tree: SDTreeDevice, p, ok=None):
    """Dense-grid point query -> (kd leaf index, root slot, slot_row) in
    ONE gather (the fused kd_grid_f row; ids exact as small-int floats)."""
    row = _kd_grid_row(tree, p, ok)
    kd_leaf = row[..., 0].astype(jnp.int32)
    slot = row[..., 1].astype(jnp.int32)
    return kd_leaf, slot, row[..., 2:8]


def hemisphere_flat(tree: SDTreeDevice, slot, n, ok=None):
    """Usable-hemisphere mass in ONE 1-D gather: the 27-direction code is
    computed from the shading normal FIRST, so only hemi_flat[slot*32 +
    code] is read (the old path gathered the whole 32-wide row).

    ``ok``: lanes that won't consume the mass (dead/missed) read index 0
    instead of a random HBM access — the gather is latency-bound, so
    pruned reads are direct wins (same convention as the other tree
    gathers)."""
    mx = jnp.max(jnp.abs(n), axis=-1, keepdims=True)
    q = jnp.where(
        jnp.abs(n) > 0.5 * jnp.maximum(mx, 1e-12), jnp.sign(n), 0.0
    ).astype(jnp.int32)
    code = (q[..., 0] + 1) + 3 * (q[..., 1] + 1) + 9 * (q[..., 2] + 1)
    gidx = jnp.maximum(slot, 0) * 32 + code
    if ok is not None:
        gidx = jnp.where(ok, gidx, 0)
    h = tree.hemi_flat[gidx]
    return jnp.where(slot >= 0, h, 0.5)


def _hemi_select(hrow, slot, n):
    """Hemisphere mass from a prefetched 32-wide hemi row (no gather)."""
    mx = jnp.max(jnp.abs(n), axis=-1, keepdims=True)
    q = jnp.where(
        jnp.abs(n) > 0.5 * jnp.maximum(mx, 1e-12), jnp.sign(n), 0.0
    ).astype(jnp.int32)
    code = (q[..., 0] + 1) + 3 * (q[..., 1] + 1) + 9 * (q[..., 2] + 1)
    io = jax.lax.broadcasted_iota(jnp.int32, hrow.shape, hrow.ndim - 1)
    h = jnp.sum(jnp.where(io == code[..., None], hrow, 0.0), axis=-1)
    return jnp.where(slot >= 0, h, 0.5)


def hemisphere_fast(tree: SDTreeDevice, slot, n):
    """1-row-gather hemisphere mass via the per-slot 27-direction table."""
    hrow = tree.hemi_tab[jnp.maximum(slot, 0)]  # (..., 32)
    return _hemi_select(hrow, slot, n)


def quad_sample_fast2(tree: SDTreeDevice, srow, u1, u2, ok=None):
    """Alias-table leaf sampling: ONE packed row gather, exact
    distribution — the 16-wide alias row carries both candidates' leaf
    geometry [lo_x, lo_y, size, pdf, node_f], where-selected in registers.

    ``ok``: lanes that won't use the sample (BSDF branch, delta lobes,
    dead lanes) read row 0 instead of a random HBM access.

    Returns (xy, pdf, leaf): the picked leaf's quad node id rides the geom
    row for free, so the splat never re-locates tree-sampled directions."""
    off = srow[..., 1].astype(jnp.int32)
    cnt = jnp.maximum(srow[..., 2].astype(jnp.int32), 1)
    root_irr = srow[..., 3]
    scaled = u1 * cnt.astype(jnp.float32)
    j = jnp.clip(scaled.astype(jnp.int32), 0, cnt - 1)
    v = jnp.clip(scaled - j.astype(jnp.float32), 0.0, 1.0 - 1e-7)
    aidx = off + j
    if ok is not None:
        aidx = jnp.where(ok, aidx, 0)
    ab = tree.alias_ab[aidx]              # W=2: [prob, other_glob_row]
    prob = ab[..., 0]
    take_self = v < prob
    vr = jnp.where(
        take_self,
        v / jnp.maximum(prob, 1e-12),
        (v - prob) / jnp.maximum(1.0 - prob, 1e-12),
    )
    vr = jnp.clip(vr, 0.0, 1.0 - 1e-7)
    cidx = jnp.where(take_self, aidx, ab[..., 1].astype(jnp.int32))
    if ok is not None:
        cidx = jnp.where(ok, cidx, 0)
    g4 = tree.leaf_geomp[cidx]            # W=4 packed chosen-leaf geometry
    w0 = jax.lax.bitcast_convert_type(g4[..., 0], jnp.uint32)
    w1 = jax.lax.bitcast_convert_type(g4[..., 1], jnp.uint32)
    lo_x = (w0 & np.uint32(0xFFFFF)).astype(jnp.float32) * np.float32(2.0 ** -20)
    lo_y = (w1 & np.uint32(0xFFFFF)).astype(jnp.float32) * np.float32(2.0 ** -20)
    size = jnp.exp2(-((w0 >> np.uint32(20)) & np.uint32(0x1F)).astype(jnp.float32))
    xy = jnp.stack([lo_x + size * vr, lo_y + size * u2], axis=-1)
    pdf = g4[..., 2]
    leaf = g4[..., 3].astype(jnp.int32)
    uni = root_irr <= 0
    xy = jnp.where(uni[..., None], jnp.stack([u1, u2], axis=-1), xy)
    pdf = jnp.where(uni, INV_FOUR_PI, pdf)
    leaf = jnp.where(uni, srow[..., 0].astype(jnp.int32), leaf)
    return jnp.clip(xy, 0.0, 1.0 - 1e-7), pdf, leaf


def _residual_quadrant(row, xy):
    """Child pick + per-level pdf ratio from a packed q_pack row."""
    d = row[..., 8]
    scale = jnp.exp2(d)
    mx = (jnp.floor(xy[..., 0] * scale) + 0.5) / scale
    my = (jnp.floor(xy[..., 1] * scale) + 0.5) / scale
    c = _quadrant(xy[..., 0], xy[..., 1], mx, my)
    cio = jax.lax.broadcasted_iota(jnp.int32, row[..., 0:4].shape, row.ndim - 1)
    selc = cio == c[..., None]
    child = jnp.sum(jnp.where(selc, row[..., 0:4], 0.0), axis=-1).astype(jnp.int32)
    irr_c = jnp.sum(jnp.where(selc, row[..., 4:8], 0.0), axis=-1)
    irr_n = row[..., 9]
    ratio = jnp.where(irr_n > 0, 4.0 * irr_c / jnp.maximum(irr_n, 1e-30), 1.0)
    is_leaf = row[..., 0] < 0
    return child, ratio, is_leaf


def _two_level_cells(tree: SDTreeDevice, xy):
    """Level-1 cell index + level-2 subcell index of canonical points."""
    res = 1 << tree.grid_l
    sres = 1 << tree.sub_l
    fx = xy[..., 0] * res
    fy = xy[..., 1] * res
    cx = jnp.clip(fx.astype(jnp.int32), 0, res - 1)
    cy = jnp.clip(fy.astype(jnp.int32), 0, res - 1)
    sx = jnp.clip(((fx - cx) * sres).astype(jnp.int32), 0, sres - 1)
    sy = jnp.clip(((fy - cy) * sres).astype(jnp.int32), 0, sres - 1)
    return cy * res + cx, sy * sres + sx


def _pair_taps(tv, tg, idx):
    """Fetch the [v, g] pair at row ``idx`` of the SPLIT pair tables
    (one 1-D tap each — see the grid_v/grid_g field comment)."""
    return tv[idx], tg[idx]


# Residual-descent tail compaction: lanes unresolved by the two-level
# grid (quad depth > grid_l+sub_l) are typically a small fraction, but
# the descent's per-step q_pack row gather runs at the FULL lane width —
# at late iterations (deep trees) that is several ~10 ms gathers per
# bounce for <1% of lanes. The tail therefore compacts the unresolved
# lanes into a fixed cap-row buffer (rank scatter + small gathers), runs
# the descent at cap width, and scatters the results back; a lax.cond
# falls back to the full-width descent when the cap overflows. Override
# for tests via _TAIL_CAP (None = min(max(M//8, 1024), M)).
_TAIL_CAP = None


def _tail_cap(m: int) -> int:
    """Compacted-tail capacity. Small: the deep-tree profile (round 5)
    measured the tail at 211 ms/pass of which ~90 ms was the compacted
    descent's gathers at the old m//8 cap (230k rows for ~700 needy
    lanes); at m//64 those shrink ~8x while the 64x headroom over
    observed need keeps the full-width fallback (measured 1.6 s/pass —
    gather issue cost does NOT drop for masked row-0 lanes at this
    scale) essentially unreachable. The rank scatter over m lanes is the
    remaining fixed cost."""
    if _TAIL_CAP is not None:
        return min(int(_TAIL_CAP), m)
    return min(max(m // 64, 8192), m)


def _compact_tail(need, m, cap, gather_arrays):
    """Rank-scatter the ``need`` lanes' ids into ``cap`` slots. Returns
    (idx (cap,) int32 with M = dropped padding, per-array compacted
    gathers, done flags for the compacted width)."""
    rank = jnp.cumsum(need.astype(jnp.int32)) - 1
    slot_of = jnp.where(need, rank, cap)  # non-needy -> OOB, dropped
    idx = jnp.full((cap,), m, jnp.int32).at[slot_of].set(
        jnp.arange(m, dtype=jnp.int32)
    )
    safe = jnp.minimum(idx, m - 1)
    comp = [a[safe] for a in gather_arrays]
    done_c = idx >= m  # padding slots start resolved
    return idx, comp, done_c


def quad_pdf_leaf_fast2(tree: SDTreeDevice, slot, srow, xy, ok=None):
    """Two-level-grid pdf + point location in ONE packed-row gather chain.

    The pdf of a direction IS the pdf of the leaf containing it, so both
    come from the same lookup: 1 two-wide gather resolves cells whose
    covering node at grid depth is a leaf, 1 more resolves to depth
    grid_l+sub_l via the subgrid pool; the packed-row residual descent for
    deeper leaves is lax.cond-skipped when no lane needs it. Returns
    (pdf, leaf node id) — the leaf id feeds splat capture (the splat never
    re-locates directions the trace already located)."""
    res = 1 << tree.grid_l
    sres = 1 << tree.sub_l
    cell, subcell = _two_level_cells(tree, xy)
    gidx = jnp.maximum(slot, 0) * (res * res) + cell
    if ok is not None:
        gidx = jnp.where(ok, gidx, 0)
    v, g = _pair_taps(tree.grid_v, tree.grid_g, gidx)
    done0 = g >= 0
    if ok is not None:
        done0 = done0 | ~ok   # masked lanes never take the residual tail
    sub_cap = tree.sub_g.shape[0] // (sres * sres)
    sub = jnp.clip((-g).astype(jnp.int32) - 1, 0, sub_cap - 1)
    sidx = sub * (sres * sres) + subcell
    # lanes resolved at level 1 (or masked) read row 0 — most cells
    # resolve at level 1, so this prunes most of the gather's HBM reads
    sidx = jnp.where(done0, 0, sidx)
    if ok is not None:
        sidx = jnp.where(ok, sidx, 0)
    v2, g2 = _pair_taps(tree.sub_v, tree.sub_g, sidx)
    done1 = done0 | (g2 >= 0)
    pdf01 = jnp.where(done0, jnp.maximum(v, 0.0), jnp.maximum(v2, 0.0))
    leaf01 = jnp.where(done0, g, jnp.maximum(g2, 0.0)).astype(jnp.int32)
    # depth grid_l+sub_l where ~done1; done lanes pinned to row 0 so the
    # full-width tail's q_pack gathers stay pruned (a done lane's -g2-1
    # can be junk-positive -> a random HBM read per masked lane)
    node0 = jnp.where(done1, 0, (-g2).astype(jnp.int32) - 1)
    root_irr = srow[..., 3]
    prefix_scale = jnp.exp2(
        2.0 * jnp.float32(tree.grid_l + tree.sub_l)
    ) * INV_FOUR_PI

    def _descend(xy_t, node_t, done_t):
        def cond(carry):
            i, node, mul, done = carry
            return (i < tree.quad_max_depth) & ~jnp.all(done)

        def body(carry):
            i, node, mul, done = carry
            row = tree.q_pack[jnp.maximum(node, 0)]
            child, ratio, is_leaf = _residual_quadrant(row, xy_t)
            adv = ~done & ~is_leaf
            mul2 = jnp.where(adv, mul * ratio, mul)
            node2 = jnp.where(adv, child, node)
            return i + 1, node2, mul2, done | is_leaf

        _, node, mul, _ = jax.lax.while_loop(
            cond, body,
            (
                jnp.int32(0), node_t,
                jnp.ones(xy_t.shape[:-1], jnp.float32), done_t,
            ),
        )
        return node, mul

    def tail_full(_):
        row0 = tree.q_pack[jnp.maximum(node0, 0)]
        prefix = row0[..., 9] * prefix_scale / jnp.maximum(root_irr, 1e-30)
        node, mul = _descend(xy, jnp.maximum(node0, 0), done1)
        return prefix * mul, node

    need = ~done1
    if xy.ndim == 2 and (cap := _tail_cap(xy.shape[0])) < xy.shape[0]:
        m = xy.shape[0]

        def tail_compact(_):
            idx, (xy_c, node0_c, rirr_c), done_c = _compact_tail(
                need, m, cap, (xy, node0, root_irr)
            )
            node0_c = jnp.maximum(node0_c, 0)
            row0 = tree.q_pack[node0_c]
            prefix_c = (
                row0[..., 9] * prefix_scale / jnp.maximum(rirr_c, 1e-30)
            )
            node_c, mul_c = _descend(xy_c, node0_c, done_c)
            pdf_c = prefix_c * mul_c
            # idx = M padding rows drop out of the scatters (OOB)
            return (
                jnp.zeros((m,), jnp.float32).at[idx].set(pdf_c),
                jnp.zeros((m,), jnp.int32).at[idx].set(node_c),
            )

        def tail(_):
            n_need = jnp.sum(need.astype(jnp.int32))
            return jax.lax.cond(n_need <= cap, tail_compact, tail_full, None)
    else:
        tail = tail_full

    pdf_tail, leaf_tail = jax.lax.cond(
        jnp.any(need),
        tail,
        lambda _: (
            jnp.zeros(xy.shape[:-1], jnp.float32),
            jnp.zeros_like(leaf01),
        ),
        None,
    )
    pdf = jnp.where(done1, pdf01, pdf_tail)
    leaf = jnp.where(done1, leaf01, leaf_tail)
    # zero-flux root: uniform pdf (leaf id stays structural)
    pdf = jnp.where(root_irr > 0, pdf, INV_FOUR_PI)
    return jnp.where(jnp.isfinite(pdf), pdf, 0.0), leaf


def quad_pdf_fast2(tree: SDTreeDevice, slot, srow, xy):
    """pdf-only view of :func:`quad_pdf_leaf_fast2`."""
    return quad_pdf_leaf_fast2(tree, slot, srow, xy)[0]


def quad_leaf_lookup_fast2(tree: SDTreeDevice, slot, xy):
    """Two-level-grid point location: 2 packed gathers resolve to depth
    grid_l+sub_l; the residual descent is lax.cond-skipped when unused."""
    res = 1 << tree.grid_l
    sres = 1 << tree.sub_l
    cell, subcell = _two_level_cells(tree, xy)
    # node-table taps only (the pdf column is not needed for point
    # location); runs at splat scale (up to 2*V ~ 24M lanes)
    g = tree.grid_g[jnp.maximum(slot, 0) * (res * res) + cell]
    done0 = g >= 0
    sub_cap = tree.sub_g.shape[0] // (sres * sres)
    sub = jnp.clip((-g).astype(jnp.int32) - 1, 0, sub_cap - 1)
    sidx = jnp.where(done0, 0, sub * (sres * sres) + subcell)
    n2 = tree.sub_g[sidx]
    done1 = done0 | (n2 >= 0)
    node01 = jnp.where(done0, g, jnp.maximum(n2, 0.0)).astype(jnp.int32)
    # internal at grid_l+sub_l; done lanes pinned to row 0 (see
    # quad_pdf_leaf_fast2 — keeps the full-width tail's gathers pruned)
    node0 = jnp.where(done1, 0, (-n2).astype(jnp.int32) - 1)

    def _descend(xy_t, node_t, done_t):
        def cond(carry):
            i, node, done = carry
            return (i < tree.quad_max_depth) & ~jnp.all(done)

        def body(carry):
            i, node, done = carry
            row = tree.q_pack[jnp.maximum(node, 0)]
            child, _, is_leaf = _residual_quadrant(row, xy_t)
            node2 = jnp.where(done | is_leaf, node, child)
            return i + 1, node2, done | is_leaf

        _, node, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), node_t, done_t)
        )
        return node

    def tail_full(_):
        return _descend(xy, jnp.maximum(node0, 0), done1)

    need = ~done1
    if xy.ndim == 2 and (cap := _tail_cap(xy.shape[0])) < xy.shape[0]:
        m = xy.shape[0]

        def tail_compact(_):
            idx, (xy_c, node0_c), done_c = _compact_tail(
                need, m, cap, (xy, node0)
            )
            node_c = _descend(xy_c, jnp.maximum(node0_c, 0), done_c)
            # idx = M padding rows drop out of the scatter (OOB)
            return jnp.zeros((m,), jnp.int32).at[idx].set(node_c)

        def tail(_):
            n_need = jnp.sum(need.astype(jnp.int32))
            return jax.lax.cond(n_need <= cap, tail_compact, tail_full, None)
    else:
        tail = tail_full

    node_tail = jax.lax.cond(
        jnp.any(need), tail, lambda _: jnp.zeros_like(node01), None
    )
    return jnp.where(done1, node01, node_tail)
