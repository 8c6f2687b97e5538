"""SD-tree visualization — parity with the reference tree_plotter.py:
load a saved tree npz, query the kd leaf containing a world position, and
render its directional quadtree as an area-normalized irradiance heat map
over the canonical square (phi, cos theta), optionally across iterations.
"""
from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


class QuadTreePlotter:
    """Heat-map sampling of one quadtree (reference QuadTreePlotter,
    tree_plotter.py:16-151)."""

    def __init__(self, npz):
        self.child = np.stack(
            [npz[f"quadtree_child_{i}_index"].astype(np.int64) for i in range(1, 5)],
            axis=1,
        )
        self.is_leaf = npz["quadtree_isLeaf"]
        self.child[self.is_leaf] = -1
        self.irr = npz["quadtree_irradiance"].astype(np.float64)

    def sample_irradiance(self, root: int, res: int) -> np.ndarray:
        """(res, res) grid of leaf irradiance / leaf area (reference
        sampleIrradiance, tree_plotter.py:45-101)."""
        xs = (np.arange(res) + 0.5) / res
        img = np.zeros((res, res))
        for yi, y in enumerate(xs):
            for xi, x in enumerate(xs):
                node = root
                lo = np.array([0.0, 0.0])
                size = 1.0
                while self.child[node, 0] >= 0:
                    mid = lo + size / 2
                    right = x >= mid[0]
                    top = y >= mid[1]
                    c = 0 if (right and top) else 1 if top else 2 if not right else 3
                    node = self.child[node, c]
                    lo = np.array(
                        [mid[0] if right else lo[0], mid[1] if top else lo[1]]
                    )
                    size /= 2
                img[yi, xi] = self.irr[node] / (size * size)
        return img

    def plot(self, root: int, out_path, res: int = 128, title=None):
        img = self.sample_irradiance(root, res)
        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(
            img, origin="lower", extent=[0, 1, 0, 1], cmap="inferno"
        )
        ax.set_xlabel(r"$\phi / 2\pi$")
        ax.set_ylabel(r"$(\cos\theta + 1)/2$")
        ax.set_title(title or f"quadtree root {root}")
        fig.colorbar(im, ax=ax, label="irradiance / area")
        fig.tight_layout()
        fig.savefig(out_path, dpi=120)
        plt.close(fig)


class KDTreePlotter:
    """kd-leaf point query over a saved tree (reference KDTreePlotter,
    tree_plotter.py:154-231)."""

    def __init__(self, npz):
        self.lo = npz["kdtree_bbox_min"]
        self.hi = npz["kdtree_bbox_max"]
        self.is_leaf = npz["kdtree_isLeaf"]
        self.left = npz["kdtree_child_left_index"].astype(np.int64)
        self.right = npz["kdtree_child_right_index"].astype(np.int64)
        roots = npz["quadtree_rootNodeIndex"].astype(np.int64)
        slots = npz["kdtree_quadTreeRootIndex"].astype(np.int64)
        self.quad_root = roots[np.clip(slots, 0, len(roots) - 1)]

    def find_leaf(self, p) -> int:
        """Descend by bbox containment (reference findLeafNode,
        tree_plotter.py:173-213)."""
        node = 0
        p = np.asarray(p)
        while not self.is_leaf[node]:
            l, r = self.left[node], self.right[node]
            if np.all(p >= self.lo[l]) and np.all(p <= self.hi[l]):
                node = l
            else:
                node = r
        return node


class MultiIterationTreePlotter:
    """Plot the quadtree at one world position across training iterations
    (reference MultiIterationTreePlotter, tree_plotter.py:234-265)."""

    def __init__(self, tree_data_dir, scene_name):
        self.dir = Path(tree_data_dir)
        self.scene_name = scene_name

    def plot(self, position, out_dir, iterations=None, res=128):
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        files = sorted(self.dir.glob(f"{self.scene_name}_iter-*.npz"))
        for f in files:
            it = f.stem.split("-")[-1]
            if iterations is not None and int(it) not in iterations:
                continue
            npz = np.load(f)
            kd = KDTreePlotter(npz)
            leaf = kd.find_leaf(position)
            qt = QuadTreePlotter(npz)
            qt.plot(
                kd.quad_root[leaf],
                out_dir / f"quadtree_iter-{it}.png",
                res=res,
                title=f"iter {it} @ {np.round(position, 2)}",
            )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-dir", required=True)
    ap.add_argument("--scene", required=True)
    ap.add_argument("--pos", nargs=3, type=float, required=True)
    ap.add_argument("--out", default="tree-plots")
    args = ap.parse_args()
    MultiIterationTreePlotter(args.tree_dir, args.scene).plot(args.pos, args.out)
