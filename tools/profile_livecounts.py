"""Per-bounce live-lane counts on veach-ajar (1280x720) + stepped-vs-fused
pass timing — sizes the wavefront-shrink (cascade) win: XLA per-bounce work
runs at full static width, so sum(live_d)/(D*N) bounds the saving.

Usage: python tools/profile_livecounts.py
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


def main():
    from practical_path_guiding_lab_tpu.render import path_tracer as pt
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene

    scene = compile_scene(
        load_file("/root/reference/scenes/veach-ajar/scene.xml",
                  resx=1280, resy=720)
    )
    w, h = 1280, 720
    n = w * h
    lane_ids, px, py = jax.jit(pt._film_prologue)(scene, 0, 0)
    state = jax.jit(pt._init_state)(scene, px, py, lane_ids)
    step = jax.jit(pt._bounce_body)
    counts = []
    for depth in range(scene.max_depth):
        state = step(scene, 0, 0, state)
        counts.append(int(state["n_live"]))
    total = sum(counts)
    print("watermark n_live per bounce (lanes only die):")
    for d, c in enumerate(counts):
        print(f"  depth {d:2d}: {c:8d}  ({c/n*100:5.1f}%)")
    print(f"sum/D*N = {total/(len(counts)*n)*100:.1f}%  (upper bound on "
          f"XLA-portion saving: {(1 - total/(len(counts)*n))*100:.0f}%)")

    # NOTE: n_live is the WATERMARK (only updates when live halves);
    # true live counts come from summing active
    state = jax.jit(pt._init_state)(scene, px, py, lane_ids)
    true_counts = []
    for depth in range(scene.max_depth):
        state = step(scene, 0, 0, state)
        true_counts.append(int(jnp.sum(state["active"])))
    print("true live counts:")
    for d, c in enumerate(true_counts):
        print(f"  depth {d:2d}: {c:8d}  ({c/n*100:5.1f}%)")
    t = sum(true_counts)
    print(f"true sum/D*N = {t/(len(true_counts)*n)*100:.1f}%")


if __name__ == "__main__":
    main()
