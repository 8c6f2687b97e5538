"""Dump the compiled HLO of the guided trace program at DEEP-TREE shapes
(the bench_guided_deep workload) and name the hot ops from
tools/profile_deep_ops.py.

Usage: python tools/dump_deep_hlo.py [tree.npz]
"""
from __future__ import annotations

import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

from dump_guided_hlo import summarize


def main():
    tree_path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/repo/debug_r3b/kdc2500-blend/veach-ajar/tree-data/"
        "veach-ajar_iter-4.npz"
    )
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )
    from practical_path_guiding_lab_tpu.render import path_tracer as pt_mod

    desc = load_file(
        "/root/reference/scenes/veach-ajar/scene.xml", resx=1280, resy=720
    )
    scene = compile_scene(desc)
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    integ.loadSDTreeFromFile(tree_path)
    integ.setIteration(5, False)
    integ.render_pass(0, 1000)  # seed the plan
    n_total = scene.camera.width * scene.camera.height
    key = (pt_mod.scene_token(scene), n_total, "guided", True, True)
    sched = pt_mod.plan_for(key, n_total, scene.max_depth)
    print("schedule:", sched, flush=True)

    lowered = integ._jit_wave.lower(
        scene, integ.dev_tree, 0, 1001, 5, record=True, spp=1, schedule=sched,
    )
    txt = lowered.compile().as_text()
    summarize(
        txt, "/tmp/deep_trace_hlo.txt",
        wanted=["fusion.25", "fusion.26", "fusion.28", "fusion.29",
                "fusion.30", "fusion.31", "fusion.32", "fusion.33",
                "fusion.34", "fusion.62", "fusion.1461", "fusion.1389",
                "cond.11", "cond.266", "cond.640", "while.41", "sort.1",
                "fusion.23", "fusion.24", "fusion.27"],
    )


if __name__ == "__main__":
    main()
