"""Dump the compiled (optimized) HLO of the guided TRAIN pass programs —
trace (guided_wavefront_pass) and splat (process_and_splat) — at the real
iteration-3 shapes, so profiler fusion names (fusion.N) can be mapped to
their root ops and source lines.

The profile in tools/profile_guided_ops.py names where the time goes but
XLA's fusion.N labels are opaque; this tool retrieves the executable's
text (works through the axon remote-compile backend) and writes it to
/tmp/guided_trace_hlo.txt and /tmp/guided_splat_hlo.txt, then prints a
summary of every fusion >= min_bytes with its op_name metadata.

Usage: python tools/dump_guided_hlo.py
"""
from __future__ import annotations

import os
import re
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.simplefilter("ignore")

import jax


def summarize(txt, path, wanted=()):
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path} ({len(txt)/1e6:.1f} MB)")
    # map fusion name -> (op_name, source) from the call sites in ENTRY/
    # while bodies (the definition sites carry the metadata)
    pat = re.compile(
        r"%(fusion[.\w]*|[\w.]*fusion[.\w]*) = [^\n]*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:[^\n]*?source_file=\"([^\"]*)\")?(?:[^\n]*?source_line=(\d+))?"
    )
    rows = {}
    for m in pat.finditer(txt):
        name, op, sf, sl = m.group(1), m.group(2), m.group(3), m.group(4)
        rows.setdefault(name, (op, sf, sl))
    for w in wanted:
        if w in rows:
            op, sf, sl = rows[w]
            print(f"  {w:<28s} {op[:90]}  {sf}:{sl}")
        else:
            print(f"  {w:<28s} (not found)")
    return rows


def main():
    from practical_path_guiding_lab_tpu.scene import load_file
    from practical_path_guiding_lab_tpu.scene.scene import compile_scene
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )
    from practical_path_guiding_lab_tpu.render import path_tracer as pt_mod
    from practical_path_guiding_lab_tpu.render import guided as g

    desc = load_file(
        "/root/reference/scenes/veach-ajar/scene.xml", resx=1280, resy=720
    )
    scene = compile_scene(desc)
    integ = PathGuidingIntegrator(scene)
    integ.setup()
    spp = 0
    for iteration, passes in ((1, 4), (2, 8)):
        integ.setIteration(iteration, False)
        for _ in range(passes):
            integ.render_pass(0, spp)
            spp += 1
        integ.refineAndPrepareSDTreeForNextIteration()
    integ.setIteration(3, False)
    # run one pass to seed the cascade plan for this key, then grab the
    # planned schedule (the program the profiler actually times)
    integ.render_pass(0, spp)
    spp += 1
    n_total = scene.camera.width * scene.camera.height
    key = (pt_mod.scene_token(scene), n_total, "guided", True, True)
    sched = pt_mod.plan_for(key, n_total, scene.max_depth)
    print("schedule:", sched, flush=True)

    lowered = integ._jit_wave.lower(
        scene, integ.dev_tree, 0, spp, 3, record=True, spp=1, schedule=sched,
    )
    txt = lowered.compile().as_text()
    rows = summarize(
        txt, "/tmp/guided_trace_hlo.txt",
        wanted=[f"fusion.{i}" for i in range(1, 13)]
        + ["fusion.1299", "fusion.1295", "fusion.1310", "fusion.1315",
           "fusion.32", "fusion.40", "fusion.24", "fusion.36",
           "cond.625", "cond.634", "cond.610"],
    )

    # splat program at the sliced widths
    L, px, py, rays, recs, counts, ovf = integ._jit_wave(
        scene, integ.dev_tree, 0, spp, 3, record=True, spp=1, schedule=sched,
    )
    rw = pt_mod.schedule_row_widths(sched, n_total, scene.max_depth)
    lowered_s = g._splat_jit.lower(
        integ.dev_tree, recs, L, 0, spp, row_widths=rw
    )
    txt_s = lowered_s.compile().as_text()
    summarize(
        txt_s, "/tmp/guided_splat_hlo.txt",
        wanted=[f"fusion.{i}" for i in range(1, 12)],
    )


if __name__ == "__main__":
    main()
