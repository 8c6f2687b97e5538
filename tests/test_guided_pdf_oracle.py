"""Frozen-tree Monte-Carlo oracles for the guided mixture pdf
(round-2 verdict item 4): the 5%-tolerance unbiasedness test can miss a
mildly wrong mixture pdf, so these verify, on a TRAINED and refined tree,

 (a) the quadtree directional pdf integrates to 1 over the sphere
     (uniform-canonical MC — the cylindrical equal-area map makes
     uniform [0,1]^2 samples uniform over the sphere), and
 (b) sampler/pdf consistency of the one-sample-MIS mixture: drawing wo
     from the ACTUAL mixture procedure (w.p. f BSDF, else tree;
     woPdf = f*bsdf_pdf + (1-f)*tree_pdf,
     path_guiding_integrator.py:283-311) gives
     E[tree_pdf(wo)/woPdf(wo)] = 1 and E[bsdf_pdf(wo)/woPdf(wo)] = 1 —
     any mismatch between what is sampled and what the pdf claims
     biases these away from 1.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from practical_path_guiding_lab_tpu import bsdf as bsdf_mod
from practical_path_guiding_lab_tpu.core.sphere_map import canonical_to_dir
from practical_path_guiding_lab_tpu.guiding import sdtree as sd


@pytest.fixture(scope="module")
def trained_tree(cornell_small):
    """Train 2 passes on cornell, refine -> a tree with real structure."""
    from practical_path_guiding_lab_tpu.render.guided import render_guided_pass
    from practical_path_guiding_lab_tpu.render.integrator import (
        PathGuidingIntegrator,
    )

    scene = cornell_small
    integ = PathGuidingIntegrator(scene)
    integ.setup(kd_capacity=1 << 10, quad_capacity=1 << 14)
    for p in range(2):
        _, _, _, _, tree_cur = render_guided_pass(
            scene, integ.dev_tree, integ.dev_tree, 11, p, iteration=1,
            is_final=False,
        )
        integ.dev_tree = tree_cur
    integ.setIteration(1, False)
    integ.refineAndPrepareSDTreeForNextIteration()
    return scene, integ.dev_tree


def _surface_point(scene, n):
    """A diffuse surface interaction tiled n times (the floor hit of the
    central camera ray)."""
    from practical_path_guiding_lab_tpu.accel.traverse import intersect
    from practical_path_guiding_lab_tpu.scene.camera import generate_rays

    ray = generate_rays(
        scene.camera, jnp.asarray([0.5, 0.52]), jnp.asarray([0.8, 0.8])
    )
    si = intersect(scene, ray.o, ray.d)
    assert bool(si.valid[0])
    return jax.tree.map(lambda a: jnp.repeat(a[0:1], n, axis=0), si)


@pytest.mark.slow
def test_tree_pdf_integrates_to_one(trained_tree):
    scene, tree = trained_tree
    n = 1 << 17
    rng = np.random.default_rng(5)
    si = _surface_point(scene, n)
    _, slot, srow = sd.kd_lookup_grid(tree, si.p)
    xy = jnp.asarray(rng.random((n, 2)), jnp.float32)
    pdf = np.asarray(sd.quad_pdf_fast2(tree, slot, srow, xy))
    integral = pdf.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.02, integral


@pytest.mark.slow
def test_mixture_sampler_pdf_consistency(trained_tree):
    scene, tree = trained_tree
    n = 1 << 17
    frac = 0.5
    rng = np.random.default_rng(9)
    si = _surface_point(scene, n)
    ctx = bsdf_mod.make_context(scene, si)

    u = jnp.asarray(rng.random((6, n)), jnp.float32)
    bs = bsdf_mod.sample(ctx, si.wi_world, u[0], u[1], u[2])
    _, slot, srow = sd.kd_lookup_grid(tree, si.p)
    t_xy, t_pdf_s, _leaf = sd.quad_sample_fast2(tree, srow, u[3], u[4])
    wo_tree = canonical_to_dir(t_xy)

    take_tree = (u[5] >= frac) & ~bs["delta"]
    wo = jnp.where(take_tree[:, None], wo_tree, bs["wo"])
    _, bsdf_pdf_tree = bsdf_mod.eval_pdf(ctx, si.wi_world, wo_tree)
    bsdf_pdf = jnp.where(take_tree, bsdf_pdf_tree, bs["pdf"])
    # tree pdf of the OTHER branch's direction via the production pdf path
    from practical_path_guiding_lab_tpu.core.sphere_map import dir_to_canonical

    tree_pdf_b = sd.quad_pdf_fast2(tree, slot, srow, dir_to_canonical(bs["wo"]))
    tree_pdf = jnp.where(take_tree, t_pdf_s, tree_pdf_b)

    wo_pdf = frac * bsdf_pdf + (1.0 - frac) * tree_pdf
    ok = np.asarray(wo_pdf) > 1e-9
    r_tree = np.where(ok, np.asarray(tree_pdf) / np.maximum(np.asarray(wo_pdf), 1e-30), 0.0)
    r_bsdf = np.where(ok, np.asarray(bsdf_pdf) / np.maximum(np.asarray(wo_pdf), 1e-30), 0.0)
    # E[tree_pdf/woPdf] = integral of tree_pdf = 1; same for bsdf_pdf
    assert abs(r_tree.mean() - 1.0) < 0.02, r_tree.mean()
    assert abs(r_bsdf.mean() - 1.0) < 0.02, r_bsdf.mean()

    # cross-check: the sampled-branch pdfs must agree with the pdf-query
    # path for the same directions (sampler internal consistency)
    t_pdf_query = np.asarray(
        sd.quad_pdf_fast2(tree, slot, srow, dir_to_canonical(wo_tree))
    )
    assert np.allclose(
        t_pdf_query, np.asarray(t_pdf_s), rtol=1e-3, atol=1e-5
    )
