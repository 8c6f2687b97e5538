"""Golden-image statistical oracles for the wider scene corpus
(SURVEY.md section 4.3): render small, compare brightness and structure
against the bundled Tungsten ground truths.

Thresholds are loose where the corpus itself is degraded (missing mesh
blobs: teapot bodies, veach-ajar pots) or where low-spp noise dominates
(glossy/caustic transport); cornell-box has the tight check
(tests/test_render.py). veach-mis exercises sphere emitters +
roughconductor + MIS; teapot (scene_v3, which matches the GT) exercises
envmap + plastic + checkerboard.
"""
import warnings

import numpy as np
import pytest

from practical_path_guiding_lab_tpu.io import exr
from practical_path_guiding_lab_tpu.render.integrator import PathTracingIntegrator
from practical_path_guiding_lab_tpu.scene import load_file
from practical_path_guiding_lab_tpu.scene.scene import compile_scene

SCENES = "/root/reference/scenes"
lum = lambda x: x @ np.array([0.212671, 0.71516, 0.072169])


def _rr_windows(reference_window, unbiased_window=(0.90, 1.08)):
    """Brightness windows are parameterized on the RR semantics (PPG_RR):
    the default 'reference' mode kills at q without the 1/q survivor
    reweight (exactly what the reference computes — its 1/q lands on a
    dead temporary, path_guiding_integrator.py:372-378), which darkens
    deep transport by ~5-10%. The reference-mode window's upper bound
    therefore INTENTIONALLY excludes 1.0; unbiased mode (PPG_RR=unbiased)
    gets a window around 1.0 instead.
    """
    from practical_path_guiding_lab_tpu.render.path_tracer import rr_mode

    return reference_window if rr_mode() == "reference" else unbiased_window


def _render(name, fn, rx, ry, spp):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        d = load_file(f"{SCENES}/{name}/{fn}", resx=rx, resy=ry)
        s = compile_scene(d)
    integ = PathTracingIntegrator(s)
    acc = None
    for p in range(spp):
        img, _ = integ.render_pass(0, p)
        acc = img if acc is None else acc + img
    img = np.asarray(acc) / spp
    gt = exr.read(f"{SCENES}/{name}/TungstenRender.exr")
    fy, fx = gt.shape[0] // ry, gt.shape[1] // rx
    gtd = gt.reshape(ry, fy, rx, fx, 3).mean(axis=(1, 3))
    return img, gtd


def _stats(img, gt):
    ratio = img.mean() / gt.mean()
    corr = np.corrcoef(
        lum(np.minimum(img, 20)).ravel(), lum(np.minimum(gt, 20)).ravel()
    )[0, 1]
    return ratio, corr


def test_veach_mis_golden():
    """Sphere area emitters + beckmann roughconductor + MIS.
    Measured 0.911 / 0.994 at 16 spp (reference-RR defaults); windows
    sized so a ~10%-off render fails."""
    img, gt = _render("veach-mis", "scene.xml", 160, 90, 16)
    ratio, corr = _stats(img, gt)
    lo, hi = _rr_windows((0.86, 0.97))
    assert lo < ratio < hi, f"brightness ratio {ratio}"
    assert corr > 0.98, f"correlation {corr}"


def test_teapot_v3_golden():
    """Envmap emitter + checkerboard texture (+plastic when meshes exist).
    scene_v3.xml is the variant the bundled GT was rendered from; its
    teapot meshes are unfetched blobs, so only brightness is checked."""
    img, gt = _render("teapot", "scene_v3.xml", 80, 45, 16)
    ratio, corr = _stats(img, gt)
    lo, hi = _rr_windows((0.84, 0.97))  # measured 0.902 (reference RR)
    assert lo < ratio < hi, f"brightness ratio {ratio}"


@pytest.mark.slow
def test_veach_bidir_golden():
    """OBJ meshes + dielectric + hard indirect (lamp) transport."""
    img, gt = _render("veach-bidir", "scene.xml", 64, 64, 16)
    ratio, corr = _stats(img, gt)
    # bidir's dominant transport ends before rr_depth, so RR bias is small
    lo, hi = _rr_windows((0.96, 1.11), (0.96, 1.13))  # measured 1.034
    assert lo < ratio < hi, f"brightness ratio {ratio}"
    assert corr > 0.87, f"correlation {corr}"  # measured 0.915


@pytest.mark.slow
def test_veach_ajar_golden():
    """Textured scene, ggx conductors, strong light through a door gap.
    (Pot meshes are unfetched blobs — both we and the reference render
    without them.)"""
    img, gt = _render("veach-ajar", "scene.xml", 80, 45, 16)
    ratio, corr = _stats(img, gt)
    lo, hi = _rr_windows((0.85, 0.97))  # measured 0.911 (reference RR)
    assert lo < ratio < hi, f"brightness ratio {ratio}"
    assert corr > 0.70, f"correlation {corr}"  # measured 0.756


@pytest.mark.slow
def test_torus_renders():
    """No GT EXR in the corpus (unfetched blob); smoke-check energy and
    NaN-freeness of the serialized-mesh + roughdielectric + directional
    emitter pipeline."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        d = load_file(f"{SCENES}/torus/scene.xml", resx=64, resy=48)
        s = compile_scene(d)
    integ = PathTracingIntegrator(s)
    img, _ = integ.render_pass(0, 0)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


@pytest.mark.slow
def test_torus_filter_regression():
    """Tent/gaussian reconstruction-filter image regression (no GT in the
    corpus): deterministic seed-0 pass statistics recorded 2026-08-17.
    A filter/shape regression of a few percent fails these."""
    from practical_path_guiding_lab_tpu.render.integrator import (
        develop_pass_image,
    )
    from practical_path_guiding_lab_tpu.render.path_tracer import render_pass

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        d = load_file(f"{SCENES}/torus/scene.xml", resx=64, resy=48)
    expect = {
        "tent": (0.186592, 0.143260),
        "gaussian": (0.186560, 0.139923),
        "box": (0.186234, 0.152986),
    }
    for rf, (em, es) in expect.items():
        s = compile_scene(d).replace(rfilter=rf)
        L, px, py, _ = render_pass(s, 0, 0, True)
        img = np.asarray(develop_pass_image(s, L, px, py))
        assert abs(img.mean() - em) < 2e-3, (rf, img.mean())
        assert abs(img.std() - es) < 2e-3, (rf, img.std())
