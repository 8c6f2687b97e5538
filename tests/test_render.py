"""Integration tests: intersector correctness and golden-image MSE on
cornell-box (the reference's statistical oracle, SURVEY.md section 4.3)."""
import numpy as np
import jax.numpy as jnp
import pytest

from practical_path_guiding_lab_tpu.accel.traverse import intersect, occluded
from practical_path_guiding_lab_tpu.io import exr
from practical_path_guiding_lab_tpu.render.path_tracer import render_pass

SCENES = "/root/reference/scenes"


def test_intersect_known_hits(cornell_small):
    s = cornell_small
    # ray above the boxes must hit the back wall at z=-1
    o = jnp.asarray([[0.0, 1.5, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    si = intersect(s, o, d)
    assert bool(si.valid[0])
    assert abs(float(si.t[0]) - 4.0) < 1e-3
    assert np.allclose(np.asarray(si.p[0]), [0, 1.5, -1], atol=1e-3)
    assert np.allclose(np.asarray(si.n[0]), [0, 0, 1], atol=1e-3)
    # ray pointing away hits nothing
    si2 = intersect(s, o, -d)
    assert not bool(si2.valid[0])


def test_occlusion(cornell_small):
    s = cornell_small
    o = jnp.asarray([[0.0, 1.5, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    # back wall at z=-1: distance 1.0 -> occluded at t_max 2, clear at 0.5
    assert bool(occluded(s, o, d, jnp.asarray([2.0]))[0])
    assert not bool(occluded(s, o, d, jnp.asarray([0.5]))[0])


def test_cornell_golden_mse(cornell_small):
    """Render 64x64 @ 16spp; luminance must match the Tungsten GT closely
    (statistical oracle, reference main.py:38-41 + computeMSE)."""
    s = cornell_small
    acc = np.zeros((64 * 64, 3), np.float32)
    spp = 16
    for p in range(spp):
        L, _, _, _ = render_pass(s, 0, p)
        acc += np.asarray(L)
    img = (acc / spp).reshape(64, 64, 3)
    gt = exr.read(f"{SCENES}/cornell-box/TungstenRender.exr")
    gtd = gt.reshape(64, 16, 64, 16, 3).mean(axis=(1, 3))
    lum = lambda x: x @ np.array([0.212671, 0.71516, 0.072169])
    # brightness within 3%, correlation > 0.99
    assert abs(img.mean() / gtd.mean() - 1.0) < 0.03
    corr = np.corrcoef(lum(img).ravel(), lum(gtd).ravel())[0, 1]
    assert corr > 0.99
