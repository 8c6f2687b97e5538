"""Film reconstruction-filter oracles (the reference delegates to Mitsuba's
rfilter plugins — box/tent/gaussian as configured per scene, e.g.
scenes/torus/scene.xml:14)."""
import numpy as np
import pytest
import jax.numpy as jnp

from practical_path_guiding_lab_tpu.render.film import splat_filtered


def _rand(n, w, h, seed):
    rng = np.random.default_rng(seed)
    # interior samples so no filter mass falls off the film
    px = jnp.asarray(2 + rng.random(n) * (w - 4), jnp.float32)
    py = jnp.asarray(2 + rng.random(n) * (h - 4), jnp.float32)
    val = jnp.asarray(rng.random((n, 3)), jnp.float32)
    return px, py, val


def test_filters_conserve_energy():
    """Interior splats: sum(img) == sum(value * filter_mass) and the
    normalized image (img / wgt) averages to the sample mean for a
    constant-value field."""
    w, h, n = 32, 24, 4000
    for rf in ("box", "tent", "gaussian"):
        px, py, val = _rand(n, w, h, 7)
        ones = jnp.ones((n, 3), jnp.float32)
        img, wgt = splat_filtered(w, h, px, py, ones, rf)
        # constant field: normalized image must be exactly 1 where touched
        norm = np.asarray(img[..., 0]) / np.maximum(np.asarray(wgt), 1e-12)
        touched = np.asarray(wgt) > 1e-6
        assert np.allclose(norm[touched], 1.0, atol=1e-5), rf
        # weighted-value / weight consistency on a random field
        img2, wgt2 = splat_filtered(w, h, px, py, val, rf)
        assert np.all(np.asarray(img2).sum(-1)[~touched] == 0), rf


def test_tent_peak_at_pixel_center():
    """A sample exactly at a pixel center puts all tent mass there."""
    w, h = 8, 8
    px = jnp.asarray([3.5], jnp.float32)  # center of pixel (3,3)
    py = jnp.asarray([4.5], jnp.float32)
    val = jnp.ones((1, 3), jnp.float32)
    img, wgt = splat_filtered(w, h, px, py, val, "tent")
    wgt = np.asarray(wgt)
    assert wgt[4, 3] > 0.999 and abs(wgt.sum() - wgt[4, 3]) < 1e-5


def test_gaussian_symmetric_and_normalizable():
    """Center sample: gaussian weights are 4-fold symmetric around the
    pixel and strictly positive in the 4x4 support."""
    w, h = 16, 16
    px = jnp.asarray([8.5], jnp.float32)
    py = jnp.asarray([8.5], jnp.float32)
    val = jnp.ones((1, 3), jnp.float32)
    _, wgt = splat_filtered(w, h, px, py, val, "gaussian")
    wgt = np.asarray(wgt)
    assert wgt[8, 8] == wgt.max()
    assert np.allclose(wgt[7, 8], wgt[9, 8], rtol=1e-5)
    assert np.allclose(wgt[8, 7], wgt[8, 9], rtol=1e-5)
    assert np.allclose(wgt[7, 7], wgt[9, 9], rtol=1e-5)


def test_box_is_nearest_pixel():
    w, h = 8, 8
    px = jnp.asarray([2.2, 6.9], jnp.float32)
    py = jnp.asarray([0.1, 7.8], jnp.float32)
    val = jnp.ones((2, 3), jnp.float32)
    img, wgt = splat_filtered(w, h, px, py, val, "box")
    wgt = np.asarray(wgt)
    assert wgt[0, 2] == 1.0 and wgt[7, 6] == 1.0 and wgt.sum() == 2.0


@pytest.mark.slow
def test_aligned_splat_matches_scatter():
    """splat_filtered_aligned on pixel-major jittered lanes is numerically
    identical to the scatter-based splat_filtered (incl. off-film drops)."""
    from practical_path_guiding_lab_tpu.render.film import (
        splat_filtered_aligned,
    )

    w, h = 13, 9
    rng = np.random.default_rng(3)
    for spp in (1, 3):
        n = w * h * spp
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        px = jnp.asarray(
            np.tile(xx.reshape(-1), spp) + rng.random(n), jnp.float32
        )
        py = jnp.asarray(
            np.tile(yy.reshape(-1), spp) + rng.random(n), jnp.float32
        )
        val = jnp.asarray(rng.random((n, 3)), jnp.float32)
        for rf in ("box", "tent", "gaussian"):
            img0, wgt0 = splat_filtered(w, h, px, py, val, rf)
            img1, wgt1 = splat_filtered_aligned(w, h, px, py, val, rf)
            np.testing.assert_allclose(
                np.asarray(img1), np.asarray(img0), rtol=1e-5, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(wgt1), np.asarray(wgt0), rtol=1e-5, atol=1e-6
            )


def test_aligned_moments_match_scatter():
    from practical_path_guiding_lab_tpu.render import variance as var_mod

    w, h = 11, 7
    rng = np.random.default_rng(5)
    for spp in (1, 2):
        n = w * h
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        px = jnp.asarray(
            np.tile(xx.reshape(-1), spp) + rng.random(n * spp), jnp.float32
        )
        py = jnp.asarray(
            np.tile(yy.reshape(-1), spp) + rng.random(n * spp), jnp.float32
        )
        L = jnp.asarray(rng.random((n * spp, 3)), jnp.float32)
        s0 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        s20 = jnp.asarray(rng.random((n, 3)), jnp.float32)
        a0, b0 = var_mod.accumulate_moments(s0, s20, L, px, py, w)
        a1, b1 = var_mod.accumulate_moments_aligned(s0, s20, L)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), rtol=1e-6)
