"""BSDF correctness: sampling/pdf consistency (chi-square-lite via MC
integration), energy conservation (white furnace bounds), Fresnel checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from practical_path_guiding_lab_tpu import bsdf as B
from practical_path_guiding_lab_tpu.bsdf.fresnel import fresnel_dielectric
from practical_path_guiding_lab_tpu.core.math import normalize


def _ctx(kind, n=1, **kw):
    z = jnp.zeros(n)
    o = jnp.ones(n)
    c3 = lambda v: jnp.tile(jnp.asarray(v, jnp.float32), (n, 1))
    defaults = dict(
        kind=jnp.full((n,), kind, jnp.int32),
        refl=c3((0.8, 0.6, 0.4)),
        spec=c3((1.0, 1.0, 1.0)),
        diff=c3((0.5, 0.5, 0.5)),
        alpha=o * 0.2,
        ggx=jnp.zeros(n, bool),
        eta3=c3((0.2, 0.92, 1.1)),
        k3=c3((3.9, 2.45, 2.14)),
        eta=o * 1.5,
        ns=c3((0.0, 0.0, 1.0)),
    )
    defaults.update(kw)
    return B.BSDFContext(**defaults)


def _mc_pdf_integral(kind, alpha=0.2, ggx=False, n=200_000):
    """Integral of the smooth pdf over the sphere should be <= 1 (== the
    smooth fraction for purely-smooth bsdfs)."""
    rng = np.random.default_rng(3)
    wo = normalize(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    ctx = _ctx(kind, n, alpha=jnp.full((n,), alpha), ggx=jnp.full((n,), ggx, bool))
    wi = jnp.tile(normalize(jnp.asarray([[0.3, -0.2, 0.93]], jnp.float32)), (n, 1))
    _, pdf = B.eval_pdf(ctx, wi, wo)
    return float(jnp.mean(pdf) * 4 * np.pi)


@pytest.mark.parametrize(
    "kind,expected",
    [
        (B.BSDF_DIFFUSE, 1.0),
        (B.BSDF_ROUGH_CONDUCTOR, 1.0),
        (B.BSDF_ROUGH_DIELECTRIC, 1.0),
    ],
)
def test_pdf_integrates_to_one(kind, expected):
    assert abs(_mc_pdf_integral(kind) - expected) < 0.05


def test_sample_pdf_consistency():
    """pdf reported by sample() must match eval_pdf() at the sampled wo."""
    n = 50_000
    rng = np.random.default_rng(5)
    for kind in [B.BSDF_DIFFUSE, B.BSDF_ROUGH_CONDUCTOR, B.BSDF_PLASTIC]:
        ctx = _ctx(kind, n)
        wi = jnp.tile(normalize(jnp.asarray([[0.4, 0.1, 0.91]], jnp.float32)), (n, 1))
        u = jnp.asarray(rng.random((n, 3)), jnp.float32)
        s = B.sample(ctx, wi, u[:, 0], u[:, 1], u[:, 2])
        sm = ~np.asarray(s["delta"])
        f, pdf = B.eval_pdf(ctx, wi, s["wo"])
        ps = np.asarray(s["pdf"])[sm]
        pe = np.asarray(pdf)[sm]
        ok = pe > 1e-4
        assert np.allclose(ps[ok], pe[ok], rtol=2e-2)


def test_diffuse_energy():
    """Cosine-integrated diffuse reflectance == albedo (white furnace)."""
    n = 400_000
    rng = np.random.default_rng(11)
    ctx = _ctx(B.BSDF_DIFFUSE, n)
    wi = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    u = jnp.asarray(rng.random((n, 3)), jnp.float32)
    s = B.sample(ctx, wi, u[:, 0], u[:, 1], u[:, 2])
    total = np.asarray(s["weight"]).mean(axis=0)
    assert np.allclose(total, [0.8, 0.6, 0.4], atol=0.01)


def test_dielectric_fresnel_tir():
    f, _, _, _ = fresnel_dielectric(jnp.asarray([-0.05]), jnp.asarray([1.5]))
    assert float(f[0]) == 1.0  # total internal reflection
    f, _, _, _ = fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.5]))
    assert abs(float(f[0]) - 0.04) < 0.002  # normal incidence ~4%


def test_dielectric_sample_directions():
    """Refraction must obey Snell's law."""
    n = 1000
    ctx = _ctx(B.BSDF_DIELECTRIC, n)
    wi = jnp.tile(normalize(jnp.asarray([[0.5, 0.0, 0.866]], jnp.float32)), (n, 1))
    u = jnp.linspace(0, 1, n)
    s = B.sample(ctx, wi, u, jnp.zeros(n), jnp.zeros(n))
    wo = np.asarray(s["wo"])
    refracted = wo[:, 2] < 0
    assert refracted.any() and (~refracted).any()
    # Snell: sin_i = eta * sin_t
    sin_i = np.sqrt(1 - 0.866**2)
    sin_t = np.linalg.norm(wo[refracted][:, :2], axis=-1)
    assert np.allclose(sin_t, sin_i / 1.5, atol=1e-3)
    # reflection mirrors
    refl = wo[~refracted]
    assert np.allclose(refl[:, 0], -0.5, atol=1e-3)


def test_smooth_fraction():
    wi = normalize(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32))
    assert float(B.smooth_fraction(_ctx(B.BSDF_DIFFUSE), wi)[0]) == 1.0
    assert float(B.smooth_fraction(_ctx(B.BSDF_CONDUCTOR), wi)[0]) == 0.0
    assert float(B.smooth_fraction(_ctx(B.BSDF_DIELECTRIC), wi)[0]) == 0.0
    pf = float(B.smooth_fraction(_ctx(B.BSDF_PLASTIC), wi)[0])
    assert 0.9 < pf < 0.98  # 1 - F(0 deg) ~ 0.96
