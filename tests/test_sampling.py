"""Analytic sampler tests — the PDF/sample consistency pyramid the
reference never had (SURVEY.md §4): each sampler's Monte-Carlo estimate of
∫ pdf dω must be 1, and sample/pdf must agree (importance-sampling a known
integrand reproduces its analytic integral)."""

import numpy as np
import pytest

from fypraytracer_tpu.core import mathutils as mu
from fypraytracer_tpu.core import rng

N = 200_000


def _draws(n, streams, seed=123):
    keys = rng.path_key(np.arange(n, dtype=np.uint32), seed, 0)
    _, us = rng.uniforms(keys, streams)
    return us


def _normals(n):
    return np.tile(np.float32([0.0, 0.0, 1.0]), (n, 1))


def test_cosine_sample_pdf_consistency():
    """E[cosθ/π / pdf] = 1 when pdf = cosθ/π ⇒ mean of 1s; instead check
    E[1/pdf · cosθ/π] over cosine samples ≈ ∫cosθ/π dω = 1."""
    n = _normals(N)
    u1, u2 = _draws(N, 2)
    l = mu.cosine_sample_hemisphere(n, u1, u2)
    cos_t = np.clip(l[:, 2], 0, None)
    pdf = mu.cosine_hemisphere_pdf(cos_t)
    est = np.mean(np.where(pdf > 0, (cos_t / np.pi) / np.maximum(pdf, 1e-12), 0.0))
    assert abs(est - 1.0) < 0.01


def test_uniform_sampler_integrates_cosine():
    """∫ cosθ dω over hemisphere = π, estimated with uniform sampling."""
    n = _normals(N)
    u1, u2 = _draws(N, 2)
    l = mu.uniform_sample_hemisphere(n, u1, u2)
    cos_t = np.clip(l[:, 2], 0, None)
    est = np.mean(cos_t / mu.uniform_hemisphere_pdf())
    assert abs(est - np.pi) < 0.02


@pytest.mark.parametrize("roughness", [0.2, 0.5, 0.9])
def test_ggx_sample_pdf_consistency(roughness):
    """Sampler and analytic pdf must describe the same measure.  The GGX
    reflected lobe loses mass below the horizon (those samples report
    pdf = 0, MathUtils.cuh:149-162), so the integral of the pdf over the
    upper hemisphere is some M ≤ 1 — but estimating M two independent ways
    (GGX importance samples vs uniform samples) must agree."""
    n = _normals(N)
    view = np.tile(mu.normalize(np.float32([0.3, 0.1, 0.9])), (N, 1))
    r = np.full(N, roughness, np.float32)

    u1, u2 = _draws(N, 2)
    l_u = mu.uniform_sample_hemisphere(n, u1, u2)
    pdf_u = mu.ggx_hemisphere_pdf(n, view, l_u, r)
    m_uniform = np.mean(pdf_u / mu.uniform_hemisphere_pdf())

    v1, v2 = _draws(N, 2, seed=77)
    l_g, pdf_g = mu.ggx_sample_hemisphere(n, view, r, v1, v2)
    valid = pdf_g > 0
    pdf_a = mu.ggx_hemisphere_pdf(n, view, l_g, r)
    m_ggx = np.mean(np.where(valid, pdf_a / np.maximum(pdf_g, 1e-12), 0.0))

    assert 0.3 < m_uniform <= 1.05
    assert abs(m_ggx - m_uniform) < 0.05


@pytest.mark.parametrize("roughness", [0.3, 0.7])
def test_ggx_sample_matches_its_pdf(roughness):
    """pdf reported by the sampler must equal the analytic pdf of the
    sampled direction (MathUtils.cuh:164-171 vs :176-190)."""
    n = _normals(N // 10)
    view = np.tile(mu.normalize(np.float32([0.2, -0.3, 0.93])), (N // 10, 1))
    u1, u2 = _draws(N // 10, 2)
    l, pdf_s = mu.ggx_sample_hemisphere(n, view, np.full(N // 10, roughness, np.float32), u1, u2)
    ok = pdf_s > 0
    pdf_a = mu.ggx_hemisphere_pdf(n, view, l, np.full(N // 10, roughness, np.float32))
    np.testing.assert_allclose(pdf_s[ok], pdf_a[ok], rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("metallic", [0.0, 0.5, 1.0])
def test_brdf_mixture_pdf_consistency(metallic):
    """Mixture integral = wSpec·M_ggx + (1-wSpec)·1, where M_ggx < 1 is the
    above-horizon GGX mass (see test_ggx_sample_pdf_consistency)."""
    n = _normals(N)
    view = np.tile(mu.normalize(np.float32([0.1, 0.2, 0.97])), (N, 1))
    albedo = np.tile(np.float32([0.7, 0.5, 0.3]), (N, 1))
    rough = np.full(N, 0.5, np.float32)
    metal = np.full(N, metallic, np.float32)
    u1, u2 = _draws(N, 2)
    l = mu.uniform_sample_hemisphere(n, u1, u2)

    est_mix = np.mean(mu.brdf_hemisphere_pdf(n, view, l, albedo, metal, rough)
                      / mu.uniform_hemisphere_pdf())
    m_ggx = np.mean(mu.ggx_hemisphere_pdf(n, view, l, rough)
                    / mu.uniform_hemisphere_pdf())
    w = float(mu.specular_weight(n, view, albedo, metal)[0, 0])
    want = w * m_ggx + (1.0 - w) * 1.0
    assert abs(est_mix - want) < 0.05


def test_brdf_white_furnace_bound():
    """Energy conservation: ∫ f·cosθ dω ≤ ~1 per channel for a white
    dielectric (the reference notes but disables the clamp,
    MathUtils.cuh:314-316 — our test bounds the real integral)."""
    n = _normals(N)
    view = np.tile(np.float32([0.0, 0.0, 1.0]), (N, 1))
    albedo = np.ones((N, 3), np.float32)
    u1, u2 = _draws(N, 2)
    l = mu.uniform_sample_hemisphere(n, u1, u2)
    f = mu.cook_torrance_brdf(n, view, l, albedo, np.zeros(N, np.float32),
                              np.full(N, 0.8, np.float32))
    cos_t = np.clip(l[:, 2:3], 0, None)
    integral = np.mean(f * cos_t / mu.uniform_hemisphere_pdf(), axis=0)
    assert np.all(integral < 1.15)  # Smith-k approximation slightly exceeds 1


def test_octahedral_roundtrip():
    u1, u2 = _draws(10_000, 2)
    # full sphere directions
    z = u1 * 2.0 - 1.0
    phi = 2 * np.pi * u2
    s = np.sqrt(np.maximum(0, 1 - z * z))
    v = np.stack([s * np.cos(phi), s * np.sin(phi), z], axis=-1).astype(np.float32)
    dec = mu.decode_octahedral(mu.encode_octahedral(v))
    np.testing.assert_allclose(dec, v, atol=1e-5)


def test_onb_orthonormal():
    u1, u2 = _draws(5000, 2)
    z = u1 * 2 - 1
    phi = 2 * np.pi * u2
    s = np.sqrt(np.maximum(0, 1 - z * z))
    n = np.stack([s * np.cos(phi), s * np.sin(phi), z], -1).astype(np.float32)
    t, b = mu.build_onb(n)
    np.testing.assert_allclose(mu.dot3(t, n, keepdims=False), 0, atol=1e-5)
    np.testing.assert_allclose(mu.dot3(t, b, keepdims=False), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
