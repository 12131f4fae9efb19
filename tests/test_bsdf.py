"""BSDF scattering physics."""

import numpy as np
import jax.numpy as jnp

from wavefront_path_tracer_tpu.ops import rng
from wavefront_path_tracer_tpu.ops.bsdf import reflect, scatter, schlick
from wavefront_path_tracer_tpu.scene.scene import DIELECTRIC, LAMBERTIAN, METAL


def _scatter_one(mat_type, direction, normal, fuzz=0.0, ior=1.5, seed=1):
    n = direction.shape[0]
    state = jnp.asarray(np.full(n, seed, np.uint32))
    return np.asarray(
        scatter(
            state,
            jnp.asarray(direction, jnp.float32),
            jnp.asarray(normal, jnp.float32),
            jnp.full((n,), mat_type, jnp.int32),
            jnp.full((n,), fuzz, jnp.float32),
            jnp.full((n,), ior, jnp.float32),
        )
    )


def test_outputs_are_unit():
    rs = np.random.RandomState(0)
    d = rs.randn(512, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = rs.randn(512, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    for mat in (LAMBERTIAN, METAL, DIELECTRIC):
        out = _scatter_one(mat, d, n)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_metal_zero_fuzz_is_mirror():
    d = np.array([[0.7071068, -0.7071068, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    out = _scatter_one(METAL, d, n, fuzz=0.0)
    np.testing.assert_allclose(out[0], [0.7071068, 0.7071068, 0.0], atol=1e-6)


def test_lambertian_cosine_statistics():
    # n + uniform-unit-vector gives cosine-weighted directions:
    # E[cos(theta)] = 2/3 relative to the normal.
    m = 8192
    d = np.tile([[0.0, 0.0, -1.0]], (m, 1)).astype(np.float32)
    n = np.tile([[0.0, 1.0, 0.0]], (m, 1)).astype(np.float32)
    states = jnp.asarray((np.arange(m, dtype=np.uint64) * 2654435761 % 2**32).astype(np.uint32))
    out = np.asarray(
        scatter(states, jnp.asarray(d), jnp.asarray(n),
                jnp.zeros(m, jnp.int32), jnp.zeros(m, jnp.float32),
                jnp.zeros(m, jnp.float32))
    )
    cos = out[:, 1]
    assert (cos > -1e-6).all()  # never below the surface
    assert abs(cos.mean() - 2.0 / 3.0) < 0.02


def test_dielectric_total_internal_reflection():
    # Inside glass (ior 1.5), grazing incidence beyond the critical angle
    # (~41.8 deg from the inside): must reflect.
    theta = np.radians(60.0)
    d = np.array([[np.sin(theta), np.cos(theta), 0.0]], np.float32)  # exiting up
    n = np.array([[0.0, 1.0, 0.0]], np.float32)  # outward normal, ray inside
    out = _scatter_one(DIELECTRIC, d, n, ior=1.5)
    # TIR: reflect(d, -n) flips the y component.
    np.testing.assert_allclose(out[0], [np.sin(theta), -np.cos(theta), 0.0], atol=1e-5)


def test_dielectric_refracts_toward_normal_entering():
    # Entering glass head-on-ish: refraction bends toward the normal.
    theta = np.radians(45.0)
    d = np.array([[np.sin(theta), -np.cos(theta), 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    # Average over many RNG streams; most draws refract (R(45deg)~0.05).
    m = 512
    dd = np.tile(d, (m, 1))
    nn = np.tile(n, (m, 1))
    states = jnp.asarray((np.arange(m) * 40503 % 2**32).astype(np.uint32))
    out = np.asarray(
        scatter(states, jnp.asarray(dd), jnp.asarray(nn),
                jnp.full(m, DIELECTRIC, jnp.int32), jnp.zeros(m, jnp.float32),
                jnp.full(m, 1.5, jnp.float32))
    )
    refracted = out[:, 1] < 0
    frac = refracted.mean()
    r_expect = float(schlick(jnp.float32(np.cos(theta)), jnp.float32(1 / 1.5)))
    assert abs((1 - frac) - r_expect) < 0.05
    # Snell: sin(theta_t) = sin(45)/1.5.
    sin_t = np.abs(out[refracted][:, 0])
    np.testing.assert_allclose(sin_t, np.sin(theta) / 1.5, atol=1e-5)


def test_reflect_involution():
    rs = np.random.RandomState(1)
    d = rs.randn(64, 3).astype(np.float32)
    n = rs.randn(64, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    r = np.asarray(reflect(jnp.asarray(d), jnp.asarray(n)))
    r2 = np.asarray(reflect(jnp.asarray(r), jnp.asarray(n)))
    np.testing.assert_allclose(r2, d, atol=1e-5)
