"""Material scattering (the reference's K3, shade.wgsl:84-176).

One branchless vectorized scatter over the whole wavefront: all three
BSDFs are evaluated masked and selected with ``jnp.where``.  On the TPU
VPU this beats partition-into-per-material-queues for these three cheap
materials (no gathers/scatters, no queue management); a per-material
partitioned path is available in the wavefront engine for A/B.

RNG contract: every shading event consumes draws from its own
``(pixel, frame, sample, bounce)`` stream in a fixed order —
3 draws for the unit-sphere sample, then 1 draw for the dielectric
reflectance test — so engines agree bit-for-bit no matter which
materials their queues contain.

Material semantics (mirroring shade.wgsl:101-152):
* 0 Lambertian: ``d' = n + unit_sphere_sample`` with degenerate fallback
  to ``n`` when ``|d'| < 0.001``.
* 1 Metal: ``d' = reflect(d, n) + fuzz * unit_sphere_sample``.  Like the
  reference, no absorb-on-subsurface-scatter check.
* 2 Dielectric: outward normal convention with inside-flip, Schlick
  reflectance vs. an RNG draw, refract with total-internal-reflection
  fallback.  Albedo is white (material.rs:35).

Deviation (deliberate): returned directions are normalized
(SURVEY.md §8 bug 3 — the reference's are not).
"""

from __future__ import annotations

import jax.numpy as jnp

from wavefront_path_tracer_tpu.ops import rng
from wavefront_path_tracer_tpu.scene.scene import DIELECTRIC, LAMBERTIAN, METAL


def reflect(d, n):
    """Mirror reflection (shade.wgsl:164-166)."""
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def schlick(cosine, eta):
    """Schlick reflectance approximation (shade.wgsl:158-162)."""
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(1.0 - cosine, jnp.float32(5.0))


def scatter(
    state: jnp.ndarray,      # (N,) uint32 RNG states (one per shading event)
    direction: jnp.ndarray,  # (N, 3) unit incoming directions
    normal: jnp.ndarray,     # (N, 3) unit outward normals
    mat_type: jnp.ndarray,   # (N,) int32
    fuzz: jnp.ndarray,       # (N,) f32
    refract_idx: jnp.ndarray,  # (N,) f32
):
    """Returns (N, 3) unit scattered directions."""
    state, sx, sy, sz = rng.sample_unit_sphere(state)
    state, r_reflect = rng.next_f32(state)

    # normalize(unit-ball sample) -> point on the unit sphere surface
    # (the reference normalizes too: shade.wgsl:103,111).
    s = jnp.stack([sx, sy, sz], axis=-1)
    s = s / jnp.linalg.norm(s, axis=-1, keepdims=True)

    # Lambertian (shade.wgsl:102-109).
    d_lambert = normal + s
    degenerate = jnp.linalg.norm(d_lambert, axis=-1, keepdims=True) < 0.001
    d_lambert = jnp.where(degenerate, normal, d_lambert)

    # Metal (shade.wgsl:110-114).
    d_metal = reflect(direction, normal) + fuzz[:, None] * s

    # Dielectric (shade.wgsl:115-151).  direction is already unit.
    uv = direction
    cos_theta = jnp.minimum(jnp.sum(normal * -uv, axis=-1), 1.0)
    outside = cos_theta >= 0.0
    eta = jnp.where(outside, 1.0 / refract_idx, refract_idx)
    n_d = jnp.where(outside[:, None], normal, -normal)
    cos_theta = jnp.where(outside, cos_theta, -cos_theta)

    reflectance = schlick(cos_theta, eta)
    cos_in = jnp.sum(uv * n_d, axis=-1)  # = -cos_theta (shade.wgsl:169)
    k = 1.0 - eta * eta * (1.0 - cos_in * cos_in)
    can_refract = k >= 0.0
    d_refract = (
        eta[:, None] * uv
        - (eta * cos_in + jnp.sqrt(jnp.maximum(k, 0.0)))[:, None] * n_d
    )
    d_reflect = reflect(uv, n_d)
    d_dielectric = jnp.where(
        (can_refract & (reflectance <= r_reflect))[:, None], d_refract, d_reflect
    )

    out = jnp.where(
        (mat_type == DIELECTRIC)[:, None],
        d_dielectric,
        jnp.where((mat_type == METAL)[:, None], d_metal, d_lambert),
    )
    # Normalize; guard the (metal fuzz can cancel the reflection) zero case.
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    out = jnp.where(norm > 1e-12, out / jnp.maximum(norm, 1e-12), normal)
    return out
