"""Fused-Pallas integrator: the flagship TPU engine.

Same five-kernel *semantics* as the wavefront engine (generate / extend /
shade / miss / accumulate; reference ``path_tracer.rs:279-371``) but the
extend+shade+miss trio of each bounce is ONE Pallas kernel
(ops/pallas_kernels.py) over VMEM-resident SoA ray planes with the whole
scene in VMEM.  Rationale (measured on the target device):

* HBM streaming is ~2 orders slower than VPU compute here, so the XLA
  engines — which materialize (rays x spheres) intermediates and sort
  queues in HBM — are bandwidth-bound.  The fused kernel's only HBM
  traffic is the ray planes themselves (~50 B/ray/bounce).
* Queue compaction (a ~2 ms device sort per bounce) costs more than the
  dead lanes it removes; this engine keeps masked lanes and lets the
  bounce loop exit when every lane is dead.

RNG streams are the same (pixel, frame, sample, bounce) PCG streams as
the other engines — integer-exact; the few transcendental ops
(sin/cos/pow) may differ by ULPs from XLA's lowering, so cross-engine
image parity is statistical (RMSE), not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wavefront_path_tracer_tpu.ops.pallas_kernels import fused_bounce, pack_scene
from wavefront_path_tracer_tpu.ops.raygen import generate_rays
from wavefront_path_tracer_tpu.utils.config import RenderConfig

_LANES = 128


def _plane(x, rows_total):
    """(N,) -> (rows_total, 128) plane, padding with zeros."""
    n = x.shape[0]
    pad = rows_total * _LANES - n
    x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(rows_total, _LANES)


def trace_fused(pixel_idx, scene_arrays, cam, view, inv_proj,
                config: RenderConfig, frame, sample,
                interpret: bool = False):
    """One sample for a pixel batch; ((N,3) radiance, rays_traced)."""
    n = pixel_idx.shape[0]
    rows_total = -(-n // _LANES)
    # Round rows to the tile height so the grid divides evenly.
    tile_rows = 8
    rows_total = -(-rows_total // tile_rows) * tile_rows

    origin, direction = generate_rays(
        pixel_idx, config.width, config.height, frame, sample, cam, view, inv_proj
    )

    scene_packed = pack_scene(scene_arrays)
    n_spheres = jnp.int32(scene_arrays["centers"].shape[0])

    pix = _plane(pixel_idx.astype(jnp.uint32), rows_total)
    ox = _plane(origin[:, 0], rows_total)
    oy = _plane(origin[:, 1], rows_total)
    oz = _plane(origin[:, 2], rows_total)
    dx = _plane(direction[:, 0], rows_total)
    dy = _plane(direction[:, 1], rows_total)
    dz = _plane(direction[:, 2], rows_total)
    ones = jnp.ones((rows_total, _LANES), jnp.float32)
    tr, tg, tb = ones, ones, ones
    lane_idx = jnp.arange(rows_total * _LANES).reshape(rows_total, _LANES)
    alive = (lane_idx < n).astype(jnp.float32)
    # Padding lanes carry direction (0,0,0); mark dead from the start.
    rad_r = jnp.zeros((rows_total, _LANES), jnp.float32)
    rad_g = jnp.zeros_like(rad_r)
    rad_b = jnp.zeros_like(rad_r)

    def cond(state):
        bounce = state[0]
        alive = state[10]
        return (bounce < config.max_bounces) & (jnp.sum(alive) > 0)

    def body(state):
        (bounce, ox, oy, oz, dx, dy, dz, tr, tg, tb, alive,
         rad_r, rad_g, rad_b, rays) = state
        rays = rays + jnp.sum(alive)
        salts = jnp.stack([
            jnp.uint32(frame), jnp.uint32(sample), bounce.astype(jnp.uint32)
        ])
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, alive,
         mr, mg, mb) = fused_bounce(
            scene_packed, n_spheres, salts,
            pix, ox, oy, oz, dx, dy, dz, tr, tg, tb, alive,
            rows=tile_rows, interpret=interpret,
        )
        return (bounce + 1, ox, oy, oz, dx, dy, dz, tr, tg, tb, alive,
                rad_r + mr, rad_g + mg, rad_b + mb, rays)

    state = (jnp.int32(0), ox, oy, oz, dx, dy, dz, tr, tg, tb, alive,
             rad_r, rad_g, rad_b, jnp.float32(0))
    state = jax.lax.while_loop(cond, body, state)
    rad_r, rad_g, rad_b, rays = state[11], state[12], state[13], state[14]
    radiance = jnp.stack(
        [rad_r.reshape(-1), rad_g.reshape(-1), rad_b.reshape(-1)], axis=-1
    )[:n]
    return radiance, rays


@functools.partial(jax.jit, static_argnames=("cam", "config", "n_samples"))
def render_samples(scene_arrays, cam, view, inv_proj, config: RenderConfig,
                   frame, sample_base, n_samples: int):
    """Sum of ``n_samples`` radiance samples; ((P, 3), rays_traced)."""
    import jax as _jax

    interpret = _jax.default_backend() == "cpu"
    num_pixels = config.num_pixels
    pixel_idx = jnp.arange(num_pixels, dtype=jnp.uint32)

    def one_sample(s, carry):
        acc, rays = carry
        rad, r = trace_fused(
            pixel_idx, scene_arrays, cam, view, inv_proj, config, frame,
            sample_base + jnp.uint32(s), interpret=interpret,
        )
        return acc + rad, rays + r

    acc = jnp.zeros((num_pixels, 3), jnp.float32)
    acc, rays = jax.lax.fori_loop(0, n_samples, one_sample, (acc, jnp.float32(0)))
    return acc, rays
