"""AOV (arbitrary output variable) passes: albedo / normal / depth.

Production path tracers emit first-hit feature planes alongside the
beauty pass — they feed denoisers, compositing, and debugging.  The
reference renders radiance only (its display pass is the whole output
surface, display.rs:112-150); this is a beyond-parity capability.

AOVs reuse the XLA ops the engines share (raygen + nearest-hit
resolve), averaged over ``spp`` anti-aliased primary samples with the
same per-(pixel, sample) RNG streams as the engines, so AOV edges are
filtered exactly like the beauty pass:

* ``albedo``  — first-hit material albedo (miss lanes contribute the
  sky color, matching what a denoiser wants to divide out),
* ``normal``  — first-hit geometric normal (zero on miss; averaged
  then re-normalized),
* ``depth``   — first-hit ray distance t (miss lanes contribute 0 and
  are excluded from the average; ``coverage`` holds the hit fraction).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from wavefront_path_tracer_tpu.ops.hit import intersect_and_resolve
from wavefront_path_tracer_tpu.ops.intersect import sky_color
from wavefront_path_tracer_tpu.ops.raygen import generate_rays
from wavefront_path_tracer_tpu.renderer import prepare_scene
from wavefront_path_tracer_tpu.utils.config import RenderConfig


def render_aovs(scene, camera, config: RenderConfig, triangles=None,
                spp: int | None = None, frame: int = 0) -> dict:
    """First-hit AOV planes as (H, W, C) numpy arrays.

    Returns ``{"albedo": (H,W,3), "normal": (H,W,3), "depth": (H,W),
    "coverage": (H,W)}``.  ``spp`` defaults to
    ``config.samples_per_pixel`` (AA averaging only — AOVs are
    first-hit quantities, so a handful of samples suffices).
    """
    cfg = config
    if cfg.intersector not in ("bruteforce", "bvh"):
        # AOVs run on the shared XLA ops; baked intersectors are a
        # fused-engine concept.
        cfg = cfg.replace(intersector="bruteforce")
    spp = int(spp if spp is not None else cfg.samples_per_pixel)
    arrays = prepare_scene(scene, cfg, triangles=triangles)
    view = jnp.asarray(camera.view_matrix())
    inv_proj = jnp.asarray(camera.inverse_projection(cfg.width, cfg.height))
    cam = camera.gpu_camera()
    num = cfg.num_pixels

    @jax.jit
    def one(sample, acc):
        alb_a, nrm_a, dep_a, cov_a = acc
        pixel_idx = jnp.arange(num, dtype=jnp.uint32)
        origin, direction = generate_rays(
            pixel_idx, cfg.width, cfg.height, jnp.uint32(frame), sample,
            cam, view, inv_proj, sampler=cfg.sampler)
        t, hit, normal, albedo, _fz, _ri, _mt = intersect_and_resolve(
            origin, direction, arrays, cfg)
        h = hit[:, None]
        alb = jnp.where(h, albedo, sky_color(direction))
        nrm = jnp.where(h, normal, 0.0)
        dep = jnp.where(hit, t, 0.0)
        return (alb_a + alb, nrm_a + nrm, dep_a + dep,
                cov_a + hit.astype(jnp.float32))

    acc = (jnp.zeros((num, 3)), jnp.zeros((num, 3)), jnp.zeros((num,)),
           jnp.zeros((num,)))
    for s in range(spp):
        acc = one(jnp.uint32(s), acc)
    alb, nrm, dep, cov = (np.array(a) for a in acc)

    alb /= spp
    nlen = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / np.maximum(nlen, 1e-12)
    dep = dep / np.maximum(cov, 1e-12)       # mean over HIT samples
    cov /= spp

    shp = (cfg.height, cfg.width)
    return {
        "albedo": alb.reshape(shp + (3,)),
        "normal": nrm.reshape(shp + (3,)),
        "depth": dep.reshape(shp),
        "coverage": cov.reshape(shp),
    }


def write_aovs(prefix: str, aovs: dict) -> list:
    """Write AOVs: raw ``{prefix}.aov.npz`` plus viewable PNGs
    (normals remapped to [0,1]; depth as 1/(1+t) — white near, dark
    far, black sky).  Returns the paths written."""
    from wavefront_path_tracer_tpu.utils.image import write_png

    paths = [f"{prefix}.aov.npz"]
    np.savez_compressed(paths[0], **aovs)
    ims = {
        "albedo": aovs["albedo"],
        "normal": aovs["normal"] * 0.5 + 0.5,
        "depth": np.where(aovs["coverage"][..., None] > 0.0,
                          1.0 / (1.0 + aovs["depth"][..., None]),
                          0.0) * np.ones(3),
    }
    for name, im in ims.items():
        p = f"{prefix}.{name}.png"
        write_png(p, np.clip(im, 0.0, 1.0))
        paths.append(p)
    return paths
