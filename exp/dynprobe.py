"""Decompose the DYNAMIC culled intersector's iteration cost (real TPU).

Same method as exp/iterprobe.py (trace-time duplication via pk.PROBE,
CSE-proof, idempotent) but for make_dynamic_culled_intersect — the
no-bake path whose end-to-end rate (42 Mrays/s at 400x224@64) sits 4x
below baked (169) even though its micro pair rate (C4 36.7 Gpairs/s)
is only 1.2x off.  The probes localize the missing 3.3x:

  dyn_dbl_entry   sphere/tri block tests (quadratic + selects + loads)
  dyn_dbl_cond    per-cluster box conds (math + any + SMEM store)
  dyn_dbl_refs    per-cluster VMEM ref restage (nfld plane RMWs)
  dyn_dbl_global  the giant-sphere fori blocks
  dyn_split_entry +1 pl.when boundary per entered cluster

Dynamic compiles are fast (no bake) — each variant ~1 min.

Usage: python exp/dynprobe.py [--variants full,dyn_dbl_entry,...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavefront_path_tracer_tpu.models import fused  # noqa: E402
from wavefront_path_tracer_tpu.ops import pallas_kernels as pk  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import get_scene  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402

W, H, SPP, CLUSTERS = 400, 224, 64, 16  # overridable below


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="full,dyn_dbl_entry,dyn_dbl_cond,"
                            "dyn_dbl_refs,dyn_dbl_global,dyn_split_entry")
    ap.add_argument("--scene", default="book_one_final")
    ap.add_argument("--clusters", type=int, default=CLUSTERS)
    ap.add_argument("--spp", type=int, default=SPP)
    opts = ap.parse_args()

    spp = opts.spp
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=spp,
                       samples_per_frame=spp, max_bounces=50,
                       engine="fused", intersector="bruteforce",
                       baked_clusters=opts.clusters, block_tiles=32)
    scene = get_scene(opts.scene)
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(W, H))
    cam = cc.gpu_camera()
    base = None

    for variant in opts.variants.split(","):
        pk.PROBE = (frozenset() if variant == "full"
                    else frozenset([variant]))
        # The jit/dyn caches key on tables and static shape, not PROBE:
        # clear them so each variant retraces.
        fused._DYN_CACHE.clear()
        jax.clear_caches()
        try:
            t0 = time.time()
            rad, rays = fused.render_samples(
                arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
                jnp.uint32(0), jnp.uint32(spp))
            nrays = float(rays)
            compile_s = time.time() - t0
            t0 = time.time()
            rad, rays = fused.render_samples(
                arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
                jnp.uint32(0), jnp.uint32(spp))
            nrays = float(rays)
            dt = time.time() - t0
            chk = float(jnp.sum(rad))
            mrays = nrays / dt / 1e6
            share = "" if base is None else (
                f"  share {(base / mrays - 1.0) * 100:+.1f}%")
            if variant == "full":
                base = mrays
            print(f"{variant:16s}: {mrays:7.1f} Mrays/s  ({dt:.2f}s, "
                  f"compile {compile_s:.0f}s, chk {chk:.6e}){share}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:16s}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    pk.PROBE = frozenset()


if __name__ == "__main__":
    main()
