"""Report consensus-cull rates of the fused culled kernel.

Renders a small config and prints, per tile and aggregate, how many
superclusters/clusters were entered vs the maximum possible
(n_iterations x n_nodes), i.e. the realized cull rate.

Usage: python exp/cullstats.py [--scene book_one_final] [--clusters 16]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax.numpy as jnp  # noqa: E402

from wavefront_path_tracer_tpu.models.fused import (  # noqa: E402
    _baked_fn, _block_perm, render_pixels)
from wavefront_path_tracer_tpu.models import fused  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import get_scene  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="book_one_final")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--clusters", type=int, default=16)
    p.add_argument("--block-tiles", type=int, default=32)
    args = p.parse_args()

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, engine="fused",
                       intersector="baked", baked_clusters=args.clusters,
                       block_tiles=args.block_tiles)
    scene = get_scene(args.scene)
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()

    baked = _baked_fn(arrays, args.clusters,
                      camera_pos=np.asarray(cc.view_matrix())[:3, 3])
    n_sup = getattr(baked, "n_supers", 0)
    n_clu = getattr(baked, "n_clusters", 0)
    print(f"hierarchy: {n_sup} supers, {n_clu} clusters of {args.clusters}")

    # Drive the low-level path so we can read the aux plane directly.
    if cfg.block_tiles:
        perm, _ = _block_perm(cfg.width, cfg.height, cfg.block_tiles)
        pix = jnp.asarray(perm)
    else:
        pix = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
    orig = fused.fused_render_baked
    aux_out = {}

    def spy(*a, **kw):
        outs = orig(*a, **kw)
        aux_out["aux"] = outs[3]
        return outs

    fused.fused_render_baked = spy
    try:
        rad, rays = render_pixels(pix, arrays, cam, view, inv_proj, cfg,
                                  jnp.uint32(0), jnp.uint32(0), args.spp,
                                  baked)
        rays = float(rays)
    finally:
        fused.fused_render_baked = orig

    aux = np.asarray(aux_out["aux"])
    tiles = aux.reshape(-1, cfg.tile_rows, 128)
    nray = tiles[:, 0, 0]
    iters = tiles[:, 0, 1]
    sup = tiles[:, 0, 2]
    clu = tiles[:, 0, 3]
    tot_iters = iters.sum()
    print(f"tiles={tiles.shape[0]} rays={rays/1e6:.2f}M "
          f"iters: total={tot_iters:.0f} mean/tile={iters.mean():.1f}")
    if n_sup:
        print(f"supers entered: {sup.sum():.0f} / {tot_iters * n_sup:.0f} "
              f"({100 * sup.sum() / (tot_iters * n_sup):.1f}%)")
        print(f"clusters entered: {clu.sum():.0f} / {tot_iters * n_clu:.0f} "
              f"({100 * clu.sum() / (tot_iters * n_clu):.1f}%)")
        # effective sphere tests/ray vs brute force
        sph_tests = clu.sum() * args.clusters * 1024  # lanes pay per entry
        brute = nray.sum() * n_clu * args.clusters
        print(f"in-hierarchy pair-tests vs brute force: "
              f"{100 * sph_tests / brute:.1f}%  "
              f"(iters x 1024 lanes vs live rays: "
              f"{tot_iters * 1024 / nray.sum():.2f}x lane overhead)")
    worst = np.argsort(clu)[-5:][::-1]
    for t in worst:
        print(f"  tile {t}: rays={nray[t]:.0f} iters={iters[t]:.0f} "
              f"supers={sup[t]:.0f} clusters={clu[t]:.0f}")


if __name__ == "__main__":
    main()
