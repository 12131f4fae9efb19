"""Estimate fused-kernel lane occupancy and the ceiling of sample-
rotation rebalancing schemes.

The persistent kernel binds lane -> pixel for a whole tile; a tile's
makespan is its heaviest lane (its pixel's total path length), so
within-tile path-length variance is idle lane time (measured 1.75x at
the 1080p headline).  Rotating which pixel a lane traces per sample
averages each lane's work over M pixels, shrinking the max.

This script measures per-pixel mean path length with the megakernel
(brute force, a few spp), then simulates aggregate occupancy
(sum(work) / sum_tiles(lanes x max_lane_work)) for:
  - static: lane = pixel (today)
  - rot-row[M]: lane row rotates through M of the tile's 8 rows
  - rot-rowcol[M]: row + column rotation (M offsets)
  - ideal: perfect balance

Usage: python exp/occupancy_sim.py [--width 960 --height 544 --spp 4]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401,E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wavefront_path_tracer_tpu.models.fused import _block_perm  # noqa: E402
from wavefront_path_tracer_tpu.ops import rng  # noqa: E402
from wavefront_path_tracer_tpu.ops.bsdf import scatter  # noqa: E402
from wavefront_path_tracer_tpu.ops.hit import intersect_and_resolve  # noqa: E402
from wavefront_path_tracer_tpu.ops.raygen import generate_rays  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import get_scene  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402


def per_pixel_bounces(scene_arrays, cam, view, inv_proj, cfg, spp):
    """Mean path length per pixel, via the megakernel bounce loop."""

    @jax.jit
    def one(sample, acc):
        pixel_idx = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
        origin, direction = generate_rays(
            pixel_idx, cfg.width, cfg.height, jnp.uint32(0), sample,
            cam, view, inv_proj)
        n = pixel_idx.shape[0]
        alive = jnp.ones((n,), bool)
        bounces = jnp.zeros((n,), jnp.int32)

        def cond(s):
            return (s[0] < cfg.max_bounces) & jnp.any(s[4])

        def body(s):
            bounce, origin, direction, bounces, alive = s
            bounces = bounces + alive.astype(jnp.int32)
            t, hit, normal, albedo, fuzz, refract, mat = intersect_and_resolve(
                origin, direction, scene_arrays, cfg)
            p = origin + t[:, None] * direction
            st = rng.stream_state(pixel_idx, jnp.uint32(0), sample, bounce + 1)
            nd = scatter(st, direction, normal, mat, fuzz, refract)
            ha = alive & hit
            origin = jnp.where(ha[:, None], p, origin)
            direction = jnp.where(ha[:, None], nd, direction)
            return bounce + 1, origin, direction, bounces, ha

        s = (jnp.int32(0), origin, direction, bounces, alive)
        s = jax.lax.while_loop(cond, body, s)
        return acc + s[3]

    acc = jnp.zeros((cfg.num_pixels,), jnp.int32)
    for i in range(spp):
        acc = one(jnp.uint32(i), acc)
    return np.asarray(acc, np.float64) / spp


def occupancy(lane_work, rows=8):
    """Aggregate occupancy for (tiles, 1024) lane work."""
    total = lane_work.sum()
    makespan = lane_work.max(axis=1).sum() * lane_work.shape[1]
    return total / makespan


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--block", type=int, default=32)
    args = p.parse_args()

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, max_bounces=50,
                       engine="megakernel", intersector="bruteforce")
    scene = get_scene("book_one_final")
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()

    w = per_pixel_bounces(arrays, cam, view, inv_proj, cfg, args.spp)
    print(f"per-pixel path length: mean={w.mean():.2f} p50={np.median(w):.2f}"
          f" p99={np.percentile(w, 99):.2f} max={w.max():.2f}")

    # Lanes in block-tile order: tile = 1024 consecutive entries of perm.
    perm, _ = _block_perm(cfg.width, cfg.height, args.block)
    lanes = w[perm]
    pad = (-lanes.size) % 1024
    lanes = np.concatenate([lanes, np.zeros(pad)])
    tiles = lanes.reshape(-1, 1024)          # (T, 1024); lane = (row*128+col)
    print(f"tiles={tiles.shape[0]}")

    print(f"static lane=pixel:      occupancy {occupancy(tiles):.3f}")

    t3 = tiles.reshape(-1, 8, 128)
    for m in (2, 4, 8):
        # Row rotation over m of the 8 rows: lane (r, c) averages rows
        # r, r+1, ..., r+m-1 (mod 8).
        rot = sum(np.roll(t3, -k, axis=1) for k in range(m)) / m
        print(f"rot-row[{m}]:             occupancy "
              f"{occupancy(rot.reshape(-1, 1024)):.3f}")
    for m, step in ((4, 32), (8, 48)):
        # Row+column rotation: offset k -> (row +k, col +k*step).
        rot = sum(np.roll(np.roll(t3, -k, axis=1), -(k * step) % 128, axis=2)
                  for k in range(m)) / m
        print(f"rot-rowcol[{m},step={step}]: occupancy "
              f"{occupancy(rot.reshape(-1, 1024)):.3f}")
    ideal = np.broadcast_to(tiles.mean(axis=1, keepdims=True), tiles.shape)
    print(f"ideal:                  occupancy {occupancy(ideal):.3f}")


if __name__ == "__main__":
    main()
