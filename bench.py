"""Benchmark runner: Mrays/s on the Shirley book-1 final scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

The metric is rays processed by extend+shade per second (live rays
summed over bounces / wall time), the BASELINE.json headline.  The
baseline target is 1,000 Mrays/s (1 Grays/s) per chip.

Flags (optional): --width --height --spp --engine --intersector
--scene --all (prints extra per-config lines to stderr first).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


BASELINE_MRAYS = 1000.0


def bench_once(scene_name: str, width: int, height: int, spp: int,
               engine: str, intersector: str, max_bounces: int = 50,
               warmup_spp: int = 1, clusters: int = 0, block_tiles: int = 32,
               lane_split: int = 1, rotate_cols: int = 1,
               rr_start: int = 0, winner_hint: bool = False):
    import jax
    import jax.numpy as jnp

    from wavefront_path_tracer_tpu.models import get_engine
    from wavefront_path_tracer_tpu.renderer import prepare_scene
    from wavefront_path_tracer_tpu.scene import CameraController
    from wavefront_path_tracer_tpu.scene.scene import get_scene
    from wavefront_path_tracer_tpu.utils.config import RenderConfig

    cfg = RenderConfig(
        width=width, height=height, samples_per_pixel=spp,
        samples_per_frame=spp, max_bounces=max_bounces,
        engine=engine, intersector=intersector,
        baked_clusters=clusters, block_tiles=block_tiles,
        lane_split=lane_split, lane_rotate_cols=rotate_cols,
        rr_start_bounce=rr_start, winner_hint=winner_hint,
    )
    triangles = None
    if scene_name == "mesh_demo":
        from wavefront_path_tracer_tpu.scene.mesh import mesh_demo_scene

        scene, triangles = mesh_demo_scene()
    elif scene_name == "mesh_terrain":
        from wavefront_path_tracer_tpu.scene.mesh import mesh_terrain_scene

        scene, triangles = mesh_terrain_scene()
    else:
        scene = get_scene(scene_name)
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg, triangles=triangles)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()
    eng = get_engine(engine)

    # Warmup with the SAME static n_samples as the timed run, so the
    # timed section never includes compilation.
    rad, rays = eng.render_samples(
        arrays, cam, view, inv_proj, cfg, jnp.uint32(0), jnp.uint32(0), spp
    )
    jax.block_until_ready(rad)

    # Time with a host transfer of an output scalar: block_until_ready
    # has been observed returning early through this device tunnel.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rad, rays = eng.render_samples(
            arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
            jnp.uint32(warmup_spp), spp
        )
        rays = float(rays)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "scene": scene_name,
        "config": (f"{width}x{height}@{spp}spp/{engine}/{intersector}"
                   + (f"/cull{clusters}" if clusters else "")),
        "rays": rays,
        "seconds": dt,
        "mrays_per_s": rays / dt / 1e6,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="book_one_final")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    # Default batch IS the BASELINE convergence workload (1000 spp at
    # 1080p in one dispatch); small-spp numbers are tail-bound.
    p.add_argument("--spp", type=int, default=1000)
    p.add_argument("--engine", default="fused")
    p.add_argument("--intersector", default="baked")
    p.add_argument("--max-bounces", type=int, default=50)
    p.add_argument("--clusters", type=int, default=16,
                   help="fused/baked: leaf cluster size for consensus "
                        "culling (16 measured best at 1080p; 0 disables)")
    p.add_argument("--block-tiles", type=int, default=32,
                   help="fused: NxN pixel blocks per ray tile (0 = linear)")
    p.add_argument("--lane-split", type=int, default=1,
                   help="fused: split each pixel's samples over K lanes")
    p.add_argument("--rotate-cols", type=int, default=1,
                   help="fused: column phases for lane rotation")
    p.add_argument("--rr", type=int, default=0,
                   help="Russian roulette start bounce (0 = off)")
    p.add_argument("--winner-hint", action="store_true",
                   help="fused/baked culled: winner-cluster shortlist")
    p.add_argument("--all", action="store_true", help="sweep engines/intersectors")
    args = p.parse_args()

    if args.all:
        best = None
        for engine, intersectors in (
            ("fused", ("baked", "bruteforce")),
            ("wavefront", ("bvh", "bruteforce")),
            ("megakernel", ("bvh", "bruteforce")),
        ):
            for intersector in intersectors:
                # The XLA engines are ~100x slower; a multi-minute single
                # dispatch trips the device watchdog, so give them a
                # smaller (rate-equivalent) sample budget.
                spp = args.spp if engine == "fused" else max(1, args.spp // 8)
                clusters = args.clusters if engine == "fused" else 0
                try:
                    r = bench_once(args.scene, args.width, args.height, spp,
                                   engine, intersector, args.max_bounces,
                                   clusters=clusters)
                except Exception as e:  # keep sweeping
                    print(f"{engine}/{intersector}: FAILED {e}", file=sys.stderr)
                    continue
                print(f"{r['config']}: {r['mrays_per_s']:.1f} Mrays/s "
                      f"({r['rays']/1e6:.0f} Mrays in {r['seconds']:.2f}s)",
                      file=sys.stderr)
                if best is None or r["mrays_per_s"] > best["mrays_per_s"]:
                    best = r
        result = best
    else:
        result = bench_once(args.scene, args.width, args.height, args.spp,
                            args.engine, args.intersector, args.max_bounces,
                            clusters=args.clusters, block_tiles=args.block_tiles,
                            lane_split=args.lane_split,
                            rotate_cols=args.rotate_cols,
                            rr_start=args.rr,
                            winner_hint=args.winner_hint)

    print(f"timing: {result['rays']/1e6:.0f} Mrays in "
          f"{result['seconds']:.2f}s", file=sys.stderr)
    value = result["mrays_per_s"]
    print(json.dumps({
        "metric": f"Mrays/sec/chip extend+shade ({result['config']}, {result['scene']})",
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
