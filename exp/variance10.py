"""Pin the cornell cross-run variance (VERDICT round-2 item 10).

Round 2 observed 625-657 Mrays/s over three cross-process cornell runs
(~5% band) with no attribution.  This harness runs N in-process and M
cross-process repetitions of the same timed render and separates the
candidate causes:

* warm in-process spread  -> clock throttling / device noise
* first-run-of-process delta -> compile-cache load + tunnel warm-up
* monotonic drift         -> thermal throttling

Usage: python exp/variance10.py [--runs 10] [--procs 3] [--scene
cornell_spheres] [--width 400] [--height 224] [--spp 64]
Appends nothing; prints a table + summary stats for BENCHMARKS.md.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def in_process_runs(args):
    import wavefront_path_tracer_tpu.utils.compile_cache  # noqa: F401
    import jax
    import jax.numpy as jnp

    from wavefront_path_tracer_tpu.models.fused import render_samples
    from wavefront_path_tracer_tpu.renderer import prepare_scene
    from wavefront_path_tracer_tpu.scene import CameraController
    from wavefront_path_tracer_tpu.scene.scene import get_scene
    from wavefront_path_tracer_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, samples_per_frame=args.spp,
                       max_bounces=50, engine="fused", intersector="baked",
                       baked_clusters=16, block_tiles=32)
    scene = get_scene(args.scene)
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()

    rates = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        rad, rays = render_samples(arrays, cam, view, inv_proj, cfg,
                                   jnp.uint32(i), jnp.uint32(0), args.spp)
        rays = float(rays)
        dt = time.perf_counter() - t0
        rates.append(rays / dt / 1e6)
        print(f"run {i:2d}: {rates[-1]:7.1f} Mrays/s ({dt:.2f}s)"
              + ("   [includes compile]" if i == 0 else ""),
              file=sys.stderr, flush=True)
    return rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--procs", type=int, default=3,
                    help="additional cross-process single runs")
    ap.add_argument("--scene", default="cornell_spheres")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=224)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child:
        args.runs = 2  # one warm-up-bearing, one warm
        rates = in_process_runs(args)
        print(json.dumps(rates))
        return

    rates = in_process_runs(args)
    warm = rates[1:]
    print(f"\nin-process warm ({len(warm)} runs): "
          f"min {min(warm):.1f}  median {statistics.median(warm):.1f}  "
          f"max {max(warm):.1f}  band {100*(max(warm)/min(warm)-1):.1f}%  "
          f"stdev {statistics.pstdev(warm):.1f}")
    half = len(warm) // 2
    if half >= 2:
        d = statistics.median(warm[half:]) - statistics.median(warm[:half])
        print(f"drift (2nd-half median - 1st-half): {d:+.1f} Mrays/s "
              f"({'thermal suspect' if d < -5 else 'no thermal drift'})")

    proc_warm = []
    for p in range(args.procs):
        cmd = [sys.executable, os.path.abspath(__file__), "--_child",
               "--scene", args.scene, "--width", str(args.width),
               "--height", str(args.height), "--spp", str(args.spp)]
        out = subprocess.run(cmd, stdout=subprocess.PIPE, text=True,
                             timeout=1500)
        vals = json.loads(out.stdout.strip().splitlines()[-1])
        proc_warm.append(vals[-1])
        print(f"process {p}: first {vals[0]:.1f}  warm {vals[-1]:.1f}")
    if proc_warm:
        print(f"cross-process warm: min {min(proc_warm):.1f}  "
              f"max {max(proc_warm):.1f}  "
              f"band {100*(max(proc_warm)/min(proc_warm)-1):.1f}%")


if __name__ == "__main__":
    main()
