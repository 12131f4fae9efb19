"""Correctness gate: RMSE between an engine under test and the oracle.

The BASELINE acceptance criterion is "< 1e-3 RMSE vs CPU oracle images"
(BASELINE.md); this tool renders the same configuration with the
megakernel oracle and the engine under test (optionally on different
platforms) and reports the display-image RMSE plus convergence stats.

Usage::

    python -m wavefront_path_tracer_tpu.validate \
        --scene book_one_final --width 400 --height 225 --spp 100 \
        --engine fused --intersector baked

Exit code 0 iff RMSE < --gate (default 1e-3).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="book_one_final")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=225)
    p.add_argument("--spp", type=int, default=100)
    p.add_argument("--max-bounces", type=int, default=50)
    p.add_argument("--engine", default="fused")
    p.add_argument("--intersector", default="baked")
    p.add_argument("--oracle-engine", default="megakernel")
    p.add_argument("--oracle-intersector", default="bruteforce")
    p.add_argument("--oracle-spf", type=int, default=10,
                   help="oracle frame-batch size (the XLA oracle is slow; "
                        "multi-minute single dispatches trip the device "
                        "watchdog, so its spp budget runs in batches)")
    p.add_argument("--gate", type=float, default=1e-3)
    p.add_argument("--save-prefix", default=None,
                   help="write <prefix>_test.png / <prefix>_oracle.png")
    args = p.parse_args(argv)

    from wavefront_path_tracer_tpu.renderer import render
    from wavefront_path_tracer_tpu.scene import CameraController
    from wavefront_path_tracer_tpu.scene.scene import get_scene
    from wavefront_path_tracer_tpu.utils.config import RenderConfig
    from wavefront_path_tracer_tpu.utils.image import rmse, write_png

    scene = get_scene(args.scene)
    cc = CameraController.book_one_final()
    base = RenderConfig(
        width=args.width, height=args.height,
        samples_per_pixel=args.spp, samples_per_frame=args.spp,
        max_bounces=args.max_bounces,
    )

    t0 = time.time()
    test = render(scene, cc, base.replace(
        engine=args.engine, intersector=args.intersector,
        samples_per_frame=min(args.spp, 200)))
    t_test = time.time() - t0
    print(f"test engine done in {t_test:.1f}s "
          f"({test.mrays_per_s:.1f} Mrays/s)", file=sys.stderr)

    t0 = time.time()
    oracle = render(scene, cc, base.replace(
        engine=args.oracle_engine, intersector=args.oracle_intersector,
        samples_per_frame=min(args.oracle_spf, args.spp)))
    t_oracle = time.time() - t0
    print(f"oracle done in {t_oracle:.1f}s", file=sys.stderr)

    err = rmse(test.image, oracle.image)
    if args.save_prefix:
        write_png(f"{args.save_prefix}_test.png", test.image)
        write_png(f"{args.save_prefix}_oracle.png", oracle.image)

    result = {
        "scene": args.scene,
        "config": f"{args.width}x{args.height}@{args.spp}spp",
        "engine": f"{args.engine}/{args.intersector}",
        "oracle": f"{args.oracle_engine}/{args.oracle_intersector}",
        "rmse": err,
        "gate": args.gate,
        "pass": bool(err < args.gate),
        "test_mrays_per_s": round(test.mrays_per_s, 2),
    }
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
