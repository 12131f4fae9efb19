"""Benchmark runner: Mrays/s on the Shirley book-1 final scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

The metric is rays processed by extend+shade per second (live rays
summed over bounces / wall time), the BASELINE.json headline.  The
baseline target is 1,000 Mrays/s (1 Grays/s) per chip.  The JSON also
carries roofline accounting: achieved primitive-pair tests/s vs the
measured ~146.3 Gpairs/s VPU issue ceiling (exp/pair_ceiling.py) as
"device_utilization" — "32% of an aspirational target" and "X% of what
this silicon can issue" are different claims; both are recorded.

Resilience (the round-2 lesson: one tunnel hiccup must not turn the
round's official perf record into a stack trace): the default
invocation is an ORCHESTRATOR that re-execs this file with --worker in
a fresh subprocess (fresh JAX client) per attempt, retries with
backoff on failure or hang, and on persistent failure STILL prints the
JSON line — with an "error" field plus the last-known-good number from
golden/LAST_GOOD_BENCH.json — and exits 0.

Flags (optional): --width --height --spp --engine --intersector
--scene --all (sweep; extra per-config lines to stderr) --attempts
--timeout --mesh TILESxSAMPLES (shard over a device mesh when a pod is
attached) --worker (internal).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


BASELINE_MRAYS = 1000.0
# Measured VPU primitive-pair issue ceiling on this chip: 146.3 Gpairs/s
# sphere-major dynamic, 145.5 baked immediates (exp/pair_ceiling.py,
# slope-timed so the tunnel's ~25 ms RTT cancels).  Round 2's 44.4
# (micro_r2 C6) timed single blocking calls and under-reported ~3.3x,
# which made utilization read as an impossible 2.4.
PAIR_CEILING = 146.3e9
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "golden", "LAST_GOOD_BENCH.json")

# Driver-tracked mesh rows (key, scene, w, h, spp, intersector), all
# fused/cull16: the production baked terrain path, the dynamic-culled
# terrain path, and the 50k-triangle torus knot (the incoherent-ray
# stress scene; small spp — it runs ~0.6-2 Mrays/s).
MESH_ROWS = [
    ("terrain_baked", "mesh_terrain", 800, 448, 32, "baked"),
    ("terrain_dynamic", "mesh_terrain", 800, 448, 32, "bruteforce"),
    ("knot50k_dynamic", "mesh_knot50k", 800, 448, 8, "bruteforce"),
]


def _roofline(engine: str, intersector: str, clusters: int, arrays,
              camera_pos, stats, dt: float):
    """(pairs_total, pairs_per_s, device_utilization) or Nones.

    Pairs issued by the sweep = iterations x globals x 1024 lanes (the
    unconditional per-iteration sweep) + cluster entries x mean cluster
    items x 1024 (every lane of the 8x128 tile pays per entry, live or
    not).  Exact counters come from the kernel's aux plane
    (fused.render_samples_with_stats); only the per-entry item count is
    a mean (Morton clusters are full except the last).
    """
    if engine != "fused":
        return None, None, None
    import numpy as np

    from wavefront_path_tracer_tpu.models import fused

    iters = float(stats["iterations"])
    entered = float(stats["clusters_entered"])
    lanes = 1024.0  # 8 sublane rows x 128 lanes per tile-iteration
    n_sph = int(np.asarray(arrays["centers"]).shape[0])
    n_tri = int(np.asarray(arrays["tri_v0"]).shape[0]) \
        if "tri_v0" in arrays else 0
    if intersector == "baked":
        bf = fused._baked_fn(arrays, clusters, camera_pos=camera_pos)
        if clusters > 0:
            per_entry = bf.n_clustered_items / max(bf.n_clusters, 1)
            pairs = iters * bf.n_globals * lanes + entered * per_entry * lanes
        else:
            pairs = iters * (n_sph + n_tri) * lanes
    elif clusters > 0:
        from wavefront_path_tracer_tpu.ops.pallas_kernels import (
            pack_culled_scene)

        (_, _, _, _, _, _, _, _,
         ngb, ncl, _, _, _, _) = pack_culled_scene(
            arrays, cluster_size=clusters, camera_hint=camera_pos)
        pairs = iters * ngb * 8 * lanes + entered * clusters * lanes
    else:
        pairs = iters * (n_sph + n_tri) * lanes
    pps = pairs / dt
    return pairs, pps, pps / PAIR_CEILING


def knot_tris(scene_name: str) -> int:
    """Triangle budget encoded in a knot scene name: 'mesh_knot' (the
    50k default) or 'mesh_knot<N>k'.  Malformed names (a bare numeric
    suffix, a missing count) are errors, not silent 50k fallbacks — a
    typo'd MESH_ROWS entry must fail, not record a mislabeled row."""
    import re

    m = re.fullmatch(r"mesh_knot(?:(\d+)k)?", scene_name)
    if m is None:
        raise ValueError(
            f"bad knot scene name {scene_name!r}: expected "
            "'mesh_knot' or 'mesh_knot<N>k' (e.g. mesh_knot50k)")
    return int(m.group(1)) * 1000 if m.group(1) else 50000


def bench_once(scene_name: str, width: int, height: int, spp: int,
               engine: str, intersector: str, max_bounces: int = 50,
               warmup_spp: int = 1, clusters: int = 0, block_tiles: int = 32,
               lane_split: int = 1, rotate_cols: int = 1,
               rr_start: int = 0, winner_hint: bool = False,
               mesh_spec=None):
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
    elif scene_name.startswith("mesh_knot"):
        # Procedural torus knot (examples/gen_obj.py), e.g.
        # "mesh_knot50k" — the incoherent-ray mesh stress scene.
        from examples.gen_obj import torus_knot
        from wavefront_path_tracer_tpu.scene.mesh import MeshSceneBuilder

        tris = knot_tris(scene_name)
        b = MeshSceneBuilder()
        b.sphere([0.0, -1000.0, 0.0], 1000.0,
                 b.lambertian([0.5, 0.5, 0.5]))
        v, f = torus_knot(tris)
        b.mesh(v, f, b.lambertian([0.7, 0.3, 0.2]))
        scene, triangles = b.build_mesh_scene()
    else:
        scene = get_scene(scene_name)
    cc = CameraController.book_one_final()
    if scene_name.startswith("mesh_knot"):
        # Frame the knot (the book camera points away from the origin
        # cluster); matches exp/knotbench.py so rows are comparable.
        cc.camera = cc.camera.look_at([0.0, 1.5, 4.0], [0.0, 0.0, 0.0])
        cc.vfov_deg = 40.0
        cc.defocus_angle_deg = 0.0
    arrays = prepare_scene(scene, cfg, triangles=triangles)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()

    if mesh_spec is not None:
        # Pod path: shard the render over a tiles x samples device mesh
        # (parallel/sharding.py).  One command when hardware appears.
        from wavefront_path_tracer_tpu.parallel.sharding import (
            make_mesh, render_samples_sharded)

        tile_ax, sample_ax = mesh_spec
        mesh = make_mesh(tile_ax * sample_ax, sample_axis=sample_ax)

        def run(n):
            rad, rays = render_samples_sharded(
                mesh, arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
                jnp.uint32(0), n)
            return rad, rays, None

    elif engine == "fused":
        # The stats variant returns the kernel's real iteration/cull
        # counters (same Pallas kernel — the aux plane is always
        # produced; only three extra scalar reductions differ), which
        # the roofline accounting below converts to pair tests.
        from wavefront_path_tracer_tpu.models.fused import (
            render_samples_with_stats)

        def run(n):
            return render_samples_with_stats(
                arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
                jnp.uint32(0), n)

    else:
        eng = get_engine(engine)

        def run(n):
            rad, rays = eng.render_samples(
                arrays, cam, view, inv_proj, cfg, jnp.uint32(0),
                jnp.uint32(0), n)
            return rad, rays, None

    # Warmup with the SAME static n_samples as the timed run, so the
    # timed section never includes compilation.
    rad, rays, stats = run(spp)
    jax.block_until_ready(rad)

    # Time with a host transfer of an output scalar: block_until_ready
    # has been observed returning early through this device tunnel.
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rad, rays, stats = run(spp)
        rays = float(rays)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pairs = pps = util = None
    if stats is not None:
        try:
            from wavefront_path_tracer_tpu.models.fused import (
                _resolve_clusters)

            host_stats = {k: float(v) for k, v in stats.items()}
            pairs, pps, util = _roofline(
                engine, intersector, _resolve_clusters(cfg, arrays),
                arrays, __import__("numpy").asarray(cc.view_matrix())[:3, 3],
                host_stats, dt)
        except Exception as e:  # roofline is reporting, never a failure
            print(f"roofline accounting skipped: {e}", file=sys.stderr)
    return {
        "scene": scene_name,
        "config": (f"{width}x{height}@{spp}spp/{engine}/{intersector}"
                   + (f"/cull{clusters}" if clusters else "")
                   + (f"/mesh{mesh_spec[0]}x{mesh_spec[1]}" if mesh_spec
                      else "")),
        "rays": rays,
        "seconds": dt,
        "mrays_per_s": rays / dt / 1e6,
        "pairs": pairs,
        "pairs_per_s": pps,
        "device_utilization": util,
    }


def build_parser() -> argparse.ArgumentParser:
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
    p.add_argument("--mesh", default=None, metavar="TILESxSAMPLES",
                   help="shard over a jax device mesh, e.g. 4x2 "
                        "(requires that many attached devices)")
    p.add_argument("--all", action="store_true",
                   help="sweep engines/intersectors")
    p.add_argument("--no-mesh-row", action="store_true",
                   help="skip the tracked mesh-scene sub-record")
    p.add_argument("--worker", action="store_true",
                   help=argparse.SUPPRESS)  # internal: run the bench here
    p.add_argument("--attempts", type=int, default=3,
                   help="orchestrator: worker attempts before falling "
                        "back to the last-known-good record")
    p.add_argument("--timeout", type=int, default=1500,
                   help="orchestrator: seconds per worker attempt "
                        "(covers backend init + cold compile + run)")
    return p


def parse_mesh(spec):
    if spec is None:
        return None
    t, s = spec.lower().split("x")
    return int(t), int(s)


def worker_main(args) -> None:
    # This machine's sitecustomize force-updates jax_platforms to the
    # TPU plugin, clobbering an explicit JAX_PLATFORMS=cpu (used for
    # plumbing tests); put the caller's intent back before any backend
    # initializes (same workaround as __graft_entry__).
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    mesh_spec = parse_mesh(args.mesh)
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
                    print(f"{engine}/{intersector}: FAILED {e}",
                          file=sys.stderr)
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
                            clusters=args.clusters,
                            block_tiles=args.block_tiles,
                            lane_split=args.lane_split,
                            rotate_cols=args.rotate_cols,
                            rr_start=args.rr,
                            winner_hint=args.winner_hint,
                            mesh_spec=mesh_spec)

    print(f"timing: {result['rays']/1e6:.0f} Mrays in "
          f"{result['seconds']:.2f}s", file=sys.stderr)
    value = result["mrays_per_s"]
    out = {
        "metric": (f"Mrays/sec/chip extend+shade ({result['config']}, "
                   f"{result['scene']})"),
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / BASELINE_MRAYS, 4),
    }
    if result.get("device_utilization") is not None:
        out["pairs_per_s"] = round(result["pairs_per_s"], 1)
        out["device_utilization"] = round(result["device_utilization"], 4)
        out["utilization_note"] = (
            "primitive-pair tests issued / measured 146.3 Gpairs/s VPU "
            "issue ceiling (exp/pair_ceiling.py, slope-timed)")
    if (not args.no_mesh_row and not args.all and not mesh_spec
            and args.scene == "book_one_final"):
        # Tracked mesh rows (BASELINE measurement config 5: OBJ mesh
        # scenes): catch large-scene regressions the sphere headline
        # can't see, on the BEST-KNOWN config for each scene (r4
        # VERDICT: tracking only the slow dynamic path made the
        # production baked mesh path invisible to the driver record).
        # Crash-proof — a mesh failure must never cost the headline
        # record; the error is recorded in that row's place.
        out["mesh"] = {}
        for key, m_scene, mw, mh, mspp, m_int in MESH_ROWS:
            try:
                m = bench_once(m_scene, mw, mh, mspp, "fused", m_int,
                               args.max_bounces, clusters=16)
                print(f"mesh row {key} {m['config']}: "
                      f"{m['mrays_per_s']:.2f} Mrays/s", file=sys.stderr)
                out["mesh"][key] = {
                    "config": f"{m['config']}, {m['scene']}",
                    "value": round(m["mrays_per_s"], 2),
                    "unit": "Mrays/s"}
            except Exception as e:
                out["mesh"][key] = {"error": f"mesh row failed: {e}"}
    print(json.dumps(out))


def orchestrate(args, argv) -> None:
    """Run the bench in fresh subprocesses; never exit without JSON."""
    cmd = [sys.executable, os.path.abspath(__file__), "--worker"] + [
        a for a in argv if a != "--worker"]
    last_err = "no attempts ran"
    for attempt in range(max(1, args.attempts)):
        if attempt:
            delay = 20 * (2 ** (attempt - 1))
            print(f"bench attempt {attempt} failed; retrying in {delay}s "
                  f"with a fresh client", file=sys.stderr)
            time.sleep(delay)
        # A wedged tunnel hangs every attempt for the full window; give
        # the first attempt the full budget (cold compile) and retries
        # a shorter one (the cache is warm if anything works at all).
        window = args.timeout if attempt == 0 else min(args.timeout, 600)
        try:
            proc = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=None,
                timeout=window, text=True)
        except subprocess.TimeoutExpired:
            last_err = f"worker hang: no result within {window}s"
            continue
        except Exception as e:
            last_err = f"worker spawn failed: {e}"
            continue
        line = None
        for ln in (proc.stdout or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{") and ln.endswith("}"):
                line = ln
        if proc.returncode == 0 and line:
            rec = json.loads(line)
            # Refresh the last-known-good record (best effort) — but
            # only for the real headline config on the real device, so
            # a CPU smoke test or a small sweep never clobbers it.
            is_headline = (
                args.scene == "book_one_final" and args.width == 1920
                and args.height == 1080 and args.spp == 1000
                and args.engine == "fused" and args.intersector == "baked"
                and not args.all and not args.mesh
                and "cpu" not in os.environ.get("JAX_PLATFORMS", "")
                and rec.get("value", 0) > 0)
            if is_headline:
                try:
                    os.makedirs(os.path.dirname(LAST_GOOD_PATH),
                                exist_ok=True)
                    with open(LAST_GOOD_PATH, "w") as f:
                        json.dump(dict(rec, recorded_at=time.strftime(
                            "%Y-%m-%d %H:%M:%S")), f, indent=1)
                except OSError as e:
                    print(f"last-good record not updated: {e}",
                          file=sys.stderr)
            print(line)
            return
        last_err = (f"worker rc={proc.returncode}, "
                    f"{'no JSON line in output' if not line else line}")

    # Persistent failure: emit a machine-readable record anyway, with
    # the last driver- or builder-verified number and its provenance.
    rec = {"metric": "Mrays/sec/chip extend+shade", "value": 0.0,
           "unit": "Mrays/s", "vs_baseline": 0.0}
    source = "none: no last-known-good record exists"
    try:
        with open(LAST_GOOD_PATH) as f:
            lg = json.load(f)
        rec.update({k: lg[k] for k in
                    ("metric", "value", "unit", "vs_baseline", "mesh")
                    if k in lg})
        source = (f"last-known-good from {LAST_GOOD_PATH} "
                  f"({lg.get('recorded_at', 'undated')})")
    except Exception as e:
        source += f" ({e})"
    rec["error"] = f"all {args.attempts} bench attempts failed: {last_err}"
    rec["value_source"] = source
    print(json.dumps(rec))
    sys.exit(0)


def main() -> None:
    args = build_parser().parse_args()
    if args.worker:
        worker_main(args)
    else:
        orchestrate(args, sys.argv[1:])


if __name__ == "__main__":
    main()
