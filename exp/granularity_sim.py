"""Consensus-granularity ceiling simulator (CPU, no TPU claim).

The fused kernel's remaining 3x to the 1 Grays/s north star is sphere
tests on clusters that *whole-tile* consensus cannot skip (ROADMAP
item 1).  This script quantifies what each candidate structure would
actually buy, by replaying real ray states (megakernel ops, lockstep
bounces) and re-running the consensus sweep as pure table math:

  schemes
    tile/cam      1024-lane groups, camera-hint front-to-back order,
                  cap refresh every 16 clusters  (~production)
    tile/oct      same groups, order re-sorted per group+bounce by the
                  majority direction octant (ROADMAP candidate b)
    row/cam       128-lane groups (8x finer; needs per-row pl.when --
                  costed separately), camera order
    row/oct       128-lane groups + per-row octant order
    ray/ideal     per-ray optimal front-to-back with exact caps: the
                  lower bound any traversal structure could reach

  outputs: lane-pairs per live ray-bounce (the quantity wall time is
  proportional to, issue-rate-bound VPU) per scheme, plus the bounce-0
  vs bounce>0 split (primary rays are coherent; the question is who
  pays for diffuse incoherence).

Caveats vs production: lockstep bounce grouping is MORE coherent than
persistent-lane depth mixing, so absolute entered rates here are
optimistic; the RATIOS between schemes are the signal.  Winner-hint
feedback and triangle phases are not modeled.

Usage: python exp/granularity_sim.py [--width 400 --height 224 --spp 2]
       [--scene book_one_final] [--clusters 16] [--tiles 44]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from wavefront_path_tracer_tpu.models.fused import _block_perm  # noqa: E402
from wavefront_path_tracer_tpu.ops import rng  # noqa: E402
from wavefront_path_tracer_tpu.ops.hit import intersect_and_resolve  # noqa: E402
from wavefront_path_tracer_tpu.ops.pallas_kernels import (  # noqa: E402
    T_MIN, _morton_order)
from wavefront_path_tracer_tpu.ops.raygen import generate_rays  # noqa: E402
from wavefront_path_tracer_tpu.renderer import prepare_scene  # noqa: E402
from wavefront_path_tracer_tpu.scene import CameraController  # noqa: E402
from wavefront_path_tracer_tpu.scene.scene import get_scene  # noqa: E402
from wavefront_path_tracer_tpu.utils.config import RenderConfig  # noqa: E402

T_FAR = 1e30


def record_states(arrays, cam, view, inv_proj, cfg, spp):
    """Replay lockstep bounces; return per-bounce (o, d, alive) lists."""
    states = []

    @jax.jit
    def first(sample):
        pixel_idx = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
        return generate_rays(pixel_idx, cfg.width, cfg.height, jnp.uint32(0),
                             sample, cam, view, inv_proj)

    @jax.jit
    def step(sample, bounce, origin, direction):
        pixel_idx = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
        t, hit, normal, albedo, fuzz, refract, mat = intersect_and_resolve(
            origin, direction, arrays, cfg)
        p = origin + t[:, None] * direction
        st = rng.stream_state(pixel_idx, jnp.uint32(0), sample, bounce + 1)
        from wavefront_path_tracer_tpu.ops.bsdf import scatter

        nd = scatter(st, direction, normal, mat, fuzz, refract)
        return p, nd, hit

    for s in range(spp):
        origin, direction = first(jnp.uint32(s))
        alive = np.ones((cfg.num_pixels,), bool)
        for b in range(cfg.max_bounces):
            states.append((np.asarray(origin), np.asarray(direction),
                           alive.copy(), b))
            origin, direction, hit = step(jnp.uint32(s), jnp.int32(b),
                                          origin, direction)
            alive = alive & np.asarray(hit)
            if alive.sum() == 0:
                break
    return states


def build_structure(arrays, cluster_size, eye):
    """Globals split + Morton clusters + slab + camera order, mirroring
    baked_culled_intersect's bake (pallas_kernels.py)."""
    centers = np.asarray(arrays["centers"], np.float64)
    radii = np.asarray(arrays["radii"], np.float64)
    med = np.median(np.abs(radii))
    is_glob = np.abs(radii) > 10.0 * med
    rest = np.nonzero(~is_glob)[0]
    if rest.size <= 2 * cluster_size:
        raise SystemExit("scene too small for the hierarchy")
    order = rest[_morton_order(np.asarray(centers[rest], np.float32))]
    clusters = []
    for s in range(0, order.size, cluster_size):
        idx = order[s:s + cluster_size]
        lo = (centers[idx] - np.abs(radii[idx])[:, None]).min(0)
        hi = (centers[idx] + np.abs(radii[idx])[:, None]).max(0)
        p = np.clip(eye, lo, hi)
        clusters.append((lo, hi, idx, float(np.sum((p - eye) ** 2))))
    clusters.sort(key=lambda c: c[3])
    slab_lo = np.min([c[0] for c in clusters], 0)
    slab_hi = np.max([c[1] for c in clusters], 0)
    return (np.nonzero(is_glob)[0], clusters, (slab_lo, slab_hi),
            centers, radii)


def sphere_t(o, d, centers, radii):
    """Exact nearest-root table: (R, S) t for rays (R,3) x spheres."""
    oc = o[:, None, :] - centers[None, :, :]
    b = np.einsum("rd,rsd->rs", d, oc)
    c = np.einsum("rsd,rsd->rs", oc, oc) - (radii ** 2)[None, :]
    disc = b * b - c
    sq = np.sqrt(np.maximum(disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    t = np.where(t1 > T_MIN, t1, np.where(t2 > T_MIN, t2, T_FAR))
    return np.where(disc >= 0.0, t, T_FAR)


def box_range(o, inv_d, lo, hi):
    t0 = (lo[None, :] - o) * inv_d
    t1 = (hi[None, :] - o) * inv_d
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    return tmin, tmax


def persistent_timelines(states, n_pixels, spp):
    """Per-pixel bounce chains -> per-(pixel, sample) ray lists.

    Returns chains[s][p] = list of state-row indices into the flattened
    state arrays, so a lane's persistent timeline is the concatenation
    of its pixels' chains over samples."""
    chains = [[[] for _ in range(n_pixels)] for _ in range(spp)]
    flat_o, flat_d = [], []
    row = 0
    sample = -1
    last_bounce = 10 ** 9
    for o, d, alive, bounce in states:
        if bounce <= last_bounce:
            sample += 1
        last_bounce = bounce
        idx = np.nonzero(alive)[0]
        flat_o.append(o[idx])
        flat_d.append(d[idx])
        for j, pix in enumerate(idx):
            chains[sample][pix].append(row + j)
        row += idx.size
    return chains, np.concatenate(flat_o), np.concatenate(flat_d)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--spp", type=int, default=2)
    p.add_argument("--scene", default="book_one_final")
    p.add_argument("--clusters", type=int, default=16)
    p.add_argument("--tiles", type=int, default=44,
                   help="random tile subsample (0 = all)")
    p.add_argument("--refresh", type=int, default=16)
    p.add_argument("--persistent", action="store_true",
                   help="model persistent lanes (depth mixing): each "
                        "lane advances its own (sample, bounce) stream; "
                        "rotation averages a lane over its strip's 4 "
                        "pixel rows (in-row rotation)")
    args = p.parse_args()

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, max_bounces=50,
                       engine="megakernel", intersector="bruteforce")
    scene = get_scene(args.scene)
    cc = CameraController.book_one_final()
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    inv_proj = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()
    eye = np.asarray(cc.camera.position, np.float64)

    states = record_states(arrays, cam, view, inv_proj, cfg, args.spp)
    globs, clusters, slab, centers, radii = build_structure(
        arrays, args.clusters, eye)
    if args.persistent:
        persistent_main(args, cfg, states, globs, clusters, slab,
                        centers, radii)
        return
    n_c = len(clusters)
    n_glob = globs.size
    csize = max(len(c[2]) for c in clusters)
    print(f"{args.scene}: {n_c} clusters x {csize}, {n_glob} globals, "
          f"{len(states)} bounce-waves recorded")

    perm, _ = _block_perm(cfg.width, cfg.height, 32)
    pad = (-perm.size) % 1024
    perm = np.concatenate([perm, np.full(pad, -1)])
    tiles = perm.reshape(-1, 1024)
    if args.tiles and tiles.shape[0] > args.tiles:
        rs = np.random.RandomState(0)
        tiles = tiles[rs.choice(tiles.shape[0], args.tiles, replace=False)]

    # Cluster geometric centers for direction-order heuristics.
    cmid = np.stack([(c[0] + c[1]) * 0.5 for c in clusters])

    schemes = ["tile/cam", "tile/oct", "row/cam", "row/oct", "ray/ideal"]
    pairs = {s: 0.0 for s in schemes}    # lane-pairs charged
    entered = {s: 0 for s in schemes}    # entered groups (when count)
    live_total = 0.0
    iters_total = 0
    pairs_b0 = {s: 0.0 for s in schemes}
    live_b0 = 0.0

    for o_all, d_all, alive_all, bounce in states:
        for tl in tiles:
            sel = tl[tl >= 0]
            alive = alive_all[sel]
            nlive = alive.sum()
            if nlive == 0:
                continue
            o = o_all[sel].astype(np.float64)
            d = d_all[sel].astype(np.float64)
            inv_d = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
            R = sel.size
            # Exact per-(ray, cluster) tables.
            ent = np.full((R, n_c), T_FAR)
            mt = np.full((R, n_c), T_FAR)
            for ci, (lo, hi, idx, _h) in enumerate(clusters):
                tmin, tmax = box_range(o, inv_d, lo, hi)
                hit = (tmin <= tmax) & (tmax > T_MIN)
                ent[:, ci] = np.where(hit, np.maximum(tmin, 0.0), T_FAR)
                mt[:, ci] = sphere_t(o, d, centers[idx], radii[idx]).min(-1)
            s_lo, s_hi = slab
            smin, smax = box_range(o, inv_d, s_lo, s_hi)
            t_exit = np.where((smin <= smax) & (smax > T_MIN), smax, -1.0)
            t_exit = np.where(alive, t_exit, -1.0)
            best0 = np.full((R,), T_FAR)
            if n_glob:
                best0 = sphere_t(o, d, centers[globs],
                                 radii[globs]).min(-1)

            def run(groups, order_fn):
                """Sweep with per-group consensus; returns (lane-pairs,
                entered-group-count) — the latter drives the pl.when
                boundary cost model (~243 ns per entered group)."""
                total = 0.0
                n_entered = 0
                for g in groups:
                    ga = alive[g]
                    if not ga.any():
                        continue
                    order = order_fn(g)
                    best = best0[g].copy()
                    cap = np.minimum(best, t_exit[g])  # refresh snapshot
                    for k, ci in enumerate(order):
                        if k % args.refresh == 0:
                            cap = np.minimum(best, t_exit[g])
                        if (ga & (ent[g, ci] < cap)).any():
                            total += len(g) * len(clusters[ci][2])
                            n_entered += 1
                            best = np.minimum(best, mt[g, ci])
                    total += len(g) * n_glob  # globals always tested
                return total, n_entered

            rows = [np.arange(r * 128, min((r + 1) * 128, R))
                    for r in range(8) if r * 128 < R]
            tile_g = [np.arange(R)]
            cam_order = np.arange(n_c)

            def oct_order(g):
                dm = d[g][alive[g]]
                if dm.shape[0] == 0:
                    return cam_order
                sgn = np.sign(np.where(np.median(dm, 0) == 0, 1e-30,
                                       np.median(dm, 0)))
                key = cmid @ sgn
                return np.argsort(key)

            res = {}
            ent_n = {}
            for name, gr, ofn in (
                    ("tile/cam", tile_g, lambda g: cam_order),
                    ("tile/oct", tile_g, oct_order),
                    ("row/cam", rows, lambda g: cam_order),
                    ("row/oct", rows, oct_order)):
                res[name], ent_n[name] = run(gr, ofn)
            # Per-ray ideal: sort clusters by entry distance per ray,
            # sweep until entry exceeds the running exact cap.
            ideal = 0.0
            ord_r = np.argsort(ent, axis=1)
            for live_i in np.nonzero(alive)[0]:
                best = min(best0[live_i], T_FAR)
                capx = t_exit[live_i]
                for ci in ord_r[live_i]:
                    e = ent[live_i, ci]
                    if e >= min(best, capx):
                        break
                    ideal += len(clusters[ci][2])
                    best = min(best, mt[live_i, ci])
            ideal += nlive * n_glob
            res["ray/ideal"] = ideal
            ent_n["ray/ideal"] = 0

            for s in schemes:
                pairs[s] += res[s]
                entered[s] += ent_n[s]
                if bounce == 0:
                    pairs_b0[s] += res[s]
            live_total += nlive
            iters_total += 1
            if bounce == 0:
                live_b0 += nlive

    print(f"\nlive ray-bounces: {live_total:.0f} "
          f"(bounce0 {100 * live_b0 / live_total:.0f}%)")
    print(f"{'scheme':<10} {'lane-pairs/live-ray':>20} {'vs tile/cam':>12} "
          f"{'bounce0':>9} {'bounce>0':>9} {'modeled':>9}")
    base = pairs["tile/cam"] / live_total
    for s in schemes:
        v = pairs[s] / live_total
        v0 = pairs_b0[s] / max(live_b0, 1)
        vn = (pairs[s] - pairs_b0[s]) / max(live_total - live_b0, 1)
        # Device-cost model per tile-iteration (measured constants:
        # ~243 ns per entered pl.when group, ~26.5 ns per
        # 1024-lane-pair sphere test op-group).
        t_model = (entered[s] * 243.0 + v * live_total / 1024 * 26.5) \
            / max(iters_total, 1)
        print(f"{s:<10} {v:>20.1f} {v / base:>11.2f}x {v0:>9.1f} "
              f"{vn:>9.1f} {t_model:>7.0f}ns")


def persistent_main(args, cfg, states, globs, clusters, slab,
                    centers, radii):
    """Depth-mixed persistent-lane modeling (see --persistent)."""
    n_c = len(clusters)
    n_glob = globs.size
    chains, flat_o, flat_d = persistent_timelines(
        states, cfg.num_pixels, args.spp)
    N = flat_o.shape[0]
    print(f"persistent mode: {N} rays flattened")
    o = flat_o.astype(np.float64)
    d = flat_d.astype(np.float64)
    inv_d = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
    ent = np.full((N, n_c), T_FAR, np.float32)
    mt = np.full((N, n_c), T_FAR, np.float32)
    for ci, (lo, hi, idx, _h) in enumerate(clusters):
        tmin, tmax = box_range(o, inv_d, lo, hi)
        hit = (tmin <= tmax) & (tmax > T_MIN)
        ent[:, ci] = np.where(hit, np.maximum(tmin, 0.0), T_FAR)
        mt[:, ci] = sphere_t(o, d, centers[idx], radii[idx]).min(-1)
    s_lo, s_hi = slab
    smin, smax = box_range(o, inv_d, s_lo, s_hi)
    t_exit = np.where((smin <= smax) & (smax > T_MIN), smax,
                      -1.0).astype(np.float32)
    best0 = np.full((N,), T_FAR, np.float32)
    if n_glob:
        best0 = sphere_t(o, d, centers[globs], radii[globs]).min(-1)

    perm, _ = _block_perm(cfg.width, cfg.height, 32)
    pad = (-perm.size) % 1024
    perm = np.concatenate([perm, np.full(pad, -1)])
    tiles = perm.reshape(-1, 1024)
    tiles = tiles[(tiles >= 0).all(axis=1)]   # full tiles only
    if args.tiles and tiles.shape[0] > args.tiles:
        rs = np.random.RandomState(0)
        tiles = tiles[rs.choice(tiles.shape[0], args.tiles, replace=False)]

    cam_order = np.arange(n_c)
    csize = [len(c[2]) for c in clusters]

    def sweep(rays, order):
        """Consensus sweep over one group's active rays -> lane-pairs."""
        if rays.size == 0:
            return 0.0
        best = best0[rays].copy()
        texit = t_exit[rays]
        e = ent[rays]
        m = mt[rays]
        total = 0.0
        cap = np.minimum(best, texit)
        for k, ci in enumerate(order):
            if k % args.refresh == 0:
                cap = np.minimum(best, texit)
            if (e[:, ci] < cap).any():
                total += 128 * csize[ci]     # whole row issues
                best = np.minimum(best, m[:, ci])
        return total + 128 * n_glob

    def tile_pairs(sel, rotate, rows_gated):
        timelines = []
        for r in range(8):
            strip = sel[r * 128:(r + 1) * 128]
            for c in range(128):
                tl = []
                for k in range(args.spp):
                    pix = strip[(c + 32 * k) % 128] if rotate else strip[c]
                    tl.extend(chains[k][pix])
                timelines.append(tl)
        depth = max(len(t) for t in timelines)
        pairs = 0.0
        for i in range(depth):
            act = np.array([t[i] if i < len(t) else -1 for t in timelines])
            if rows_gated:
                for r in range(8):
                    rr = act[r * 128:(r + 1) * 128]
                    pairs += sweep(rr[rr >= 0], cam_order)
            else:
                live = act[act >= 0]
                # whole-tile group: all 8 rows issue when entered
                if live.size:
                    best = best0[live].copy()
                    texit = t_exit[live]
                    cap = np.minimum(best, texit)
                    for k, ci in enumerate(cam_order):
                        if k % args.refresh == 0:
                            cap = np.minimum(best, texit)
                        if (ent[live, ci] < cap).any():
                            pairs += 1024 * csize[ci]
                            best = np.minimum(best, mt[live, ci])
                    pairs += 1024 * n_glob
        return pairs

    live_total = sum(len(chains[k][p]) for k in range(args.spp)
                     for p in range(cfg.num_pixels))
    live_frac = 0.0
    res = {"p-tile/rot": 0.0, "p-row/rot": 0.0, "p-row/static": 0.0}
    for sel in tiles:
        res["p-tile/rot"] += tile_pairs(sel, True, False)
        res["p-row/rot"] += tile_pairs(sel, True, True)
        res["p-row/static"] += tile_pairs(sel, False, True)
        live_frac += sum(len(chains[k][p]) for k in range(args.spp)
                         for p in sel)

    print(f"\nlive ray-bounces in sampled tiles: {live_frac:.0f}")
    base = res["p-tile/rot"] / live_frac
    print(f"{'scheme':<14} {'lane-pairs/live-ray':>20} {'vs p-tile':>10}")
    for s, v in res.items():
        v /= live_frac
        print(f"{s:<14} {v:>20.1f} {v / base:>9.2f}x")


if __name__ == "__main__":
    main()
