"""Fused-Pallas engine vs. the oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from wavefront_path_tracer_tpu.renderer import render
from wavefront_path_tracer_tpu.utils.config import RenderConfig
from wavefront_path_tracer_tpu.utils.image import rmse

from tests.test_engines import BASE, _cover_camera


@pytest.fixture(scope="module")
def oracle(book_cover_scene):
    return render(book_cover_scene, _cover_camera(), BASE.replace(engine="megakernel"))


def _statistically_equal(a, b, max_diverged=0.02):
    """Engines share integer RNG streams but the fused kernel's float
    math (raygen + shading transcendentals) goes through Mosaic's
    lowering: ULP differences occasionally flip which sphere a deep
    bounce hits, diverging a handful of paths.  Equality is therefore
    statistical: means agree tightly and almost all pixels match."""
    assert np.isfinite(a.accumulated).all()
    assert abs(a.accumulated.mean() - b.accumulated.mean()) < 2e-3
    assert rmse(a.image, b.image) < 5e-3
    diff = np.abs(a.accumulated - b.accumulated).max(axis=-1)
    assert (diff > 1e-3).mean() < max_diverged


def test_fused_matches_oracle(book_cover_scene, oracle):
    fz = render(book_cover_scene, _cover_camera(), BASE.replace(engine="fused"))
    _statistically_equal(fz, oracle)


def test_fused_nonsquare_padding(book_cover_scene, oracle):
    # 100x27 = 2700 pixels: not a multiple of 128 -> padded lanes must
    # neither crash nor leak radiance.
    cfg = BASE.replace(engine="fused", width=100, height=27,
                       samples_per_pixel=2, samples_per_frame=2)
    ref = render(book_cover_scene, _cover_camera(),
                 cfg.replace(engine="megakernel"))
    fz = render(book_cover_scene, _cover_camera(), cfg)
    _statistically_equal(fz, ref)


def test_fused_defocus_blur(book_cover_scene):
    # Thin-lens path: in-kernel lens sampling must match the oracle's.
    cfg = BASE.replace(samples_per_pixel=8, samples_per_frame=8)
    cam = _cover_camera()
    cam.defocus_angle_deg = 10.0
    cam.focus_distance = 3.4
    ref = render(book_cover_scene, cam, cfg.replace(engine="megakernel"))
    fz = render(book_cover_scene, cam, cfg.replace(engine="fused"))
    _statistically_equal(fz, ref)


def test_baked_cluster_culling_matches(book_cover_scene, oracle):
    """Morton-cluster culling is conservative: statistically identical
    images (sphere reorder shifts only near-tie winners)."""
    cfg = BASE.replace(engine="fused", intersector="baked", baked_clusters=2)
    fz = render(book_cover_scene, _cover_camera(), cfg)
    _statistically_equal(fz, oracle)


def test_winner_hint_matches(book_cover_scene, oracle):
    """The winner-cluster shortlist only reorders cluster iteration
    (prepassed clusters are excluded from the main sweep), so the
    render stays statistically identical to the plain culled sweep and
    to the oracle."""
    cfg = BASE.replace(engine="fused", intersector="baked",
                       baked_clusters=2)
    plain = render(book_cover_scene, _cover_camera(), cfg)
    hinted = render(book_cover_scene, _cover_camera(),
                    cfg.replace(winner_hint=True))
    _statistically_equal(hinted, plain)
    _statistically_equal(hinted, oracle)


def test_winner_hint_hierarchy_matches():
    """Shortlist + the engaged two-level hierarchy: cluster_size=2 on
    120 spheres yields ~60 clusters > super_gate=48, so the prepass
    exclusion dict is consumed inside the per-super pl.when bodies —
    the trickiest winner-hint interaction; must stay conservative."""
    from wavefront_path_tracer_tpu.scene.scene import get_scene

    scene = get_scene("procedural", n=120, seed=3)
    cfg = BASE.replace(engine="fused", intersector="baked",
                       samples_per_pixel=2, samples_per_frame=2,
                       baked_clusters=2)
    plain = render(scene, _cover_camera(), cfg)
    hinted = render(scene, _cover_camera(), cfg.replace(winner_hint=True))
    _statistically_equal(hinted, plain)


def test_winner_hint_gated_off_at_scale():
    """The shortlist prepass is O(n_clusters) per iteration — a
    measured 2x loss at 625 clusters — so the bake must auto-disable
    it above 64 clusters (BENCHMARKS.md)."""
    from wavefront_path_tracer_tpu.ops.pallas_kernels import (
        baked_culled_intersect,
    )

    rng = np.random.RandomState(0)

    def bake(n):
        return baked_culled_intersect(
            (rng.randn(n, 3) * 10).astype(np.float32),
            np.full(n, 0.2, np.float32),
            rng.rand(n, 3).astype(np.float32),
            np.zeros(n, np.float32), np.ones(n, np.float32),
            np.zeros(n, np.float32), cluster_size=16, winner_hint=True)

    assert bake(2000).returns_winner_key is False
    assert bake(300).returns_winner_key is True


def test_culled_hierarchy_matches_unculled_spheres():
    """With enough spheres the two-level hierarchy actually engages
    (globals split, Morton clusters, slab cap); culling must be
    conservative — same image as the unculled baked kernel up to
    near-tie reorder."""
    from wavefront_path_tracer_tpu.scene.scene import get_scene

    scene = get_scene("procedural", n=96, seed=3)
    cfg = BASE.replace(engine="fused", intersector="baked",
                       samples_per_pixel=2, samples_per_frame=2)
    plain = render(scene, _cover_camera(), cfg)
    culled = render(scene, _cover_camera(), cfg.replace(baked_clusters=8))
    _statistically_equal(culled, plain)


def test_culled_triangles_match_unculled():
    """Triangle clusters (Morton by centroid + slab cap) are conservative
    too: terrain mesh renders identically culled vs not."""
    from wavefront_path_tracer_tpu.scene.mesh import mesh_terrain_scene

    scene, tris = mesh_terrain_scene(n_quads=6, seed=1)
    cfg = BASE.replace(engine="fused", intersector="baked",
                       samples_per_pixel=2, samples_per_frame=2)
    plain = render(scene, _cover_camera(), cfg, triangles=tris)
    culled = render(scene, _cover_camera(),
                    cfg.replace(baked_clusters=8), triangles=tris)
    _statistically_equal(culled, plain)


def test_culled_triangles_match_oracle():
    """Culled fused triangles vs the XLA megakernel oracle."""
    from wavefront_path_tracer_tpu.scene.mesh import mesh_terrain_scene

    scene, tris = mesh_terrain_scene(n_quads=5, seed=2)
    cfg = BASE.replace(samples_per_pixel=2, samples_per_frame=2)
    ref = render(scene, _cover_camera(), cfg.replace(engine="megakernel"),
                 triangles=tris)
    culled = render(scene, _cover_camera(),
                    cfg.replace(engine="fused", intersector="baked",
                                baked_clusters=8), triangles=tris)
    _statistically_equal(culled, ref)


def test_lane_split_equivalent():
    """Splitting a pixel's sample budget over K lanes must sum to the
    same radiance (same (pixel, sample) RNG streams, different lanes)."""
    from wavefront_path_tracer_tpu.scene.scene import book_cover

    scene = book_cover()
    cfg = BASE.replace(engine="fused", samples_per_pixel=4,
                       samples_per_frame=4)
    one = render(scene, _cover_camera(), cfg)
    four = render(scene, _cover_camera(), cfg.replace(lane_split=4))
    assert np.allclose(one.accumulated, four.accumulated, rtol=1e-5,
                       atol=1e-5)


def test_dynamic_culled_matches_unculled():
    """The dynamic consensus-culled intersector (scene as VMEM tables,
    O(1)-compile cluster loop) agrees with the unculled dynamic kernel."""
    from wavefront_path_tracer_tpu.scene.scene import get_scene

    scene = get_scene("procedural", n=96, seed=3)
    cfg = BASE.replace(engine="fused", intersector="bruteforce",
                       samples_per_pixel=2, samples_per_frame=2)
    plain = render(scene, _cover_camera(), cfg)
    culled = render(scene, _cover_camera(), cfg.replace(baked_clusters=8))
    _statistically_equal(culled, plain)


def test_dynamic_culled_triangles_match_oracle():
    """Dynamic-culled triangles (VMEM tables, no per-scene bake) vs the
    XLA megakernel oracle — OBJ scenes get culling without bake latency."""
    from wavefront_path_tracer_tpu.scene.mesh import mesh_terrain_scene

    scene, tris = mesh_terrain_scene(n_quads=5, seed=2)
    cfg = BASE.replace(samples_per_pixel=2, samples_per_frame=2)
    ref = render(scene, _cover_camera(), cfg.replace(engine="megakernel"),
                 triangles=tris)
    dyn = render(scene, _cover_camera(),
                 cfg.replace(engine="fused", intersector="bruteforce",
                             baked_clusters=8), triangles=tris)
    _statistically_equal(dyn, ref)


def test_dynamic_culled_triangles_match_baked():
    """Dynamic-culled and baked-culled triangle intersectors agree."""
    from wavefront_path_tracer_tpu.scene.mesh import mesh_terrain_scene

    scene, tris = mesh_terrain_scene(n_quads=6, seed=1)
    cfg = BASE.replace(engine="fused", samples_per_pixel=2,
                       samples_per_frame=2, baked_clusters=8)
    baked = render(scene, _cover_camera(), cfg.replace(intersector="baked"),
                   triangles=tris)
    dyn = render(scene, _cover_camera(),
                 cfg.replace(intersector="bruteforce"), triangles=tris)
    _statistically_equal(dyn, baked)


def test_far_from_origin_scene():
    """The slimmed quadratic expands |o-c|^2 around the scene center;
    without the conditioning shift its error grows as eps*|c|^2 and a
    scene translated 10k units from the origin develops silhouette
    speckle and self-intersection acne.  The XLA oracle uses the
    robust |o-c| form, so agreement here proves the conditioning."""
    from wavefront_path_tracer_tpu.scene.scene import book_cover

    off = np.array([2000.0, -1000.0, 3000.0], np.float32)
    scene = book_cover()
    scene = scene._replace(centers=scene.centers + off)
    cc = _cover_camera()
    cam = cc.camera
    cc.camera = cam.look_at(np.asarray(cam.position) + off,
                            np.array([0.0, 0.0, -1.0]) + off)
    cfg = BASE.replace(samples_per_pixel=2, samples_per_frame=2)
    mk = render(scene, cc, cfg.replace(engine="megakernel"))
    for intersector, clusters in (("baked", 16), ("bruteforce", 8)):
        fz = render(scene, cc, cfg.replace(engine="fused",
                                           intersector=intersector,
                                           baked_clusters=clusters))
        assert np.isfinite(fz.accumulated).all()
        # Ray origins themselves are f32-quantized to ~|o|*eps here, so
        # cross-engine ULP divergence is amplified; the gates are loose
        # but a *conditioning* failure is orders worse (err ~ eps*|c|^2
        # rivals c_q near surfaces: acne/speckle over most pixels).
        assert abs(fz.accumulated.mean() - mk.accumulated.mean()) < 2e-2
        diff = np.abs(fz.image - mk.image).max(axis=-1)
        assert (diff > 0.05).mean() < 0.05


def test_lane_rotation_equivalent():
    """Sample rotation reassigns (pixel, sample) work items to lanes but
    every RNG stream is unchanged — per-pixel radiance must match up to
    float summation order."""
    from wavefront_path_tracer_tpu.scene.scene import book_cover

    scene = book_cover()
    cfg = BASE.replace(engine="fused", samples_per_pixel=4,
                       samples_per_frame=4)
    rot = render(scene, _cover_camera(), cfg)          # default: on
    off = render(scene, _cover_camera(), cfg.replace(lane_rotate=False))
    assert np.allclose(rot.accumulated, off.accumulated, rtol=1e-5,
                       atol=1e-5)


def test_lane_rotation_cols_statistical():
    """Column phases reassign lanes across image columns too.  The
    (pixel, sample) RNG streams are unchanged, but the bigger graph
    changes XLA's FMA fusion choices, so a near-tie path can diverge by
    ULPs — equality is statistical, like cross-engine comparisons."""
    from wavefront_path_tracer_tpu.scene.scene import book_cover

    scene = book_cover()
    cfg = BASE.replace(engine="fused", samples_per_pixel=4,
                       samples_per_frame=4)
    off = render(scene, _cover_camera(), cfg.replace(lane_rotate=False))
    c2 = render(scene, _cover_camera(), cfg.replace(lane_rotate_cols=2))
    assert np.abs(np.asarray(c2.accumulated).sum()
                  - np.asarray(off.accumulated).sum()) < 1e-2
    diff = np.abs(c2.accumulated - off.accumulated).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01


def test_lane_rotation_partial_tile():
    """Tiles with padding lanes must disable rotation (a rotated lane
    would trace a padding slot) and still match the oracle."""
    from wavefront_path_tracer_tpu.scene.scene import book_cover

    scene = book_cover()
    cfg = BASE.replace(engine="fused", width=100, height=27,
                       samples_per_pixel=2, samples_per_frame=2)
    ref = render(scene, _cover_camera(), cfg.replace(engine="megakernel"))
    fz = render(scene, _cover_camera(), cfg)
    _statistically_equal(fz, ref)


def test_auto_cluster_resolution():
    """baked_clusters=-1 resolves by primitive count (measured optima:
    16 under 2000 primitives, 32 above; exp/sweep10k.py)."""
    from wavefront_path_tracer_tpu.models.fused import _resolve_clusters

    small = {"centers": np.zeros((390, 3), np.float32)}
    big = {"centers": np.zeros((10000, 3), np.float32)}
    tri = {"centers": np.zeros((100, 3), np.float32),
           "tri_v0": np.zeros((5000, 3), np.float32)}
    auto = BASE.replace(engine="fused", baked_clusters=-1)
    assert _resolve_clusters(auto, small) == 16
    assert _resolve_clusters(auto, big) == 32
    assert _resolve_clusters(auto, tri) == 32
    explicit = BASE.replace(engine="fused", baked_clusters=8)
    assert _resolve_clusters(explicit, big) == 8
    off = BASE.replace(engine="fused", baked_clusters=0)
    assert _resolve_clusters(off, big) == 0


def test_auto_cluster_render_matches_explicit():
    """An auto-resolved dynamic-culled render equals the explicit-16 one."""
    from wavefront_path_tracer_tpu.scene.scene import book_cover

    scene = book_cover()
    cfg = BASE.replace(engine="fused", intersector="bruteforce",
                       samples_per_pixel=2, samples_per_frame=2)
    auto = render(scene, _cover_camera(), cfg.replace(baked_clusters=-1))
    exp16 = render(scene, _cover_camera(), cfg.replace(baked_clusters=16))
    np.testing.assert_array_equal(np.asarray(auto.accumulated),
                                  np.asarray(exp16.accumulated))


def test_dynamic_culled_multibatch_matches_unculled():
    """>16 clusters exercises the pipelined cond refresh (batch k+1's
    cluster-major cond groups are computed, with 8-aligned stores that
    may re-store the in-flight batch's tail under a fresher cap, before
    batch k's sweep runs) — the result must stay identical to the
    unculled dynamic kernel."""
    from wavefront_path_tracer_tpu.scene.scene import get_scene

    scene = get_scene("procedural", n=200, seed=5)
    cfg = BASE.replace(engine="fused", intersector="bruteforce",
                       samples_per_pixel=2, samples_per_frame=2)
    plain = render(scene, _cover_camera(), cfg)
    culled = render(scene, _cover_camera(), cfg.replace(baked_clusters=8))
    _statistically_equal(culled, plain)


def test_dynamic_culled_fori_sweep_matches_unculled():
    """>64 clusters switches from the statically-unrolled cluster sweep
    to the rolled super-gated form (fori over _DYN_SUPER-cluster
    superclusters, each batch gated on its union AABB); same-image
    gate."""
    from wavefront_path_tracer_tpu.scene.scene import get_scene

    scene = get_scene("procedural", n=600, seed=5)
    cfg = BASE.replace(engine="fused", intersector="bruteforce",
                       samples_per_pixel=1, samples_per_frame=1,
                       max_bounces=6)
    plain = render(scene, _cover_camera(), cfg)
    culled = render(scene, _cover_camera(), cfg.replace(baked_clusters=8))
    _statistically_equal(culled, plain)


def test_stage_timing_probes(book_cover_scene):
    """Differential stage timing: returns a breakdown, image semantics
    unchanged (probes are idempotent), non-baked path refuses."""
    import jax.numpy as jnp

    from wavefront_path_tracer_tpu.models.fused import stage_timing
    from wavefront_path_tracer_tpu.renderer import prepare_scene

    cam = _cover_camera()
    cfg = BASE.replace(engine="fused", intersector="baked",
                       baked_clusters=4, width=32, height=16)
    arrays = prepare_scene(book_cover_scene, cfg)
    base, rows = stage_timing(
        arrays, cam.gpu_camera(), jnp.asarray(cam.view_matrix()),
        jnp.asarray(cam.inverse_projection(cfg.width, cfg.height)),
        cfg, n_samples=2, reps=1)
    assert base > 0
    labels = [r[0] for r in rows]
    assert any("raygen" in l for l in labels)
    assert any("shade" in l for l in labels)
    # Shares are non-negative and the residual row closes the budget.
    assert all(r[2] >= 0 for r in rows)

    # The dynamic culled path now supports probes (keyed on the
    # kernels' probe= static arg); only the probe-less plain VMEM
    # kernel refuses.
    base_d, rows_d = stage_timing(
        arrays, cam.gpu_camera(), jnp.asarray(cam.view_matrix()),
        jnp.asarray(cam.inverse_projection(cfg.width, cfg.height)),
        # The dynamic tables need 8-aligned clusters (8-row blocks).
        cfg.replace(intersector="bruteforce", baked_clusters=8),
        n_samples=2, reps=1)
    assert base_d > 0
    labels_d = [r[0] for r in rows_d]
    assert any("global sweep" in l for l in labels_d)
    assert all(r[2] >= 0 for r in rows_d)

    with pytest.raises(NotImplementedError):
        stage_timing(arrays, cam.gpu_camera(),
                     jnp.asarray(cam.view_matrix()),
                     jnp.asarray(cam.inverse_projection(32, 16)),
                     cfg.replace(intersector="bruteforce",
                                 baked_clusters=0), n_samples=2)


def _bubble_scene(tmp_path):
    """RTIOW hollow-glass-bubble scene via the scene-file path (the
    one user-facing way to get a negative radius)."""
    import json

    from wavefront_path_tracer_tpu.scene.file import load_scene_file

    doc = {
        "spheres": [
            {"center": [0, -100.5, -1], "radius": 100,
             "material": {"type": "lambertian", "albedo": [0.5, 0.5, 0.5]}},
            {"center": [0, 0, -1.2], "radius": 0.5,
             "material": {"type": "lambertian", "albedo": [0.1, 0.2, 0.5]}},
            # Hollow glass bubble: outer shell + inside-out inner.
            {"center": [-1, 0, -1], "radius": 0.5,
             "material": {"type": "dielectric", "ior": 1.5}},
            {"center": [-1, 0, -1], "radius": -0.4,
             "material": {"type": "dielectric", "ior": 1.5}},
        ],
    }
    p = tmp_path / "bubble.json"
    p.write_text(json.dumps(doc))
    return doc, load_scene_file(str(p))


def test_negative_radius_parity(tmp_path):
    """The RTIOW hollow-bubble trick (negative radius = inside-out
    sphere, normal flipped) must agree across ALL engines: the XLA
    engines used to treat r < 0 as padding and never hit the bubble
    while the fused baked path did (round-3 advisor finding, RMSE 0.09
    divergence).  Geometry is that of |r|; the flipped normal makes a
    dielectric shell hollow."""
    import json

    from wavefront_path_tracer_tpu.scene.file import load_scene_file

    doc, (scene, tris, _) = _bubble_scene(tmp_path)
    assert tris is None
    cc = _cover_camera()
    cfg = BASE.replace(samples_per_pixel=8, samples_per_frame=8)
    mega = render(scene, cc, cfg.replace(engine="megakernel"))
    wave = render(scene, cc, cfg.replace(engine="wavefront"))
    np.testing.assert_array_equal(mega.accumulated, wave.accumulated)
    fused = render(scene, cc, cfg.replace(
        engine="fused", intersector="baked"))
    _statistically_equal(fused, mega)
    # The bubble must actually be visible: against a no-bubble render
    # the shell region differs (guards against 'parity by both engines
    # ignoring r<0').
    solid_doc = {"spheres": doc["spheres"][:3]}
    sp = tmp_path / "solid.json"
    sp.write_text(json.dumps(solid_doc))
    solid_scene, _, _ = load_scene_file(str(sp))
    solid = render(solid_scene, cc, cfg.replace(engine="megakernel"))
    assert rmse(solid.image, mega.image) > 1e-3


def test_negative_radius_dynamic_culled_parity(tmp_path):
    """Same hollow-bubble scene through the fused *dynamic culled*
    path (VMEM tables carry 1/r, so the sign flows through the packed
    winner), plus the BVH oracle (|r| AABBs)."""
    _, (scene, _, _) = _bubble_scene(tmp_path)
    cc = _cover_camera()
    cfg = BASE.replace(samples_per_pixel=8, samples_per_frame=8)
    mega = render(scene, cc, cfg.replace(engine="megakernel"))
    dyn = render(scene, cc, cfg.replace(
        engine="fused", intersector="bruteforce", baked_clusters=16))
    _statistically_equal(dyn, mega)
    # BVH vs bruteforce is statistical, not bitwise (different
    # traversal order -> different float summation; see
    # test_engines.test_bvh_vs_bruteforce_statistical).
    bvh = render(scene, cc, cfg.replace(
        engine="megakernel", intersector="bvh"))
    assert rmse(bvh.image, mega.image) < 1e-3


def test_recluster_matches_oracle(book_cover_scene, oracle):
    """The segmented re-clustering engine (sort live rays by direction
    octant x origin Morton cell between bounce segments) is the same
    integrator: identical per-(pixel,sample,bounce) RNG streams, so it
    matches the megakernel statistically like every fused variant."""
    seg = render(book_cover_scene, _cover_camera(), BASE.replace(
        engine="fused", intersector="baked", baked_clusters=16,
        recluster=2))
    _statistically_equal(seg, oracle)


def test_recluster_dynamic_matches_oracle(book_cover_scene, oracle):
    seg = render(book_cover_scene, _cover_camera(), BASE.replace(
        engine="fused", intersector="bruteforce", baked_clusters=16,
        recluster=2))
    _statistically_equal(seg, oracle)


def test_recluster_above_two_refused():
    """K > 2 is refused up front: recluster=4 was measured to crash the
    TPU worker (BENCHMARKS.md round 4 — the fused segment sort's scoped
    VMEM), and a shipped flag value must fail with an actionable error,
    not take down the device."""
    import pytest

    from wavefront_path_tracer_tpu.utils.config import RenderConfig

    with pytest.raises(ValueError, match="crashes the TPU worker"):
        RenderConfig(width=8, height=8, samples_per_pixel=1, recluster=3)
    with pytest.raises(ValueError, match="recluster must be <= 2"):
        RenderConfig(width=8, height=8, samples_per_pixel=1, recluster=4)


def test_recluster_triangles_match_oracle():
    """Mesh scene through the segmented engine (the workload the
    re-sorting exists for)."""
    from wavefront_path_tracer_tpu.renderer import render as render_tri
    from wavefront_path_tracer_tpu.scene.mesh import mesh_demo_scene
    from wavefront_path_tracer_tpu.scene import CameraController

    scene, tris = mesh_demo_scene()
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at([0.0, 1.2, 3.0], [0.0, 0.3, -0.5])
    cc.vfov_deg = 45.0
    cc.defocus_angle_deg = 0.0
    cfg = BASE.replace(width=48, height=32, samples_per_pixel=4,
                       samples_per_frame=4, engine="fused",
                       intersector="bruteforce", baked_clusters=16)
    # Baseline is the PERSISTENT fused engine: this mirror-box + glass
    # scene amplifies ULP-flip divergence vs the XLA oracle at 4 spp
    # (both fused variants sit ~4e-3 from it, 7e-5 from each other),
    # so the oracle comparison lives in the sphere-scene tests and this
    # one pins segment-vs-persistent integrator identity on triangles.
    pers = render_tri(scene, cc, cfg, triangles=tris)
    seg = render_tri(scene, cc, cfg.replace(recluster=2), triangles=tris)
    _statistically_equal(seg, pers)


def test_recluster_stats_and_rays():
    """Ray accounting: the segmented engine reports the same extend+shade
    ray count as the persistent engine (streams and termination are
    identical), and its cull counters are live."""
    import jax.numpy as jnp

    from wavefront_path_tracer_tpu.models.fused import (
        render_samples_with_stats)
    from wavefront_path_tracer_tpu.renderer import prepare_scene

    import numpy as np

    from wavefront_path_tracer_tpu.scene.scene import SceneBuilder

    # A scene with enough small spheres to actually form clusters
    # (book_cover's 5 spheres all land in the unconditional globals,
    # where cull counters are structurally zero).
    b = SceneBuilder()
    ground = b.lambertian([0.5, 0.5, 0.5])
    b.sphere([0.0, -1000.0, 0.0], 1000.0, ground)
    rs = np.random.RandomState(3)
    for i in range(96):
        m = b.lambertian(rs.uniform(0.2, 0.9, 3).tolist())
        b.sphere([float(i % 10) - 5.0, 0.2,
                  float(i // 10) - 5.0], 0.2, m)
    scene = b.build()
    cc = _cover_camera()
    cfg = BASE.replace(engine="fused", intersector="baked",
                       baked_clusters=16)
    arrays = prepare_scene(scene, cfg)
    view = jnp.asarray(cc.view_matrix())
    ip = jnp.asarray(cc.inverse_projection(cfg.width, cfg.height))
    cam = cc.gpu_camera()
    _, rays_p, _ = render_samples_with_stats(
        arrays, cam, view, ip, cfg, jnp.uint32(0), jnp.uint32(0), 2)
    _, rays_s, st = render_samples_with_stats(
        arrays, cam, view, ip, cfg.replace(recluster=2), jnp.uint32(0),
        jnp.uint32(0), 2)
    # XLA raygen (segmented) vs in-kernel raygen (persistent) differ by
    # ULPs; a handful of near-tie paths change length.
    assert abs(float(rays_s) - float(rays_p)) / float(rays_p) < 1e-3
    assert float(st["clusters_entered"]) > 0


def test_recluster_schedule():
    from wavefront_path_tracer_tpu.models.fused import _segment_schedule

    assert _segment_schedule(2, 50) == (2, 2, 4, 8, 16, 18)
    assert sum(_segment_schedule(3, 12)) == 12
    assert _segment_schedule(4, 4) == (4,)
    assert _segment_schedule(8, 4) == (4,)


def test_recluster_requires_culling(book_cover_scene):
    with pytest.raises(NotImplementedError, match="culling intersector"):
        render(book_cover_scene, _cover_camera(), BASE.replace(
            engine="fused", intersector="bruteforce", baked_clusters=0,
            recluster=2))
