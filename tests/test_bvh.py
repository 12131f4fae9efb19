"""BVH build invariants + traversal agreement with brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from wavefront_path_tracer_tpu.ops.bvh_traverse import intersect_bvh
from wavefront_path_tracer_tpu.ops.intersect import intersect_bruteforce
from wavefront_path_tracer_tpu.scene import book_one_final, procedural_spheres
from wavefront_path_tracer_tpu.scene.bvh import build_bvh, build_flat_bvh, bvh_depth


def _check_invariants(bvh, centers, radii, perm):
    n = centers.shape[0]
    # Permutation is a permutation.
    np.testing.assert_array_equal(np.sort(perm), np.arange(n))
    pc = bvh.prim_count
    lf = bvh.left_first
    # Leaves cover each primitive exactly once.
    covered = np.zeros(n, np.int32)
    for i in range(bvh.num_nodes):
        if i == 1:  # dummy node
            continue
        if pc[i] > 0:
            covered[lf[i] : lf[i] + pc[i]] += 1
            assert pc[i] <= 4
    leaf_only = covered.copy()
    # Internal nodes reference valid adjacent children.
    for i in range(bvh.num_nodes):
        if i == 1 or pc[i] > 0:
            continue
        assert 2 <= lf[i] < bvh.num_nodes - 1
    # Skip nodes that are descendants of other leaves: root reachability.
    reach = np.zeros(n, np.int32)
    stack = [0]
    while stack:
        node = stack.pop()
        if pc[node] > 0:
            reach[lf[node] : lf[node] + pc[node]] += 1
        else:
            stack.extend([int(lf[node]), int(lf[node]) + 1])
    np.testing.assert_array_equal(reach, 1)
    # Node AABBs contain their primitives (in permuted order).
    c = centers[perm]
    r = radii[perm]
    stack = [0]
    while stack:
        node = stack.pop()
        if pc[node] > 0:
            sl = slice(lf[node], lf[node] + pc[node])
            assert (c[sl] - r[sl, None] >= bvh.aabb_min[node] - 1e-4).all()
            assert (c[sl] + r[sl, None] <= bvh.aabb_max[node] + 1e-4).all()
        else:
            stack.extend([int(lf[node]), int(lf[node]) + 1])


def test_build_invariants_final_scene(final_scene):
    bvh, perm = build_flat_bvh(final_scene.centers, final_scene.radii)
    _check_invariants(bvh, final_scene.centers, final_scene.radii, perm)
    assert bvh_depth(bvh) < 40


def test_build_single_and_tiny():
    c = np.array([[0.0, 0.0, -3.0]], np.float32)
    r = np.array([1.0], np.float32)
    bvh, perm = build_flat_bvh(c, r)
    assert bvh.prim_count[0] == 1  # root is a leaf
    _check_invariants(bvh, c, r, perm)

    c2 = np.array([[0, 0, -3], [0, 0, 3], [3, 0, 0]], np.float32)
    r2 = np.ones(3, np.float32)
    bvh2, perm2 = build_flat_bvh(c2, r2)
    _check_invariants(bvh2, c2, r2, perm2)


@pytest.mark.parametrize("scene_fn,n_rays", [(book_one_final, 512)])
def test_traversal_matches_bruteforce(scene_fn, n_rays):
    scene = scene_fn()
    bvh, ordered = build_bvh(scene, backend="python")
    rs = np.random.RandomState(11)
    # Rays from around the camera toward the scene, plus random ones.
    origin = np.tile([[13.0, 2.0, 3.0]], (n_rays, 1)).astype(np.float32)
    target = rs.randn(n_rays, 3).astype(np.float32) * 4
    direction = target - origin
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    origin[n_rays // 2 :] = rs.randn(n_rays // 2, 3) * 5  # interior rays

    t_b, i_b, h_b = intersect_bruteforce(
        jnp.asarray(origin), jnp.asarray(direction),
        jnp.asarray(ordered.centers), jnp.asarray(ordered.radii),
    )
    t_v, i_v, h_v = intersect_bvh(
        jnp.asarray(origin), jnp.asarray(direction),
        jnp.asarray(ordered.centers), jnp.asarray(ordered.radii),
        jnp.asarray(bvh.aabb_min), jnp.asarray(bvh.aabb_max),
        jnp.asarray(bvh.left_first), jnp.asarray(bvh.prim_count),
    )
    # The two intersectors use the same formulas but XLA may fuse
    # (FMA/contract) them differently, so agreement is to float32
    # round-off, not bit-exact.
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_v))
    hb = np.asarray(h_b)
    np.testing.assert_allclose(np.asarray(t_v)[hb], np.asarray(t_b)[hb], rtol=2e-4)
    agree = (np.asarray(i_v)[hb] == np.asarray(i_b)[hb]).mean()
    assert agree > 0.99  # rare near-tie hits may pick the other sphere


def test_traversal_matches_bruteforce_procedural():
    scene = procedural_spheres(n=2000, seed=3)
    bvh, ordered = build_bvh(scene, backend="python")
    assert bvh_depth(bvh) > 8  # actually deep
    rs = np.random.RandomState(12)
    n_rays = 256
    origin = rs.randn(n_rays, 3).astype(np.float32) * 20
    origin[:, 1] = np.abs(origin[:, 1]) + 0.5
    direction = rs.randn(n_rays, 3).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    t_b, i_b, h_b = intersect_bruteforce(
        jnp.asarray(origin), jnp.asarray(direction),
        jnp.asarray(ordered.centers), jnp.asarray(ordered.radii),
    )
    t_v, i_v, h_v = intersect_bvh(
        jnp.asarray(origin), jnp.asarray(direction),
        jnp.asarray(ordered.centers), jnp.asarray(ordered.radii),
        jnp.asarray(bvh.aabb_min), jnp.asarray(bvh.aabb_max),
        jnp.asarray(bvh.left_first), jnp.asarray(bvh.prim_count),
    )
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_v))
    hb = np.asarray(h_b)
    np.testing.assert_allclose(np.asarray(t_v)[hb], np.asarray(t_b)[hb], rtol=2e-4)


def test_triangle_bvh_matches_bruteforce():
    """Triangle BVH traversal (generalized AABB builder + Moller-Trumbore
    leaf tests) agrees with the brute-force triangle intersector."""
    import numpy as np

    from wavefront_path_tracer_tpu.ops.bvh_traverse import (
        intersect_bvh_triangles)
    from wavefront_path_tracer_tpu.ops.triangle import intersect_triangles
    from wavefront_path_tracer_tpu.scene.bvh import build_flat_bvh_aabb
    from wavefront_path_tracer_tpu.scene.mesh import mesh_terrain_scene

    _, tris = mesh_terrain_scene(n_quads=10, seed=4)
    v0 = np.asarray(tris.v0)
    e1 = np.asarray(tris.e1)
    e2 = np.asarray(tris.e2)
    verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    bvh, perm = build_flat_bvh_aabb(verts.min(axis=1), verts.max(axis=1))
    v0p, e1p, e2p = v0[perm], e1[perm], e2[perm]

    rng = np.random.RandomState(0)
    n = 512
    origin = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    origin[:, 1] = rng.uniform(2.5, 8.0, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t_b, i_b, h_b = intersect_triangles(origin, d, v0p, e1p, e2p)
    t_v, i_v, h_v = intersect_bvh_triangles(
        origin, d, v0p, e1p, e2p,
        bvh.aabb_min, bvh.aabb_max, bvh.left_first, bvh.prim_count)
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_v))
    np.testing.assert_allclose(np.asarray(t_v)[np.asarray(h_b)],
                               np.asarray(t_b)[np.asarray(h_b)], rtol=1e-5)


def test_wavefront_bvh_triangles_render():
    """wavefront/bvh renders a mesh scene identically to megakernel
    brute force (triangle BVH wired through prepare_scene)."""
    import numpy as np

    from wavefront_path_tracer_tpu.renderer import render
    from wavefront_path_tracer_tpu.scene.mesh import mesh_terrain_scene
    from tests.test_engines import BASE, _cover_camera

    scene, tris = mesh_terrain_scene(n_quads=5, seed=2)
    cfg = BASE.replace(samples_per_pixel=2, samples_per_frame=2)
    ref = render(scene, _cover_camera(), cfg.replace(engine="megakernel"),
                 triangles=tris)
    wf = render(scene, _cover_camera(),
                cfg.replace(engine="wavefront", intersector="bvh"),
                triangles=tris)
    d = np.abs(ref.accumulated - wf.accumulated).max(axis=-1)
    assert (d > 1e-3).mean() < 0.01  # near-tie reorder flips only
