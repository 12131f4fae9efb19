"""Native C++ BVH builder: bit-parity with the numpy builder + speed."""

import time

import numpy as np
import pytest

from wavefront_path_tracer_tpu.scene import book_cover, procedural_spheres
from wavefront_path_tracer_tpu.scene.bvh import build_flat_bvh

bvh_native = pytest.importorskip(
    "wavefront_path_tracer_tpu.native.bvh_native", reason="no native toolchain"
)


def _assert_identical(scene):
    py_bvh, py_perm = build_flat_bvh(scene.centers, scene.radii)
    nat_bvh, nat_perm = bvh_native.build_flat_bvh(scene.centers, scene.radii)
    np.testing.assert_array_equal(nat_perm, py_perm)
    np.testing.assert_array_equal(nat_bvh.left_first, py_bvh.left_first)
    np.testing.assert_array_equal(nat_bvh.prim_count, py_bvh.prim_count)
    # Bit-exact AABBs: same f32 evaluation order by construction.
    np.testing.assert_array_equal(nat_bvh.aabb_min, py_bvh.aabb_min)
    np.testing.assert_array_equal(nat_bvh.aabb_max, py_bvh.aabb_max)


def test_native_matches_python_cover():
    _assert_identical(book_cover())


def test_native_matches_python_final(final_scene):
    _assert_identical(final_scene)


def test_native_matches_python_procedural():
    _assert_identical(procedural_spheres(n=3000, seed=9))


def test_native_is_faster_at_scale():
    scene = procedural_spheres(n=10000, seed=4)
    t0 = time.perf_counter()
    bvh_native.build_flat_bvh(scene.centers, scene.radii)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_flat_bvh(scene.centers, scene.radii)
    python_t = time.perf_counter() - t0
    assert native_t < python_t, (native_t, python_t)
