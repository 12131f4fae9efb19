"""Smoke tests for the driver bench runner's scene plumbing.

bench.py is the round's official perf record, so its scene-construction
paths (especially the procedural knot added for the driver-tracked mesh
rows) must not rot between TPU runs.  These run tiny configs on CPU —
they validate plumbing, not throughput.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_bench_once_knot_scene_cpu():
    """The mesh_knot<N>k scene name builds a ground sphere + N*1000-ish
    triangle knot and frames it with the knot camera.  Engine:
    megakernel — the CPU-cheap path; the tracked row's fused engine is
    exercised on the real device by the bench run itself (interpret-mode
    Pallas on a 1k-triangle scene is minutes-slow, too heavy for a
    smoke test)."""
    r = bench.bench_once("mesh_knot1k", 64, 32, 1, "megakernel",
                         "bruteforce", max_bounces=4)
    assert r["scene"] == "mesh_knot1k"
    assert r["rays"] > 64 * 32  # at least one bounce beyond primaries
    assert r["mrays_per_s"] > 0
    # The knot must actually be in frame: a miss-everything render has
    # exactly 2 rays/pixel (primary + ground bounce);  the knot adds
    # bounce depth.
    assert r["rays"] / (64 * 32) > 1.5


def test_bench_once_book_scene_cpu():
    r = bench.bench_once("book_cover", 64, 32, 1, "megakernel",
                         "bruteforce", max_bounces=4)
    assert r["mrays_per_s"] > 0


def test_knot_tris_parsing():
    """Knot scene names parse strictly: the bare name means the 50k
    stress scene, '<N>k' scales it, and malformed suffixes are errors
    rather than silent 50k fallbacks (a typo'd row must not record a
    mislabeled measurement)."""
    import pytest

    assert bench.knot_tris("mesh_knot") == 50000
    assert bench.knot_tris("mesh_knot50k") == 50000
    assert bench.knot_tris("mesh_knot1k") == 1000
    for bad in ("mesh_knot500", "mesh_knotk", "mesh_knot5k0",
                "mesh_knot_5k"):
        with pytest.raises(ValueError):
            bench.knot_tris(bad)
    for key, scene, *_ in bench.MESH_ROWS:
        if scene.startswith("mesh_knot"):
            bench.knot_tris(scene)  # tracked rows must parse


def test_mesh_rows_spec_shape():
    """Every tracked mesh row names a resolvable scene/intersector (a
    typo here silently turns the driver record's row into an error
    entry)."""
    for key, scene, w, h, spp, intersector in bench.MESH_ROWS:
        assert intersector in ("baked", "bruteforce")
        assert scene.startswith("mesh_")
        assert w * h > 0 and spp > 0
