"""Scene construction parity with the reference generators."""

import numpy as np

from wavefront_path_tracer_tpu.scene import (
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    book_cover,
    book_one_final,
    procedural_spheres,
)


def test_book_cover_matches_reference_layout(book_cover_scene):
    s = book_cover_scene
    # 5 spheres / 5 materials (reference scene.rs:12-46).
    assert s.num_spheres == 5
    assert s.num_materials == 5
    np.testing.assert_allclose(s.centers[0], [0.0, -100.5, -1.0])
    assert s.radii[0] == 100.0
    # Hollow bubble: same center as the glass sphere, r=0.4, ior 1/1.5.
    np.testing.assert_allclose(s.centers[3], s.centers[4])
    assert s.radii[4] == np.float32(0.4)
    assert s.mat_type[4] == DIELECTRIC
    np.testing.assert_allclose(s.refract_idx[4], 1.0 / 1.5, rtol=1e-6)
    # Metal right sphere fuzz clamped to [0,1].
    assert s.mat_type[2] == METAL and s.fuzz[2] == 1.0


def test_book_one_final_structure(final_scene):
    s = final_scene
    # ground + grid (~380-450 after the exclusion zone) + 3 big spheres.
    assert 300 < s.num_spheres < 500
    assert s.mat_type[0] == LAMBERTIAN and s.radii[0] == 1000.0
    # The three big spheres are the last three.
    np.testing.assert_allclose(s.centers[-3], [0.0, 1.0, 0.0])
    np.testing.assert_allclose(s.centers[-2], [-4.0, 1.0, 0.0])
    np.testing.assert_allclose(s.centers[-1], [4.0, 1.0, 0.0])
    assert s.mat_type[-3] == DIELECTRIC
    assert s.mat_type[-2] == LAMBERTIAN
    assert s.mat_type[-1] == METAL
    # All three material families present in the grid.
    assert set(np.unique(s.mat_type)) == {LAMBERTIAN, METAL, DIELECTRIC}
    # Per-sphere gathered tables agree with the normalized tables.
    np.testing.assert_array_equal(s.albedo, s.table_albedo[s.mat_idx])
    np.testing.assert_array_equal(s.fuzz, s.table_fuzz[s.mat_idx])


def test_book_one_final_reproducible():
    a = book_one_final(seed=42)
    b = book_one_final(seed=42)
    np.testing.assert_array_equal(a.centers, b.centers)
    c = book_one_final(seed=7)
    assert a.num_spheres != c.num_spheres or not np.array_equal(a.centers, c.centers)


def test_procedural_scene_scales():
    s = procedural_spheres(n=1000, seed=1)
    assert s.num_spheres == 1001
    lo, hi = s.aabbs()
    assert lo.shape == (1001, 3)
    assert (hi >= lo).all()


def test_cornell_spheres_material_mix():
    from wavefront_path_tracer_tpu.scene.scene import cornell_spheres

    s = cornell_spheres()
    assert s.num_spheres == 64
    kinds, counts = np.unique(s.mat_type, return_counts=True)
    frac = dict(zip(kinds.tolist(), (counts / s.num_spheres).tolist()))
    # Specular-heavy: glass + metal dominate the interior.
    assert frac.get(DIELECTRIC, 0) + frac.get(METAL, 0) > 0.5
