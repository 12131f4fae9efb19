"""Scene construction: spheres, materials, cameras, BVH."""

from wavefront_path_tracer_tpu.scene.scene import (  # noqa: F401
    LAMBERTIAN,
    METAL,
    DIELECTRIC,
    Scene,
    SceneBuilder,
    book_bubble,
    book_cover,
    book_one_final,
    procedural_spheres,
)
from wavefront_path_tracer_tpu.scene.camera import (  # noqa: F401
    Camera,
    CameraController,
    GPUCamera,
    inverse_projection,
)
