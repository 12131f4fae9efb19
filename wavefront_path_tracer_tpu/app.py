"""Interactive (headless) render session — the event-loop layer.

Re-expresses the reference's winit application shell
(``gpu_wavefront_pt/src/app.rs``) and its disabled imgui input path
(``wavefront_common/src/gui.rs:63-199``) without a window system: a
session owns the renderer, camera controller, and FPS meter; callers
feed it key/mouse events and step frames.  The redraw loop of the
reference (``app.rs:102-121``: fps update -> parameter sync -> render ->
request redraw) becomes ``step()``; camera mutation triggers the same
accumulation restart (``path_tracer.rs:240-277``).

Works as a programmatic API or as a minimal terminal REPL (``python -m
wavefront_path_tracer_tpu.app``) that renders a preview PNG per command.
"""

from __future__ import annotations

import sys
import time
from typing import Optional

from wavefront_path_tracer_tpu.renderer import Renderer, RenderResult
from wavefront_path_tracer_tpu.scene.camera import CameraController
from wavefront_path_tracer_tpu.scene.scene import Scene
from wavefront_path_tracer_tpu.utils.config import RenderConfig
from wavefront_path_tracer_tpu.utils.profiling import FramesPerSecond

# Key bindings mirror the reference (gui.rs:91-134): WASD planar motion,
# Q/E up/down.
_KEY_ACTIONS = {
    "w": "move_forward",
    "s": "move_backward",
    "a": "move_left",
    "d": "move_right",
    "q": "move_up",
    "e": "move_down",
}


class InteractiveSession:
    """Headless interactive rendering: input events + progressive frames."""

    def __init__(self, scene: Scene, camera: CameraController,
                 config: RenderConfig, triangles=None):
        self.camera = camera
        self.renderer = Renderer(scene, camera, config, triangles=triangles)
        self.fps = FramesPerSecond()
        self._last_step = time.perf_counter()

    # -- input events (app.rs:74-101 / gui.rs key handling) --
    def key_event(self, key: str, pressed: bool) -> None:
        action = _KEY_ACTIONS.get(key.lower())
        if action:
            getattr(self.camera, action)(pressed)

    def mouse_delta(self, dx: float, dy: float) -> None:
        self.camera.process_mouse(dx, dy)

    def resize(self, width: int, height: int) -> None:
        self.renderer.resize(width, height)

    def set_vfov(self, vfov_deg: float) -> None:
        self.camera.vfov_deg = vfov_deg
        self.renderer.camera_changed()

    def set_defocus(self, angle_deg: float, focus_distance: Optional[float] = None) -> None:
        self.camera.defocus_angle_deg = angle_deg
        if focus_distance is not None:
            self.camera.focus_distance = focus_distance
        self.renderer.camera_changed()

    # -- the redraw loop body (app.rs:102-121) --
    def step(self) -> Optional[RenderResult]:
        """Integrate camera motion for the elapsed dt, restart
        accumulation if the camera moved, render one SPF batch."""
        now = time.perf_counter()
        dt = now - self._last_step
        self._last_step = now

        before = (tuple(self.camera.camera.position),
                  self.camera.camera.pitch, self.camera.camera.yaw)
        self.camera.update_camera(dt)
        after = (tuple(self.camera.camera.position),
                 self.camera.camera.pitch, self.camera.camera.yaw)
        if before != after:
            self.renderer.camera_changed()

        self.fps.update()
        return self.renderer.render_frame()

    @property
    def progress(self) -> float:
        return self.renderer.progress.progress(
            self.renderer.config.samples_per_pixel)


def repl(argv=None) -> int:
    """Tiny terminal loop: one-letter move commands, renders previews."""
    from wavefront_path_tracer_tpu.cli import build_parser, build_scene
    from wavefront_path_tracer_tpu.utils.image import write_png

    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    scene, triangles, file_cam = build_scene(args)
    from wavefront_path_tracer_tpu.cli import resolve_intersector

    intersector, clusters, notes = resolve_intersector(
        args.engine, args.intersector, args.clusters, scene, triangles)
    for n in notes:
        print(n, file=sys.stderr)
    cc = CameraController.book_one_final()
    cc.camera = cc.camera.look_at(args.look_from, args.look_at)
    if file_cam:
        from wavefront_path_tracer_tpu.scene.file import apply_camera_dict

        apply_camera_dict(cc, file_cam)
    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, samples_per_frame=args.spf,
                       max_bounces=args.max_bounces, engine=args.engine,
                       intersector=intersector, baked_clusters=clusters)
    session = InteractiveSession(scene, cc, cfg, triangles=triangles)

    print("commands: w/a/s/d/q/e move, r render-to-spp, p save png, x quit",
          file=sys.stderr)
    for line in sys.stdin:
        cmd = line.strip().lower()
        if cmd == "x":
            break
        elif cmd in _KEY_ACTIONS:
            session.key_event(cmd, True)
            session.step()
            session.key_event(cmd, False)
            print(f"pos={session.camera.camera.position}", file=sys.stderr)
        elif cmd == "r":
            while True:
                r = session.step()
                if r is None or session.progress >= 1.0:
                    break
            print(f"progress={session.progress:.0%} "
                  f"fps={session.fps.get_avg_fps():.1f}", file=sys.stderr)
        elif cmd == "p":
            from wavefront_path_tracer_tpu.utils.image import display_transform

            session.renderer.render_frame()
            samples = max(1, session.renderer.progress.accumulated_samples)
            img = display_transform(
                session.renderer._accum.reshape(cfg.height, cfg.width, 3), samples
            )
            write_png(args.out, img)
            print(f"wrote {args.out} @ {samples} spp", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(repl())
