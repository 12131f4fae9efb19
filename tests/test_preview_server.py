"""Live HTTP render window (utils/preview_server.py) — the headless
analog of the reference's swapchain present (display.rs:112-150)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from wavefront_path_tracer_tpu.utils.image import read_png
from wavefront_path_tracer_tpu.utils.preview_server import PreviewServer


@pytest.fixture
def server():
    s = PreviewServer(port=0, host="127.0.0.1")
    yield s
    s.close()


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.headers.get_content_type(), r.read()


def test_frame_roundtrip(server, tmp_path):
    img = np.zeros((6, 8, 3), np.float32)
    img[:, :, 0] = 1.0  # solid red
    server.publish(img, samples=3, target_spp=10, mrays_per_s=1.5,
                   fps=2.0, frame=1, done=False)
    status, ctype, body = _get(server.port, "/frame.png")
    assert status == 200 and ctype == "image/png"
    p = tmp_path / "f.png"
    p.write_bytes(body)
    decoded = read_png(str(p))
    assert decoded.shape == (6, 8, 3)
    assert decoded[0, 0, 0] == 255 and decoded[0, 0, 1] == 0


def test_status_endpoint(server):
    server.publish(np.zeros((2, 2, 3), np.float32), samples=7,
                   target_spp=16, mrays_per_s=0.5, fps=1.0, frame=4,
                   done=True)
    status, ctype, body = _get(server.port, "/status.json")
    assert status == 200 and ctype == "application/json"
    st = json.loads(body)
    assert st["samples"] == 7 and st["target_spp"] == 16 and st["done"]


def test_viewer_page_and_404(server):
    status, ctype, body = _get(server.port, "/")
    assert status == 200 and b"/stream" in body
    with pytest.raises(urllib.error.HTTPError):
        _get(server.port, "/nope")


def test_frame_before_first_publish_is_503(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server.port, "/frame.png")
    assert e.value.code == 503


def test_stream_pushes_frames(server):
    """/stream is multipart push: a subscriber sees each published
    frame without re-requesting (the swapchain-present analog)."""
    parts = []
    ready = threading.Event()

    def subscribe():
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/stream", timeout=10)
        assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
        ready.set()
        for _ in range(2):
            # boundary line, headers, blank, then the PNG payload
            assert req.readline().strip() == b"--frame"
            headers = {}
            while True:
                line = req.readline().strip()
                if not line:
                    break
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
            n = int(headers[b"content-length"])
            parts.append(req.read(n))
            req.readline()  # trailing CRLF

    t = threading.Thread(target=subscribe, daemon=True)
    t.start()
    assert ready.wait(10)
    import time
    for k in range(2):
        img = np.full((2, 2, 3), k / 2.0, np.float32)
        server.publish(img, samples=k + 1, target_spp=2,
                       mrays_per_s=1.0, fps=1.0, frame=k + 1,
                       done=k == 1)
        # The stream is latest-wins: wait for this part to be consumed
        # before publishing the next, or the subscriber only sees one.
        deadline = time.monotonic() + 10
        while len(parts) < k + 1 and time.monotonic() < deadline:
            time.sleep(0.01)
    t.join(timeout=10)
    assert not t.is_alive() and len(parts) == 2
    assert all(p.startswith(b"\x89PNG") for p in parts)
    assert parts[0] != parts[1]


def _post(port, path, body: bytes):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read()


def test_input_endpoint_queues_keys(server):
    """POST /input queues keys for the render loop; pop_keys drains."""
    status, _ = _post(server.port, "/input", b"wj")
    assert status == 200
    assert server.pop_keys() == "wj"
    assert server.pop_keys() == ""  # drained


def test_input_rejects_cross_site(server):
    """/input is state-changing and unauthenticated, so cross-site
    browser POSTs are refused: a foreign Origin fails, a DNS-name Host
    (the rebinding shape) fails, and same-origin/header-less requests
    pass."""
    def post(headers):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/input", data=b"w",
            method="POST", headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    me = f"127.0.0.1:{server.port}"
    assert post({"Origin": "http://evil.example"}) == 403
    assert post({"Origin": "null"}) == 403
    assert post({"Host": "attacker.example", "Origin":
                 "http://attacker.example"}) == 403  # DNS rebinding
    assert post({"Host": "attacker.example"}) == 403
    assert server.pop_keys() == ""  # nothing leaked through
    assert post({"Origin": f"http://{me}"}) == 200  # the viewer page
    assert post({}) == 200                          # curl-style
    assert server.pop_keys() == "ww"


def test_input_backlog_is_bounded(server):
    server.push_keys("w" * 1000)
    assert len(server.pop_keys()) <= 256


def test_viewer_page_captures_keyboard(server):
    status, _, body = _get(server.port, "/")
    assert status == 200
    assert b"keydown" in body and b"/input" in body


def test_browser_keys_steer_camera(server):
    """A key POSTed to /input drives the camera through
    interactive_loop — the served window both shows AND steers,
    closing the loop with the reference's windowed input path
    (app.rs:74-121 + gui.rs:63-199)."""
    import io

    from wavefront_path_tracer_tpu.app import (
        InteractiveSession, interactive_loop)
    from wavefront_path_tracer_tpu.scene import (
        CameraController, book_cover)
    from wavefront_path_tracer_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1,
                       max_bounces=2, engine="megakernel")
    session = InteractiveSession(
        book_cover(), CameraController.book_one_final(), cfg)
    yaw0 = session.camera.camera.yaw
    _post(server.port, "/input", b"j")   # look left 5 degrees
    _post(server.port, "/input", b"x")   # quit
    interactive_loop(session, input_stream=io.StringIO(""),
                     show_term=False, stream=io.StringIO(),
                     key_source=server.pop_keys, max_frames=3)
    assert session.camera.camera.yaw != yaw0


def test_cli_serve_end_to_end(tmp_path, monkeypatch):
    """--serve publishes every frame batch and the final done frame."""
    from wavefront_path_tracer_tpu import cli
    from wavefront_path_tracer_tpu.utils import preview_server

    captured = []
    real_publish = preview_server.PreviewServer.publish

    def spy(self, image, **status):
        captured.append((np.asarray(image).shape, dict(status)))
        return real_publish(self, image, **status)

    monkeypatch.setattr(preview_server.PreviewServer, "publish", spy)
    out = tmp_path / "o.png"
    rc = cli.main(["--scene", "cornell_spheres", "--width", "16",
                   "--height", "16",
                   "--spp", "2", "--spf", "1", "--max-bounces", "2",
                   "--engine", "megakernel", "--serve", "0",
                   "--out", str(out), "--quiet"])
    assert rc in (0, None) and out.exists()
    # two frame batches + the final done present
    assert len(captured) == 3
    assert captured[-1][1]["done"] is True
    assert captured[0][0] == (16, 16, 3)
