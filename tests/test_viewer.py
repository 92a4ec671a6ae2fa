"""Interactive viewer (tools/viewer.py) — the WASM-frontend analog.

Reference behavior being mirrored: examples/web/src/lib.rs exposes a
progressive path tracer to the browser (`Scene::new`, `render_block`
incremental accumulation, `get_img` gamma-2.2 paint). Here the browser is a
thin HTTP frontend; these tests exercise the server contract: progressive
accumulation, camera orbit with accumulation restart AND executable reuse,
pause, and the PNG endpoint.
"""
import json
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import viewer  # noqa: E402


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.read()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def _wait(pred, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.1)
    return False


@pytest.fixture(scope="module")
def server():
    port = 8797
    srv = viewer.main(["cbox", "--port", str(port), "--res", "0.0625",
                       "--", "path", "-m", "3"], block=False)
    yield port
    viewer._STATE["stop"] = True
    srv.shutdown()


def test_progressive_accumulation(server):
    port = server
    assert _wait(lambda: viewer._STATE["spp"] >= 3)
    st = json.loads(_get(port, "/api/state"))
    assert st["width"] == 32 and st["height"] == 32
    assert st["spp"] >= 3 and st["backend"] == "cpu"
    png = _get(port, "/img.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    page = _get(port, "/").decode()
    assert "api/orbit" in page and "img.png" in page


def test_orbit_resets_and_reuses_executable(server):
    port = server
    assert _wait(lambda: viewer._STATE["spp"] >= 5)
    png_before = _get(port, "/img.png")
    spp_before = json.loads(_get(port, "/api/state"))["spp"]
    t0 = time.time()
    _post(port, "/api/orbit", {"dtheta": 1.2, "dzoom": 0.8})
    # accumulation restarts at the new pose (seq strictly advances, and a
    # fresh accumulation run reaches >= 5 spp below; spp itself can race
    # past spp_before between polls on a fast pass loop)
    assert _wait(lambda: 0 < viewer._STATE["spp"] < spp_before
                 or viewer._STATE["elapsed"] < time.time() - t0)
    assert _wait(lambda: viewer._STATE["spp"] >= 5)
    # executable reuse: the camera is a jit ARGUMENT, so the orbit must not
    # have built a second executable (deterministic — no wall-clock bound,
    # which flaked under machine load)
    assert viewer._STATE["n_exec"] == 1, viewer._STATE["n_exec"]
    png_after = _get(port, "/img.png")
    assert png_after != png_before  # the camera actually moved


def test_pause_and_resume(server):
    port = server
    _post(port, "/api/pause", {"paused": True})
    assert _wait(lambda: viewer._STATE["paused"])
    time.sleep(0.4)
    spp = json.loads(_get(port, "/api/state"))["spp"]
    time.sleep(0.6)
    assert json.loads(_get(port, "/api/state"))["spp"] == spp
    _post(port, "/api/pause", {"paused": False})
    assert _wait(lambda: viewer._STATE["spp"] > spp)


def test_orbit_camera_math():
    """The rebuilt rigid transform keeps the projection half and looks at
    the orbit target."""
    from rustlight_tpu.scene.camera import make_camera, look_at

    cam = make_camera(32, 32, 45.0, look_at((0, 1, -4), (0, 1, 0), (0, 1, 0)))
    viewer._ORBIT.update(theta=0.7, phi=0.3, radius=5.0,
                         target=np.zeros(3, np.float32),
                         up=np.array([0.0, 1.0, 0.0], np.float32))
    cam2 = viewer._orbit_camera(cam)
    # projection untouched
    np.testing.assert_array_equal(np.asarray(cam2.sample_to_camera),
                                  np.asarray(cam.sample_to_camera))
    # eye on the orbit sphere
    eye = np.asarray(cam2.to_world)[:3, 3]
    assert np.linalg.norm(eye) == pytest.approx(5.0, rel=1e-5)
    # forward axis points at the target
    fwd = np.asarray(cam2.to_world)[:3, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-5)
    # to_local inverts to_world
    np.testing.assert_allclose(
        np.asarray(cam2.to_local) @ np.asarray(cam2.to_world), np.eye(4),
        atol=1e-5)
