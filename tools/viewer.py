#!/usr/bin/env python
"""Progressive render viewer — the analog of the reference's in-browser WASM
frontend (examples/web: Scene::new/step/image progressive path tracing).

Renders one pass per step, averages, and serves the running image over HTTP
with auto-refresh:

  python tools/viewer.py cbox --port 8000 -- path -m 6
"""
import argparse
import io
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

_STATE = {"png": b"", "spp": 0, "elapsed": 0.0}
_PAGE = """<html><head><meta http-equiv="refresh" content="1">
<title>rustlight_tpu viewer</title></head>
<body style="background:#222;color:#ddd;font-family:monospace">
<h3>rustlight_tpu — %d spp, %.1fs</h3>
<img src="/img.png" style="image-rendering:pixelated;width:70%%"/>
</body></html>"""


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path.startswith("/img.png"):
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(_STATE["png"])
        else:
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write((_PAGE % (_STATE["spp"], _STATE["elapsed"])).encode())

    def log_message(self, *a):
        pass


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--res", type=float, default=0.25, help="image scale")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="-- followed by CLI integrator args")
    args = ap.parse_args()

    from rustlight_tpu.cli import build_parser, load_scene_arg, build_integrator
    from rustlight_tpu.integrators.meta import _render_once
    from rustlight_tpu.utils.image import tonemap_gamma

    rest = [a for a in args.rest if a != "--"] or ["path"]
    cli_args = build_parser().parse_args(
        [args.scene, "-s", str(args.res)] + rest)
    scene = load_scene_arg(cli_args)
    sd = scene.compile()
    integ = build_integrator(cli_args)

    server = ThreadingHTTPServer(("0.0.0.0", args.port), _Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"serving on http://localhost:{args.port}")

    from PIL import Image
    t0 = time.time()
    avg = None
    it = 0
    while True:
        film = _render_once(sd, integ, 1, seed=it)
        if avg is None:
            avg = film["primal"].astype(np.float64)
        else:
            avg = (avg * it + film["primal"]) / (it + 1)
        it += 1
        buf = io.BytesIO()
        Image.fromarray(tonemap_gamma(avg)).save(buf, format="PNG")
        _STATE.update(png=buf.getvalue(), spp=it, elapsed=time.time() - t0)


if __name__ == "__main__":
    main()
