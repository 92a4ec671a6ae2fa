#!/usr/bin/env python
"""Interactive progressive render viewer — the analog of the reference's
in-browser WASM frontend (examples/web/src/lib.rs: `Scene::new` +
`render_block` + `get_img` progressive path tracing driven from JS).

The reference compiles the renderer to WASM so the browser is the compute
device; here the compute device is the TPU, so the browser is a thin
interactive frontend over HTTP while the wavefront renderer accumulates
passes server-side:

  * progressive accumulation: one whole-wavefront pass per step (the
    reference's `render_block` unit becomes one full-image sample — there
    are no blocks on a wavefront machine), running average like lib.rs's
    `img[i] += c; nb_samples[i] += 1`.
  * interactivity: click-drag orbit / wheel zoom / key controls move the
    camera around the scene's bounding-sphere center and restart
    accumulation.  The interactive step jits with the CAMERA AS AN
    ARGUMENT (geometry/material/emitter tables stay compile-time
    constants), so every camera move reuses ONE executable instead of
    recompiling — the property that makes orbiting viable through a
    20-minute-cold-compile TPU relay.
  * `get_img` analog: gamma-2.2 tonemapped PNG (lib.rs:221-232), polled by
    the page's fetch loop.

  python tools/viewer.py cbox --port 8000 -- path -m 6
"""
import argparse
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

_STATE = {
    "png": b"", "spp": 0, "elapsed": 0.0, "seq": 0, "paused": False,
    "backend": "", "width": 0, "height": 0, "pass_s": 0.0, "scene": "",
    "integrator": "", "stop": False,
}
_LOCK = threading.Lock()
_ORBIT = {"dirty": False, "theta": 0.0, "phi": 0.0, "radius": 1.0,
          "target": None, "up": np.array([0.0, 1.0, 0.0], np.float32)}

_PAGE = """<!doctype html><html><head><title>rustlight_tpu viewer</title>
<style>
 body{background:#1b1b1f;color:#d6d6dc;font-family:monospace;margin:0}
 #bar{padding:8px 12px;display:flex;gap:16px;align-items:center}
 #bar b{color:#8ecaff}
 #img{image-rendering:pixelated;width:70vmin;display:block;margin:0 auto;
      cursor:grab;user-select:none;-webkit-user-drag:none}
 button{background:#2a2a31;color:#d6d6dc;border:1px solid #444;
        font-family:monospace;padding:2px 10px;cursor:pointer}
 #help{padding:4px 12px;color:#888}
</style></head><body>
<div id="bar">
 <b>rustlight_tpu</b><span id="stats">…</span>
 <button id="pause">pause</button><button id="reset">reset</button>
</div>
<div id="help">drag = orbit &nbsp; wheel / +- = zoom &nbsp; arrows = orbit</div>
<img id="img" draggable="false"/>
<script>
const img=document.getElementById('img'), stats=document.getElementById('stats');
let seq=-1, paused=false;
async function post(u,b){await fetch(u,{method:'POST',body:JSON.stringify(b||{})});}
async function poll(){
  try{
    const s=await (await fetch('/api/state')).json();
    stats.textContent=`${s.scene} · ${s.integrator} · ${s.width}x${s.height} · `+
      `${s.spp} spp · ${s.elapsed.toFixed(1)}s · ${s.pass_s.toFixed(1)} pass/s · ${s.backend}`;
    paused=s.paused;
    document.getElementById('pause').textContent=paused?'resume':'pause';
    if(s.seq!==seq){seq=s.seq;img.src='/img.png?v='+seq;}
  }catch(e){}
  setTimeout(poll,250);
}
poll();
let drag=null;
img.addEventListener('pointerdown',e=>{drag=[e.clientX,e.clientY];img.setPointerCapture(e.pointerId);});
img.addEventListener('pointermove',e=>{
  if(!drag)return;
  const dx=e.clientX-drag[0],dy=e.clientY-drag[1];drag=[e.clientX,e.clientY];
  post('/api/orbit',{dtheta:-dx*0.01,dphi:dy*0.01});
});
img.addEventListener('pointerup',e=>{drag=null;});
img.addEventListener('wheel',e=>{e.preventDefault();post('/api/orbit',{dzoom:e.deltaY>0?1.12:0.89});});
document.getElementById('pause').onclick=()=>post('/api/pause',{paused:!paused});
document.getElementById('reset').onclick=()=>post('/api/reset');
window.addEventListener('keydown',e=>{
  const k=e.key;
  if(k==='ArrowLeft')post('/api/orbit',{dtheta:0.15});
  else if(k==='ArrowRight')post('/api/orbit',{dtheta:-0.15});
  else if(k==='ArrowUp')post('/api/orbit',{dphi:0.15});
  else if(k==='ArrowDown')post('/api/orbit',{dphi:-0.15});
  else if(k==='+'||k==='=')post('/api/orbit',{dzoom:0.89});
  else if(k==='-')post('/api/orbit',{dzoom:1.12});
});
</script></body></html>"""


class _Handler(BaseHTTPRequestHandler):
    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/img.png"):
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(_STATE["png"])
        elif self.path.startswith("/api/state"):
            with _LOCK:
                st = {k: v for k, v in _STATE.items() if k != "png"}
            self._json(st)
        else:
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE.encode())

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        try:
            body = json.loads(self.rfile.read(n) or b"{}")
        except ValueError:
            body = {}
        with _LOCK:
            if self.path.startswith("/api/orbit"):
                _ORBIT["theta"] += float(body.get("dtheta", 0.0))
                _ORBIT["phi"] = float(np.clip(
                    _ORBIT["phi"] + float(body.get("dphi", 0.0)), -1.48, 1.48))
                _ORBIT["radius"] *= float(body.get("dzoom", 1.0))
                _ORBIT["dirty"] = True
            elif self.path.startswith("/api/pause"):
                _STATE["paused"] = bool(body.get("paused",
                                                 not _STATE["paused"]))
            elif self.path.startswith("/api/reset"):
                _ORBIT["dirty"] = True
        self._json({"ok": True})

    def log_message(self, *a):
        pass


def _orbit_camera(cam):
    """Rebuild the rigid camera transform from the orbit state; the
    projection half (sample<->camera) is untouched, so only to_world /
    to_local change — both traced arguments of the interactive step."""
    from rustlight_tpu.scene.camera import look_at
    t, p, r = _ORBIT["theta"], _ORBIT["phi"], _ORBIT["radius"]
    tgt = _ORBIT["target"]
    eye = tgt + r * np.array([np.cos(p) * np.sin(t), np.sin(p),
                              np.cos(p) * np.cos(t)], np.float32)
    m = look_at(eye, tgt, _ORBIT["up"])
    import jax
    # device_put: the compiled step's executable cache keys on committed
    # shardings, so numpy leaves here (vs the committed device arrays the
    # initial camera carries from Scene.compile) would silently build a
    # second executable per pose family
    return jax.device_put(cam.replace(
        to_world=np.asarray(m, np.float32),
        to_local=np.linalg.inv(m).astype(np.float32)))


def make_interactive_step(sd, integrator):
    """One progressive pass with the camera as a traced argument.

    Returns (step, cam0): `step(cam, pass_idx)` -> [h*w, 3] radiance of one
    sample per pixel, jitted once and reused for every camera pose (the
    reference's `render_block` loop equivalent; geometry stays a
    compile-time constant exactly like the non-interactive path)."""
    import jax
    import jax.numpy as jnp
    from rustlight_tpu.integrators.common import _pixel_grid
    from rustlight_tpu.utils.rng import make_stream, stream_fold

    cam0 = sd.camera
    pix = jnp.asarray(_pixel_grid(cam0.width, cam0.height))
    if hasattr(integrator, "prepare"):
        integrator.prepare(sd)
    base = make_stream(0)

    @jax.jit
    def step(cam, pass_idx):
        sd2 = sd.replace(camera=cam)
        stream = stream_fold(base, pass_idx)
        li = integrator.compute_pixel(sd2, pix, stream)
        ok = jnp.all(jnp.isfinite(li), axis=-1) & jnp.all(li >= 0.0, axis=-1)
        return jnp.where(ok[:, None], li, 0.0)

    return step, cam0


def _render_loop(sd, integrator):
    import jax
    from PIL import Image
    from rustlight_tpu.utils.image import tonemap_gamma

    step, cam = make_interactive_step(sd, integrator)
    h, w = cam.height, cam.width
    with _LOCK:
        _STATE.update(width=w, height=h, backend=jax.default_backend())
    avg = np.zeros((h, w, 3), np.float64)
    it = 0
    t0 = time.time()
    tp = None
    while not _STATE["stop"]:
        with _LOCK:
            if _ORBIT["dirty"]:
                cam = _orbit_camera(cam)
                avg[:] = 0.0
                it = 0
                t0 = time.time()
                _ORBIT["dirty"] = False
            paused = _STATE["paused"]
        if paused:
            time.sleep(0.1)
            continue
        tq = time.time()
        li = np.asarray(step(cam, it)).reshape(h, w, 3)
        avg = (avg * it + li) / (it + 1)
        it += 1
        dt = time.time() - tq
        tp = dt if tp is None else 0.8 * tp + 0.2 * dt
        buf = io.BytesIO()
        Image.fromarray(tonemap_gamma(avg)).save(buf, format="PNG")
        with _LOCK:
            _STATE.update(png=buf.getvalue(), spp=it,
                          elapsed=time.time() - t0, seq=_STATE["seq"] + 1,
                          pass_s=(1.0 / tp if tp > 0 else 0.0),
                          # executables built so far: must stay 1 across
                          # orbits (camera is a traced ARGUMENT, so a pose
                          # change never recompiles)
                          n_exec=step._cache_size())


def main(argv=None, block=True):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--res", type=float, default=0.25, help="image scale")
    argv = sys.argv[1:] if argv is None else list(argv)
    # everything after a literal `--` goes verbatim to the CLI parser
    # (argparse.REMAINDER would also swallow --port/--res)
    rest_args = []
    if "--" in argv:
        i = argv.index("--")
        argv, rest_args = argv[:i], argv[i + 1:]
    args = ap.parse_args(argv)
    args.rest = rest_args

    from rustlight_tpu.cli import (build_parser, load_scene_arg,
                                   build_integrator, _respect_platform_env)
    from rustlight_tpu.scene.geometry import scene_bounds

    _respect_platform_env()  # the axon plugin ignores JAX_PLATFORMS=cpu

    rest = args.rest or ["path"]
    cli_args = build_parser().parse_args(
        [args.scene, "-s", str(args.res)] + rest)
    scene = load_scene_arg(cli_args)
    _, _, center, _ = scene_bounds(scene.meshes)
    sd = scene.compile()
    integ = build_integrator(cli_args)

    # seed the orbit from the loaded camera: spherical coords of the eye
    # around the scene bounding-sphere center
    eye = np.asarray(sd.camera.to_world)[:3, 3]
    v = eye - center
    r = float(np.linalg.norm(v))
    _ORBIT.update(target=center.astype(np.float32), radius=max(r, 1e-3),
                  theta=float(np.arctan2(v[0], v[2])),
                  phi=float(np.arcsin(np.clip(v[1] / max(r, 1e-3), -1, 1))))
    with _LOCK:
        _STATE.update(scene=args.scene, integrator=rest[0])

    server = ThreadingHTTPServer(("0.0.0.0", args.port), _Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"serving on http://localhost:{args.port}", flush=True)

    if block:
        _render_loop(sd, integ)
    else:
        threading.Thread(target=_render_loop, args=(sd, integ),
                         daemon=True).start()
        return server


if __name__ == "__main__":
    main()
