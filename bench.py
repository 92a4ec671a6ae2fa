"""Headline benchmark: path tracing throughput on the local chip.

Prints ONE JSON line (the driver contract) — Mrays/s (primary + bounce +
shadow rays / wall-clock), rendered with the persistent-wavefront loop
(pixel-pinned lane respawn keeps the wavefront full through Russian
roulette; see IntegratorPathTracing.compute_block). Two configs ride in
it:
  1. cbox 512^2 128 spp (the BASELINE config; dense MXU intersector) —
     the top-level metric, with the round-5 correctness gate (8x8
     block-means vs a committed TPU reference within 4x the measured
     seed floor; "ok": false + exit 1 on violation),
  2. 122k-tri sphere grid 256^2 8 spp depth 5 (the production Pallas
     tile-walk intersector on divergent wavefronts) — detail.grid122k,
  3. 516k-tri grid path (detail.grid516k) and the 4.9M-tri wide-mode AO
     frontier (detail.grid4p9M) — the rows VERDICT r4 item 5 asked the
     driver record to track.

vs_baseline is measured against the BASELINE.json target of >= 100 Mrays/s
aggregate on a v5e-8, i.e. 12.5 Mrays/s per chip. Ray count is the actual
number of traced rays (trace + NEE shadow per live lane per bounce),
measured by an instrumented pass — not lanes*bounces.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def _probe_devices(timeout_s: float = 240.0) -> str:
    """Check device availability in a bounded subprocess: the axon TPU
    tunnel has two observed failure phases — ops hang on a futex, or the
    backend errors at init. Either way the bench must emit its one JSON
    line instead of hanging the driver or stack-tracing."""
    code = ("import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "p and jax.config.update('jax_platforms', p)\n"  # axon ignores env
            "print(jax.devices()[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0:
            return r.stdout.strip()
        tail = (r.stderr.strip().splitlines() or [f"rc={r.returncode}"])[-1]
        return f"backend init failed: {tail[:200]}"
    except subprocess.TimeoutExpired:
        return "backend probe hung (wedged device tunnel)"


_PARTIAL = {}      # rows measured so far; the watchdog emits these


def main():
    import threading

    # deadline watchdog: the device probe can pass while a later dispatch
    # wedges (observed axon failure mode) — the bench must still emit its
    # one JSON line rather than hang the driver forever. The headline
    # (cbox) is measured FIRST, so an overrun mid-way through the
    # large-scene rows still reports the measured headline with an error
    # note instead of a zero row (cold compiles of the large-scene walk
    # programs can take ~10 min each on the remote compile service).
    deadline = float(os.environ.get("RUSTLIGHT_TPU_BENCH_DEADLINE", 3300))

    def _overrun():
        head = _PARTIAL.get("cbox")
        if head is not None:
            row = {"metric": "cbox_path_128spp_throughput",
                   "value": head["value"], "unit": "Mrays/s/chip",
                   "vs_baseline": round(head["value"] / 12.5, 3),
                   "detail": {k: v for k, v in head.items()
                              if k not in ("metric", "value", "unit")},
                   "error": f"deadline {deadline:.0f}s hit before the "
                            "remaining large-scene rows compiled "
                            "(partial results)"}
            for k in ("grid122k", "grid516k", "grid4p9M"):
                if k in _PARTIAL:
                    row["detail"][k] = _PARTIAL[k]
            if "correctness" in _PARTIAL:
                row["detail"]["correctness"] = _PARTIAL["correctness"]
                row["ok"] = bool(_PARTIAL["correctness"].get("ok", True))
            print(json.dumps(row), flush=True)
            os._exit(0 if row.get("ok", True) else 1)
        print(json.dumps({
            "metric": "cbox_path_128spp_throughput",
            "value": 0.0,
            "unit": "Mrays/s/chip",
            "vs_baseline": 0.0,
            "error": f"bench overran its {deadline:.0f}s deadline "
                     "(wedged device tunnel mid-run)",
        }), flush=True)
        os._exit(1)

    watchdog = threading.Timer(deadline, _overrun)
    watchdog.daemon = True
    watchdog.start()

    from rustlight_tpu.cli import _respect_platform_env, _enable_compile_cache
    _respect_platform_env()   # honor JAX_PLATFORMS=cpu despite the plugin
    _enable_compile_cache()   # relay compiles run 20-270 s; cache repeats
    plat = _probe_devices()
    if plat not in ("tpu", "axon", "cpu", "gpu"):
        print(json.dumps({
            "metric": "cbox_path_128spp_throughput",
            "value": 0.0,
            "unit": "Mrays/s/chip",
            "vs_baseline": 0.0,
            "error": plat,
        }))
        return
    import jax
    import jax.numpy as jnp
    from rustlight_tpu.models import cornell_box, sphere_grid
    from rustlight_tpu.integrators import IntegratorPathTracing
    from rustlight_tpu.integrators.common import _pixel_grid
    from rustlight_tpu.utils.rng import make_stream, stream_fold

    # The driver contract is ONE JSON line; the large-scene metrics the
    # round-2/4 verdicts asked the bench to track (the production Pallas
    # tile-walk kernel at 122k, the 516k mid-frontier, and the 4.9M-tri
    # wide-HBM-walk frontier) ride inside it as detail.grid122k/.grid516k/
    # .grid4p9M. The HEADLINE (cbox + its correctness gate) is measured
    # first so a deadline overrun during the large-scene compiles still
    # reports it (see _overrun); the combined line prints at the end.
    head, check = _bench_config("cbox_path_128spp_throughput",
                                cornell_box(512, 512).compile(),
                                512, 512, 128, 6, emit=False, gate=True)
    _PARTIAL["cbox"] = head
    _PARTIAL["correctness"] = check
    grid = _bench_config("grid122k_path_8spp_throughput",
                         sphere_grid(122_000, 256, 256).compile(),
                         256, 256, 8, 5, emit=False)
    _PARTIAL["grid122k"] = grid
    big = _bench_config("grid516k_path_8spp_throughput",
                        sphere_grid(516_000, 256, 256).compile(),
                        256, 256, 8, 5, emit=False)
    _PARTIAL["grid516k"] = big
    huge = _bench_ao_4p9m()
    _PARTIAL["grid4p9M"] = huge
    ok = bool(check.get("ok", True))
    detail = {k: v for k, v in head.items()
              if k not in ("metric", "value", "unit")}
    detail.update({"grid122k": grid, "grid516k": big, "grid4p9M": huge,
                   "correctness": check})
    print(json.dumps({
        "metric": "cbox_path_128spp_throughput",
        "value": head["value"], "unit": "Mrays/s/chip",
        "vs_baseline": round(head["value"] / 12.5, 3),
        "detail": detail, "ok": ok,
    }))
    if not ok:
        sys.exit(1)


def _block_mean(img: np.ndarray, b: int) -> np.ndarray:
    h, w, c = img.shape
    return img.reshape(h // b, b, w // b, b, c).mean(axis=(1, 3))


def _correctness_gate(img: np.ndarray) -> dict:
    """TPU-side correctness envelope (VERDICT r4 item 6): l1 of the 8x8
    block-means of the bench cbox render against a committed TPU reference,
    gated at 4x the measured seed-to-seed (ref-vs-ref) floor. Block-means
    average out per-pixel MC noise and toolchain-level fusion/rounding
    reshuffles (statistically identical renders pass); a biased estimator,
    broken emitter, or wrong-scene regression lands far above the floor.
    Analogous to the reference harness's metric gating,
    /root/reference/tests/launch.py:109-138."""
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "regress", "bench_ref.npz")
    if not os.path.exists(ref_path):
        return {"ok": True, "skipped": "regress/bench_ref.npz missing"}
    ref = np.load(ref_path)
    bm = _block_mean(img.astype(np.float64), int(ref["block"]))
    perturb = float(os.environ.get("RUSTLIGHT_TPU_BENCH_SELFTEST_PERTURB",
                                   "0"))
    if perturb:
        bm = bm * (1.0 + perturb)
    l1 = float(np.abs(bm - ref["blockmean"]).mean())
    floor = float(ref["floor_l1"])
    return {"ok": bool(l1 <= 4.0 * floor), "l1_vs_ref": round(l1, 6),
            "floor_l1": round(floor, 6), "margin": 4.0}


def _bench_ao_4p9m():
    """4.9M-tri sphere grid, AO 256^2 4 spp (the wide-HBM-walk frontier;
    crosses the 2^14-cluster cap). Rays are exact: every sample traces one
    primary + one occlusion wavefront, so 2 * n_pixels * spp per render."""
    import jax.numpy as jnp
    from rustlight_tpu.scene.geometry import TriMesh
    from rustlight_tpu.scene import Scene, make_camera, look_at
    from rustlight_tpu.models.presets import sphere_grid_mesh
    from rustlight_tpu import bsdfs
    from rustlight_tpu.integrators import IntegratorAO, render

    sc = Scene()
    m = sc.add_material(bsdfs.diffuse((0.65, 0.6, 0.55)))
    mesh, gs = sphere_grid_mesh(4_200_000, n_theta=18, material=m)
    sc.add_mesh(mesh)
    ext = gs * 3.0
    sc.camera = make_camera(256, 256, fov=55.0,
                            to_world=look_at((ext / 2, ext / 2, -0.35 * ext),
                                             (ext / 2, ext / 2, ext / 2),
                                             (0, 1, 0)))
    sd = sc.compile()
    integ = IntegratorAO(max_distance=2.0)
    film = render(sd, integ, spp=4, seed=0)           # warm-up / compile
    float(jnp.sum(film["primal"]))                    # hard sync
    t0 = time.time()
    film = render(sd, integ, spp=4, seed=1)
    mean = float(jnp.mean(film["primal"]))            # hard sync via readback
    dt = time.time() - t0
    rays = 2 * 256 * 256 * 4
    import jax
    n_dev = len(jax.devices())
    return {"metric": "grid4p9M_ao_4spp_throughput",
            "value": round(rays / dt / 1e6 / max(n_dev, 1), 3),
            "unit": "Mrays/s/chip", "resolution": "256x256", "spp": 4,
            "n_tris": int(sd.geom.n_tris), "wall_s": round(dt, 3),
            "rays_per_render": rays, "n_devices": n_dev,
            "mean_ao": round(mean, 5)}


def _bench_config(metric, scene, width, height, spp, max_depth,
                  emit=True, extra=None, gate=False):
    import jax
    import jax.numpy as jnp
    from rustlight_tpu.integrators import IntegratorPathTracing
    from rustlight_tpu.integrators.common import _pixel_grid
    from rustlight_tpu.utils.rng import make_stream, stream_fold

    integ = IntegratorPathTracing(max_depth=max_depth)
    pix = jnp.asarray(_pixel_grid(width, height))

    n_dev = len(jax.devices())
    if n_dev > 1:
        # multi-chip: pixel-sharded persistent-wavefront render over the
        # full device mesh (parallel/render.py); zero cross-device traffic
        # until the film concat, so throughput scales ~linearly on ICI
        from rustlight_tpu.parallel import make_device_mesh, \
            render_block_sharded
        mesh = make_device_mesh()
        npx = pix.shape[0]
        pad = (-npx) % n_dev
        if pad:
            pix_s = jnp.concatenate([pix, jnp.tile(pix[-1:], (pad, 1))], 0)
        else:
            pix_s = pix

        @jax.jit
        def run_block(stream):
            return render_block_sharded(scene, integ, mesh, pix_s, spp)
    else:
        # ray counting: instrument one pass to count traced rays exactly
        # (primary+bounce rays = one trace per live lane per bounce; shadow
        # rays = one visibility ray per NEE-eligible lane per bounce)
        # the scene is CLOSED OVER (compile-time constant): XLA
        # constant-folds scene-dependent work — 2.25x faster than passing
        # the pytree as an argument on v5e. Only the RNG stream is an
        # argument.
        @jax.jit
        def run_block(stream):
            return integ.compute_block(scene, pix, stream, spp)

    stream0 = stream_fold(make_stream(0), 0)
    # warm up / compile. NOTE: on the axon relay block_until_ready does not
    # reliably block; a scalar readback is the only trustworthy sync.
    float(jnp.sum(run_block(stream0)))

    t0 = time.time()
    acc = run_block(stream0)
    float(jnp.sum(acc))  # hard sync (includes one ~30 ms readback)
    dt = time.time() - t0
    acc = acc[: pix.shape[0]]

    # Count rays on a measurement pass: per pass, bounce b traces alive_b
    # rays plus the NEE shadow rays that actually survive the default
    # visibility-history Russian roulette (path.py nee_rr; skipped shadow
    # rays are NOT counted — the throughput metric must not be inflated by
    # rays the estimator no longer traces).
    from rustlight_tpu.accel import intersect_rays, visible
    from rustlight_tpu.scene import generate_rays, fill_hit, sample_light
    from rustlight_tpu.bsdfs import bsdf_sample
    from rustlight_tpu.utils.rng import stream_next, stream_next2d

    n = pix.shape[0]
    nee_rr = IntegratorPathTracing(max_depth=max_depth)._nee_rr_for(scene)

    @jax.jit
    def alive_per_bounce(scene_, pix_):
        stream = stream_fold(make_stream(0), 0)
        u_pix, stream = stream_next2d(stream, (n,))
        o, d = generate_rays(scene_.camera, pix_.astype(jnp.float32) + u_pix)
        from rustlight_tpu.scene.scene import offset_ray_origin
        from rustlight_tpu.utils.frame import to_world
        from rustlight_tpu.utils.vec import channel_max

        def body(carry, k):
            o, d, alive, thr, prev_occ, stream, rays = carry
            rh = intersect_rays(scene_.geom, o, d)
            hit = fill_hit(scene_, o, d, rh)
            lane = alive & hit.valid
            u_sel, stream = stream_next(stream, (n,))
            u_pos, stream = stream_next2d(stream, (n,))
            ls = sample_light(scene_.emitters, scene_.geom, hit.p, u_sel,
                              u_pos)
            # the real loop's pre_ok gates on can_expand: no NEE at the
            # final bounce (those lanes shoot inert tfar=0 rays)
            pre = lane & ls.valid & (k + 1 < max_depth)
            if nee_rr is not None:
                u_nrr, stream = stream_next(stream, (n,))
                p_keep = jnp.where(prev_occ, nee_rr, 1.0)
                pre = pre & (u_nrr < p_keep)
            p_sh = offset_ray_origin(hit.p, hit.n_g, ls.d)
            vis = visible(scene_.geom, p_sh, ls.p, mask=pre)
            prev_occ = jnp.where(pre, ~vis, prev_occ)
            rays = rays + jnp.sum(alive) + jnp.sum(pre)  # trace + shadow
            u_b, stream = stream_next2d(stream, (n,))
            bs = bsdf_sample(scene_.materials, hit.mat, hit.uv, hit.wi, u_b)
            thr = thr * bs.weight
            u_rr, stream = stream_next(stream, (n,))
            rr_p = jnp.minimum(channel_max(thr), 0.95)
            keep = u_rr < rr_p
            alive = lane & bs.valid & keep
            thr = thr / jnp.maximum(rr_p, 1e-8)[:, None]
            d2 = to_world(hit.frame, bs.wo)
            o2 = offset_ray_origin(hit.p, hit.n_g, d2)
            return (o2, d2, alive, thr, prev_occ, stream, rays), None

        init = (o, d, jnp.ones(n, bool), jnp.ones((n, 3)),
                jnp.zeros(n, bool), stream, jnp.zeros((), jnp.float32))
        (o, d, alive, thr, prev_occ, stream, rays), _ = jax.lax.scan(
            body, init, jnp.arange(max_depth))
        return rays

    rays_per_pass = float(alive_per_bounce(scene, pix))
    total_rays = rays_per_pass * spp
    mrays_aggregate = total_rays / dt / 1e6
    mrays = mrays_aggregate / max(n_dev, 1)   # per-chip (metric unit)

    detail = {
        "resolution": f"{width}x{height}",
        "spp": spp,
        "wall_s": round(dt, 3),
        "rays_per_pass": int(rays_per_pass),
        "n_devices": n_dev,
        "aggregate_mrays_s": round(mrays_aggregate, 3),
        "mean_radiance": float(np.asarray(acc).mean() / spp),
    }
    if extra:
        detail.update(extra)
    row = {"metric": metric, "value": round(mrays, 3),
           "unit": "Mrays/s/chip", **detail}
    if gate:
        img = np.asarray(acc, np.float64).reshape(height, width, 3) / spp
        check = _correctness_gate(img)
        return row, check
    if emit:
        print(json.dumps({
            "metric": metric, "value": round(mrays, 3),
            "unit": "Mrays/s/chip",
            "vs_baseline": round(mrays / 12.5, 3), "detail": detail,
        }))
    return row


if __name__ == "__main__":
    main()
