"""Wavefront (bounce-synchronous) path tracer with NEE + MIS.

Reference: src/integrators/explicit/path.rs + the path-graph strategies
(src/paths/strategies/{directional,emitters}.rs). The reference's recursive
per-pixel graph evaluation becomes a `lax.while_loop` over SoA lane state —
the reference's own breadth-first `generate()` driver
(src/paths/strategies/mod.rs:35-80) is exactly this shape.

Semantics mirrored:
  - two strategies per vertex: BSDF-directional and light-NEE, combined with
    the *balance* heuristic over strategy pdfs (path.rs:77-106);
  - `strategy` = all | bsdf | emitter filters contributions by the sampling
    strategy id (path.rs:50-66) — sensor-edge (directly visible light) always
    contributes;
  - emission with k edges gated by min_depth <= k-1; expansion stops at
    max_depth edges; RR from rr_depth with survival min(throughput_max, 0.95)
    (directional.rs:77-87);
  - delta vertices (smooth BSDFs) skip NEE and get MIS weight 1 on hits.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..accel import intersect_rays, visible
from ..bsdfs import bsdf_eval, bsdf_pdf, bsdf_sample, bsdf_is_smooth
from ..bsdfs.table import TRANSPORT_IMPORTANCE
from ..scene import (
    fill_hit, generate_rays, sample_light, direct_pdf_tri, emitted_radiance,
    env_radiance, env_direction_pdf,
)
from ..scene.scene import offset_ray_origin
from ..scene.volume import (
    volume_sample_distance, phase_eval, phase_sample, transmittance,
)
from ..utils.frame import to_world, to_local
from ..utils.rng import stream_next, stream_next2d
from ..utils.vec import channel_max, dot
from .common import Integrator, mis_balance

STRATEGY_ALL = "all"
STRATEGY_BSDF = "bsdf"
STRATEGY_EMITTER = "emitter"


class _PathState(NamedTuple):
    k: Any            # iteration (edges completed so far)
    stream: Any
    o: Any            # [n, 3] current ray origin (previous vertex position)
    d: Any            # [n, 3] current ray direction
    throughput: Any   # [n, 3]
    radiance: Any     # [n, 3]
    alive: Any        # [n]
    prev_pdf: Any     # [n] solid-angle pdf of the directional strategy
    prev_delta: Any   # [n] previous bounce was a delta lobe (or sensor)
    prev_nee: Any     # [n] NEE was *possible* at the previous vertex


class IntegratorPathTracing(Integrator):
    def __init__(self, min_depth: Optional[int] = None,
                 max_depth: Optional[int] = None,
                 rr_depth: Optional[int] = 0,
                 strategy: str = STRATEGY_ALL,
                 single_scattering: bool = False,
                 hard_cap: int = 64):
        self.min_depth = min_depth or 0
        self.max_depth = max_depth
        self.rr_depth = rr_depth
        self.strategy = strategy
        self.single_scattering = single_scattering
        # safety bound for the while_loop when max_depth is None (RR terminates
        # lanes geometrically; 64 bounces leaves ~1e-? of energy for albedo .95)
        self.hard_cap = hard_cap if max_depth is None else min(hard_cap, max_depth)

    # ----------------------------------------------------------------- core
    def compute_pixel(self, scene, pix, stream):
        n = pix.shape[0]
        u_pix, stream = stream_next2d(stream, (n,))
        o, d = generate_rays(scene.camera, pix.astype(jnp.float32) + u_pix)

        use_nee = self.strategy in (STRATEGY_ALL, STRATEGY_EMITTER)
        mis_on = self.strategy == STRATEGY_ALL
        keep_bsdf_hits = self.strategy in (STRATEGY_ALL, STRATEGY_BSDF)

        state = _PathState(
            k=jnp.int32(0), stream=stream, o=o, d=d,
            throughput=jnp.ones((n, 3), jnp.float32),
            radiance=jnp.zeros((n, 3), jnp.float32),
            alive=jnp.ones(n, bool),
            prev_pdf=jnp.ones(n, jnp.float32),
            prev_delta=jnp.ones(n, bool),   # sensor: single strategy, weight 1
            prev_nee=jnp.zeros(n, bool),
        )

        def cond(s):
            return (s.k < self.hard_cap) & jnp.any(s.alive)

        has_med = scene.volume is not None

        def body(s):
            k = s.k
            stream = s.stream
            rh = intersect_rays(scene.geom, s.o, s.d)
            hit = fill_hit(scene, s.o, s.d, rh)

            # ---- medium: free-flight sampling along the segment
            if has_med:
                u_med, stream = stream_next(stream, (n,))
                tfar = jnp.where(rh.hit, rh.t, 1e8)
                sd = volume_sample_distance(scene.volume, tfar, u_med)
                scattered = s.alive & (~sd.exited)
                thr = s.throughput * sd.w
                p_scatter = s.o + s.d * sd.t[:, None]
            else:
                scattered = jnp.zeros(n, bool)
                thr = s.throughput
                p_scatter = s.o

            lane_hit = s.alive & hit.valid & (~scattered)

            # ---- emission picked up through the BSDF/sensor edge (k+1 edges)
            min_ok = k >= self.min_depth
            le = emitted_radiance(scene.emitters, scene.geom, hit.tri, s.d,
                                  uv=hit.uv)
            # MIS vs the NEE strategy pdf at the previous vertex
            if scene.ats is not None:
                from ..scene.emitters import direct_pdf_tri_ats
                pdf_light = direct_pdf_tri_ats(scene.emitters, scene.geom,
                                               scene.ats, hit.tri, s.o, hit.p,
                                               hit.n_g, s.d)
            else:
                pdf_light = direct_pdf_tri(scene.emitters, hit.tri, s.o, hit.p, hit.n_g, s.d)
            w_hit = jnp.where(
                s.prev_delta | (~s.prev_nee) | (~jnp.asarray(mis_on)),
                1.0, mis_balance(s.prev_pdf, pdf_light))
            senses = keep_bsdf_hits | (k == 0)  # sensor edge always contributes
            contrib = thr * le * w_hit[:, None]
            add = lane_hit & min_ok & senses
            radiance = s.radiance + jnp.where(add[:, None], contrib, 0.0)

            # ---- escaped rays: environment light
            esc = s.alive & (~hit.valid) & (~scattered)
            if scene.emitters.has_env:
                le_env = env_radiance(scene.emitters, s.d)
                pdf_env = env_direction_pdf(scene.emitters, s.d)
                w_env = jnp.where(
                    s.prev_delta | (~s.prev_nee) | (~jnp.asarray(mis_on)),
                    1.0, mis_balance(s.prev_pdf, pdf_env))
                radiance = radiance + jnp.where(
                    (esc & min_ok & senses)[:, None],
                    thr * le_env * w_env[:, None], 0.0)

            smooth = bsdf_is_smooth(scene.materials, hit.mat)
            # single_scattering: surface vertices contribute nothing further
            # (reference path.rs:120-124) — their lanes die after the emission
            if self.single_scattering:
                lane_surface = jnp.zeros(n, bool)
            else:
                lane_surface = lane_hit
            vertex = lane_surface | scattered
            can_expand = (self.max_depth is None) | (k + 1 < (self.max_depth or 0))
            can_expand = jnp.asarray(can_expand) & vertex

            p_v = jnp.where(scattered[:, None], p_scatter, hit.p)

            # ---- NEE (light strategy), path of k+2 edges
            u_sel, stream = stream_next(stream, (n,))
            u_pos, stream = stream_next2d(stream, (n,))
            if use_nee:
                if scene.ats is not None:
                    from ..scene.emitters import sample_light_ats
                    ls = sample_light_ats(scene.emitters, scene.geom, scene.ats,
                                          p_v, hit.n_s, u_sel, u_pos)
                else:
                    ls = sample_light(scene.emitters, scene.geom, p_v, u_sel, u_pos)
                wo_l = to_local(hit.frame, ls.d)
                f_s = bsdf_eval(scene.materials, hit.mat, hit.uv, hit.wi, wo_l,
                                TRANSPORT_IMPORTANCE)
                pdf_s = bsdf_pdf(scene.materials, hit.mat, hit.uv, hit.wi, wo_l,
                                 TRANSPORT_IMPORTANCE)
                if has_med:
                    g = scene.volume.phase_g
                    ph = phase_eval(g, -s.d, ls.d)
                    f = jnp.where(scattered[:, None], ph[:, None], f_s)
                    pdf_other = jnp.where(scattered, ph, pdf_s)
                    tr_sh = transmittance(scene.volume, ls.dist)
                else:
                    f = f_s
                    pdf_other = pdf_s
                    tr_sh = 1.0
                p_shadow = jnp.where(
                    scattered[:, None], p_v,
                    offset_ray_origin(hit.p, hit.n_g, ls.d))
                vis = visible(scene.geom, p_shadow, ls.p)
                w_nee = jnp.where(
                    ls.is_delta | (~jnp.asarray(mis_on)),
                    1.0, mis_balance(ls.pdf, pdf_other))
                nee_ok = (can_expand & (scattered | (lane_surface & (~smooth)))
                          & ls.valid & vis & ((k + 1) >= self.min_depth))
                radiance = radiance + jnp.where(
                    nee_ok[:, None],
                    thr * f * tr_sh * ls.weight * w_nee[:, None], 0.0)

            # ---- directional bounce: BSDF at surfaces, phase in the medium
            u_bsdf, stream = stream_next2d(stream, (n,))
            bs = bsdf_sample(scene.materials, hit.mat, hit.uv, hit.wi, u_bsdf,
                             TRANSPORT_IMPORTANCE)
            wo_world = to_world(hit.frame, bs.wo)
            weight = bs.weight
            pdf_dir = bs.pdf
            is_delta = bs.is_delta
            valid_dir = bs.valid
            if has_med:
                d_ph, w_ph, pdf_ph = phase_sample(scene.volume.phase_g, -s.d, u_bsdf)
                wo_world = jnp.where(scattered[:, None], d_ph, wo_world)
                weight = jnp.where(scattered[:, None], w_ph, weight)
                pdf_dir = jnp.where(scattered, pdf_ph, pdf_dir)
                is_delta = jnp.where(scattered, False, is_delta)
                valid_dir = jnp.where(scattered, pdf_ph > 0.0, valid_dir)
            throughput = thr * weight

            # Russian roulette (directional.rs:77-87)
            u_rr, stream = stream_next(stream, (n,))
            if self.rr_depth is None:
                rr_keep = jnp.ones(n, bool)
                rr_w = jnp.ones(n, jnp.float32)
            else:
                do_rr = (k + 1) >= self.rr_depth
                rr_p = jnp.minimum(channel_max(throughput), 0.95)
                rr_keep = jnp.where(do_rr, u_rr < rr_p, True)
                rr_w = jnp.where(do_rr & rr_keep, 1.0 / jnp.maximum(rr_p, 1e-8), 1.0)
            throughput = throughput * rr_w[:, None]

            alive = (can_expand & valid_dir & rr_keep
                     & (channel_max(throughput) > 0.0))
            o_new = jnp.where(scattered[:, None], p_v,
                              offset_ray_origin(hit.p, hit.n_g, wo_world))

            nee_possible = jnp.asarray(use_nee) & (scattered | (~smooth))
            return _PathState(
                k=k + 1, stream=stream,
                o=jnp.where(alive[:, None], o_new, s.o),
                d=jnp.where(alive[:, None], wo_world, s.d),
                throughput=jnp.where(alive[:, None], throughput, s.throughput),
                radiance=radiance,
                alive=alive,
                prev_pdf=jnp.where(alive, pdf_dir, s.prev_pdf),
                prev_delta=jnp.where(alive, is_delta, s.prev_delta),
                prev_nee=jnp.where(alive, nee_possible, s.prev_nee),
            )

        final = lax.while_loop(cond, body, state)
        return final.radiance
