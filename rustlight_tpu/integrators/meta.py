"""Meta-integrators: pass averaging and equal-time rendering.

Reference: src/integrators/avg.rs (running average across passes, optional
timeout, per-iteration dumps + `<out>_time.csv` timeline) and
src/integrators/equal_time.rs (repeat passes until a wall-clock budget,
report achieved spp).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.film import Film
from .common import Integrator, SplattingIntegrator, render, render_splat


def _render_once(scene, integrator, spp, seed, sampler="independent",
                 mesh=None):
    """One render pass; `mesh` routes to the sharded execution paths
    (the reference's `-t` thread pool, integrators/mod.rs:452-459)."""
    if isinstance(integrator, SplattingIntegrator):
        if mesh is not None:
            from ..parallel import render_splat_sharded
            cam = scene.camera
            return render_splat_sharded(
                scene, integrator, n_paths=spp * cam.width * cam.height,
                mesh=mesh, seed=seed)
        return render_splat(scene, integrator, spp, seed=seed)
    if hasattr(integrator, "render"):           # self-driving (MCMC, GDPT)
        import inspect
        kw = {}
        if mesh is not None:
            if "mesh" in inspect.signature(integrator.render).parameters:
                kw["mesh"] = mesh
            else:
                # never drop a requested mesh silently: the user asked for
                # -t N and would otherwise get a single-device render with
                # no hint (the round-3 gradient-domain gap)
                import logging
                logging.getLogger(__name__).warning(
                    "%s.render() does not support a device mesh; the -t "
                    "request is ignored and this pass runs single-device",
                    type(integrator).__name__)
        return integrator.render(scene, spp, seed=seed, **kw)
    if mesh is not None:
        from ..parallel import render_sharded
        return render_sharded(scene, integrator, spp, mesh=mesh, seed=seed,
                              sampler=sampler)
    return render(scene, integrator, spp, seed=seed, sampler=sampler)


def _print_progress(it: int, nb_passes, timeout_s, elapsed: float,
                    spp_per_pass: int) -> None:
    """One in-place progress line on stderr (the reference's optional
    terminal progress bar, `progress-bar` feature, integrators/mod.rs:17-43
    — a capability toggle, not a format contract)."""
    import sys
    if nb_passes:
        frac = it / nb_passes
        eta = elapsed / max(it, 1) * (nb_passes - it)
        tail = f"pass {it}/{nb_passes}  eta {eta:6.1f}s"
    elif timeout_s:
        frac = min(elapsed / timeout_s, 1.0)
        tail = f"{elapsed:6.1f}/{timeout_s:.0f}s  pass {it}"
    else:
        frac = 0.0
        tail = f"pass {it} (unbounded)"
    n = int(frac * 30)
    bar = "#" * n + "-" * (30 - n)
    sys.stderr.write(f"\r[{bar}] {tail}  {it * spp_per_pass} spp")
    sys.stderr.flush()


class IntegratorAverage:
    """Average repeated passes; `timeout_s=None` runs `nb_passes` passes,
    otherwise loops until the wall-clock budget (reference `-a`)."""

    def __init__(self, integrator, spp_per_pass: int = 1,
                 nb_passes: Optional[int] = None,
                 timeout_s: Optional[float] = None,
                 dump_base: Optional[str] = None,
                 mesh=None, max_passes: Optional[int] = None,
                 resume: bool = False, progress: bool = False):
        # nb_passes=None and timeout_s=None = run forever with per-pass
        # dumps (the reference's `-a inf`, avg.rs:21 + cli.rs:31-39);
        # max_passes is a safety bound for tests of the infinite mode.
        self.integrator = integrator
        self.spp_per_pass = spp_per_pass
        self.nb_passes = nb_passes
        self.timeout_s = timeout_s
        self.dump_base = dump_base
        self.mesh = mesh
        self.max_passes = max_passes
        self.infinite = nb_passes is None and timeout_s is None
        # resume=True restarts from the newest `{dump_base}_<k>.pfm` dump.
        # Beyond-reference capability: rustlight's per-pass dumps are its
        # de-facto checkpointing (avg.rs:69-106) but a crashed run cannot
        # continue them. Pass seeds are `seed + pass_index`, so a resumed
        # run reproduces the uninterrupted run bit-exactly.
        self.resume = resume
        # progress=True prints an in-place per-pass progress line (the
        # reference's optional terminal progress bar, `progress-bar`
        # feature / integrators/mod.rs:17-43).
        self.progress = progress

    def _load_dump(self, k: int):
        """Load dump pass k as a Film, or None."""
        import os
        path = f"{self.dump_base}_{k}.pfm"
        if not os.path.exists(path):
            return None
        from ..utils import image as _image
        img = _image.load(path)
        film = Film(img.shape[1], img.shape[0])
        film.buffers["primal"] = np.asarray(img, np.float32)
        return film

    def _find_resume(self):
        """Newest existing dump (film, pass_count), or None."""
        import re
        from pathlib import Path
        base = Path(self.dump_base)
        pat = re.compile(re.escape(base.name) + r"_(\d+)\.pfm$")
        best = None
        for f in (base.parent if base.parent.name else Path(".")).glob(
                base.name + "_*.pfm"):
            m = pat.match(f.name)
            if m:
                k = int(m.group(1))
                if best is None or k > best[0]:
                    best = (k, f)
        if best is None:
            return None
        # load the FOUND file (a re-derived name would miss e.g.
        # zero-padded dump names and silently mis-weight the resume)
        from ..utils import image as _image
        img = _image.load(str(best[1]))
        film = Film(img.shape[1], img.shape[0])
        film.buffers["primal"] = np.asarray(img, np.float32)
        return film, best[0]

    def render(self, scene, seed: int = 0, verbose: bool = False) -> Film:
        if self.timeout_s is not None:
            # time budgets measure RENDER time: compile outside the clock
            _render_once(scene, self.integrator, self.spp_per_pass, seed - 1,
                         mesh=self.mesh)
        t0 = time.time()
        avg: Optional[Film] = None
        timeline = []
        it = 0
        averaging = getattr(self.integrator, "averaging", True)
        if self.resume and self.dump_base:
            if not averaging:
                # a non-averaging integrator (e.g. SMCMC with persistent
                # chains) replaces the film each pass; a film dump alone
                # cannot seed a continuation. If the integrator dumped its
                # chain state ({dump_base}_state.npz, written atomically
                # alongside each pass dump), reload it — the continuation
                # is then bit-exact because pass streams derive from
                # seed + pass index. Otherwise refuse loudly, start clean.
                import os
                state_path = f"{self.dump_base}_state.npz"
                if (hasattr(self.integrator, "load_state_dict")
                        and os.path.exists(state_path)):
                    with np.load(state_path) as z:
                        sd = {k: z[k] for k in z.files}
                    it = int(sd.pop("pass_count"))
                    self.integrator.load_state_dict(sd, scene)
                else:
                    import logging
                    logging.getLogger(__name__).warning(
                        "--resume ignored: %s does not average passes and "
                        "no chain-state dump was found, so a film dump "
                        "cannot seed a bit-exact continuation",
                        type(self.integrator).__name__)
            else:
                got = self._find_resume()
                if got is not None:
                    avg, it = got
                    # averaging integrators with auxiliary state (e.g. the
                    # guided path tracer's trained table) reload it too;
                    # if a crash landed between the film save and the state
                    # save, rewind to the pass the state matches so the
                    # continuation stays bit-exact
                    import os
                    import logging
                    state_path = f"{self.dump_base}_state.npz"
                    if (hasattr(self.integrator, "load_state_dict")
                            and os.path.exists(state_path)):
                        with np.load(state_path) as z:
                            sd = {k: z[k] for k in z.files}
                        k = int(sd.pop("pass_count"))
                        older = self._load_dump(k) if k < it else None
                        if k == it:
                            self.integrator.load_state_dict(sd, scene)
                        elif older is not None:
                            # crash between film and state save: rewind to
                            # the pass the state matches (bit-exact)
                            avg, it = older, k
                            self.integrator.load_state_dict(sd, scene)
                        else:
                            # state and films cannot be aligned (stale
                            # state from a longer prior run, or the pass-k
                            # dump is gone): loading it would silently
                            # break the bit-exact guarantee — skip it
                            logging.getLogger(__name__).warning(
                                "--resume: state checkpoint (pass %d) does "
                                "not align with newest dump (pass %d) and "
                                "no pass-%d dump exists; continuing from "
                                "the film only (auxiliary state restarts)",
                                k, it, k)
        if (self.infinite and self.dump_base is None
                and self.max_passes is None):
            raise ValueError(
                "IntegratorAverage with nb_passes=None and timeout_s=None "
                "runs forever: give it dump_base (per-pass checkpoints, the "
                "-a inf contract) or max_passes")
        while True:
            if (self.nb_passes is not None and self.timeout_s is None
                    and not self.infinite and it >= self.nb_passes
                    and avg is not None):
                break   # resumed run already complete: no extra pass
            film = _render_once(scene, self.integrator, self.spp_per_pass,
                                seed + it, mesh=self.mesh)
            if avg is None or not averaging:
                avg = film
            else:
                avg.average_with(film, it)
            it += 1
            timeline.append((time.time() - t0, it))
            if self.progress:
                _print_progress(it, self.nb_passes, self.timeout_s,
                                time.time() - t0, self.spp_per_pass)
            if self.dump_base:
                avg.save(f"{self.dump_base}_{it}.pfm")
                if hasattr(self.integrator, "state_dict"):
                    sd = self.integrator.state_dict()
                    if sd is not None:
                        # atomic write: a crash mid-save must not destroy
                        # the previous checkpoint
                        import os
                        sd["pass_count"] = np.asarray(it)
                        tmp = f"{self.dump_base}_state_tmp.npz"
                        np.savez(tmp, **sd)
                        os.replace(tmp, f"{self.dump_base}_state.npz")
            if self.max_passes is not None and it >= self.max_passes:
                break
            if self.infinite:
                continue
            if self.timeout_s is not None:
                if time.time() - t0 >= self.timeout_s:
                    break
            elif it >= self.nb_passes:
                break
        if self.progress:
            import sys
            sys.stderr.write("\n")
        if self.dump_base:
            # per-pass cumulative time CSV (avg.rs:97-106)
            with open(f"{self.dump_base}_time.csv", "w") as f:
                for t, i in timeline:
                    f.write(f"{t},{i}\n")
        if verbose:
            print(f"avg: {it} passes in {time.time()-t0:.2f}s")
        return avg


class IntegratorEqualTime:
    """Render passes until `target_s` elapsed; reports achieved spp
    (reference `-e`)."""

    def __init__(self, integrator, target_s: float, spp_per_pass: int = 1,
                 mesh=None, progress: bool = False):
        self.integrator = integrator
        self.target_s = target_s
        self.spp_per_pass = spp_per_pass
        self.achieved_spp = 0
        self.mesh = mesh
        self.progress = progress

    def render(self, scene, seed: int = 0, verbose: bool = False) -> Film:
        # warm the compile cache outside the clock: the budget is render
        # time, matching the reference where compilation does not exist
        _render_once(scene, self.integrator, self.spp_per_pass, seed - 1,
                     mesh=self.mesh)
        t0 = time.time()
        acc: Optional[Film] = None
        passes = 0
        while time.time() - t0 < self.target_s or passes == 0:
            film = _render_once(scene, self.integrator, self.spp_per_pass,
                                seed + passes, mesh=self.mesh)
            if acc is None:
                acc = film
            else:
                acc.average_with(film, passes)
            passes += 1
            if self.progress:
                _print_progress(passes, None, self.target_s,
                                time.time() - t0, self.spp_per_pass)
        self.achieved_spp = passes * self.spp_per_pass
        if self.progress:
            import sys
            sys.stderr.write("\n")
        if verbose:
            print(f"equal_time: achieved {self.achieved_spp} spp "
                  f"in {time.time()-t0:.2f}s")
        return acc
