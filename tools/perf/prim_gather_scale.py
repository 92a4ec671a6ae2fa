"""Primitive-count scaling for the photon-primitive gathers (VERDICT r3
item 8: the reference splits beams x5 and BVH-gathers through its generic
accel for a reason — vol_primitives.rs:650-699 — while the repo's gather is
a chunked DENSE sweep, O(rays x primitives). This measures where the dense
sweep's wall-clock actually falls off as nb_primitive grows and records
either an adequacy ceiling or the case for a clustered gather.)

For each nb_primitive in the sweep this times one full render pass
(light-path generation + gather, hard-sync via scalar readback) of the BRE
and beam estimators on a 64x64 cbox-medium view, then reports wall, the
pair-test rate (rays x prims / s), and the marginal cost per 1k primitives.

Run on a real chip:  python tools/perf/prim_gather_scale.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np


def main():
    from rustlight_tpu.cli import _enable_compile_cache, _respect_platform_env
    _respect_platform_env()
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from rustlight_tpu.models import cornell_box
    from rustlight_tpu.scene import make_volume
    from rustlight_tpu.integrators import IntegratorVolPrimitives, render

    sc = cornell_box(64, 64)
    sc.volume = make_volume(sigma_s=(0.0025,) * 3)
    sd = sc.compile()
    n_rays = 64 * 64

    rows = []
    for prim in ("bre", "beams"):
        for nb in (1024, 4096, 16384, 65536, 131072):
            integ = IntegratorVolPrimitives(
                nb_primitive=nb, max_depth=4, hard_cap=4, primitives=prim,
                radius=8.0, prim_chunk=min(nb, 512))
            # compile + warm
            f = render(sd, integ, spp=1, seed=1)
            _ = float(jnp.sum(f["primal"]))           # hard sync
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                f = render(sd, integ, spp=1, seed=2)
                _ = float(jnp.sum(f["primal"]))
                best = min(best, time.perf_counter() - t0)
            rate = n_rays * nb / best
            rows.append(dict(prim=prim, nb_primitive=nb,
                             wall_s=round(best, 4),
                             pair_rate_per_s=float(f"{rate:.4g}"),
                             mean=float(np.asarray(f["primal"]).mean())))
            print(rows[-1])
        # marginal wall per 1k primitives across the sweep tail (the dense
        # sweep is linear once the fixed light-path cost is amortized)
        tail = [r for r in rows if r["prim"] == prim][-2:]
        dwall = tail[1]["wall_s"] - tail[0]["wall_s"]
        dnb = (tail[1]["nb_primitive"] - tail[0]["nb_primitive"]) / 1000.0
        print(f"[{prim}] marginal {dwall / dnb * 1000:.3f} ms per 1k prims "
              f"at 4k rays")

    out = Path(__file__).parent / "regress" / "prim_gather_scale.json"
    out.write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
