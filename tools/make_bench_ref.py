#!/usr/bin/env python
"""Generate regress/bench_ref.npz — the committed TPU reference behind
bench.py's correctness gate (VERDICT r4 item 6).

Renders the exact bench cbox config (512^2, 128 spp, max_depth 6, stream
seed 0) on the CURRENT backend, stores its 8x8 block-means, and measures the
seed-to-seed l1 floor from an independent seed-1 render. Run ON TPU when
re-baselining:

    python tools/make_bench_ref.py

The gate then passes any render whose block-mean l1 vs this reference is
within 4x the floor (statistically-identical toolchain reshuffles pass; a
biased estimator / broken emitter / wrong scene fails).
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOCK = 8


def main():
    from rustlight_tpu.cli import _respect_platform_env, _enable_compile_cache
    _respect_platform_env()
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from rustlight_tpu.models import cornell_box
    from rustlight_tpu.integrators import IntegratorPathTracing
    from rustlight_tpu.integrators.common import _pixel_grid
    from rustlight_tpu.utils.rng import make_stream, stream_fold

    plat = jax.devices()[0].platform
    scene = cornell_box(512, 512).compile()
    integ = IntegratorPathTracing(max_depth=6)
    pix = jnp.asarray(_pixel_grid(512, 512))

    @jax.jit
    def run(stream):
        return integ.compute_block(scene, pix, stream, 128)

    imgs = []
    for seed in (0, 1):
        acc = run(stream_fold(make_stream(seed), 0))
        float(jnp.sum(acc))        # hard sync (axon relay)
        imgs.append(np.asarray(acc, np.float64).reshape(512, 512, 3) / 128)

    from bench import _block_mean
    bm0, bm1 = (_block_mean(im, BLOCK) for im in imgs)
    floor = float(np.abs(bm0 - bm1).mean())
    out = os.path.join(REPO, "regress", "bench_ref.npz")
    np.savez_compressed(out, blockmean=bm0.astype(np.float32),
                        floor_l1=floor, block=BLOCK, platform=plat,
                        spp=128, max_depth=6)
    print(f"wrote {out}: platform={plat} block={BLOCK} "
          f"floor_l1={floor:.6f} mean={bm0.mean():.6f}")


if __name__ == "__main__":
    main()
