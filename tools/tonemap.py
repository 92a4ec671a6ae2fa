#!/usr/bin/env python
"""Image metric / tonemap / falsecolor tool (reference scripts/tonemap.py).

Examples:
  python tools/tonemap.py img.exr                      # -> img.png (gamma 2.2)
  python tools/tonemap.py out.exr -r ref.exr -m mape   # print metric
  python tools/tonemap.py out.exr -r ref.exr -m l1 -fc err.png -c 0 0.5
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from rustlight_tpu.utils import image as rimage
from rustlight_tpu.utils.metrics import compute_metric, metric_scalar, falsecolor


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-e", "--exposure", type=float, default=0.0)
    ap.add_argument("-m", "--metric",
                    choices=["l1", "l2", "mrse", "mape", "smape", "rmse", "dssim"])
    ap.add_argument("-eps", "--epsilon", type=float, default=1e-2)
    ap.add_argument("-c", "--clip", nargs=2, type=float, default=[0, 1])
    ap.add_argument("-fc", "--falsecolor", type=str)
    ap.add_argument("-r", "--ref", type=str)
    ap.add_argument("-p", "--plain", action="store_true",
                    help="print only the metric value")
    args = ap.parse_args()

    ref = rimage.load(args.ref) if args.ref else None
    for inp in args.inputs:
        img = rimage.load(inp) * (2.0 ** args.exposure)
        if args.metric and ref is not None:
            v = metric_scalar(ref, img, args.metric, args.epsilon)
            print(v if args.plain else f"{inp}: {args.metric} = {v:.6g}")
            if args.falsecolor and args.metric in ("l1", "l2", "mrse", "mape", "smape"):
                err = compute_metric(ref, img, args.metric, args.epsilon)
                rimage.write_ldr(args.falsecolor, falsecolor(err, args.clip),
                                 gamma=1.0)
        else:
            out = str(Path(inp).with_suffix(".png"))
            rimage.write_ldr(out, img)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
