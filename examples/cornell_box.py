#!/usr/bin/env python
"""Standard Cornell box render (analog of examples/cornell_box.cc).

Usage:  python examples/cornell_box.py out.png [--res 1024] [--spp 10000]
        [--depth 5] [--backend auto|brute|bvh|pallas]

The reference renders 1024x1024 at 10,000 spp, depth 5 (cornell_box.cc:99).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pathtracer_tpu as pt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("filename")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=10000)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    cam, scene = pt.cornell_box(res=(args.res, args.res))
    pt.render(cam, scene, args.spp, args.depth, args.filename,
              backend=args.backend)


if __name__ == "__main__":
    main()
