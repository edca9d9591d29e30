#!/usr/bin/env python
"""Specular-wall Cornell sweep (analog of examples/modified_cornell.cc):
renders the roughness sweep {0, 0.05, 0.1, 0.3, 0.5, 0.8} to
``<prefix><r>.png``.

Usage:  python examples/modified_cornell.py out_prefix [--res 1024]
        [--spp 10000] [--depth 5]
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pathtracer_tpu as pt

ROUGHNESS = [0, 0.05, 0.1, 0.3, 0.5, 0.8]  # modified_cornell.cc:14


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=10000)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--backend", default="auto")
    args = ap.parse_args()

    for r in ROUGHNESS:
        cam, scene = pt.modified_cornell(r, res=(args.res, args.res))
        pt.render(cam, scene, args.spp, args.depth,
                  f"{args.prefix}{r:g}.png", backend=args.backend)


if __name__ == "__main__":
    main()
