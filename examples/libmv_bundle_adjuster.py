#!/usr/bin/env python
"""Bundle a blender/libmv binary problem dump
(reference: examples/libmv_bundle_adjuster.cc).

Usage:
  python examples/libmv_bundle_adjuster.py \
      --input /root/reference/data/libmv-ba-problems/problem_01.bin \
      --refine_intrinsics radial
"""

import argparse

import _common  # noqa: F401
from ceres_tpu.examples.libmv import read_libmv_problem, solve_libmv_problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="blender problem dump")
    ap.add_argument(
        "--refine_intrinsics", default="none", choices=["none", "radial"]
    )
    args = ap.parse_args()
    prob = read_libmv_problem(args.input)
    print(
        f"cameras: {int(prob.camera_valid.sum())}, "
        f"points: {int(prob.point_valid.sum())}, "
        f"markers: {prob.markers.shape[0]}"
    )
    intr, cams, pts, summary = solve_libmv_problem(
        prob, refine_intrinsics=args.refine_intrinsics
    )
    print(summary.brief_report())
    print("final intrinsics:", intr)


if __name__ == "__main__":
    main()
