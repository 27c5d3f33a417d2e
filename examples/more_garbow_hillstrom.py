#!/usr/bin/env python
"""Classic More-Garbow-Hillstrom test set
(reference: examples/more_garbow_hillstrom.cc)."""

import argparse

import _common  # noqa: F401
import numpy as np

import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.examples.more_garbow_hillstrom import PROBLEMS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--constrained", action="store_true", help="with bounds")
    args = ap.parse_args()
    wins = total = 0
    for spec in PROBLEMS:
        if args.constrained and spec.lower_bounds is None:
            continue
        problem, _ = spec.build(constrained=args.constrained)
        summary = ceres_tpu.solve(SolverOptions(max_num_iterations=300), problem)
        target = spec.constrained_f_min if args.constrained else spec.f_min
        ok = np.isfinite(summary.final_cost) and (
            target is None or summary.final_cost <= target + 1e-4 * (1 + abs(target))
        )
        wins += bool(ok)
        total += 1
        print(f"{spec.name:28s} final cost {summary.final_cost:.3e} "
              f"(target {target}) {'ok' if ok else 'MISS'}")
    print(f"{wins}/{total} reached the certified minimum")


if __name__ == "__main__":
    main()
