#!/usr/bin/env python
"""NIST StRD accuracy harness (reference: examples/nist.cc). Point at a
directory of certified .dat files (e.g. /root/reference/data/nist)."""

import argparse

import _common  # noqa: F401
from ceres_tpu.examples.nist import run_nist, summarize_nist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nist_data_dir", required=True)
    args = ap.parse_args()
    results = run_nist(args.nist_data_dir)
    for name, rs in sorted(results.items()):
        for i, r in enumerate(rs):
            print(
                f"{name:10s} start {i+1}: "
                f"{'SUCCESS' if r.success else 'FAILURE'} lre {r.lre:4.1f} "
                f"final cost {r.final_cost:.6e} certified {r.certified_cost:.6e}"
            )
    for tier, (wins, total) in summarize_nist(results).items():
        print(f"{tier.capitalize():8s}: {wins}/{total}")


if __name__ == "__main__":
    main()
