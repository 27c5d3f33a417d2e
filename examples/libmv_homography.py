#!/usr/bin/env python
"""Homography estimation with symmetric geometric distance
(reference: examples/libmv_homography.cc)."""

import _common  # noqa: F401
import numpy as np

from ceres_tpu.examples.libmv import EstimateHomographyOptions, estimate_homography


def main():
    h_true = np.array([[1.243715, -0.461057, -111.964454],
                       [0.0, 0.617589, -192.379252],
                       [0.0, -0.000983, 1.0]])
    rng = np.random.default_rng(0)
    x1 = rng.uniform(0, 500, (12, 2))
    ones = np.ones((12, 1))
    y = (h_true @ np.concatenate([x1, ones], axis=1).T).T
    x2 = y[:, :2] / y[:, 2:3]
    h, summary = estimate_homography(
        x1, x2, EstimateHomographyOptions(expected_average_symmetric_distance=1e-10)
    )
    print(summary.brief_report())
    print("estimated H:\n", h)
    print("true H:\n", h_true)


if __name__ == "__main__":
    main()
