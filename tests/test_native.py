"""Native (C++) loader/preprocessor tests: native results must match the
NumPy fallbacks exactly. Skipped when the library is not built
(`make -C native`)."""

import numpy as np
import pytest

from ceres_tpu.io import native
from ceres_tpu.io.bal import load_bal, synthetic_bal

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def write_bal(bal, path):
    with open(path, "w") as f:
        f.write(f"{bal.num_cameras} {bal.num_points} {bal.num_observations}\n")
        for i in range(bal.num_observations):
            f.write(
                f"{bal.camera_index[i]} {bal.point_index[i]} "
                f"{bal.observations[i,0]:.17g} {bal.observations[i,1]:.17g}\n"
            )
        for c in bal.cameras.reshape(-1):
            f.write(f"{c:.17g}\n")
        for p in bal.points.reshape(-1):
            f.write(f"{p:.17g}\n")


@needs_native
def test_native_bal_parse_matches_python(tmp_path):
    bal = synthetic_bal(4, 17, 60, seed=7)
    path = str(tmp_path / "p.txt")
    write_bal(bal, path)
    cameras, points, ci, pi, obs = native.load_bal_native(path)
    np.testing.assert_allclose(cameras, bal.cameras)
    np.testing.assert_allclose(points, bal.points)
    np.testing.assert_array_equal(ci, bal.camera_index)
    np.testing.assert_array_equal(pi, bal.point_index)
    np.testing.assert_allclose(obs, bal.observations)


def test_sort_by_camera_matches_lexsort():
    rng = np.random.default_rng(0)
    ci = rng.integers(0, 10, 500)
    pi = rng.integers(0, 50, 500)
    perm = native.sort_by_camera(ci, pi)
    ref = np.lexsort((pi, ci))
    np.testing.assert_array_equal(ci[perm], ci[ref])
    np.testing.assert_array_equal(pi[perm], pi[ref])


def test_count_degrees():
    ci = np.array([0, 0, 1, 2, 2, 2])
    pi = np.array([3, 1, 1, 0, 3, 3])
    cd, pd = native.count_degrees(ci, pi, 3, 4)
    np.testing.assert_array_equal(cd, [2, 1, 3])
    np.testing.assert_array_equal(pd, [1, 2, 0, 3])


def test_coo_to_crs():
    rows = np.array([2, 0, 1, 0, 2])
    cols = np.array([1, 3, 0, 1, 0])
    perm, row_ptr = native.coo_to_crs(rows, cols, 3)
    np.testing.assert_array_equal(row_ptr, [0, 2, 3, 5])
    np.testing.assert_array_equal(rows[perm], [0, 0, 1, 2, 2])
    np.testing.assert_array_equal(cols[perm], [1, 3, 0, 0, 1])
