"""Smoke tests for the runnable example programs in examples/.

Each script mirrors one reference example's main() (examples/*.cc); the
quick ones are driven in-process here so the user-facing entry points
cannot rot. The data-dependent CLIs (denoising, nist, libmv, pose_graph_3d,
bundle_adjuster) exercise the same library code as their dedicated test
modules and accept real files from /root/reference/data.
"""

import importlib.util
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "examples")

QUICK = [
    "powell",
    "rosenbrock",
    "robust_curve_fitting",
    "circle_fit",
    "helloworld_numeric_diff",
    "sampled_function",
    "robot_pose_mle",
    "pose_graph_2d",
    "libmv_homography",
    "bicubic_interpolation",
    "ellipse_approximation",
]


def _run_main(name, argv=()):
    sys.path.insert(0, EXAMPLES_DIR)
    old_argv = sys.argv
    try:
        spec = importlib.util.spec_from_file_location(
            f"example_{name}", os.path.join(EXAMPLES_DIR, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.argv = [f"{name}.py", *argv]
        mod.main()
    finally:
        sys.argv = old_argv
        sys.path.remove(EXAMPLES_DIR)


@pytest.mark.parametrize("name", QUICK)
def test_example_runs(name, capsys):
    _run_main(name)
    out = capsys.readouterr().out
    assert "Solver Summary" in out or "CONVERGENCE" in out or "H:" in out, out
