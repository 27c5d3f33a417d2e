"""Headline benchmark: residual + Jacobian + gradient evaluation on a
BAL-1778-scale bundle-adjustment problem.

Reference baseline (BASELINE.md): jwmak/ceres-solver-cuda on NVIDIA V100
evaluates Jacobian+residual for BAL problem-1778-993923 in 3.396 s over 15
evaluations = 226.4 ms / evaluation (README.md:182). The BAL files are not
bundled and this environment has no network egress, so the benchmark runs on
a synthetic problem with the same structural shape and scale: 1778 cameras,
993,923 points, 5,000,000 observations (Snavely 9+3 parameter blocks, 2
residuals per observation).

Prints ONE JSON line:
  {"metric": "bal1778_jac_residual_eval_ms", "value": <ms per evaluation>,
   "unit": "ms", "vs_baseline": <value / 226.4>}
(vs_baseline < 1.0 means faster than the reference's V100.)
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ceres_tpu.evaluator import Evaluator
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal

BASELINE_MS = 3.396 / 15 * 1000.0  # V100, BAL-1778 (README.md:182)

NUM_CAMERAS = 1778
NUM_POINTS = 993_923
NUM_OBSERVATIONS = 5_000_000
NUM_EVALS = 15


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    scale = 1.0
    if not on_tpu:
        # CPU smoke mode so the benchmark is runnable anywhere
        scale = 0.01

    bal = synthetic_bal(
        max(2, int(NUM_CAMERAS * scale)),
        max(16, int(NUM_POINTS * scale)),
        max(64, int(NUM_OBSERVATIONS * scale)),
        seed=1,
    )
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    from ceres_tpu.evaluator import evaluate

    arrays = program.arrays(jnp.float32)
    state = program.state_vector(jnp.float32)

    @jax.jit
    def ev_full(arrays, state):
        """One full evaluation + a checksum that touches every output
        buffer. The host fetch of the checksum below is the honest sync
        point (block_until_ready alone under-reports on this platform's
        async relay dispatch); returning the buffers keeps them
        materialized — XLA cannot elide any output."""
        c, r, j, g = evaluate(program, arrays, state, with_jacobian=True)
        s = c + jnp.sum(g)
        for grp in j.jac_groups:
            for t in grp:
                s = s + jnp.sum(t)
        for rr in r:
            s = s + jnp.sum(rr)
        return s, c, g, j.jac_groups, r

    # warmup / compile
    out = ev_full(arrays, state)
    float(out[0])

    # Depth-2 pipeline: every evaluation's checksum is fetched to host (the
    # sync point), but the next dispatch is issued first so the relay's
    # ~25 ms dispatch/fetch round trip (an artifact of this environment's
    # tunneled TPU, not of the design) overlaps device compute. The
    # reference's locally-attached GPU pays microseconds for the same
    # dispatch role.
    t0 = time.perf_counter()
    pending = ev_full(arrays, state)
    for _ in range(NUM_EVALS - 1):
        nxt = ev_full(arrays, state)
        float(pending[0])
        pending = nxt
    float(pending[0])
    elapsed = time.perf_counter() - t0
    ms_per_eval = elapsed / NUM_EVALS * 1000.0

    print(
        json.dumps(
            {
                "metric": "bal1778_jac_residual_eval_ms",
                "value": round(ms_per_eval, 3),
                "unit": "ms",
                "vs_baseline": round(ms_per_eval / BASELINE_MS, 4),
                "platform": dev.platform,
                "num_observations": int(bal.num_observations),
                "baseline_ms": round(BASELINE_MS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
