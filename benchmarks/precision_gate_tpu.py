"""On-chip precision gate at BAL-1778 scale (round-2 verdict #3).

BASELINE.json acceptance: final-cost parity with the (f64, jet.h
end-to-end) reference within Ceres' default function_tolerance (1e-6).
The CPU gate in tests/test_precision_gate.py proves the math; this script
proves it ON THE CHIP at benchmark scale, where CPU-f32 simulation is not
the same thing (different fusion, real bf16 MXU passes, the Pallas kernel
actually runs).

Protocol:
  1. solve the synthetic BAL-1778 problem on the TPU in f32, and again
     with use_mixed_precision_solves (bf16 PCG matvecs);
  2. solve the IDENTICAL problem in f64 on local CPU (subprocess, smaller
     iteration budget is NOT used — same solver configuration);
  3. gate |cost_f32 - cost_f64| / cost_f64 <= 1e-6.

Emits one JSON line per path; exit 0 iff every path passes the gate.
Results are recorded in BASELINE.md ("Precision gate" section).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FUNCTION_TOLERANCE = 1e-6

# full BAL-1778 scale on the chip; the f64 CPU reference uses the same
# problem (identical seed/structure) — its wall time is minutes, which is
# exactly why the production path is the f32 chip path
SCALE = float(os.environ.get("SCALE", "1.0"))
CAMS = max(2, int(1778 * SCALE))
PTS = max(16, int(993_923 * SCALE))
OBS = max(64, int(5_000_000 * SCALE))
SEED = 11
MAX_ITERS = 20  # the reference benchmark's --num_iterations=20


def _options_kwargs():
    return dict(
        max_num_iterations=MAX_ITERS,
        eta=1e-2,
        max_linear_solver_iterations=50,
        fused_execution_chunk_iters=5,
        function_tolerance=0.0,
        gradient_tolerance=0.0,
        parameter_tolerance=0.0,
    )


def solve_here(dtype, mixed):
    import ceres_tpu
    from ceres_tpu import HuberLoss
    from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
    from ceres_tpu.types import (
        LinearSolverType,
        PreconditionerType,
        SolverOptions,
    )

    bal = synthetic_bal(CAMS, PTS, OBS, seed=SEED, observation_noise=2.0,
                        perturb_points=0.3)
    problem, _, _ = build_ba_problem(bal, loss=HuberLoss(1.0))
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        dtype=dtype,
        use_mixed_precision_solves=mixed,
        **_options_kwargs(),
    )
    t0 = time.perf_counter()
    s = ceres_tpu.solve(options, problem)
    return s.final_cost, s.initial_cost, time.perf_counter() - t0


def f64_reference():
    """Identical problem + solver config, f64 on local CPU, subprocess."""
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import sys, json, time
sys.path.insert(0, {REPO!r})
sys.path.insert(0, {REPO!r} + "/benchmarks")
import precision_gate_tpu as g
import jax.numpy as jnp
c, c0, dt = g.solve_here(jnp.float64, False)
print("REF " + json.dumps({{"final": c, "initial": c0, "s": dt}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        # no one-hot reduction plans on CPU: XLA-CPU materializes the
        # [n, cnt] one-hot operand (148 GB OOM at f64 full scale)
        env=dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            BENCH_PHASE="",
            CERES_TPU_NO_ONEHOT="1",
        ),
        capture_output=True, text=True, timeout=5400,
    )
    for ln in out.stdout.splitlines():
        if ln.startswith("REF "):
            return json.loads(ln[4:])
    sys.stderr.write(out.stderr[-3000:])
    raise RuntimeError("f64 reference solve failed")


def main():
    on_tpu = jax.default_backend() == "tpu"
    ref = f64_reference()
    print(json.dumps({"path": "f64_cpu_reference", "final_cost": ref["final"],
                      "solve_s": round(ref["s"], 1)}), flush=True)
    ok = True
    for mixed in (False, True):
        c, c0, dt = solve_here(jnp.float32, mixed)
        gap = abs(c - ref["final"]) / max(abs(ref["final"]), 1e-300)
        passed = gap <= FUNCTION_TOLERANCE
        ok &= passed
        print(json.dumps({
            "path": "f32+bf16" if mixed else "f32",
            "platform": jax.default_backend(),
            "on_tpu": on_tpu,
            "final_cost": c,
            "rel_gap_vs_f64": gap,
            "gate": FUNCTION_TOLERANCE,
            "passed": passed,
            "solve_s": round(dt, 1),
            "n_obs": OBS,
        }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
