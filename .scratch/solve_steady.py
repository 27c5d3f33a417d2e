"""Steady-state LM iterations/s on BAL-1778 scale (2+ fused chunks)."""
import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
sys.path.insert(0, "/root/repo")
import ceres_tpu
from ceres_tpu import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal

bal = synthetic_bal(1778, 993_923, 5_000_000, seed=1,
                    perturb_points=0.5, perturb_rotation=0.02)
problem, _, _ = build_ba_problem(bal)
t0 = time.time()
s = ceres_tpu.solve(
    SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=45,
        max_linear_solver_iterations=20,
        function_tolerance=0.0, gradient_tolerance=0.0, parameter_tolerance=0.0,
    ),
    problem,
)
wall = time.time() - t0
n = len(s.iterations) - 1
# per-chunk times recorded as amortized iteration times; last chunk is steady
times = [it.iteration_time_in_seconds for it in s.iterations[1:]]
print(f"{s.termination_type} cost {s.initial_cost:.4e} -> {s.final_cost:.4e}")
print(f"wall {wall:.1f}s / {n} iters; chunk-amortized it times: "
      f"first {times[0]:.2f}s last {times[-1]:.2f}s")
print(f"steady-state: {1.0/times[-1]:.2f} LM it/s")
