"""Full-scale BAL-1778 LM solve on TPU: measures LM iterations/s."""
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

t0 = time.time()
bal = synthetic_bal(1778, 993_923, 5_000_000, seed=1)
problem, _, _ = build_ba_problem(bal)
print(f"problem build: {time.time()-t0:.1f}s", flush=True)

prec = sys.argv[1] if len(sys.argv) > 1 else "SCHUR_JACOBI"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

t0 = time.time()
s = ceres_tpu.solve(
    SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=getattr(PreconditionerType, prec),
        max_num_iterations=iters,
        max_linear_solver_iterations=50,
        minimizer_progress_to_stdout=True,
    ),
    problem,
)
wall = time.time() - t0
n_it = len(s.iterations) - 1
print(f"\n{s.termination_type} cost {s.initial_cost:.4e} -> {s.final_cost:.4e}")
print(f"wall {wall:.1f}s for {n_it} iterations = {n_it/wall:.2f} LM it/s "
      f"(incl. first-call compile)")
print(f"preprocessor-analog (program compile+upload) excluded; "
      f"linear solver time {s.linear_solver_time_in_seconds:.1f}s")
