import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
sys.path.insert(0, "/root/repo")
import ceres_tpu
from ceres_tpu.types import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.evaluator import Evaluator
from ceres_tpu.solvers.strategies import make_lm_step_fn
from ceres_tpu.solvers.fused_loop import make_chunk_fn

bal = synthetic_bal(1778, 993_923, 5_000_000, seed=1,
                    perturb_points=0.3, perturb_rotation=0.01)
problem, _, _ = build_ba_problem(bal)
program = problem.compile()
options = SolverOptions(
    linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
    preconditioner_type=PreconditionerType.SCHUR_JACOBI,
    max_num_iterations=60,
    max_linear_solver_iterations=20,
    function_tolerance=0.0, gradient_tolerance=0.0, parameter_tolerance=0.0,
)
ev = Evaluator(program, dtype=jnp.float32)
state = program.state_vector(jnp.float32)
step_fn = make_lm_step_fn(program, options, ev)
chunk_fn = make_chunk_fn(program, options, step_fn)

t0=time.time()
cost, res, jac, grad = ev.evaluate_groups(state)
scale = jax.jit(lambda j: 1.0/(1.0+jnp.sqrt(j.squared_column_norms())))(jac)
jax.block_until_ready(scale); print(f"initial eval+scale {time.time()-t0:.1f}s", flush=True)

dtype = state.dtype
c0 = jnp.asarray(float(cost), dtype)
zero = jnp.asarray(0.0, dtype)
se = (c0, c0, c0, c0, zero, zero, jnp.asarray(0, jnp.int32))
args = lambda lim: (ev.arrays, state, c0, tuple(res), (jac.jac_groups, jac.t_rows),
                    grad, scale, jnp.asarray(1e4, dtype), jnp.asarray(2.0, dtype),
                    jnp.asarray(0, jnp.int32), se, jnp.asarray(lim, jnp.int32))

for lim in (1, 1, 2, 4, 8):
    t0 = time.time()
    out = chunk_fn(*args(lim))
    n = int(out["it"])
    print(f"limit={lim}: ran {n} iters in {time.time()-t0:.2f}s", flush=True)
