import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from ceres_tpu.evaluator import evaluate
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.jacobian import BlockJacobian
from ceres_tpu.types import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.linalg.schur import schur_views, make_ete_solver, schur_jacobi_blocks, schur_solve
from ceres_tpu.linalg.preconditioners import BlockDiagSolver

bal = synthetic_bal(1778, 993_923, 5_000_000, seed=1)
problem, _, _ = build_ba_problem(bal)
program = problem.compile()
arrays = program.arrays(jnp.float32)
state = program.state_vector(jnp.float32)

c0, r0, jac0, g0 = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=True))(arrays, state)
jax.block_until_ready(jac0.jac_groups)
num_eff = program.num_effective_parameters
v = jnp.ones(num_eff, jnp.float32)

options = SolverOptions(
    linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
    preconditioner_type=PreconditionerType.SCHUR_JACOBI,
    max_linear_solver_iterations=20,
)

def bench(name, make_fn, *args, iters=5):
    def loop(*a):
        def body(i, carry):
            out = make_fn(carry, *a)
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.zeros((), jnp.float32)
            for l in leaves: s = s + jnp.sum(l).astype(jnp.float32) * 1e-20
            return carry + s * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    f = jax.jit(loop)
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    dt = (time.perf_counter() - t0 - 0.025) / iters * 1000
    print(f"{name:46s} {dt:8.2f} ms", flush=True)

def pj(c, jac):
    ng = tuple(tuple(jnp.maximum(j, c - 1e30) for j in jacs) for jacs in jac.jac_groups)
    return BlockJacobian(program, ng, jac.t_rows, jac.axis_name, jac.positions)

dsq = jnp.ones(num_eff, jnp.float32)
e_mask_np, f_mask_np = program.schur_tangent_masks()
e_mask = jnp.asarray(e_mask_np, jnp.float32)
f_mask = jnp.asarray(f_mask_np, jnp.float32)

def views(c, jac):
    return schur_views(program, pj(c, jac))

bench("make_ete_solver", lambda c, jac: make_ete_solver(program, views(c, jac)[0], dsq * e_mask).inv_tables, jac0)

def sj(c, jac):
    je, jf = views(c, jac)
    ete = make_ete_solver(program, je, dsq * e_mask)
    return schur_jacobi_blocks(program, je, jf, ete, dsq * f_mask)
bench("schur_jacobi_blocks (incl ete)", sj, jac0)

def sapply(c, jac):
    je, jf = views(c, jac)
    ete = make_ete_solver(program, je, dsq * e_mask)
    t1 = jf.right_multiply(v)
    ett1 = je.left_multiply(t1)
    t2 = ete(ett1)
    et2 = je.right_multiply(t2)
    diff = [a - b for a, b in zip(t1, et2)]
    return jf.left_multiply(diff) + dsq * f_mask * v
bench("s_apply (incl ete build)", sapply, jac0)

def full_step(c, jac):
    return schur_solve(program, options, pj(c, jac), r0, g0, dsq)[0]
bench("schur_solve (20 CG iters)", full_step, jac0, iters=3)
