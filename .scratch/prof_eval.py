"""Break down where bench.py's 230ms goes."""
import os, sys, time, json
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")

from ceres_tpu.evaluator import evaluate, state_tables, _group_eval
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal

bal = synthetic_bal(1778, 993_923, 5_000_000, seed=1)
problem, _, _ = build_ba_problem(bal)
program = problem.compile()
arrays = program.arrays(jnp.float32)
state = program.state_vector(jnp.float32)

def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    # honest sync via host fetch of a scalar checksum
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:45s} {dt:8.2f} ms")
    return out

@jax.jit
def f_res_only(arrays, state):
    c, r, _, _ = evaluate(program, arrays, state, with_jacobian=False)
    return c, r

@jax.jit
def f_jac_only(arrays, state):
    # jacobian computation without gradient (left_multiply)
    st = state_tables(program, state)
    outs = []
    for meta, garr in zip(program.groups, arrays["groups"]):
        c, res, jacs = _group_eval(meta, garr, st, True, True)
        outs.append((c, res, jacs))
    return outs

@jax.jit
def f_full(arrays, state):
    c, r, j, g = evaluate(program, arrays, state, with_jacobian=True)
    return c, g, j.jac_groups, r

@jax.jit
def f_grad_from(arrays, state):
    c, r, j, g = evaluate(program, arrays, state, with_jacobian=True)
    return g

timeit("residual-only", f_res_only, arrays, state)
timeit("jacobian (no grad)", f_jac_only, arrays, state)
timeit("full (jac+grad)", f_full, arrays, state)

# products on a fixed jacobian
c, r, jac, g = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=True))(arrays, state)
jax.block_until_ready(jac.jac_groups)
v = jnp.ones(program.num_effective_parameters, jnp.float32)

timeit("left_multiply (J^T u)", jax.jit(lambda j, u: j.left_multiply(u)), jac, r)
timeit("right_multiply (J v)", jax.jit(lambda j, v: j.right_multiply(v)), jac, v)
timeit("jtj_multiply", jax.jit(lambda j, v: j.jtj_multiply(v)), jac, v)
timeit("squared_column_norms", jax.jit(lambda j: j.squared_column_norms()), jac)
timeit("block_diag_jtj", jax.jit(lambda j: j.block_diag_jtj()), jac)
