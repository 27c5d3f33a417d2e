import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from ceres_tpu.evaluator import evaluate, plus, state_tables, _group_eval
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.jacobian import BlockJacobian

bal = synthetic_bal(1778, 993_923, 5_000_000, seed=1)
problem, _, _ = build_ba_problem(bal)
program = problem.compile()
arrays = program.arrays(jnp.float32)
state = program.state_vector(jnp.float32)

def bench(name, make_fn, *args, iters=10):
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

which = sys.argv[1] if len(sys.argv) > 1 else "all"

tie = lambda c: jnp.maximum(state, c - 1e30)
if which in ("all", "eval"):
    bench("full eval (jac+grad)", lambda c: evaluate(program, arrays, tie(c), with_jacobian=True)[::3])
    bench("residual-only eval", lambda c: evaluate(program, arrays, tie(c), with_jacobian=False)[0])
    def jac_only(c):
        st = state_tables(program, tie(c))
        return [_group_eval(meta, garr, st, True, True) for meta, garr in zip(program.groups, arrays["groups"])]
    bench("jacobian (no grad)", jac_only)
    bench("plus", lambda c: plus(program, arrays, tie(c), jnp.ones(program.num_effective_parameters, jnp.float32)*1e-8))

if which in ("all", "prod"):
    c0, r0, jac0, g0 = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=True))(arrays, state)
    jax.block_until_ready(jac0.jac_groups)
    v = jnp.ones(program.num_effective_parameters, jnp.float32)
    def pj(c, jac):
        ng = tuple(tuple(jnp.maximum(j, c - 1e30) for j in jacs) for jacs in jac.jac_groups)
        return BlockJacobian(program, ng, jac.t_rows, jac.axis_name, jac.positions)
    bench("left_multiply", lambda c, jac, r: pj(c, jac).left_multiply(r), jac0, r0)
    bench("right_multiply", lambda c, jac: pj(c, jac).right_multiply(v), jac0)
    bench("jtj_multiply", lambda c, jac: pj(c, jac).jtj_multiply(v), jac0)
    bench("squared_column_norms", lambda c, jac: pj(c, jac).squared_column_norms(), jac0)
    bench("block_diag_jtj", lambda c, jac: pj(c, jac).block_diag_jtj(), jac0)
    bench("scale_columns", lambda c, jac: pj(c, jac).scale_columns(v), jac0)
