"""Component-level profile of the implicit-Schur PCG matvec (tvec form).

Times each piece of S·y at BAL-1778 scale on the current backend to locate
where the per-PCG-iteration time goes (VERDICT r3: 19.2 ms measured vs a
~2 ms HBM bound). One JSON line per timing.
"""

import argparse
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, reps=10, **meta):
    @jax.jit
    def cs(*a):
        out = fn(*a)
        s = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                leaf.dtype, jnp.floating
            ):
                s = s + jnp.sum(leaf.astype(jnp.float32))
        return s, out

    out = cs(*args)
    float(out[0])  # compile + warmup
    # depth-2 pipeline hiding the relay round trip
    t0 = time.perf_counter()
    prev = cs(*args)
    for _ in range(reps - 1):
        cur = cs(*args)
        float(prev[0])
        prev = cur
    float(prev[0])
    dt = (time.perf_counter() - t0) / reps
    print(
        json.dumps({"benchmark": name, "ms": round(dt * 1000, 2), **meta}),
        flush=True,
    )
    return out[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from ceres_tpu import HuberLoss
    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
    from ceres_tpu.linalg.preconditioners import BlockDiagSolver
    from ceres_tpu.linalg.schur import make_ete_solver, schur_views

    n_cam = max(4, int(1778 * args.scale))
    n_pt = max(32, int(993_923 * args.scale))
    n_obs = max(128, int(5_000_000 * args.scale))
    bal = synthetic_bal(n_cam, n_pt, n_obs, seed=3)
    problem, _, _ = build_ba_problem(bal, loss=HuberLoss(1.0))
    program = problem.compile()

    ev = Evaluator(program, dtype=jnp.float32)
    state = program.state_vector(jnp.float32)
    _c, _r, jac0, grad = ev.evaluate_groups(state)
    e_np, f_np = program.schur_tangent_masks()
    dsq = jnp.full((program.num_effective_parameters,), 0.1, jnp.float32)
    dsq_e = dsq * jnp.asarray(e_np, jnp.float32)
    dsq_f = dsq * jnp.asarray(f_np, jnp.float32)

    scale_v = jax.jit(
        lambda j: 1.0 / (1.0 + jnp.sqrt(j.squared_column_norms()))
    )(jac0)
    jac = jax.jit(lambda j, s: j.scale_columns(s).materialize_scale())(
        jac0, scale_v
    )

    @jax.jit
    def setup(jac):
        jac_e, jac_f = schur_views(program, jac)
        ete = make_ete_solver(program, jac_e, dsq_e)
        return dict(ete.inv_tables)

    ete_tables = setup(jac)

    y = jnp.asarray(
        np.random.default_rng(0).normal(
            0, 1, program.num_effective_parameters
        ),
        jnp.float32,
    ) * jnp.asarray(f_np, jnp.float32)

    @jax.jit
    def to_tvec(jac, y):
        return jac.tvec(y)

    y_tv = to_tvec(jac, y)

    def fm(jac):
        return schur_views(program, jac)[1]

    def em(jac):
        return schur_views(program, jac)[0]

    # --- components -----------------------------------------------------
    t1 = timed(
        "F_right_multiply_t", lambda j, v: fm(j).right_multiply_t(v),
        jac, y_tv, reps=args.reps,
    )
    timed(
        "E_left_multiply_t", lambda j, u: em(j).left_multiply_t(list(u)),
        jac, tuple(t1), reps=args.reps,
    )

    @jax.jit
    def ete_apply(tables, tv):
        ete = BlockDiagSolver.from_inverse_tables(program, tables)
        return ete.apply_t(tv)

    e_tv = jax.jit(lambda j, u: em(j).left_multiply_t(list(u)))(jac, tuple(t1))
    t2 = timed("ete_apply_t", ete_apply, ete_tables, e_tv, reps=args.reps)
    et2 = timed(
        "E_right_multiply_t", lambda j, v: em(j).right_multiply_t(v),
        jac, t2, reps=args.reps,
    )
    timed(
        "F_left_multiply_t", lambda j, u: fm(j).left_multiply_t(list(u)),
        jac, tuple(t1), reps=args.reps,
    )

    # --- full S.y -------------------------------------------------------
    def s_apply(jac, y_tv, ete_tables):
        jac_e, jac_f = schur_views(program, jac)
        ete = BlockDiagSolver.from_inverse_tables(program, ete_tables)
        t1 = jac_f.right_multiply_t(y_tv)
        t2 = ete.apply_t(jac_e.left_multiply_t(t1))
        et2 = jac_e.right_multiply_t(t2)
        diff = [a - b for a, b in zip(t1, et2)]
        out = jac_f.left_multiply_t(diff)
        dsq_f_tv = jac.tvec(dsq_f)
        return [o + d * v for o, d, v in zip(out, dsq_f_tv, y_tv)]

    timed("S_apply_full", s_apply, jac, y_tv, ete_tables, reps=args.reps)

    # bf16 variant
    @jax.jit
    def to_bf16(jac):
        return jac.astype(jnp.bfloat16)

    jac16 = to_bf16(jac)
    timed("S_apply_full_bf16", s_apply, jac16, y_tv, ete_tables, reps=args.reps)

    # 20 chained S.y in one dispatch (amortize dispatch/relay):
    def s_apply_20(jac, y_tv, ete_tables):
        def body(i, v):
            out = s_apply(jac, v, ete_tables)
            # normalize so values stay finite
            nrm = sum(jnp.sum(o * o) for o in out)
            return [o * jax.lax.rsqrt(nrm + 1e-30) for o in out]

        return jax.lax.fori_loop(0, 20, body, y_tv)

    timed("S_apply_x20_fori", s_apply_20, jac, y_tv, ete_tables, reps=3,
          note="per-iter = ms/20")


if __name__ == "__main__":
    main()
