"""Micro-benchmark suite: per-kernel timings with JSON output.

Role of the reference's Google-Benchmark tier
(internal/ceres/CMakeLists.txt:603-641: spmv_benchmark.cc,
evaluation_benchmark.cc, schur_eliminator_benchmark.cc,
jet_operator_benchmark.cc, block_jacobi_preconditioner_benchmark.cc):
when the end-to-end bench regresses, this localizes it to a specific
kernel. One JSON line per benchmark.

Usage:
    python benchmarks/micro.py                 # all, BA-16-ish scale
    python benchmarks/micro.py --scale 1.0     # BAL-1778 scale (TPU)
    python benchmarks/micro.py --only eval,reduce

Runs on whatever backend jax picks (TPU when present; CPU smoke anywhere).
Each timing uses a jitted function, one warmup call, then `reps`
host-synced calls — the same accounting as bench.py's serial mode.
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
    """Time `fn` via a scalar-checksum fetch (block_until_ready
    under-reports through this platform's async relay — see bench.py), a
    depth-2 dispatch pipeline hiding the ~25 ms relay round trip, and the
    checksum reduction touching every output buffer so nothing is
    dead-code-eliminated."""
    import jax.numpy as _jnp

    @jax.jit
    def cs(*a):
        out = fn(*a)
        s = _jnp.zeros((), _jnp.float32)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "dtype") and _jnp.issubdtype(
                leaf.dtype, _jnp.floating
            ):
                s = s + _jnp.sum(leaf.astype(_jnp.float32))
        return s, out

    float(cs(*args)[0])  # compile + warmup
    t0 = time.perf_counter()
    pending, out = cs(*args)
    for _ in range(reps - 1):
        nxt, out = cs(*args)
        float(pending)
        pending = nxt
    float(pending)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    line = {"benchmark": name, "ms": round(ms, 3), "reps": reps}
    line.update(meta)
    print(json.dumps(line), flush=True)
    return out


def _problem(scale):
    from ceres_tpu.io.bal import build_ba_problem, synthetic_bal

    bal = synthetic_bal(
        max(2, int(1778 * scale)),
        max(16, int(993_923 * scale)),
        max(64, int(5_000_000 * scale)),
        seed=1,
    )
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    return program, int(bal.num_observations)


def bench_eval(program, n):
    """Group evaluation: Pallas kernel vs XLA fusion path, residual-only
    vs jacobian (the role of evaluation_benchmark.cc)."""
    from ceres_tpu.evaluator import evaluate

    arrays = program.arrays(jnp.float32)
    state = program.state_vector(jnp.float32)

    def run(tag, env):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        for m in program.groups:  # drop cached kernels between variants
            if hasattr(m, "_pallas_kernels"):
                del m._pallas_kernels
        try:
            f_res = jax.jit(
                lambda a, s: evaluate(program, a, s, with_jacobian=False)[0]
            )
            timed(f"eval_residual_{tag}", f_res, arrays, state, n_obs=n)

            @jax.jit
            def f_full(a, s):
                c, r, j, g = evaluate(program, a, s, with_jacobian=True)
                leaves = [c, g]
                for grp in j.jac_groups:
                    leaves.extend(grp)
                return leaves

            timed(f"eval_jac_residual_grad_{tag}", f_full, arrays, state, n_obs=n)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            for m in program.groups:
                if hasattr(m, "_pallas_kernels"):
                    del m._pallas_kernels

    run("default", {})  # fused Pallas kernels (incl. residual-only path)
    run("xla", {"CERES_TPU_NO_PALLAS": "1"})


def bench_reduce(program, n):
    """Deterministic reduction plans: bucket reshape-sum vs one-hot MXU
    matmul vs segment_sum (the reference's atomicAdd-analog tier;
    spmv_benchmark.cc role)."""
    from ceres_tpu.jacobian import reduce_T

    meta = program.groups[0]
    idx = program.group_idx[0]
    k = 6
    contrib = jnp.asarray(np.random.RandomState(0).randn(k, meta.n), jnp.float32)
    for pos in range(len(meta.positions)):
        pm = meta.positions[pos]
        cnt = program.tangent_class_counts[pm.t_cls]
        rows = jnp.asarray(idx["t_rows"][pos])
        plan = (meta.red_plans or {}).get(pos)
        kind = plan[0] if plan else "segsum"
        f = jax.jit(
            lambda c, r, _p=plan: reduce_T(_p, c, r, cnt + 1)
        )
        timed(f"reduce_{kind}_pos{pos}", f, contrib, rows, n_obs=meta.n, out=cnt)
        if kind != "segsum":  # also time the generic fallback for contrast
            f2 = jax.jit(lambda c, r: reduce_T(None, c, r, cnt + 1))
            timed(f"reduce_segsum_pos{pos}", f2, contrib, rows, n_obs=meta.n, out=cnt)


def bench_gather(program, n):
    """Parameter-gather variants [cnt, s] table -> [s, n] lanes: the
    camera-side gather inside every partitioned product (one-hot MXU vs
    row-take+transpose vs lane-axis take)."""
    from ceres_tpu.jacobian import gather_T

    meta = program.groups[0]
    idx = program.group_idx[0]
    # camera position = the non-owner position
    pos = 0 if meta.owner != 0 else 1
    pm = meta.positions[pos]
    cnt = program.tangent_class_counts[pm.t_cls]
    rows = jnp.asarray(idx["t_rows"][pos])
    table = jnp.asarray(
        np.random.RandomState(0).randn(cnt + 1, pm.tangent_size), jnp.float32
    )

    f1 = jax.jit(lambda t, r: gather_T(("onehot",), t, r))
    timed("gather_onehot", f1, table, rows, n_obs=meta.n, cnt=cnt)
    f2 = jax.jit(lambda t, r: jnp.take(t, r, axis=0).T)
    timed("gather_take_T", f2, table, rows, n_obs=meta.n, cnt=cnt)
    f3 = jax.jit(lambda t, r: t.T[:, r])
    timed("gather_lane_axis", f3, table, rows, n_obs=meta.n, cnt=cnt)


def bench_pcg(program, n):
    """One implicit-Schur PCG iteration (4 partitioned products +
    preconditioner), and the SCHUR_JACOBI preconditioner build
    (block_jacobi_preconditioner_benchmark / schur_eliminator_benchmark
    roles)."""
    from ceres_tpu.linalg.preconditioners import BlockDiagSolver
    from ceres_tpu.linalg.schur import (
        make_ete_solver,
        schur_jacobi_blocks,
        schur_views,
    )

    from ceres_tpu.evaluator import Evaluator

    ev = Evaluator(program, dtype=jnp.float32)
    state = program.state_vector(jnp.float32)
    _c, _r, jac, grad = ev.evaluate_groups(state)
    e_np, f_np = program.schur_tangent_masks()
    dsq = jnp.full((program.num_effective_parameters,), 0.1, jnp.float32)
    dsq_e = dsq * jnp.asarray(e_np, jnp.float32)
    dsq_f = dsq * jnp.asarray(f_np, jnp.float32)

    # Everything large rides as traced ARGUMENTS (BlockJacobian is a
    # pytree): a closure would bake the [26 x 5M] Jacobian into the
    # program as constants — this platform's remote compile rejects the
    # payload (HTTP 413).
    @jax.jit
    def build_prec(jac, g):
        jac_e, jac_f = schur_views(program, jac)
        ete = make_ete_solver(program, jac_e, dsq_e)
        return schur_jacobi_blocks(program, jac_e, jac_f, ete, dsq_f), dict(
            ete.inv_tables
        )

    out = timed("schur_jacobi_precond_build", build_prec, jac, grad, n_obs=n)
    blocks, ete_tables = out

    @jax.jit
    def prec_tables_of(blocks):
        return dict(BlockDiagSolver(program, blocks).inv_tables)

    prec_tables = prec_tables_of(list(blocks))

    @jax.jit
    def s_apply_prec(jac, y, ete_tables, prec_tables):
        jac_e, jac_f = schur_views(program, jac)
        ete = BlockDiagSolver.from_inverse_tables(program, ete_tables)
        prec = BlockDiagSolver.from_inverse_tables(program, prec_tables)
        t1 = jac_f.right_multiply(y)
        t2 = ete(jac_e.left_multiply(t1))
        et2 = jac_e.right_multiply(t2)
        diff = [a - b for a, b in zip(t1, et2)]
        sy = jac_f.left_multiply(diff) + dsq_f * y
        return prec(sy)

    timed(
        "pcg_iteration_implicit_schur",
        s_apply_prec,
        jac,
        grad,
        ete_tables,
        prec_tables,
        n_obs=n,
    )


def bench_chunk(program, n, scale):
    """One fused LM chunk (6 iterations of eval+PCG+acceptance inside a
    single device program) — the end-to-end hot dispatch."""
    import ceres_tpu
    from ceres_tpu import HuberLoss
    from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
    from ceres_tpu.types import (
        LinearSolverType,
        PreconditionerType,
        SolverOptions,
    )

    bal = synthetic_bal(
        max(2, int(1778 * scale)),
        max(16, int(993_923 * scale)),
        max(64, int(5_000_000 * scale)),
        seed=3,
        observation_noise=2.0,
        perturb_points=0.5,
    )
    problem, _, _ = build_ba_problem(bal, loss=HuberLoss(1.0))
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        fused_execution_chunk_iters=6,
        max_num_iterations=12,
        eta=1e-1,
        max_linear_solver_iterations=25,
        function_tolerance=0.0,
        gradient_tolerance=0.0,
        parameter_tolerance=0.0,
    )
    t0 = time.perf_counter()
    s = ceres_tpu.solve(options, problem)
    total = time.perf_counter() - t0
    es = s.execution_summary
    chunks = es.calls("FusedLoop::Chunk")
    print(
        json.dumps(
            {
                "benchmark": "fused_chunk_6it",
                "ms": round(es.seconds("FusedLoop::Chunk") / max(chunks, 1) * 1000, 1),
                "chunks": chunks,
                "iterations": len(s.iterations) - 1,
                "total_s": round(total, 1),
                "note": "first chunk includes jit compile",
            }
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument("--only", type=str, default="eval,reduce,gather,pcg,chunk")
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    scale = args.scale if args.scale is not None else (1.0 if on_tpu else 0.003)
    which = set(args.only.split(","))

    print(
        json.dumps(
            {"suite": "micro", "platform": jax.default_backend(), "scale": scale}
        ),
        flush=True,
    )
    program, n = _problem(scale)
    if "eval" in which:
        bench_eval(program, n)
    if "reduce" in which:
        bench_reduce(program, n)
    if "gather" in which:
        bench_gather(program, n)
    if "pcg" in which:
        bench_pcg(program, n)
    if "chunk" in which:
        bench_chunk(program, n, scale)


if __name__ == "__main__":
    main()
