"""Visibility-based (CLUSTER_JACOBI / CLUSTER_TRIDIAGONAL) and SUBSET
preconditioner tests.

Strategy (mirrors the reference's visibility_based_preconditioner_test.cc +
subset_preconditioner_test.cc): unit-test the clustering algorithms on known
graphs, verify preconditioner exactness against the dense Schur complement
on problems whose cluster structure covers all camera pairs, and run
end-to-end BA solves.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import ceres_tpu
from ceres_tpu import (
    LinearSolverType,
    PreconditionerType,
    SolverOptions,
    TerminationType,
    VisibilityClusteringType,
)
from ceres_tpu.io.bal import BalProblem, build_ba_problem, synthetic_bal
from ceres_tpu.linalg.visibility import (
    VisibilityPreconditioner,
    canonical_views_clustering,
    degree2_max_spanning_forest,
    single_linkage_clustering,
)


# ------------------------------------------------------------------ #
# clustering unit tests
# ------------------------------------------------------------------ #


def test_single_linkage_merges_strong_edges():
    # edges: 0-1 strong, 1-2 strong, 3-4 weak -> clusters {0,1,2},{3},{4}
    ci = np.array([0, 1, 3])
    cj = np.array([1, 2, 4])
    w = np.array([0.95, 0.92, 0.5])
    membership, n = single_linkage_clustering(5, ci, cj, w)
    assert n == 3
    assert membership[0] == membership[1] == membership[2]
    assert membership[3] != membership[4]
    assert membership[3] != membership[0]


def test_canonical_views_two_obvious_clusters():
    # two cliques {0,1,2} and {3,4,5} with strong internal similarity
    edges = []
    for grp in ([0, 1, 2], [3, 4, 5]):
        for i in range(3):
            for j in range(i + 1, 3):
                edges.append((grp[i], grp[j], 0.9))
    ci = np.array([e[0] for e in edges])
    cj = np.array([e[1] for e in edges])
    w = np.array([e[2] for e in edges])
    vis = np.full(6, 10)
    membership, n = canonical_views_clustering(
        6, ci, cj, w, vis, min_views=0, size_penalty_weight=0.5
    )
    assert n >= 2
    assert membership[0] == membership[1] == membership[2]
    assert membership[3] == membership[4] == membership[5]
    assert membership[0] != membership[3]


def test_degree2_forest_is_paths():
    # star graph: forest must degrade to paths (degree <= 2)
    ei = np.array([0, 0, 0, 0])
    ej = np.array([1, 2, 3, 4])
    w = np.array([4.0, 3.0, 2.0, 1.0])
    chains = degree2_max_spanning_forest(5, ei, ej, w)
    covered = sorted(c for chain in chains for c in chain)
    assert covered == [0, 1, 2, 3, 4]
    for chain in chains:
        assert len(set(chain)) == len(chain)
    # vertex 0 keeps its two heaviest edges (1, 2); 3 and 4 split off
    main = max(chains, key=len)
    assert len(main) == 3 and 0 in main


# ------------------------------------------------------------------ #
# exactness against the dense Schur complement
# ------------------------------------------------------------------ #


def _dense_bal(num_cameras, num_points, seed=0):
    """Full-visibility BAL problem: every camera sees every point."""
    base = synthetic_bal(num_cameras, num_points, num_cameras * num_points, seed=seed)
    cam_idx, pt_idx = np.meshgrid(
        np.arange(num_cameras), np.arange(num_points), indexing="ij"
    )
    rng = np.random.default_rng(seed + 1)
    obs = rng.normal(0.0, 100.0, (num_cameras * num_points, 2))
    return BalProblem(
        cameras=base.cameras,
        points=base.points,
        camera_index=cam_idx.reshape(-1),
        point_index=pt_idx.reshape(-1),
        observations=obs,
    )


def _schur_pieces(problem, dsq_value=0.1):
    from ceres_tpu.linalg.schur import make_ete_solver, schur_views

    program = problem.compile()
    ev = program.evaluator()
    state = program.state_vector()
    _cost, _res, jac, _grad = ev.evaluate_groups(state)
    e_np, f_np = program.schur_tangent_masks()
    e_mask = jnp.asarray(e_np)
    f_mask = jnp.asarray(f_np)
    dsq = jnp.full((program.num_effective_parameters,), dsq_value)
    jac_e, jac_f = schur_views(program, jac)
    ete = make_ete_solver(program, jac_e, dsq * e_mask)

    def s_apply(y):
        t1 = jac_f.right_multiply(y)
        t2 = ete(jac_e.left_multiply(t1))
        et2 = jac_e.right_multiply(t2)
        diff = [a - b for a, b in zip(t1, et2)]
        return jac_f.left_multiply(diff) + dsq * f_mask * y

    return program, jac_e, jac_f, ete, dsq * f_mask, f_np, s_apply


def test_cluster_jacobi_exact_for_single_cluster():
    # full visibility -> similarity 1.0 -> single-linkage puts every camera
    # in ONE cluster -> M == S and M^{-1} S v == v.
    problem, _, _ = build_ba_problem(_dense_bal(4, 12))
    program, jac_e, jac_f, ete, dsq_f, f_np, s_apply = _schur_pieces(problem)
    prec = VisibilityPreconditioner(
        program,
        jac_e,
        jac_f,
        ete,
        dsq_f,
        PreconditionerType.CLUSTER_JACOBI,
        VisibilityClusteringType.SINGLE_LINKAGE,
    )
    assert prec.plan.n_clusters == 1
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=f_np.shape) * f_np)
    out = prec(s_apply(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), rtol=1e-5, atol=1e-8)


def test_cluster_tridiagonal_exact_for_two_clusters():
    # two camera groups with disjoint point sets + one shared point:
    # single linkage -> 2 clusters, cluster graph edge -> forest edge, so
    # the tridiagonal sparsity covers every camera pair -> M == S.
    nc, npts = 6, 21
    base = synthetic_bal(nc, npts, nc * npts, seed=5)
    cam_idx, pt_idx = [], []
    for c in range(nc):
        pts = list(range(0, 10)) if c < 3 else list(range(10, 20))
        pts = pts + [20]  # shared point
        cam_idx += [c] * len(pts)
        pt_idx += pts
    rng = np.random.default_rng(7)
    obs = rng.normal(0.0, 100.0, (len(cam_idx), 2))
    bal = BalProblem(
        cameras=base.cameras,
        points=base.points,
        camera_index=np.asarray(cam_idx),
        point_index=np.asarray(pt_idx),
        observations=obs,
    )
    problem, _, _ = build_ba_problem(bal)
    program, jac_e, jac_f, ete, dsq_f, f_np, s_apply = _schur_pieces(problem)
    prec = VisibilityPreconditioner(
        program,
        jac_e,
        jac_f,
        ete,
        dsq_f,
        PreconditionerType.CLUSTER_TRIDIAGONAL,
        VisibilityClusteringType.SINGLE_LINKAGE,
    )
    assert prec.plan.n_clusters == 2
    assert len(prec.plan.chains) == 1 and len(prec.plan.chains[0]) == 2
    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.normal(size=f_np.shape) * f_np)
    out = prec(s_apply(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), rtol=1e-5, atol=1e-8)


# ------------------------------------------------------------------ #
# end-to-end solves
# ------------------------------------------------------------------ #


@pytest.mark.parametrize(
    "ptype,ctype",
    [
        (PreconditionerType.CLUSTER_JACOBI, VisibilityClusteringType.CANONICAL_VIEWS),
        (PreconditionerType.CLUSTER_JACOBI, VisibilityClusteringType.SINGLE_LINKAGE),
        (
            PreconditionerType.CLUSTER_TRIDIAGONAL,
            VisibilityClusteringType.CANONICAL_VIEWS,
        ),
    ],
)
def test_ba_solve_with_visibility_preconditioner(ptype, ctype):
    bal = synthetic_bal(6, 50, 200, seed=2)
    problem, _, _ = build_ba_problem(bal)
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=ptype,
            visibility_clustering_type=ctype,
            max_num_iterations=30,
        ),
        problem,
    )
    assert s.termination_type == TerminationType.CONVERGENCE
    # same optimum as the SCHUR_JACOBI run in test_seg_reduce
    assert abs(s.final_cost - 112.8969) < 0.5, s.final_cost


def test_subset_preconditioner_cgnr():
    # SUBSET with *all* residual blocks -> M == J'J + D, so PCG converges
    # immediately; the solve must reach the same optimum as DENSE_QR.
    rng = np.random.default_rng(0)
    xdata = np.linspace(0.0, 5.0, 40)
    ydata = np.exp(0.3 * xdata + 0.1) + rng.normal(0, 0.01, 40)

    def build():
        import jax.numpy as jn

        problem = ceres_tpu.Problem()
        mb = problem.add_parameter_block(np.array([0.0]))
        cb = problem.add_parameter_block(np.array([0.0]))

        def residual(params, data):
            m, c = params
            x, y = data[0][0], data[0][1]
            return (y - jn.exp(m[0] * x + c[0]))[None]

        cf = ceres_tpu.CostFunction(residual, 1, name="expfit")
        handles = []
        for x, y in zip(xdata, ydata):
            handles.append(
                problem.add_residual_block(
                    cf, None, [mb, cb], (np.array([x, y]),)
                )
            )
        return problem, handles

    problem, handles = build()
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.CGNR,
            preconditioner_type=PreconditionerType.SUBSET,
            residual_blocks_for_subset_preconditioner=handles,
            max_num_iterations=50,
        ),
        problem,
    )
    assert s.termination_type == TerminationType.CONVERGENCE

    problem2, _ = build()
    s2 = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.DENSE_QR, max_num_iterations=50
        ),
        problem2,
    )
    np.testing.assert_allclose(s.final_cost, s2.final_cost, rtol=1e-6)


def test_subset_requires_rows():
    bal = synthetic_bal(3, 20, 60, seed=1)
    problem, _, _ = build_ba_problem(bal)
    with pytest.raises(ValueError):
        ceres_tpu.solve(
            SolverOptions(
                linear_solver_type=LinearSolverType.CGNR,
                preconditioner_type=PreconditionerType.SUBSET,
            ),
            problem,
        )


# ------------------------------------------------------------------ #
# exact dense-restriction comparison (multi-cluster, partial visibility)
# ------------------------------------------------------------------ #


def _partial_visibility_bal(nc=9, pts_per_group=8, seed=13):
    """Three camera groups with disjoint point sets plus weak cross links:
    single linkage at 0.9 similarity keeps the groups as separate clusters.
    """
    npts = 3 * pts_per_group + 3
    base = synthetic_bal(nc, npts, nc * npts, seed=seed)
    cam_idx, pt_idx = [], []
    for c in range(nc):
        g = c // 3
        pts = list(range(g * pts_per_group, (g + 1) * pts_per_group))
        pts.append(3 * pts_per_group + g)  # one shared point per group pair
        cam_idx += [c] * len(pts)
        pt_idx += pts
    rng = np.random.default_rng(seed + 1)
    obs = rng.normal(0.0, 100.0, (len(cam_idx), 2))
    return BalProblem(
        cameras=base.cameras,
        points=base.points,
        camera_index=np.asarray(cam_idx),
        point_index=np.asarray(pt_idx),
        observations=obs,
    )


def _dense_s_cam(program, s_apply, f_np):
    """Materialize S restricted to camera coordinates, in f64."""
    import jax

    num_eff = program.num_effective_parameters
    cam_pos = np.flatnonzero(f_np)
    basis = jnp.eye(num_eff)[cam_pos]
    s_cols = np.asarray(jax.vmap(s_apply)(basis))  # [ncam*tf, num_eff]
    return s_cols[:, cam_pos], cam_pos


@pytest.mark.parametrize(
    "ptype",
    [PreconditionerType.CLUSTER_JACOBI, PreconditionerType.CLUSTER_TRIDIAGONAL],
)
def test_preconditioner_matches_exact_dense_restriction(ptype):
    """The assembled M must equal the dense S restricted to the cluster
    sparsity (within-cluster pairs; + forest-edge pairs for TRIDIAGONAL) —
    the documented approximations must vanish on a standard BA problem
    (one signature group, one camera position per row)."""
    problem, _, _ = build_ba_problem(_partial_visibility_bal())
    program, jac_e, jac_f, ete, dsq_f, f_np, s_apply = _schur_pieces(problem)
    prec = VisibilityPreconditioner(
        program, jac_e, jac_f, ete, dsq_f,
        ptype, VisibilityClusteringType.SINGLE_LINKAGE,
    )
    plan = prec.plan
    assert plan.n_clusters >= 3, plan.n_clusters

    s_cam, cam_pos = _dense_s_cam(program, s_apply, f_np)
    tf = plan.tf
    ncam = plan.n_cams

    # keep mask over camera pairs
    keep = np.zeros((ncam, ncam), dtype=bool)
    for cl in range(plan.n_clusters):
        rows = plan.members[cl]
        keep[np.ix_(rows, rows)] = True
    if ptype == PreconditionerType.CLUSTER_TRIDIAGONAL:
        for chain in plan.chains:
            for a, b in zip(chain[:-1], chain[1:]):
                keep[np.ix_(plan.members[a], plan.members[b])] = True
                keep[np.ix_(plan.members[b], plan.members[a])] = True
    keep_big = np.kron(keep, np.ones((tf, tf), dtype=bool))
    m_ref = np.where(keep_big, s_cam, 0.0)

    rng = np.random.default_rng(17)
    v_cam = rng.normal(size=ncam * tf)
    expected = np.linalg.solve(m_ref, v_cam)

    v = np.zeros(program.num_effective_parameters)
    v[cam_pos] = v_cam
    got = np.asarray(prec(jnp.asarray(v)))[cam_pos]
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)
