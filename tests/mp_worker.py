"""Worker process for the 2-process multi-host parity test.

Each worker joins the jax.distributed runtime (CPU emulation, 4 virtual
devices per process — the SURVEY §4:537-539 test vehicle), loads the SAME
BAL file host-locally (lazy payload: this process materializes only the
observation rows its devices own), and runs the sharded fused
ITERATIVE_SCHUR solve over the global 2x4-device mesh. Process 0 writes
the final cost + parameters for the parent test to compare against a
single-process solve.

Usage: python mp_worker.py <pid> <nproc> <port> <bal_path> <out_npz>
           [mesh_kind] [local_devices]
mesh_kind: "flat" (1-D dp mesh, default) or "hybrid" (2-level dcn x ici
mesh with two-stage reductions).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    bal_path = sys.argv[4]
    out_path = sys.argv[5]
    mesh_kind = sys.argv[6] if len(sys.argv) > 6 else "flat"
    local_devices = int(sys.argv[7]) if len(sys.argv) > 7 else 4

    from ceres_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        platform="cpu",
        local_device_count=local_devices,
    )
    import jax

    jax.config.update("jax_enable_x64", True)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == local_devices * nproc

    import numpy as np

    import ceres_tpu
    from ceres_tpu import LinearSolverType, PreconditionerType, SolverOptions
    from ceres_tpu.io.bal import build_ba_problem, load_bal_lazy

    bal = load_bal_lazy(bal_path)
    problem, cam_ids, pt_ids = build_ba_problem(bal)
    mesh = (
        distributed.hybrid_mesh()
        if mesh_kind == "hybrid"
        else distributed.global_mesh("dp")
    )
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=8,
        mesh=mesh,
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.used_fused_execution, "sharded solve must stay fused"

    if pid == 0:
        cams = np.stack(
            [np.asarray(problem.parameter_block_value(h)) for h in cam_ids]
        )
        pts = np.stack(
            [np.asarray(problem.parameter_block_value(h)) for h in pt_ids]
        )
        np.savez(
            out_path,
            final_cost=summary.final_cost,
            initial_cost=summary.initial_cost,
            iterations=len(summary.iterations) - 1,
            cameras=cams,
            points=pts,
        )
    print(f"[p{pid}] ok final_cost={summary.final_cost}", flush=True)


if __name__ == "__main__":
    main()
