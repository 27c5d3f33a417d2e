"""Primitive-level timings for camera-side gather/reduce alternatives.

The S·y profile (schur_profile.py) shows the camera half (one-hot matmul
gather + one-hot matmul reduce) at ~19 ms of the 23 ms PCG iteration at
BAL-1778 scale — the one-hot OPERAND generation (iota-compare, O(cnt*n)
VPU work) dominates, not the MXU matmul. Candidate replacements measured
here, all chained x20 in a fori_loop (the ~25 ms sync floor swamps single
dispatches):

- onehot_gather / onehot_reduce: the incumbent.
- take_lane: jnp.take of the transposed small table along the lane axis.
- take_row_T: row gather [n, s] + transpose (the tile-padded variant).
- lane_permute_2 / lane_permute_9: static lane permutation of [r, n] /
  [s, n] — the glue a camera-sorted second Jacobian layout would need.
- bucket_reduce_cam: reshape+sum reduce in a camera-sorted layout
  (simulated with uniform degree), the target end-state.
"""

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

LOOP = 20


def timed_loop(name, step_fn, init, *args, reps=5, **meta):
    @jax.jit
    def run(v, *a):
        def body(i, v):
            out = step_fn(v, *a)
            nrm = jnp.sum(out.astype(jnp.float32) ** 2)
            return (out.astype(jnp.float32) * jax.lax.rsqrt(nrm + 1e-30)).astype(
                out.dtype
            )

        out = jax.lax.fori_loop(0, LOOP, body, v)
        return jnp.sum(out.astype(jnp.float32))

    float(run(init, *args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(init, *args))
    dt = (time.perf_counter() - t0) / reps
    print(
        json.dumps(
            {"benchmark": name, "ms_per_apply": round(dt / LOOP * 1000, 2), **meta}
        ),
        flush=True,
    )


def main():
    n = 5_000_000
    cnt = 1779
    s = 9
    rng = np.random.default_rng(0)
    rows_np = rng.integers(0, cnt, n)
    rows = jnp.asarray(rows_np, jnp.int32)
    perm = jnp.asarray(rng.permutation(n), jnp.int32)
    table = jnp.asarray(rng.normal(0, 1, (cnt, s)), jnp.float32)

    # gather: table rows -> [s, n]
    def onehot_gather(t, rows):
        oh = jax.nn.one_hot(rows, cnt, dtype=t.dtype, axis=0)
        return jnp.einsum("cs,cn->sn", t, oh, preferred_element_type=t.dtype)

    # NOTE: the loop normalizes its carry; for gather benchmarks the carry
    # is the TABLE (small) so the big op runs fresh each iteration.
    def g_onehot(t, rows):
        out = onehot_gather(t, rows)  # [s, n]
        return (t + jnp.sum(out) * 1e-30).astype(t.dtype)

    timed_loop("gather_onehot", g_onehot, table, rows)

    def g_take_lane(t, rows):
        out = jnp.take(t.T, rows, axis=1)  # [s, n]
        return (t + jnp.sum(out) * 1e-30).astype(t.dtype)

    timed_loop("gather_take_lane", g_take_lane, table, rows)

    def g_take_row(t, rows):
        out = jnp.take(t, rows, axis=0).T  # [n, s] -> [s, n]
        return (t + jnp.sum(out) * 1e-30).astype(t.dtype)

    timed_loop("gather_take_row_T", g_take_row, table, rows)

    # reduce: contrib [k, n] -> [k, cnt]
    for k in (2, 9):
        contrib = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.float32)

        def r_onehot(c, rows):
            oh = jax.nn.one_hot(rows, cnt, dtype=c.dtype)
            out = jnp.einsum(
                "kn,nc->kc", c, oh, preferred_element_type=jnp.float32
            )
            return c + jnp.sum(out) * 1e-30

        timed_loop(f"reduce_onehot_k{k}", r_onehot, contrib, rows)

        def r_segsum(c, rows):
            out = jax.ops.segment_sum(c.T, rows, num_segments=cnt).T
            return c + jnp.sum(out) * 1e-30

        timed_loop(f"reduce_segsum_k{k}", r_segsum, contrib, rows)

    # lane permutation of residual-space vectors
    for k in (2, 9, 18):
        x = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.float32)

        def permute(x, perm):
            return jnp.take(x, perm, axis=1)

        timed_loop(f"lane_permute_k{k}", permute, x, perm)

    # camera-sorted bucket reduce (uniform degree d = n // cnt_pad)
    cnt_pad = 2048
    d = n // cnt_pad
    n2 = cnt_pad * d
    for k in (2, 9):
        contrib = jnp.asarray(rng.normal(0, 1, (k, n2)), jnp.float32)

        def r_bucket(c):
            return c * (1 + 1e-30 * jnp.sum(c.reshape(k, cnt_pad, d).sum(axis=2)))

        timed_loop(f"reduce_bucket_cam_k{k}", r_bucket, contrib, n_lanes=n2)

        def g_bucket(t2):
            # slice + broadcast gather in camera-major order
            out = jnp.broadcast_to(
                t2[:, :, None], (k, cnt_pad, d)
            ).reshape(k, n2)
            return t2 + jnp.sum(out) * 1e-30

        t2 = jnp.asarray(rng.normal(0, 1, (k, cnt_pad)), jnp.float32)
        timed_loop(f"gather_bucket_cam_k{k}", g_bucket, t2)


if __name__ == "__main__":
    main()
