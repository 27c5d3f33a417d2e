"""Exactness-vs-speed for the two-level one-hot gather/reduce.

The TPU MXU's DEFAULT precision truncates f32 operands to bf16 — for a
one-hot matmul standing in for a gather/segment-reduce that silently
quantizes the VALUES (~4e-3 relative), which the on-TPU differential suite
(tests_tpu/test_differential.py) caught. Exact alternatives measured here
at BAL-1778 scale:

- default: the (wrong) incumbent — bf16 operand truncation.
- highest: Precision.HIGHEST (6-pass bf16 emulation of f32).
- planes3: split the f32 value operand into 3 bf16 planes
  (hi+mid+lo == x exactly; 8+8+8 mantissa bits cover f32's 24) and run 3
  DEFAULT-precision matmuls — exact because a 0/1 one-hot is exact in
  bf16 and each plane is exact in bf16.
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
B = 8


def timed_loop(name, step_fn, init, *args, reps=5, **meta):
    @jax.jit
    def run(v, *a):
        def body(i, v):
            out = step_fn(v, *a)
            return (v + jnp.sum(out) * 1e-30).astype(v.dtype)

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


def bf16_planes(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def gather2(table_t, rows, precision, planes=False):
    s, cnt = table_t.shape
    A = -(-cnt // B)
    t3 = table_t
    if A * B != cnt:
        t3 = jnp.pad(table_t, ((0, 0), (0, A * B - cnt)))
    t3 = jnp.transpose(t3.reshape(s, A, B), (0, 2, 1)).reshape(s * B, A)
    n = rows.shape[0]
    rows_hi = rows // B
    rows_lo = rows % B
    if planes:
        oh_hi = jax.nn.one_hot(rows_hi, A, dtype=jnp.bfloat16, axis=0)
        tmp = sum(
            jnp.einsum("ka,an->kn", p, oh_hi, preferred_element_type=jnp.float32)
            for p in bf16_planes(t3)
        ).reshape(s, B, n)
    else:
        oh_hi = jax.nn.one_hot(rows_hi, A, dtype=table_t.dtype, axis=0)
        tmp = jnp.einsum(
            "ka,an->kn", t3, oh_hi,
            preferred_element_type=jnp.float32, precision=precision,
        ).reshape(s, B, n)
    oh_lo = jax.nn.one_hot(rows_lo, B, dtype=jnp.float32, axis=0)
    return (tmp * oh_lo[None]).sum(axis=1)


def reduce2(contrib, rows, num_out, precision, planes=False):
    k, n = contrib.shape
    A = -(-num_out // B)
    rows_hi = rows // B
    rows_lo = rows % B
    oh_lo = jax.nn.one_hot(rows_lo, B, dtype=jnp.float32, axis=0)
    ctmp = (contrib[:, None, :] * oh_lo[None]).reshape(k * B, n)
    if planes:
        oh_hi = jax.nn.one_hot(rows_hi, A, dtype=jnp.bfloat16)
        out = sum(
            jnp.einsum("Kn,na->Ka", p, oh_hi, preferred_element_type=jnp.float32)
            for p in bf16_planes(ctmp)
        )
    else:
        oh_hi = jax.nn.one_hot(rows_hi, A, dtype=contrib.dtype)
        out = jnp.einsum(
            "Kn,na->Ka", ctmp, oh_hi,
            preferred_element_type=jnp.float32, precision=precision,
        )
    out = jnp.transpose(out.reshape(k, B, A), (0, 2, 1)).reshape(k, A * B)
    return out[:, :num_out]


def main():
    n = 5_000_000
    cnt = 1779
    s = 9
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, cnt, n), jnp.int32)
    table_t = jnp.asarray(rng.normal(0, 300, (s, cnt)), jnp.float32)

    # accuracy check vs exact take
    exact = np.asarray(table_t)[:, np.asarray(rows[:1000])]
    for name, kw in (
        ("default", dict(precision=None)),
        ("highest", dict(precision=jax.lax.Precision.HIGHEST)),
        ("planes3", dict(precision=None, planes=True)),
    ):
        got = np.asarray(gather2(table_t, rows[:1000], **kw))
        err = np.abs(got - exact).max() / np.abs(exact).max()
        print(json.dumps({"gather_accuracy": name, "max_rel": float(err)}))

    for name, kw in (
        ("default", dict(precision=None)),
        ("highest", dict(precision=jax.lax.Precision.HIGHEST)),
        ("planes3", dict(precision=None, planes=True)),
    ):
        timed_loop(
            f"gather2_{name}",
            lambda t, r, kw=kw: gather2(t, r, **kw),
            table_t,
            rows,
        )
    for k in (2, 9):
        contrib = jnp.asarray(rng.normal(0, 300, (k, n)), jnp.float32)
        for name, kw in (
            ("default", dict(precision=None)),
            ("highest", dict(precision=jax.lax.Precision.HIGHEST)),
            ("planes3", dict(precision=None, planes=True)),
        ):
            timed_loop(
                f"reduce2_{name}_k{k}",
                lambda c, r, kw=kw: reduce2(c, r, cnt, **kw),
                contrib,
                rows,
            )


if __name__ == "__main__":
    main()
