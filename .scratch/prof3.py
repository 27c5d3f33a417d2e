import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from ceres_tpu.examples.snavely import snavely_reprojection_error
from ceres_tpu.autodiff import value_and_jacobians

N = 4_999_936  # 128-multiple
NCAM = 1778
NPTS = 993_923
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
cam_idx = jnp.sort(jax.random.randint(k1, (N,), 0, NCAM))
pt_idx = jax.random.randint(k2, (N,), 0, NPTS)
cam_table = jax.random.normal(k3, (NCAM, 9), jnp.float32) * 0.1
pt_table = jax.random.normal(k4, (NPTS, 3), jnp.float32)
uv = jax.random.normal(k5, (N, 2), jnp.float32)
uv_T = uv.T

fn = snavely_reprojection_error

def bench(name, make_fn, iters=10):
    def loop():
        def body(i, carry):
            out = make_fn(jnp.maximum(carry, -1e30))
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.zeros((), jnp.float32)
            for l in leaves: s = s + jnp.sum(l).astype(jnp.float32) * 1e-20
            return carry + s * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    f = jax.jit(loop)
    float(f())
    t0 = time.perf_counter()
    float(f())
    dt = (time.perf_counter() - t0 - 0.025) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)

def vj_rowmajor(c):
    cams = jnp.take(cam_table + c * 1e-30, cam_idx, axis=0)  # [n, 9]
    pts = jnp.take(pt_table, pt_idx, axis=0)
    res, jacs = jax.vmap(lambda ps, d: value_and_jacobians(fn, ps, d))(
        (cams, pts), (uv,)
    )
    n = res.shape[0]
    res_T = res.T
    jacs_T = tuple(jnp.transpose(j, (1, 2, 0)).reshape(-1, n) for j in jacs)
    return (res_T,) + jacs_T

def vj_onehot_gather(c):
    onehot_c = jax.nn.one_hot(cam_idx, NCAM, dtype=jnp.float32, axis=0)  # [NCAM, n]
    cams_T = jnp.einsum("cs,cn->sn", cam_table + c * 1e-30, onehot_c,
                        preferred_element_type=jnp.float32)  # [9, n]
    pts = jnp.take(pt_table, pt_idx, axis=0)
    res, jacs = jax.vmap(lambda ps, d: value_and_jacobians(fn, ps, d))(
        (cams_T.T, pts), (uv,)
    )
    n = res.shape[0]
    res_T = res.T
    jacs_T = tuple(jnp.transpose(j, (1, 2, 0)).reshape(-1, n) for j in jacs)
    return (res_T,) + jacs_T

def vj_transposed_vmap(c):
    onehot_c = jax.nn.one_hot(cam_idx, NCAM, dtype=jnp.float32, axis=0)
    cams_T = jnp.einsum("cs,cn->sn", cam_table + c * 1e-30, onehot_c,
                        preferred_element_type=jnp.float32)  # [9, n]
    pts_T = jnp.take(pt_table, pt_idx, axis=0).T  # [3, n]
    res, jacs = jax.vmap(
        lambda ps, d: value_and_jacobians(fn, ps, d), in_axes=-1, out_axes=-1
    )((cams_T, pts_T), (uv_T,))
    n = res.shape[-1]
    jacs_T = tuple(j.reshape(-1, n) for j in jacs)
    return (res,) + jacs_T

def res_only_rowmajor(c):
    cams = jnp.take(cam_table + c * 1e-30, cam_idx, axis=0)
    pts = jnp.take(pt_table, pt_idx, axis=0)
    res = jax.vmap(lambda ps, d: fn(ps, d))((cams, pts), (uv,))
    return (res.T,)

def res_only_T(c):
    onehot_c = jax.nn.one_hot(cam_idx, NCAM, dtype=jnp.float32, axis=0)
    cams_T = jnp.einsum("cs,cn->sn", cam_table + c * 1e-30, onehot_c,
                        preferred_element_type=jnp.float32)
    pts_T = jnp.take(pt_table, pt_idx, axis=0).T
    res = jax.vmap(lambda ps, d: fn(ps, d), in_axes=-1, out_axes=-1)((cams_T, pts_T), (uv_T,))
    return (res,)

bench("jac: row-major vmap + take gathers (current)", vj_rowmajor)
bench("jac: one-hot cam gather", vj_onehot_gather)
bench("jac: fully transposed vmap", vj_transposed_vmap)
bench("res-only: row-major (current)", res_only_rowmajor)
bench("res-only: fully transposed", res_only_T)
