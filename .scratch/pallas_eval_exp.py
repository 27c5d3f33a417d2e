"""Experiment: Pallas kernel for signature-group evaluation vs XLA fusion."""
import os, sys, time, functools
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from ceres_tpu.autodiff import value_and_jacobians


def snavely_reprojection_error(params, data):
    """Dot-free Snavely variant (Mosaic cannot lower the vmapped jnp.dot
    in the library version)."""
    camera, point = params
    (observed,) = data
    axis = camera[:3]
    theta2 = axis[0] * axis[0] + axis[1] * axis[1] + axis[2] * axis[2]
    theta = jnp.sqrt(theta2 + 1e-30)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    w = axis / theta
    wxp = jnp.stack([
        w[1] * point[2] - w[2] * point[1],
        w[2] * point[0] - w[0] * point[2],
        w[0] * point[1] - w[1] * point[0],
    ])
    wdp = w[0] * point[0] + w[1] * point[1] + w[2] * point[2]
    p = point * cos_t + wxp * sin_t + w * wdp * (1.0 - cos_t) + camera[3:6]
    xp = -p[0] / p[2]
    yp = -p[1] / p[2]
    f, l1, l2 = camera[6], camera[7], camera[8]
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (l1 + l2 * r2)
    return jnp.stack([f * distortion * xp, f * distortion * yp]) - observed

N = 4_999_936  # multiple of large chunk
NCAM = 1778
NPTS = 993_923
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
cam_idx = jnp.sort(jax.random.randint(k1, (N,), 0, NCAM))
pt_idx = jax.random.randint(k2, (N,), 0, NPTS)
cam_table = jax.random.normal(k3, (NCAM, 9), jnp.float32) * 0.1
pt_table = jax.random.normal(k4, (NPTS, 3), jnp.float32)
uv = jax.random.normal(k5, (N, 2), jnp.float32)
uv_T = jnp.asarray(uv.T)
fn = snavely_reprojection_error

# pre-gathered transposed params (the owner/one-hot gathers handle this in
# the real engine)
cams_T = jnp.take(cam_table, cam_idx, axis=0).T  # [9, N]
pts_T = jnp.take(pt_table, pt_idx, axis=0).T     # [3, N]
jax.block_until_ready((cams_T, pts_T))

SIZES = (9, 3)
R = 2
C = 8192  # lanes per grid step


def eval_block(cam_blk, pt_blk, uv_blk):
    """[9, C], [3, C], [2, C] -> res [2, C], jac [24, C]."""
    params = (cam_blk, pt_blk)

    vf = jax.vmap(lambda ps, d: fn(ps, d), in_axes=-1, out_axes=-1)
    res, jvp = jax.linearize(lambda *ps: vf(ps, (uv_blk,)), *params)
    cols = []
    for i, s in enumerate(SIZES):
        for j in range(s):
            def basis(k, s_k, j=j, i=i):
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (s_k, 1), 0) == j
                ).astype(jnp.float32)
                return (
                    jnp.broadcast_to(row, params[k].shape)
                    if k == i
                    else jnp.zeros_like(params[k])
                )
            tangents = tuple(
                basis(k, SIZES[k]) for k in range(len(SIZES))
            )
            cols.append(jvp(*tangents))  # [2, C]
    jac = jnp.concatenate([res] + cols, axis=0)  # [2 + 24, C] stacked
    return jac


def kernel(cam_ref, pt_ref, uv_ref, out_ref):
    out_ref[:] = eval_block(cam_ref[:], pt_ref[:], uv_ref[:])


@jax.jit
def pallas_eval(cams_T, pts_T, uv_T):
    grid = (N // C,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R + R * sum(SIZES), N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (R + R * sum(SIZES), C), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )(cams_T, pts_T, uv_T)


@jax.jit
def xla_eval(cams_T, pts_T, uv_T):
    return eval_block(cams_T, pts_T, uv_T)


def bench(name, f, *args, iters=10):
    def loop():
        def body(i, carry):
            out = f(*(jnp.maximum(a, carry - 1e30) for a in args))
            return carry + jnp.sum(out).astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    g = jax.jit(loop)
    float(g())
    t0 = time.perf_counter()
    float(g())
    dt = (time.perf_counter() - t0 - 0.025) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)

# correctness check vs reference row-major eval
out_p = np.asarray(pallas_eval(cams_T, pts_T, uv_T))
out_x = np.asarray(xla_eval(cams_T, pts_T, uv_T))
print("pallas vs xla max diff:", np.abs(out_p - out_x).max(), flush=True)

bench("pallas fused eval (res+jac)", pallas_eval, cams_T, pts_T, uv_T)
bench("xla fused eval (res+jac)", xla_eval, cams_T, pts_T, uv_T)
