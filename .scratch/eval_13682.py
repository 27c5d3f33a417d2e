"""BAL-13682-scale single-chip eval validation (config 5's problem, 1 chip)."""
import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
sys.path.insert(0, "/root/repo")
import ceres_tpu.jacobian as _jm
_jm.LANE_CHUNK = 2_097_152
from ceres_tpu.evaluator import evaluate
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal

t0 = time.time()
bal = synthetic_bal(13682, 4_456_117, 28_987_644, seed=1)
problem, _, _ = build_ba_problem(bal)
program = problem.compile()
arrays = program.arrays(jnp.float32)
state = program.state_vector(jnp.float32)
print(f"build {time.time()-t0:.0f}s", flush=True)

@jax.jit
def ev(arrays, state):
    c, r, j, g = evaluate(program, arrays, state, with_jacobian=True)
    s = c + jnp.sum(g)
    for grp in j.jac_groups:
        for t in grp:
            s = s + jnp.sum(t)
    return s, c

t0 = time.time()
out = ev(arrays, state)
print(f"compile+first eval {time.time()-t0:.1f}s, cost={float(out[1]):.4e}", flush=True)
t0 = time.time()
N = 11
pending = ev(arrays, state)
for _ in range(N - 1):
    nxt = ev(arrays, state)
    float(pending[0]); pending = nxt
float(pending[0])
dt = (time.time() - t0) / N * 1000
print(f"jac+res+grad eval: {dt:.1f} ms/eval at 29M observations", flush=True)
print(f"reference V100: 17.042s/11 evals = 1549 ms/eval (README.md:189)")
print(f"vs_baseline: {dt/1549.3:.4f}")
