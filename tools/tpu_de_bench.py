"""Microbench of the fused DE march kernel: f32 vs bf16 julia iterations.

Drives kernels._march_call directly at cornell's cubic-julia parameters.
Calls are serialized inside one jit (out feeds in) so the per-call pallas
dispatch overhead (~15 ms standalone through the tunnel) is amortized and
the VPU iteration math dominates.

Usage: python tools/tpu_de_bench.py [n_lanes] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyrite_tpu import kernels  # noqa: E402

EST = {
    "kind": "julia",
    "iterations": 25,
    "threshold": 4.0,
    "constant": (-0.45, -0.0375, -0.4, -0.025),
    "variant": "cubic",
    "slice_plane": 0.0,
}


def bench(bf16, n, reps, max_steps=64, calls=8):
    est = dict(EST, bf16=bf16)
    key = kernels.estimator_key(est)
    rng = np.random.default_rng(0)
    origin = jnp.asarray(rng.uniform(-2.0, 2.0, (n, 3)), jnp.float32)
    direction = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    direction = direction / jnp.linalg.norm(direction, axis=1, keepdims=True)
    t0 = jnp.zeros(n)
    tmax = jnp.full(n, 4.0)
    hit = jnp.ones(n, jnp.int32)

    @jax.jit
    def run(t0):
        tot = t0
        for _ in range(calls):
            tot, dist = kernels._march_call(
                origin, direction, tot * 0.0, tmax, hit,
                est_key=key, max_steps=max_steps,
            )
            tot = tot + dist * 0.0
        return tot

    out = run(t0)
    float(out.sum())  # compile + sync
    times = []
    for _ in range(reps):
        t_start = time.time()
        out = run(t0)
        float(out.sum())
        times.append(time.time() - t_start)
    best = min(times)
    per_call = best / calls
    # each lane runs <= max_steps march steps x 25 julia iterations
    print(
        f"bf16={bf16} n={n}: {per_call*1e3:.2f} ms/march-call "
        f"(best of {reps}, {calls} calls/jit)"
    )
    return per_call


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    f32 = bench(False, n, reps)
    b16 = bench(True, n, reps)
    print(f"speedup bf16/f32: {f32 / b16:.3f}x")
