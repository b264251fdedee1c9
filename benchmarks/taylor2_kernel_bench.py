#!/usr/bin/env python
"""Taylor-2 kernel vs XLA at the compute-bound scale shape (VERDICT r2 #3).

The scale config (burgers_scale: 8x200 trunk, 1M pts/step, microbatch 8192,
bf16 stream policy) measures ~48-56% of v5e bf16 peak under XLA; BASELINE
roadmap #2 puts the remaining upside "in Mosaic-level scheduling". This
script measures whether the hand kernel (mlp_taylor2_pallas_mixed: whole-net
VMEM residency, one stacked bf16 MXU matmul per layer, f32 accumulation)
captures any of it, on the FORWARD Taylor-2 pass that runs twice per
training step under remat (primal + recompute).

Timing protocol per CLAUDE.md: chained data dependencies (x depends on the
previous output), long runs, best of 3.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/taylor2_kernel_bench.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from pinns_tpu.models.mlp import MLPSpec, init_mlp
from pinns_tpu.ops.pallas.fused_mlp import (
    mlp_taylor2_pallas,
    mlp_taylor2_pallas_mixed,
)
from pinns_tpu.ops.taylor import mlp_taylor_2

MB = 8192  # the scale config's microbatch tile
REPS = 64  # chained evaluations per timing sample


def bench(fn, x, label):
    @jax.jit
    def chained(x):
        def body(x, _):
            u, ux, ut, uxx = fn(x)
            # feed a scalar function of the outputs back into x: forces
            # sequential execution without changing the values materially
            bump = (jnp.mean(u) + jnp.mean(uxx)) * 1e-12
            return x + bump, None

        x, _ = jax.lax.scan(body, x, None, length=REPS)
        return x

    x = chained(x)  # compile + warmup
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        x = chained(x)
        jax.block_until_ready(x)
        best = min(best, (time.time() - t0) / REPS)
    pts_per_sec = MB / best
    print(f"{label}: {best * 1e6:.1f} us/pass  {pts_per_sec / 1e6:.2f}M pts/s")
    return best


def main():
    spec32 = MLPSpec(
        layers=(2,) + (200,) * 8 + (1,), lb=(-1.0, 0.0), ub=(1.0, 1.0)
    )
    specmx = dataclasses.replace(
        spec32, compute_dtype=jnp.bfloat16, mixed_elementwise=True
    )
    params = init_mlp(jax.random.key(0), spec32)
    x = jax.random.uniform(
        jax.random.key(1), (MB, 2),
        minval=jnp.array([-1.0, 0.0]), maxval=jnp.array([1.0, 1.0]),
    )

    results = {}
    results["xla_mixed"] = bench(
        lambda x: mlp_taylor_2(specmx, params, x), x, "XLA mixed (max policy)"
    )
    results["pallas_mixed"] = bench(
        lambda x: mlp_taylor2_pallas_mixed(specmx, params, x, tile=1024),
        x, "Pallas mixed kernel (tile 1024)",
    )
    results["pallas_mixed_t2048"] = bench(
        lambda x: mlp_taylor2_pallas_mixed(specmx, params, x, tile=2048),
        x, "Pallas mixed kernel (tile 2048)",
    )
    results["xla_f32"] = bench(
        lambda x: mlp_taylor_2(spec32, params, x), x, "XLA f32 HIGHEST"
    )
    results["pallas_f32"] = bench(
        lambda x: mlp_taylor2_pallas(spec32, params, x, tile=512),
        x, "Pallas f32 kernel (tile 512)",
    )

    # --- full mock train step (value_and_grad over a Burgers residual
    # loss): does a kernel forward + XLA-recompute backward beat all-XLA?
    from pinns_tpu.ops.pallas.fused_mlp import make_taylor2_mixed_op

    kop = make_taylor2_mixed_op(specmx, tile=1024)

    def make_step(taylor_fn):
        def loss(params, x):
            u, ux, ut, uxx = taylor_fn(params, x)
            f = ut + u * ux - 0.0031831 * uxx
            return jnp.mean(f * f)

        grad = jax.grad(loss)

        @jax.jit
        def chained(params, x):
            def body(carry, _):
                p, x = carry
                g = grad(p, x)
                p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
                return (p, x), None

            (p, x), _ = jax.lax.scan(body, (params, x), None, length=16)
            return p, x

        return chained

    for label, fn in (
        ("step_xla_mixed", lambda p, x: mlp_taylor_2(specmx, p, x)),
        ("step_pallas_fwd", kop),
    ):
        chained = make_step(fn)
        p, xx = chained(params, x)
        jax.block_until_ready(p)
        best = float("inf")
        import time as _t

        for _ in range(3):
            t0 = _t.time()
            p, xx = chained(p, xx)
            jax.block_until_ready(p)
            best = min(best, (_t.time() - t0) / 16)
        results[label] = best
        print(f"{label}: {best * 1e6:.1f} us/step  {MB / best / 1e6:.2f}M pts/s")

    # FLOPs of one 4-stream Taylor-2 forward at this shape (dominant terms):
    flops = 4 * sum(
        2 * MB * a * b
        for a, b in zip(spec32.layers[:-1], spec32.layers[1:])
    )
    out = {
        "shape": "8x200 trunk, mb=8192",
        "us_per_pass": {k: round(v * 1e6, 1) for k, v in results.items()},
        "tflops_mixed_xla": round(flops / results["xla_mixed"] / 1e12, 1),
        "tflops_mixed_pallas": round(flops / results["pallas_mixed"] / 1e12, 1),
        "kernel_speedup_vs_xla_mixed": round(
            results["xla_mixed"] / results["pallas_mixed"], 3
        ),
        "step_speedup_vs_xla_mixed": round(
            results["step_xla_mixed"] / results["step_pallas_fwd"], 3
        ),
    }
    print(json.dumps(out))
    with open("benchmarks/results/r3_taylor2_kernel.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
