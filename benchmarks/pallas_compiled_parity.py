#!/usr/bin/env python
"""Compiled-on-TPU Pallas kernel parity (VERDICT round-1 item #8).

Runs the same assertions as tests/test_pallas.py but COMPILED on the real
chip (tests run interpreter-mode on CPU); prints one JSON line of
max-abs-diff per kernel for the round record in PARITY.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pallas_compiled_parity.py
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from pinns_tpu.ops.pallas.fused_mlp import (
    _BLOCK,
    mlp_forward_pallas,
    mlp_taylor2_pallas,
)
from pinns_tpu.ops.taylor import mlp_taylor_2

NARROW = MLPSpec(layers=(2,) + (20,) * 8 + (1,), lb=(-1.0, 0.0), ub=(1.0, 1.0))
WIDE = MLPSpec(layers=(2,) + (200,) * 8 + (1,), lb=(-1.0, 0.0), ub=(1.0, 1.0))
EULER = MLPSpec(layers=(2,) + (200,) * 5 + (3,), lb=(0.0, 0.0), ub=(1.0, 0.2))


def _maxdiff(a, b):
    return float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b))))


def main():
    out = {"device": str(jax.devices()[0])}
    x = jax.random.uniform(jax.random.key(1), (1000, 2))

    # forward kernel (flagship narrow net)
    p = init_mlp(jax.random.key(0), NARROW)
    out["forward_narrow"] = _maxdiff(
        mlp_forward_pallas(NARROW, p, x), mlp_apply(NARROW, p, x)
    )

    # Taylor-2 lane-packed kernel (narrow: all dims <= 32)
    assert max(NARROW.layers) <= _BLOCK
    ref = mlp_taylor_2(NARROW, p, x)
    ker = mlp_taylor2_pallas(NARROW, p, x)
    out["taylor2_packed_narrow"] = max(_maxdiff(a, b) for a, b in zip(ref, ker))

    # Taylor-2 sublane-stacked kernel (wide 8x200 scale net)
    pw = init_mlp(jax.random.key(2), WIDE)
    ref = mlp_taylor_2(WIDE, pw, x)
    ker = mlp_taylor2_pallas(WIDE, pw, x)
    out["taylor2_stacked_wide"] = max(_maxdiff(a, b) for a, b in zip(ref, ker))

    # multi-output (Euler trunk shape)
    pe = init_mlp(jax.random.key(4), EULER)
    ref = mlp_taylor_2(EULER, pe, x)
    ker = mlp_taylor2_pallas(EULER, pe, x)
    out["taylor2_euler_3out"] = max(_maxdiff(a, b) for a, b in zip(ref, ker))

    for k, v in out.items():
        if isinstance(v, float):
            assert np.isfinite(v) and v < 1e-3, (k, v)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
