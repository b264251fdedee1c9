"""Pallas kernels vs the jnp reference implementations (interpreter mode on
CPU; the same assertions run compiled on real TPU in the verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from pinns_tpu.ops.pallas.fused_mlp import (
    _BLOCK,
    auto_tile,
    mlp_forward_pallas,
    mlp_taylor2_pallas,
)
from pinns_tpu.ops.taylor import mlp_taylor_2

NARROW = MLPSpec(layers=(2,) + (20,) * 4 + (1,), lb=(-1.0, 0.0), ub=(1.0, 1.0))
WIDE = MLPSpec(layers=(2, 64, 64, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))


def _x(n=700):  # deliberately not a tile multiple: exercises padding
    return jax.random.uniform(jax.random.key(1), (n, 2))


def test_forward_kernel_matches():
    params = init_mlp(jax.random.key(0), NARROW)
    x = _x()
    y = mlp_forward_pallas(NARROW, params, x, tile=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(mlp_apply(NARROW, params, x)),
        rtol=1e-5, atol=1e-6,
    )


def test_taylor2_lane_packed_matches():
    assert max(NARROW.layers) <= _BLOCK  # dispatches to the packed kernel
    params = init_mlp(jax.random.key(2), NARROW)
    x = _x()
    ref = mlp_taylor_2(NARROW, params, x)
    out = mlp_taylor2_pallas(NARROW, params, x, tile=256, interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_taylor2_sublane_stacked_matches():
    assert max(WIDE.layers) > _BLOCK  # dispatches to the stacked kernel
    params = init_mlp(jax.random.key(3), WIDE)
    x = _x(300)
    ref = mlp_taylor_2(WIDE, params, x)
    out = mlp_taylor2_pallas(WIDE, params, x, tile=128, interpret=True)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_auto_tile_bounds():
    assert auto_tile(NARROW) == 1024  # narrow nets cap at 1024
    big = MLPSpec(layers=(2, 512, 512, 1), lb=(0.0, 0.0), ub=(1.0, 1.0))
    t = auto_tile(big)
    assert 128 <= t <= 1024 and t % 128 == 0
    assert t < 1024  # wide nets must shrink below the cap


def test_multi_output_taylor_kernel():
    spec = MLPSpec(layers=(2, 24, 24, 3), lb=(0.0, 0.0), ub=(1.0, 0.2))
    params = init_mlp(jax.random.key(4), spec)
    x = _x(260)
    ref = mlp_taylor_2(spec, params, x)
    out = mlp_taylor2_pallas(spec, params, x, tile=128, interpret=True)
    for a, b in zip(ref, out):
        assert b.shape == (260, 3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


# NOTE: the whole-train-step / whole-chunk Pallas kernel experiment
# (fused_step.py) was removed after a definitive negative result — see
# "Retired experiment" in BASELINE.md (XLA's fused scan wins even against a
# one-launch-per-1000-epochs kernel, 83.6 vs 107.0 us/step on v5e).


def test_taylor2_mixed_kernel_matches_policy_envelope():
    """The bf16-stream kernel variant must track the f32 reference at least
    as tightly as the XLA max-throughput stream policy does — same
    quantization points (hidden weights + inter-layer streams), f32
    accumulation."""
    import dataclasses

    from pinns_tpu.ops.pallas.fused_mlp import mlp_taylor2_pallas_mixed

    spec32 = MLPSpec(layers=(2, 64, 64, 64, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))
    specmx = dataclasses.replace(
        spec32, compute_dtype=jnp.bfloat16, mixed_elementwise=True
    )
    params = init_mlp(jax.random.key(5), spec32)
    x = _x(300)
    ref = mlp_taylor_2(spec32, params, x)
    xla_mixed = mlp_taylor_2(specmx, params, x)
    ker = mlp_taylor2_pallas_mixed(specmx, params, x, tile=256, interpret=True)
    for r, m, k in zip(ref, xla_mixed, ker):
        r, m, k = (np.asarray(v, np.float64) for v in (r, m, k))
        e_xla = np.linalg.norm(m - r) / (np.linalg.norm(r) + 1e-30)
        e_ker = np.linalg.norm(k - r) / (np.linalg.norm(r) + 1e-30)
        assert e_ker < max(2.0 * e_xla, 1e-6), (e_ker, e_xla)


def test_taylor2_mixed_op_gradients_track_xla():
    """make_taylor2_mixed_op: backward is literally the XLA path's VJP
    (recompute), so grads of a residual loss differ from the all-XLA mixed
    path only through the kernel forward's quantization at the loss point."""
    import dataclasses

    from pinns_tpu.ops.pallas.fused_mlp import make_taylor2_mixed_op

    spec32 = MLPSpec(layers=(2, 64, 64, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))
    specmx = dataclasses.replace(
        spec32, compute_dtype=jnp.bfloat16, mixed_elementwise=True
    )
    params = init_mlp(jax.random.key(6), spec32)
    x = _x(256)
    kop = make_taylor2_mixed_op(specmx, tile=256, interpret=True)

    def loss(taylor_fn):
        def f(p):
            u, ux, ut, uxx = taylor_fn(p, x)
            r = ut + u * ux - 1e-2 * uxx
            return jnp.mean(r * r)

        return f

    gk = jax.grad(loss(kop))(params)
    gx = jax.grad(loss(lambda p, xx: mlp_taylor_2(specmx, p, xx)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gx)):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        assert rel < 0.2, rel
