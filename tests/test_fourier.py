"""Random Fourier feature embedding (ModelConfig.n_fourier): spec shapes,
Taylor-mode derivative correctness through the embedding, training smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.models.mlp import (
    MLPSpec,
    fourier_matrix,
    init_mlp,
    mlp_apply,
)
from pinns_tpu.ops.derivatives import derivs_1_jvp, derivs_2_jvp
from pinns_tpu.ops.taylor import (
    mlp_taylor_1,
    mlp_taylor_2,
    mlp_taylor_2_stacked,
)
from pinns_tpu.train import Trainer

HAVE_REF = os.path.isdir("/root/reference")


def _spec(n_fourier=8, layers=(2, 16, 16, 1)):
    return MLPSpec(
        layers=layers,
        lb=(-1.0, 0.0),
        ub=(1.0, 0.99),
        fourier=fourier_matrix(n_fourier, sigma=2.0, seed=3) if n_fourier else (),
    )


def test_spec_shapes_and_init():
    spec = _spec(8)
    assert spec.embed_dim == 2 + 16
    params = init_mlp(jax.random.key(0), spec)
    assert params[0]["W"].shape == (18, 16)
    n = sum(int(np.prod(l["W"].shape)) + int(np.prod(l["b"].shape)) for l in params)
    assert n == spec.n_params
    y = mlp_apply(spec, params, jnp.zeros((5, 2)))
    assert y.shape == (5, 1)


def test_taylor_matches_jvp_oracle_with_fourier():
    """The hand-propagated embedding streams (incl. the -B^2 sin/cos
    curvature stream) must match nested-jvp AD through mlp_apply."""
    spec = _spec(8)
    params = init_mlp(jax.random.key(1), spec)
    x = jax.random.uniform(
        jax.random.key(2), (128, 2), minval=jnp.array([-1.0, 0.0]),
        maxval=jnp.array([1.0, 0.99])
    )

    def apply_fn(z):
        return mlp_apply(spec, params, z)

    y0, yx0, yt0, yxx0 = derivs_2_jvp(apply_fn, x)
    y, yx, yt, yxx = mlp_taylor_2(spec, params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yx), np.asarray(yx0), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yt0), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yxx), np.asarray(yxx0), rtol=5e-4, atol=5e-4)

    y1, yx1, yt1 = mlp_taylor_1(spec, params, x)
    np.testing.assert_allclose(np.asarray(yx1), np.asarray(yx0), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yt1), np.asarray(yt0), rtol=2e-4, atol=2e-5)

    ys = mlp_taylor_2_stacked(spec, params, x)
    for a, b in zip(ys, (y, yx, yt, yxx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fourier_multi_output_euler_trunk():
    spec = _spec(4, layers=(2, 24, 24, 3))
    params = init_mlp(jax.random.key(4), spec)
    x = jax.random.uniform(jax.random.key(5), (64, 2))

    def apply_fn(z):
        return mlp_apply(spec, params, z)

    y0, yx0, yt0 = derivs_1_jvp(apply_fn, x)
    y, yx, yt = mlp_taylor_1(spec, params, x)
    np.testing.assert_allclose(np.asarray(yx), np.asarray(yx0), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yt0), rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_fourier_training_and_checkpoint_roundtrip(tmp_path):
    exp = override(get_preset("abgrall_admm"), {
        "model.layers": (2, 16, 16, 1),
        "model.n_fourier": 8,
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 256,
        "train.out_dir": str(tmp_path),
    })
    tr = Trainer(exp)
    state = tr.init_state()
    assert state.params["net"][0]["W"].shape[0] == 2 + 16
    state, summary = tr.train(state)
    assert np.isfinite(summary["rel_l2_u"])
    restored = tr.load_checkpoint(str(tmp_path / "abgrall_admm_final.ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fourier_composes_with_mixed_precision():
    """The embedding is part of the exact first-layer input path — it must
    compose with the bf16 stream policy without NaNs and stay close to the
    full-precision result at init."""
    spec_f32 = _spec(8)
    import dataclasses

    spec_mixed = dataclasses.replace(spec_f32, compute_dtype="bfloat16")
    params = init_mlp(jax.random.key(7), spec_f32)
    x = jax.random.uniform(jax.random.key(8), (64, 2))
    y32 = mlp_taylor_2(spec_f32, params, x)
    ymx = mlp_taylor_2(spec_mixed, params, x)
    for a, b in zip(y32, ymx):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.1, atol=0.05
        )
