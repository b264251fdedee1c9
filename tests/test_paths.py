"""Trainable shock-path features (ModelConfig.n_paths): spec shapes, exact
Taylor-mode derivative streams through the embedding, gradient flow to the
path parameters, and composition with fourier / mixed precision / tp
shardings. The features are tanh(a_k (x_n - s_k(t_n))) fronts with trainable
polynomial paths s_k — the representation lever for shock/contact plateaus
(PARITY.md §4c/§4d)."""

import dataclasses
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


def _spec(n_paths=3, layers=(2, 16, 16, 1), **kw):
    return MLPSpec(
        layers=layers,
        lb=(-1.0, 0.0),
        ub=(1.0, 0.99),
        n_paths=n_paths,
        path_degree=kw.pop("path_degree", 2),
        path_sharpness=kw.pop("path_sharpness", 5.0),
        **kw,
    )


def _perturbed_params(spec, key=1):
    """Init with nonzero higher-order path coefficients so the time chain
    (s'(t) != 0) is actually exercised."""
    params = init_mlp(jax.random.key(0), spec)
    params[0]["path_c"] = params[0]["path_c"] + 0.1 * jax.random.normal(
        jax.random.key(key), params[0]["path_c"].shape
    )
    return params


def test_spec_shapes_and_init():
    spec = _spec(3)
    assert spec.embed_dim == 2 + 3
    params = init_mlp(jax.random.key(0), spec)
    assert params[0]["W"].shape == (5, 16)
    assert params[0]["path_c"].shape == (3, 3)
    assert params[0]["path_a"].shape == (3,)
    # initial fronts spread over the interior, constant in time
    np.testing.assert_allclose(
        np.asarray(params[0]["path_c"][:, 0]), [-2 / 3, 0.0, 2 / 3], atol=1e-6
    )
    assert np.all(np.asarray(params[0]["path_c"][:, 1:]) == 0.0)
    n = sum(
        int(np.prod(np.shape(leaf)))
        for leaf in jax.tree_util.tree_leaves(params)
    )
    assert n == spec.n_params
    y = mlp_apply(spec, params, jnp.zeros((5, 2)))
    assert y.shape == (5, 1)


def test_taylor_matches_jvp_oracle_with_paths():
    """Hand-propagated path streams (value, x/t tangents through s'(t_n),
    and the phi'' curvature stream) must match nested-jvp AD through
    mlp_apply."""
    spec = _spec(3)
    params = _perturbed_params(spec)
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


def test_paths_compose_with_fourier():
    spec = _spec(2, fourier=fourier_matrix(4, sigma=2.0, seed=3))
    assert spec.embed_dim == 2 + 8 + 2
    params = _perturbed_params(spec, key=3)
    x = jax.random.uniform(jax.random.key(4), (64, 2))

    def apply_fn(z):
        return mlp_apply(spec, params, z)

    r0 = derivs_2_jvp(apply_fn, x)
    r = mlp_taylor_2(spec, params, x)
    for a, b in zip(r, r0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


def test_paths_degree_zero_and_multi_output_trunk():
    spec = _spec(2, layers=(2, 24, 24, 3), path_degree=0)
    params = init_mlp(jax.random.key(4), spec)
    assert params[0]["path_c"].shape == (2, 1)
    x = jax.random.uniform(jax.random.key(5), (64, 2))

    def apply_fn(z):
        return mlp_apply(spec, params, z)

    y0, yx0, yt0 = derivs_1_jvp(apply_fn, x)
    y, yx, yt = mlp_taylor_1(spec, params, x)
    np.testing.assert_allclose(np.asarray(yx), np.asarray(yx0), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yt0), rtol=2e-4, atol=2e-5)


def test_paths_compose_with_mixed_precision():
    spec_f32 = _spec(3)
    spec_mixed = dataclasses.replace(spec_f32, compute_dtype="bfloat16")
    params = _perturbed_params(spec_f32, key=7)
    x = jax.random.uniform(jax.random.key(8), (64, 2))
    y32 = mlp_taylor_2(spec_f32, params, x)
    ymx = mlp_taylor_2(spec_mixed, params, x)
    for a, b in zip(y32, ymx):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.1, atol=0.05
        )


def test_tp_shardings_cover_path_params():
    from pinns_tpu.parallel.mesh import make_mesh
    from pinns_tpu.parallel.sharding import tp_param_shardings

    spec = _spec(2)
    params = {
        "net": init_mlp(jax.random.key(0), spec),
        "coeffs": {"lambda1": jnp.ones(()), "lambda2": jnp.zeros(())},
    }
    mesh = make_mesh(ensemble=2, data=4)
    sh = tp_param_shardings(params, mesh)
    # same tree structure -> device_put works; path params replicated
    jax.tree_util.tree_map(lambda p, s: None, params, sh)
    assert sh["net"][0]["path_c"].spec == jax.sharding.PartitionSpec()


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_path_params_train_and_checkpoint_roundtrip(tmp_path):
    """Gradients must reach the path parameters through the residual AND the
    data misfit, and a checkpoint with paths must restore bit-exact."""
    exp = override(get_preset("abgrall_admm"), {
        "model.layers": (2, 16, 16, 1),
        "model.n_paths": 2,
        "model.path_sharpness": 4.0,
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 256,
        "train.out_dir": str(tmp_path),
    })
    tr = Trainer(exp)
    state = tr.init_state()
    c0 = np.asarray(state.params["net"][0]["path_c"]).copy()
    a0 = np.asarray(state.params["net"][0]["path_a"]).copy()
    state, summary = tr.train(state)
    assert np.isfinite(summary["rel_l2_u"])
    c1 = np.asarray(state.params["net"][0]["path_c"])
    a1 = np.asarray(state.params["net"][0]["path_a"])
    assert np.max(np.abs(c1 - c0)) > 0.0, "path polynomials did not train"
    assert np.max(np.abs(a1 - a0)) > 0.0, "path sharpness did not train"
    restored = tr.load_checkpoint(str(tmp_path / "abgrall_admm_final.ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
