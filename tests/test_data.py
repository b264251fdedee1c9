import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.data.datasets import (
    GridDataset,
    build_ic_bc_training_set,
    interior_training_set,
    load_burgers_mat,
    load_euler_mat,
)
from pinns_tpu.data.sampling import (
    latin_hypercube,
    lhs_with_anchors,
    scale_to_bounds,
    uniform_box,
)

HAVE_REF = os.path.isdir("/root/reference")


def _toy_dataset(nx=9, nt=5):
    x = np.linspace(-1, 1, nx)
    t = np.linspace(0, 1, nt)
    u = np.sin(np.pi * x)[None, :] * np.exp(-t)[:, None]  # (nt, nx)
    return GridDataset(x=x, t=t, fields={"u": u}, name="toy")


def test_grid_dataset_layout():
    ds = _toy_dataset()
    assert ds.X_star.shape == (45, 2)
    assert ds.star["u"].shape == (45, 1)
    np.testing.assert_allclose(ds.lb, [-1.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(ds.ub, [1.0, 1.0], atol=1e-7)
    # flattening order: x varies fastest within a t-row
    np.testing.assert_allclose(ds.X_star[0], [-1.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(ds.X_star[1], [-0.75, 0.0], atol=1e-7)


def test_ic_bc_training_set():
    ds = _toy_dataset(nx=9, nt=5)
    x_data, targets = build_ic_bc_training_set(ds, n_u=10, seed=0)
    assert x_data.shape == (10, 2)
    assert targets["u"].shape == (10, 1)
    # every selected point lies on t=0, x=-1, or x=+1
    on_ic = np.isclose(x_data[:, 1], 0.0)
    on_bc = np.isclose(np.abs(x_data[:, 0]), 1.0)
    assert np.all(on_ic | on_bc)
    # targets match the exact solution there
    u_exact = np.sin(np.pi * x_data[:, 0:1]) * np.exp(-x_data[:, 1:2])
    np.testing.assert_allclose(targets["u"], u_exact, atol=1e-5)


def test_interior_training_set():
    ds = _toy_dataset()
    x_data, targets = interior_training_set(ds, n_u=20, seed=1)
    assert x_data.shape == (20, 2)
    u_exact = np.sin(np.pi * x_data[:, 0:1]) * np.exp(-x_data[:, 1:2])
    np.testing.assert_allclose(targets["u"], u_exact, atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_load_reference_burgers():
    ds = load_burgers_mat("burgers_shock")
    assert ds.fields["u"].shape == (100, 256)  # (Nt, Nx)
    assert ds.X_star.shape == (25600, 2)
    np.testing.assert_allclose(ds.lb, [-1.0, 0.0], atol=1e-5)
    ds2 = load_burgers_mat("twosin_burgers_shock")
    assert ds2.fields["u"].shape == (101, 513)
    # IC/BC candidate count: Nx + Nt + Nt
    x_data, _ = build_ic_bc_training_set(ds2, n_u=100)
    assert x_data.shape == (100, 2)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_load_reference_euler():
    ds = load_euler_mat()
    assert set(ds.field_names) == {"rho", "u", "E"}
    assert ds.fields["rho"].shape == (157, 300)
    x_data, targets = build_ic_bc_training_set(ds, n_u=200)
    assert set(targets) == {"rho", "u", "E"}


def test_latin_hypercube_stratification():
    n = 64
    pts = latin_hypercube(jax.random.key(0), n, 2)
    assert pts.shape == (n, 2)
    # exactly one sample per stratum in each dimension
    for d in range(2):
        bins = np.floor(np.asarray(pts[:, d]) * n).astype(int)
        assert sorted(bins.tolist()) == list(range(n))


def test_uniform_box_bounds():
    pts = uniform_box(jax.random.key(1), 1000, [-1.0, 0.0], [1.0, 0.5])
    p = np.asarray(pts)
    assert p.shape == (1000, 2)
    assert p[:, 0].min() >= -1.0 and p[:, 0].max() <= 1.0
    assert p[:, 1].min() >= 0.0 and p[:, 1].max() <= 0.5
    # roughly uniform
    assert abs(p[:, 0].mean()) < 0.1


def test_lhs_with_anchors():
    anchors = jnp.array([[0.5, 0.5], [0.1, 0.2]])
    pts = lhs_with_anchors(jax.random.key(2), 10, [0.0, 0.0], [1.0, 1.0], anchors)
    assert pts.shape == (12, 2)
    np.testing.assert_allclose(pts[-2:], anchors, atol=1e-7)


def test_scale_to_bounds():
    unit = jnp.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]])
    out = scale_to_bounds(unit, [-2.0, 1.0], [2.0, 3.0])
    np.testing.assert_allclose(out, [[-2, 1], [2, 3], [0, 2]], atol=1e-6)


def test_missing_dataset_falls_back_to_generator(tmp_path):
    # empty root: burgers_shock regenerates via Cole-Hopf
    ds = load_burgers_mat("burgers_shock", root=str(tmp_path))
    assert ds.fields["u"].shape == (100, 256)
    np.testing.assert_allclose(ds.lb, [-1.0, 0.0], atol=1e-6)
    if HAVE_REF:
        ref = load_burgers_mat("burgers_shock")  # from the reference tree
        err = np.linalg.norm(ds.fields["u"] - ref.fields["u"]) / np.linalg.norm(
            ref.fields["u"]
        )
        assert err < 1e-3

    # every NAMED dataset now has a generator (round 3: twosin + abgrall
    # identified, PARITY §2); only unknown names/paths raise
    with pytest.raises(FileNotFoundError, match="generate-data"):
        load_burgers_mat("no_such_dataset.mat", root=str(tmp_path))


def test_missing_euler_dataset_regenerates(tmp_path):
    ds = load_euler_mat("abgrall_eulers", root=str(tmp_path))
    assert set(ds.field_names) == {"rho", "u", "E"}
    assert ds.fields["rho"].shape[0] == 157  # (Nt, Nx) layout
    assert ds.fields["rho"].shape[1] == 300


def test_dataset_provenance_tag():
    """Graded numbers are self-identifying: datasets loaded from the
    reference .mat tag provenance='stored'; native regeneration (the
    self-sufficient path — for Euler the EXACT Riemann oracle, which
    departs up to 28% in u from the stored DG artifact, PARITY §2) tags
    'native'. Trainer.evaluate carries the tag into every summary."""
    import pinns_tpu.data.datasets as dsm

    ds = dsm.load_burgers_mat("burgers_shock")
    assert ds.provenance == "stored"
    ds_native = dsm.load_burgers_mat("burgers_shock", root="/nonexistent")
    assert ds_native.provenance == "native"

    from pinns_tpu.config import override
    from pinns_tpu.experiments import get_preset
    from pinns_tpu.train import Trainer

    tr = Trainer(override(get_preset("abgrall_l2"), {
        "model.layers": (2, 8, 8, 1), "sampling.n_f": 64,
        "train.epochs": 10, "train.chunk": 10, "train.log_every": 0,
    }))
    s = tr.evaluate(tr.init_state())
    assert s["truth"] == "stored"
