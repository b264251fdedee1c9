"""Native data generation vs the reference's stored ground truth."""

import os

import numpy as np
import pytest

from pinns_tpu.data.generators import (
    burgers_cole_hopf,
    burgers_fv,
    euler_solve,
    make_burgers_shock_grid,
    save_mat,
    two_sin_ic,
)

HAVE_REF = os.path.isdir("/root/reference")


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_cole_hopf_matches_reference_burgers_shock():
    """The strongest oracle available: the stored canonical dataset."""
    import scipy.io

    ref = scipy.io.loadmat("/root/reference/Burgers/Data/burgers_shock.mat")
    x, t, usol_ref = ref["x"], ref["t"], ref["usol"]
    usol = burgers_cole_hopf(x, t)
    err = np.linalg.norm(usol - usol_ref) / np.linalg.norm(usol_ref)
    assert err < 1e-3, f"Cole-Hopf rel-L2 vs reference grid: {err:.2e}"


def test_make_burgers_shock_grid_shapes():
    grid = make_burgers_shock_grid(nx=64, nt=20)
    assert grid["usol"].shape == (64, 20)
    # IC row
    np.testing.assert_allclose(
        grid["usol"][:, 0], -np.sin(np.pi * grid["x"].ravel()), atol=1e-12
    )
    # boundaries stay ~0
    assert np.abs(grid["usol"][0]).max() < 1e-6
    assert np.abs(grid["usol"][-1]).max() < 1e-6


def test_euler_solver_conservation_and_positivity():
    out = euler_solve(nx=400, n_snapshots=40)
    rho, u, ener = out["rhosol"], out["usol"], out["Enersol"]
    assert rho.shape == (400, 40)
    assert np.all(rho > 0)
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(ener))
    # mass balance: d(sum rho)/dt equals the (constant-state) boundary flux
    # difference — the blend IC has genuine inflow at the left boundary
    mass = rho.sum(axis=0)
    t = out["t"].ravel()
    dx = out["x"][1, 0] - out["x"][0, 0]
    flux_in = rho[0, 0] * u[0, 0] - rho[-1, 0] * u[-1, 0]
    expected = mass[0] + flux_in * t / dx
    np.testing.assert_allclose(mass, expected, rtol=2e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_euler_solver_matches_reference_dg_data():
    """Cross-validate the FV solve against the DG-generated reference grid."""
    import scipy.io

    ref = scipy.io.loadmat("/root/reference/Eulers/Data/Abgrall_eulers.mat")
    out = euler_solve(nx=1500, n_snapshots=157)
    # interpolate our solution onto the reference's (deduped DG) x nodes at
    # the final time
    x_ref = ref["x"].ravel()
    t_idx = -1
    for name in ("rhosol", "usol", "Enersol"):
        ours = np.interp(x_ref, out["x"].ravel(), out[name][:, t_idx])
        theirs = ref[name][:, t_idx]
        err = np.linalg.norm(ours - theirs) / np.linalg.norm(theirs)
        assert err < 0.05, f"{name} rel-L2 vs DG reference at t=0.2: {err:.3f}"


def test_burgers_fv_inviscid_shock():
    out = burgers_fv(two_sin_ic, nx=256, nt=51, t_final=0.8)
    u = out["usol"]
    assert u.shape == (256, 51)
    assert np.all(np.isfinite(u))
    # total variation must not grow (TVD scheme, inviscid scalar law)
    tv = np.abs(np.diff(u, axis=0)).sum(axis=0)
    assert tv[-1] <= tv[0] * 1.01
    # max principle
    assert u.max() <= out["usol"][:, 0].max() + 1e-4
    assert u.min() >= out["usol"][:, 0].min() - 1e-4


def test_generated_dataset_roundtrip_through_loader(tmp_path):
    from pinns_tpu.data.datasets import load_burgers_mat

    grid = make_burgers_shock_grid(nx=64, nt=20)
    path = save_mat(str(tmp_path / "gen.mat"), grid)
    ds = load_burgers_mat(path)
    assert ds.fields["u"].shape == (20, 64)
    np.testing.assert_allclose(ds.lb, [-1.0, 0.0], atol=1e-6)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_twosin_oracle_identified_and_time_axis_falsified():
    """The TwoSin dataset (ships with no generator) is the inviscid entropy
    solution of u0 = sin(2*pi*x) — but under a NON-physical time axis: the
    stored labels t = linspace(0,1,101) actually hold snapshots at
    tau in [0.010, 0.401]. Validated against the in-tree grid-converged
    Godunov FV solver; see PARITY.md §2."""
    from scipy.interpolate import interp1d
    from scipy.io import loadmat

    d = loadmat("/root/reference/Burgers/Data/TwoSin_burgers_shock.mat")
    x = d["x"].ravel()
    u = np.real(d["usol"])

    fv = burgers_fv(two_sin_ic, nx=1025, nt=301, t_final=0.45)
    cols = interp1d(fv["x"].ravel(), fv["usol"], axis=0)(x)  # (513, 301)
    tf = fv["t"].ravel()

    def best_match(k):
        diffs = np.linalg.norm(cols - u[:, k : k + 1], axis=0)
        j = int(np.argmin(diffs))
        return tf[j], diffs[j] / np.linalg.norm(u[:, k])

    # stored "t=0" column = entropy solution at tau ~ 0.010, NOT the IC
    tau0, err0 = best_match(0)
    assert abs(tau0 - 0.010) < 0.003 and err0 < 0.01
    # post-shock column (label t=0.60) matches at tau ~ 0.235
    tau60, err60 = best_match(60)
    assert abs(tau60 - 0.235) < 0.01 and err60 < 0.06
    # the label-time solution does NOT match: the dataset is inconsistent
    # with u_t + u*u_x = 0 in its own time coordinates
    j_label = int(np.argmin(np.abs(tf - 0.30)))
    err_label = np.linalg.norm(cols[:, j_label] - u[:, 30]) / np.linalg.norm(
        u[:, 30]
    )
    assert err_label > 0.3


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_twosin_regenerator_matches_stored_grid():
    """make_twosin_grid reproduces TwoSin_burgers_shock.mat (identified IC
    sin(2*pi*x) + measured adaptive-CFL clock TWOSIN_TAU) to its measured
    fidelity — the repo is data-self-sufficient for the flagship dataset."""
    import scipy.io

    from pinns_tpu.data.generators import make_twosin_grid

    ref = scipy.io.loadmat(
        "/root/reference/Burgers/Data/TwoSin_burgers_shock.mat"
    )
    out = make_twosin_grid(fv_nx=513)  # reduced FV grid: ~1 s, max err 1.9%
    assert out["usol"].shape == ref["usol"].shape == (513, 101)
    errs = np.linalg.norm(out["usol"] - ref["usol"], axis=0) / np.linalg.norm(
        ref["usol"], axis=0
    )
    # round-4 refined oracle (nu=1.9e-3, amp=1.005, re-fit TWOSIN_TAU):
    # 1.89% at this reduced grid, 1.36% at the full default grid
    assert errs.max() < 0.025, f"worst column rel-L2 {errs.max():.4f}"


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_abgrall_regenerator_matches_stored_grid():
    """make_abgrall_burgers_grid reproduces Abgrall_burgers_shock.mat
    (identified IC 0.1 + 0.65|sin 2x|, nu=5e-3, tau0=0.012 — see
    benchmarks/abgrall_ident.py) to its measured fidelity."""
    import scipy.io

    from pinns_tpu.data.generators import make_abgrall_burgers_grid

    ref = scipy.io.loadmat(
        "/root/reference/Burgers/Data/Abgrall_burgers_shock.mat"
    )
    out = make_abgrall_burgers_grid(fv_nx=257)
    assert out["usol"].shape == ref["usol"].shape == (257, 257)
    errs = np.linalg.norm(out["usol"] - ref["usol"], axis=0) / np.linalg.norm(
        ref["usol"], axis=0
    )
    # round-4 refined oracle (lam1=1.0078, nu=4.95e-3, refined IC):
    # 1.82% at this reduced grid, 1.70% at the full default grid
    assert errs.max() < 0.025, f"worst column rel-L2 {errs.max():.4f}"


def test_all_known_datasets_load_without_reference_tree(tmp_path, monkeypatch):
    """Every preset dataset must load with the reference tree absent —
    _generate_fallback covers all four named grids. Generators are patched
    to reduced resolution to keep the test fast; the wiring is what is
    under test (fidelity is covered by the match tests above)."""
    import functools

    from pinns_tpu.data import datasets as dsm
    from pinns_tpu.data import generators as g

    # reduced FV resolution (wiring under test, not fidelity)
    monkeypatch.setattr(
        g, "make_twosin_grid", functools.partial(g.make_twosin_grid, fv_nx=513)
    )
    monkeypatch.setattr(
        g,
        "make_abgrall_burgers_grid",
        functools.partial(g.make_abgrall_burgers_grid, fv_nx=257),
    )
    for name, shape in [
        ("twosin_burgers_shock", (101, 513)),
        ("abgrall_burgers_shock", (257, 257)),
        ("burgers_shock", (100, 256)),
    ]:
        ds = dsm.load_burgers_mat(name, root=str(tmp_path))
        assert ds.fields["u"].shape == shape, (name, ds.fields["u"].shape)
        assert np.all(np.isfinite(ds.fields["u"]))
    eds = dsm.load_euler_mat("abgrall_eulers", root=str(tmp_path))
    for f in ("rho", "u", "E"):
        assert eds.fields[f].shape == (157, 300)
        assert np.all(np.isfinite(eds.fields[f]))


def test_exact_riemann_matches_converged_fv():
    """The exact Riemann oracle agrees with the converged HLLC solve of the
    same blend shock tube to FV resolution — cross-validation of both."""
    from pinns_tpu.data.generators import (
        blend_primitives,
        euler_exact_riemann,
        euler_solve_hllc,
    )

    left, right = blend_primitives()
    out = euler_solve_hllc(nx=3000, n_snapshots=3, t_final=0.15)
    xs = out["x"].ravel()
    w = euler_exact_riemann(xs, 0.15, left, right)
    rho_fv = out["rhosol"][:, 2]
    u_fv = out["usol"][:, 2]
    p_fv = 0.4 * (out["Enersol"][:, 2] - 0.5 * rho_fv * u_fv**2)
    for name, a, b, tol in (
        ("rho", w[:, 0], rho_fv, 8e-3),
        ("u", w[:, 1], u_fv, 2e-2),
        ("p", w[:, 2], p_fv, 8e-3),
    ):
        err = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert err < tol, (name, err)


def test_exact_riemann_jump_and_structure():
    """Rankine-Hugoniot across the right shock, constancy of (u, p) across
    the contact, and positivity — the closed-form oracle's invariants."""
    from pinns_tpu.data.generators import blend_primitives, euler_exact_riemann

    gamma = 1.4
    left, right = blend_primitives()
    t = 0.12
    x = np.linspace(0.0, 1.0, 20001)
    w = euler_exact_riemann(x, t, left, right)
    rho, u, p = w[:, 0], w[:, 1], w[:, 2]
    assert np.all(rho > 0) and np.all(p > 0)
    # locate the right shock: the rightmost jump in rho
    jumps = np.abs(np.diff(rho))
    i = int(np.argmax(jumps[len(jumps) // 2:])) + len(jumps) // 2
    s = (x[i] + x[i + 1]) / 2.0
    s_speed = (s - 0.5) / t
    def flux(r, uu, pp):
        e = pp / (gamma - 1) + 0.5 * r * uu**2
        return np.array([r * uu, r * uu * uu + pp, uu * (e + pp)])

    fs = flux(rho[i - 5], u[i - 5], p[i - 5])
    fr = flux(rho[i + 5], u[i + 5], p[i + 5])
    # RH: s [U] = [F] componentwise across the shock
    dU = np.array([
        rho[i - 5] - rho[i + 5],
        rho[i - 5] * u[i - 5] - rho[i + 5] * u[i + 5],
        (p[i - 5] / 0.4 + 0.5 * rho[i - 5] * u[i - 5] ** 2)
        - (p[i + 5] / 0.4 + 0.5 * rho[i + 5] * u[i + 5] ** 2),
    ])
    np.testing.assert_allclose(s_speed * dU, fs - fr, rtol=2e-3, atol=2e-4)
    # contact: u and p continuous where rho jumps mid-domain
    mid = (x > 0.5 + 0.2 * t) & (x < s - 0.01)
    assert np.ptp(u[mid]) < 1e-10 and np.ptp(p[mid]) < 1e-10


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_stored_euler_artifact_error_vs_exact_documented():
    """The stored DG artifact's OWN error against the exact solution of its
    IC is material and measured (PARITY §2): the native exact oracle is
    strictly better ground truth. Pin the measured bands so a regression in
    the oracle (or a surprise change in the grading) is caught."""
    import scipy.io

    from pinns_tpu.data.generators import (
        EULER_DT,
        EULER_T0,
        blend_primitives,
        euler_exact_riemann,
    )

    ref = scipy.io.loadmat("/root/reference/Eulers/Data/Abgrall_eulers.mat")
    x_ref = ref["x"].ravel()
    left, right = blend_primitives()
    errs = {"rho": [], "u": [], "E": []}
    for k in range(0, 157, 6):
        w = euler_exact_riemann(
            x_ref, float(EULER_T0 + EULER_DT * k), left, right
        )
        e = w[:, 2] / 0.4 + 0.5 * w[:, 0] * w[:, 1] ** 2
        for f, ours in (("rho", w[:, 0]), ("u", w[:, 1]), ("E", e)):
            key = {"rho": "rhosol", "u": "usol", "E": "Enersol"}[f]
            col = ref[key][:, k]
            errs[f].append(
                float(np.linalg.norm(ours - col) / np.linalg.norm(col))
            )
    # the stored artifact tracks the exact solution only to these bands —
    # its DG dissipation/startup signature, not an oracle defect
    assert max(errs["rho"]) < 0.03
    assert max(errs["E"]) < 0.03
    assert max(errs["u"]) < 0.30
    # sanity: mid/late columns are much closer than the startup transient
    assert errs["u"][-1] < 0.06


def test_exact_riemann_toro_star_states():
    """Pin p* against Toro's published star pressures (Riemann Solvers and
    Numerical Methods, 3rd ed., table 4.3) — including the hard cases where
    a mis-scaled Newton derivative (the round-4 rarefaction-branch bug)
    stalls or converges slowly: the 1e5 pressure-ratio blast (test 3), the
    colliding-shocks state (test 4), and the double rarefaction (test 2).
    p* is read off the solution at the contact (both sides must agree)."""
    from pinns_tpu.data.generators import euler_exact_riemann

    cases = [
        # (left, right, published p*, tol matching the table's rounding)
        ((1.0, 0.0, 1.0), (0.125, 0.0, 0.1), 0.30313, 2e-5),     # Sod
        ((1.0, -2.0, 0.4), (1.0, 2.0, 0.4), 0.00189, 3e-3),      # test 2
        ((1.0, 0.0, 1000.0), (1.0, 0.0, 0.01), 460.894, 2e-6),   # test 3
        ((5.99924, 19.5975, 460.894),
         (5.99242, -6.19633, 46.0950), 1691.64, 1e-5),           # test 4
    ]
    for left, right, pstar, tol in cases:
        # locate the contact: it rides at xi = u*, so u(xi) - xi crosses
        # zero exactly there (inside a fan u - xi = +/-c != 0; in the outer
        # states the sign is fixed) — robust even when rho is continuous
        # across the contact (the symmetric double rarefaction).
        t = 1e-3
        xi = np.linspace(-40.0, 40.0, 400001)
        w = euler_exact_riemann(0.5 + xi * t, t, left, right)
        u, p = w[:, 1], w[:, 2]
        s = u - xi
        i = int(np.argmin(np.abs(s)))
        assert abs(s[i]) < 1e-2, (left, right)
        rel = abs(p[i] - pstar) / pstar
        assert rel < tol, (left, right, p[i], pstar)


def test_hllc_recovers_cfl_when_wave_speed_grows():
    """The HLLC oracle re-evaluates the CFL bound per snapshot interval: a
    strong blast into a light gas multiplies max(|u|+c) ~4x after breakup
    (measured: 37 -> 146), far past the old fixed-dt scheme's 1.5x t=0
    margin — which would have integrated this IC unstably with no warning.
    The adaptive solve must stay finite and conserve mass (outflow
    boundaries untouched at this horizon)."""
    from pinns_tpu.data.generators import euler_solve_hllc

    def ic(xc):
        rho = np.where(xc < 0.5, 1.0, 1e-3)
        p = np.where(xc < 0.5, 1000.0, 0.01)
        return np.stack([rho, np.zeros_like(xc), p / 0.4], axis=1)

    out = euler_solve_hllc(nx=400, n_snapshots=5, t_final=0.003, ic=ic)
    rho, u, E = out["rhosol"], out["usol"], out["Enersol"]
    for k in (rho, u, E):
        assert np.all(np.isfinite(k))
    p = 0.4 * (E - 0.5 * rho * u**2)
    smax = (np.abs(u) + np.sqrt(1.4 * np.maximum(p, 1e-12) / rho)).max(axis=0)
    assert smax[-1] > 2.0 * smax[0], smax  # the growth the fix handles
    mass0, mass1 = rho[:, 0].sum(), rho[:, -1].sum()
    assert abs(mass1 - mass0) / mass0 < 1e-6
