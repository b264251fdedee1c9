#!/usr/bin/env python3
"""Identify the physics behind Abgrall_burgers_shock.mat (reference ships the
grid with no generator: /root/reference/Burgers/Data/Abgrall_burgers_shock.mat,
257x257 over x,t in [0,pi]^2).

Findings feed pinns_tpu.data.generators.make_abgrall_burgers_grid — run this
to re-derive the constants baked there. Method mirrors the TwoSin oracle
identification (PARITY.md section 2):

1. FD least-squares on the stored grid -> effective PDE in label time:
   u_t + lambda1 u u_x = lambda2 u_xx with lambda1 ~ 0.999, lambda2 ~ 4.8e-3
   (DG numerical dissipation); label time IS physical time here, unlike
   TwoSin.
2. The t=0 column is a slightly-evolved state of a clean IC
   u0 = a + b sin^2(2x) (periodic on [0,pi]): fit (a, b, nu, tau0) by
   matching column 0, then validate against all 257 columns.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from pinns_tpu.data.generators import burgers_fv  # noqa: E402

MAT = "/root/reference/Burgers/Data/Abgrall_burgers_shock.mat"


def load():
    import scipy.io

    m = scipy.io.loadmat(MAT)
    return m["x"].ravel(), m["t"].ravel(), m["usol"]  # (257,), (257,), (257,257)


def rel_l2(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def dense_tau_match(a, b, nu, col, tau_max=0.8, nx=1025, nsnap=401):
    """Evolve the candidate IC densely; return (tau*, err*) matching `col`."""
    ic = lambda x: a + b * np.sin(2 * x) ** 2
    out = burgers_fv(
        ic, nx=nx, nt=nsnap, t_final=tau_max, nu=nu, xlim=(0.0, np.pi),
        periodic=True,
    )
    xs = out["x"].ravel()
    x_ref, _, _ = load()
    errs = []
    for k in range(nsnap):
        u_k = np.interp(x_ref, xs, out["usol"][:, k])
        errs.append(rel_l2(u_k, col))
    k = int(np.argmin(errs))
    return out["t"].ravel()[k], errs[k]


def validate_full(a, b, nu, tau0, nx=1025):
    """Evolve from the IC with t_offset=tau0 over [0, pi]; per-column errors."""
    x_ref, t_ref, u_ref = load()
    ic = lambda x: a + b * np.sin(2 * x) ** 2
    out = burgers_fv(
        ic, nx=nx, nt=len(t_ref), t_final=float(t_ref[-1]), nu=nu,
        xlim=(0.0, np.pi), periodic=True, t_offset=tau0,
    )
    xs = out["x"].ravel()
    errs = np.array([
        rel_l2(np.interp(x_ref, xs, out["usol"][:, k]), u_ref[:, k])
        for k in range(len(t_ref))
    ])
    return errs


if __name__ == "__main__":
    x_ref, t_ref, u_ref = load()
    col0 = u_ref[:, 0]
    print("== stage 1: tau0 scan for candidate ICs vs column 0 ==")
    best = None
    for a, b in [(0.114, 0.636), (0.125, 0.625), (0.1, 0.65), (0.0, 0.75)]:
        for nu in [0.0, 0.0048]:
            tau, err = dense_tau_match(a, b, nu, col0)
            print(f"a={a:.3f} b={b:.3f} nu={nu:.4f} -> tau0={tau:.4f} err={err:.4f}")
            if best is None or err < best[-1]:
                best = (a, b, nu, tau, err)
    a, b, nu, tau0, err0 = best
    print(f"best: a={a} b={b} nu={nu} tau0={tau0:.4f} col0 err={err0:.4f}")
    print("== stage 2: full-grid validation ==")
    errs = validate_full(a, b, nu, tau0)
    print(f"max col err={errs.max():.4f} mean={errs.mean():.4f} "
          f"argmax=col {int(errs.argmax())}")
    print("per-column (every 32):",
          np.array2string(errs[::32], precision=3))
