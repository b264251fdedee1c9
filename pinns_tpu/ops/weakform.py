"""Weak-form (finite-volume) flux residuals over space-time control volumes.

The strong-form residual f = u_t + F(u)_x is undefined at a discontinuity:
its magnitude GROWS as the network sharpens a front, so gradient descent
actively smooths shocks/contacts — measured on this suite as the Euler
front-sharpness decay and the TwoSin plateau (PARITY §4g: the shock-path
study). Weak solutions, by contrast, satisfy the INTEGRAL conservation law
exactly across jumps. This module implements that formulation
(`LossConfig.residual_kind='flux'`):

For each control volume [x1,x2] x [t1,t2] (centered at a collocation point,
half-widths a configured fraction of the domain),

    R = int_x [u(x,t2) - u(x,t1)] dx + int_t [F(x2,t) - F(x1,t)] dt

evaluated with Gauss-Legendre quadrature on each edge and normalized by the
cell measure (so r = R / |cell| -> the cell-mean of u_t + F_x for smooth u,
keeping the loss scale comparable to the strong form; for cells straddling
a jump, R penalizes exactly the Rankine-Hugoniot deficit). Everything is
batched network evaluations — N cells x 4 edges x Q nodes in ONE forward
pass, MXU-shaped, no derivatives at all in the inviscid/Euler cases.

Because weak solutions are non-unique, the companion entropy-admissibility
residual uses the same cell integrals on an entropy pair (U, G):

    E = [ int_x dU + int_t dG ] / |cell|,   violation = relu(E)^2

(admissible solutions satisfy U_t + G_x <= 0 distributionally). Burgers:
U = u^2/2, G = lambda1 u^3/3. Euler (gamma-law): the convex physical pair
U = -rho s/(gamma-1), G = u U with s = log p - gamma log rho.

Reference parity note: the reference trains strong-form residuals only
(``Abgrall_ADMM.py:170-180``, ``Euler_ADMM.py:176-198``); this is a
beyond-reference formulation targeting its own open shock problems.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from pinns_tpu.models.mlp import MLPSpec, Params, mlp_apply
from pinns_tpu.ops.taylor import mlp_taylor_1


def _gauss_legendre(q: int):
    nodes, weights = np.polynomial.legendre.leggauss(q)
    return nodes.astype(np.float64), weights.astype(np.float64)


def _cell_edges(spec: MLPSpec, centers: jnp.ndarray, hx, ht):
    """Clip cells to the domain; return per-cell midpoints and half-widths."""
    lbx, lbt = spec.lb
    ubx, ubt = spec.ub
    x1 = jnp.maximum(centers[:, 0:1] - hx, lbx)
    x2 = jnp.minimum(centers[:, 0:1] + hx, ubx)
    t1 = jnp.maximum(centers[:, 1:2] - ht, lbt)
    t2 = jnp.minimum(centers[:, 1:2] + ht, ubt)
    return x1, x2, t1, t2


def _edge_points(spec, x1, x2, t1, t2, q):
    """Quadrature points for all 4 edges: returns (pts, hxe, hte) with
    pts (N, 4Q, 2) ordered [bottom(t1), top(t2), left(x1), right(x2)]."""
    g, _ = _gauss_legendre(q)
    g = jnp.asarray(g, spec.dtype)  # (Q,)
    xm, hxe = 0.5 * (x1 + x2), 0.5 * (x2 - x1)  # (N,1)
    tm, hte = 0.5 * (t1 + t2), 0.5 * (t2 - t1)
    xq = xm + hxe * g  # (N, Q)
    tq = tm + hte * g
    one = jnp.ones_like(xq)
    bot = jnp.stack([xq, t1 * one], axis=-1)
    top = jnp.stack([xq, t2 * one], axis=-1)
    lef = jnp.stack([x1 * one, tq], axis=-1)
    rig = jnp.stack([x2 * one, tq], axis=-1)
    return jnp.concatenate([bot, top, lef, rig], axis=1), hxe, hte


def _quad(vals, weights):
    """Sum_q w_q v_q along the last-but-one axis; vals (N, Q, C)."""
    return jnp.einsum("nqc,q->nc", vals, weights)


def burgers_flux_residual(
    spec: MLPSpec,
    params: Params,
    centers: jnp.ndarray,
    lambda1,
    lambda2,
    hx: float,
    ht: float,
    quad: int = 4,
    want_entropy: bool = False,
    viscous: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cell-mean conservation residual for Burgers, F = lambda1 u^2/2
    - lambda2 u_x, plus (optionally) the weak entropy violation.

    centers: (N, 2) cell centers. `viscous` is a STATIC flag (config-level:
    lambda2 == 0 and not trainable): inviscid cells need no derivatives at
    all, so the edge evaluation is a plain forward pass. Returns (r, ent),
    each (N, 1); ent is None unless requested."""
    n = centers.shape[0]
    x1, x2, t1, t2 = _cell_edges(spec, centers, hx, ht)
    pts, hxe, hte = _edge_points(spec, x1, x2, t1, t2, quad)
    flat = pts.reshape(n * 4 * quad, 2)
    if viscous:
        u_flat, ux_flat, _ = mlp_taylor_1(spec, params, flat)
        ux = ux_flat.reshape(n, 4 * quad, 1)
    else:
        u_flat = mlp_apply(spec, params, flat)
        ux = None
    u = u_flat.reshape(n, 4 * quad, 1)
    q = quad
    _, w = _gauss_legendre(q)
    w = jnp.asarray(w, spec.dtype)

    u_bot, u_top = u[:, 0:q], u[:, q : 2 * q]
    u_lef, u_rig = u[:, 2 * q : 3 * q], u[:, 3 * q : 4 * q]
    flux_lef = 0.5 * lambda1 * u_lef * u_lef
    flux_rig = 0.5 * lambda1 * u_rig * u_rig
    if viscous:
        flux_lef = flux_lef - lambda2 * ux[:, 2 * q : 3 * q]
        flux_rig = flux_rig - lambda2 * ux[:, 3 * q : 4 * q]

    measure = 4.0 * hxe * hte
    r = (
        hxe * _quad(u_top - u_bot, w) + hte * _quad(flux_rig - flux_lef, w)
    ) / measure

    ent = None
    if want_entropy:
        ent_u = 0.5 * (u_top * u_top - u_bot * u_bot)
        ent_g = (lambda1 / 3.0) * (
            u_rig * u_rig * u_rig - u_lef * u_lef * u_lef
        )
        if viscous:
            # Viscous entropy flux: exact solutions satisfy
            # U_t + (G - lambda2 u u_x)_x = -lambda2 u_x^2 <= 0, so the
            # admissibility test must carry -lambda2 u u_x on the side
            # edges or it penalizes correct smooth viscous behavior
            # (tests/test_entropy_viscous.py).
            ent_g = ent_g - lambda2 * (
                u_rig * ux[:, 3 * q : 4 * q] - u_lef * ux[:, 2 * q : 3 * q]
            )
        e = (hxe * _quad(ent_u, w) + hte * _quad(ent_g, w)) / measure
        ent = jnp.maximum(e, 0.0) ** 2
    return r, ent


def _euler_entropy_x(y, y_x, gamma, eps: float = 1e-3):
    """d(eta)/dx along an edge from primitive fields and their x-derivatives
    (chain rule: eta_U U_x = eta_x for the state-function entropy eta)."""
    rho, u, e = y[..., 0:1], y[..., 1:2], y[..., 2:3]
    rho_x, u_x, e_x = y_x[..., 0:1], y_x[..., 1:2], y_x[..., 2:3]
    p = (gamma - 1.0) * (e - 0.5 * rho * u * u)
    p_safe = jnp.maximum(p, eps)
    rho_safe = jnp.maximum(rho, eps)
    p_x = (gamma - 1.0) * (e_x - 0.5 * u * u * rho_x - rho * u * u_x)
    s = jnp.log(p_safe) - gamma * jnp.log(rho_safe)
    s_x = p_x / p_safe - gamma * rho_x / rho_safe
    return -(rho_x * s + rho * s_x) / (gamma - 1.0)


def _euler_conserved_flux(y, gamma, eps: float = 1e-3):
    """Conserved variables U = (rho, rho u, E), fluxes (rho u, rho u^2 + p,
    u (E + p)), and the convex entropy pair (eta, q) for the gamma law."""
    rho, u, e = y[..., 0:1], y[..., 1:2], y[..., 2:3]
    p = (gamma - 1.0) * (e - 0.5 * rho * u * u)
    cons = jnp.concatenate([rho, rho * u, e], axis=-1)
    flux = jnp.concatenate(
        [rho * u, rho * u * u + p, u * (e + p)], axis=-1
    )
    s = jnp.log(jnp.maximum(p, eps)) - gamma * jnp.log(jnp.maximum(rho, eps))
    eta = -rho * s / (gamma - 1.0)
    return cons, flux, eta, u * eta


def euler_flux_residuals(
    spec: MLPSpec,
    params: Params,
    centers: jnp.ndarray,
    gamma: float,
    hx: float,
    ht: float,
    quad: int = 4,
    want_entropy: bool = False,
    visc=0.0,
    viscous: bool = False,
):
    """Cell-mean conservation residuals for the 1D Euler system (mass,
    momentum, energy) — pure forward evaluations, no derivatives (unless
    `viscous`).

    `viscous` is a STATIC flag. When set, each flux component carries an
    artificial-viscosity term -visc * dU_i/dx on the conserved variables —
    the modified-equation model of a dissipative numerical scheme (the
    stored reference grids are DG/FV solutions, which solve the inviscid
    system plus O(h) dissipation; matching it closed the TwoSin gap to the
    oracle floor, PARITY §4k). `visc` may be a trainable (1,) array for
    identification. One Taylor-1 pass replaces the forward pass; still no
    second derivatives anywhere.

    Returns ((r1, r2, r3), ent), each (N, 1); ent is the weak
    entropy-inequality violation relu(E)^2 (None unless requested)."""
    n = centers.shape[0]
    x1, x2, t1, t2 = _cell_edges(spec, centers, hx, ht)
    pts, hxe, hte = _edge_points(spec, x1, x2, t1, t2, quad)
    flat = pts.reshape(n * 4 * quad, 2)
    if viscous:
        y_flat, yx_flat, _ = mlp_taylor_1(spec, params, flat)
        y = y_flat.reshape(n, 4 * quad, 3)
        y_x = yx_flat.reshape(n, 4 * quad, 3)
    else:
        y = mlp_apply(spec, params, flat).reshape(n, 4 * quad, 3)
        y_x = None
    cons, flux, eta, etaflux = _euler_conserved_flux(y, gamma)
    if viscous:
        # dU/dx for U = (rho, rho u, E) from the primitive derivatives
        rho, u = y[..., 0:1], y[..., 1:2]
        rho_x, u_x, e_x = y_x[..., 0:1], y_x[..., 1:2], y_x[..., 2:3]
        cons_x = jnp.concatenate(
            [rho_x, rho_x * u + rho * u_x, e_x], axis=-1
        )
        flux = flux - visc * cons_x
    q = quad
    _, w = _gauss_legendre(q)
    w = jnp.asarray(w, spec.dtype)
    measure = 4.0 * hxe * hte

    d_cons = cons[:, q : 2 * q] - cons[:, 0:q]  # top - bottom
    d_flux = flux[:, 3 * q : 4 * q] - flux[:, 2 * q : 3 * q]  # right - left
    r = (hxe * _quad(d_cons, w) + hte * _quad(d_flux, w)) / measure
    residuals = (r[:, 0:1], r[:, 1:2], r[:, 2:3])

    ent = None
    if want_entropy:
        d_eta = eta[:, q : 2 * q] - eta[:, 0:q]
        d_ef = etaflux[:, 3 * q : 4 * q] - etaflux[:, 2 * q : 3 * q]
        if viscous:
            # Viscous entropy flux -visc * eta_x (eta_U U_x = eta_x by the
            # chain rule): exact solutions of the modified system satisfy
            # eta_t + (q_flux - visc eta_x)_x = -visc U_x^T eta_UU U_x <= 0
            # by convexity of eta, so the admissibility test must carry it
            # on the side edges (tests/test_entropy_viscous.py).
            eta_x = _euler_entropy_x(y, y_x, gamma)
            d_ef = d_ef - visc * (
                eta_x[:, 3 * q : 4 * q] - eta_x[:, 2 * q : 3 * q]
            )
        e = (hxe * _quad(d_eta, w) + hte * _quad(d_ef, w)) / measure
        ent = jnp.maximum(e, 0.0) ** 2
    return residuals, ent
