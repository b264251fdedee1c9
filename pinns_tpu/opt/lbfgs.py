"""On-device L-BFGS with a strong-Wolfe zoom line search.

The reference drives SciPy's L-BFGS-B from the host through
``tf.contrib.opt.ScipyOptimizerInterface`` (``Abgrall_ADMM.py:66-73``) with
options {maxiter: 5000, maxcor: 50, maxls: 50, ftol: 1e-7} — every line-search
evaluation is a host->device round trip. Here the entire optimizer runs inside
one XLA program: two-loop recursion over a circular (s, y) history, and a
bracket+zoom strong-Wolfe line search (Nocedal & Wright alg. 3.5/3.6), all
under ``lax.while_loop`` so the compiled program is step-count independent.

No box constraints (the reference never passes bounds, so the "-B" part of
L-BFGS-B is unused); termination matches SciPy semantics:
  - gradient:  max|g| <= gtol                        (pgtol)
  - function:  (f_k - f_{k+1}) / max(|f_k|, |f_{k+1}|, 1) <= ftol
  - iteration cap.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    n_iters: jnp.ndarray
    n_evals: jnp.ndarray
    converged: jnp.ndarray  # True if a tolerance triggered (vs maxiter / ls failure)



def _zoom_linesearch(value_and_grad, x, f0, g0, d, init_step, c1, c2, max_evals):
    """Strong-Wolfe line search along d from x. Returns (a, f, g, ok, evals).

    One function+gradient evaluation per while_loop trip; a mode flag switches
    between the bracketing stage and the zoom stage.
    """
    dphi0 = jnp.vdot(g0, d)
    a_max = 1e8

    # carry: mode(0=bracket,1=zoom), a_lo, phi_lo, dphi_lo, a_hi, phi_hi,
    #        a_prev, phi_prev, dphi_prev, a_trial, evals, done, ok,
    #        a_best, f_best, g_best
    def cond(c):
        return jnp.logical_not(c["done"])

    def body(c):
        a = c["a_trial"]
        phi, g = value_and_grad(x + a * d)
        dphi = jnp.vdot(g, d)
        evals = c["evals"] + 1
        out_of_budget = evals >= max_evals

        wolfe1 = phi <= f0 + c1 * a * dphi0
        wolfe2 = jnp.abs(dphi) <= -c2 * dphi0
        accept = jnp.logical_and(wolfe1, wolfe2)

        def bracket_update(c):
            # Nocedal & Wright alg 3.5
            hi_cond = jnp.logical_or(
                jnp.logical_not(wolfe1),
                jnp.logical_and(phi >= c["phi_prev"], evals > 1),
            )
            to_zoom_hi = hi_cond  # zoom(a_prev, a)
            to_zoom_rev = jnp.logical_and(jnp.logical_not(hi_cond), dphi >= 0)
            # else: extend
            new = dict(c)
            new["evals"] = evals
            # zoom(a_prev, a): lo = a_prev, hi = a
            new["mode"] = jnp.where(
                to_zoom_hi | to_zoom_rev, 1, 0
            )
            new["a_lo"] = jnp.where(to_zoom_hi, c["a_prev"], jnp.where(to_zoom_rev, a, c["a_lo"]))
            new["phi_lo"] = jnp.where(to_zoom_hi, c["phi_prev"], jnp.where(to_zoom_rev, phi, c["phi_lo"]))
            new["dphi_lo"] = jnp.where(to_zoom_hi, c["dphi_prev"], jnp.where(to_zoom_rev, dphi, c["dphi_lo"]))
            new["a_hi"] = jnp.where(to_zoom_hi, a, jnp.where(to_zoom_rev, c["a_prev"], c["a_hi"]))
            new["phi_hi"] = jnp.where(to_zoom_hi, phi, jnp.where(to_zoom_rev, c["phi_prev"], c["phi_hi"]))
            in_zoom = to_zoom_hi | to_zoom_rev
            # next trial: midpoint if entering zoom, else extend
            a_next_zoom = 0.5 * (new["a_lo"] + new["a_hi"])
            a_next_ext = jnp.minimum(2.0 * a, a_max)
            new["a_trial"] = jnp.where(in_zoom, a_next_zoom, a_next_ext)
            new["a_prev"] = a
            new["phi_prev"] = phi
            new["dphi_prev"] = dphi
            return new

        def zoom_update(c):
            # Nocedal & Wright alg 3.6 with bisection trial points
            new = dict(c)
            new["evals"] = evals
            cond_hi = jnp.logical_or(
                jnp.logical_not(wolfe1), phi >= c["phi_lo"]
            )
            # if trial violates sufficient decrease (or >= phi_lo): hi = a
            # else: maybe swap, lo = a
            swap = jnp.logical_and(
                jnp.logical_not(cond_hi),
                dphi * (c["a_hi"] - c["a_lo"]) >= 0,
            )
            new["a_hi"] = jnp.where(cond_hi, a, jnp.where(swap, c["a_lo"], c["a_hi"]))
            new["phi_hi"] = jnp.where(cond_hi, phi, jnp.where(swap, c["phi_lo"], c["phi_hi"]))
            new["a_lo"] = jnp.where(cond_hi, c["a_lo"], a)
            new["phi_lo"] = jnp.where(cond_hi, c["phi_lo"], phi)
            new["dphi_lo"] = jnp.where(cond_hi, c["dphi_lo"], dphi)
            new["a_trial"] = 0.5 * (new["a_lo"] + new["a_hi"])
            return new

        updated = jax.tree_util.tree_map(
            lambda b, z: jnp.where(c["mode"] == 0, b, z),
            bracket_update(c),
            zoom_update(c),
        )

        interval_dead = jnp.logical_and(
            updated["mode"] == 1,
            jnp.abs(updated["a_hi"] - updated["a_lo"])
            <= 1e-12 * jnp.maximum(1.0, jnp.abs(updated["a_hi"])),
        )
        fail = jnp.logical_and(
            jnp.logical_not(accept), jnp.logical_or(out_of_budget, interval_dead)
        )

        # Track the best sufficient-decrease point seen, as a fallback.
        better = jnp.logical_and(wolfe1, phi < updated["f_best"])
        updated["a_best"] = jnp.where(better, a, updated["a_best"])
        updated["f_best"] = jnp.where(better, phi, updated["f_best"])
        updated["g_best"] = jnp.where(better, g, updated["g_best"])

        updated["a_best"] = jnp.where(accept, a, updated["a_best"])
        updated["f_best"] = jnp.where(accept, phi, updated["f_best"])
        updated["g_best"] = jnp.where(accept, g, updated["g_best"])
        updated["done"] = jnp.logical_or(accept, fail)
        updated["ok"] = jnp.logical_or(
            accept, jnp.logical_and(fail, updated["f_best"] < f0)
        )
        return updated

    init = {
        "mode": jnp.asarray(0),
        "a_lo": jnp.asarray(0.0, f0.dtype),
        "phi_lo": f0,
        "dphi_lo": dphi0,
        "a_hi": jnp.asarray(0.0, f0.dtype),
        "phi_hi": f0,
        "a_prev": jnp.asarray(0.0, f0.dtype),
        "phi_prev": f0,
        "dphi_prev": dphi0,
        "a_trial": jnp.asarray(init_step, f0.dtype),
        "evals": jnp.asarray(0),
        "done": jnp.asarray(False),
        "ok": jnp.asarray(False),
        "a_best": jnp.asarray(0.0, f0.dtype),
        "f_best": f0,
        "g_best": g0,
    }
    out = lax.while_loop(cond, body, init)
    return out["a_best"], out["f_best"], out["g_best"], out["ok"], out["evals"]


def _two_loop_direction(g, s_hist, y_hist, rho_hist, count, head, gamma):
    """Two-loop recursion over a circular history buffer of size m."""
    m = s_hist.shape[0]

    def bwd(j, carry):
        q, alphas = carry
        idx = (head - 1 - j) % m
        valid = j < count
        alpha = rho_hist[idx] * jnp.vdot(s_hist[idx], q)
        alpha = jnp.where(valid, alpha, 0.0)
        q = q - alpha * y_hist[idx]
        return q, alphas.at[idx].set(alpha)

    q, alphas = lax.fori_loop(0, m, bwd, (g, jnp.zeros((m,), g.dtype)))
    r = gamma * q

    def fwd(j, r):
        idx = (head - count + j) % m
        valid = j < count
        beta = rho_hist[idx] * jnp.vdot(y_hist[idx], r)
        corr = jnp.where(valid, alphas[idx] - beta, 0.0)
        return r + corr * s_hist[idx]

    r = lax.fori_loop(0, m, fwd, r)
    return -r


def lbfgs_minimize(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iters: int = 5000,
    history: int = 50,
    ftol: float = 1e-7,
    gtol: float = 1e-5,
    max_ls: int = 50,
    c1: float = 1e-4,
    c2: float = 0.9,
) -> LBFGSResult:
    """Minimize fun over a flat vector, fully on device. jit-able as a whole."""
    value_and_grad = jax.value_and_grad(fun)
    n = x0.shape[0]
    m = history
    dtype = x0.dtype

    f0, g0 = value_and_grad(x0)

    state = {
        "x": x0,
        "f": f0,
        "g": g0,
        "s": jnp.zeros((m, n), dtype),
        "y": jnp.zeros((m, n), dtype),
        "rho": jnp.zeros((m,), dtype),
        "count": jnp.asarray(0),
        "head": jnp.asarray(0),
        "gamma": jnp.asarray(1.0, dtype),
        "k": jnp.asarray(0),
        "evals": jnp.asarray(1),
        "stop": jnp.asarray(False),
        "converged": jnp.asarray(False),
    }

    def cond(st):
        return jnp.logical_not(st["stop"])

    def body(st):
        d = _two_loop_direction(
            st["g"], st["s"], st["y"], st["rho"], st["count"], st["head"], st["gamma"]
        )
        # guard against non-descent directions: fall back to steepest descent
        descent = jnp.vdot(d, st["g"]) < 0
        d = jnp.where(descent, d, -st["g"])

        first = st["count"] == 0
        init_step = jnp.where(
            first,
            jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(st["g"])), 1e-12)),
            1.0,
        ).astype(dtype)

        a, f_new, g_new, ok, ls_evals = _zoom_linesearch(
            value_and_grad, st["x"], st["f"], st["g"], d, init_step, c1, c2, max_ls
        )
        x_new = st["x"] + a * d

        s_vec = x_new - st["x"]
        y_vec = g_new - st["g"]
        sy = jnp.vdot(s_vec, y_vec)
        curv_ok = sy > 1e-10 * jnp.linalg.norm(s_vec) * jnp.linalg.norm(y_vec)
        store = jnp.logical_and(ok, curv_ok)

        head = st["head"]
        s_hist = jnp.where(store, st["s"].at[head].set(s_vec), st["s"])
        y_hist = jnp.where(store, st["y"].at[head].set(y_vec), st["y"])
        rho_hist = jnp.where(
            store, st["rho"].at[head].set(1.0 / jnp.maximum(sy, 1e-30)), st["rho"]
        )
        new_head = jnp.where(store, (head + 1) % m, head)
        new_count = jnp.where(store, jnp.minimum(st["count"] + 1, m), st["count"])
        gamma = jnp.where(
            store, sy / jnp.maximum(jnp.vdot(y_vec, y_vec), 1e-30), st["gamma"]
        ).astype(dtype)

        # termination tests (SciPy L-BFGS-B semantics)
        f_old = st["f"]
        x_out = jnp.where(ok, x_new, st["x"])
        f_out = jnp.where(ok, f_new, st["f"])
        g_out = jnp.where(ok, g_new, st["g"])
        g_small = jnp.max(jnp.abs(g_out)) <= gtol
        f_flat = (f_old - f_out) <= ftol * jnp.maximum(
            jnp.maximum(jnp.abs(f_old), jnp.abs(f_out)), 1.0
        )
        f_flat = jnp.logical_and(f_flat, ok)  # only count real steps
        converged = jnp.logical_or(g_small, f_flat)
        k = st["k"] + 1
        stop = jnp.logical_or(
            converged, jnp.logical_or(k >= max_iters, jnp.logical_not(ok))
        )

        return {
            "x": x_out,
            "f": f_out,
            "g": g_out,
            "s": s_hist,
            "y": y_hist,
            "rho": rho_hist,
            "count": new_count,
            "head": new_head,
            "gamma": gamma,
            "k": k,
            "evals": st["evals"] + ls_evals,
            "stop": stop,
            "converged": converged,
        }

    # handle an already-converged start
    state["stop"] = jnp.max(jnp.abs(g0)) <= gtol
    state["converged"] = state["stop"]

    out = lax.while_loop(cond, body, state)
    return LBFGSResult(
        x=out["x"],
        f=out["f"],
        g=out["g"],
        n_iters=out["k"],
        n_evals=out["evals"],
        converged=out["converged"],
    )


def lbfgs_minimize_pytree(
    loss_fn: Callable,
    params,
    max_iters: int = 5000,
    history: int = 50,
    ftol: float = 1e-7,
    gtol: float = 1e-5,
    max_ls: int = 50,
):
    """Pytree front-end: flattens params, minimizes, unflattens.

    loss_fn takes the params pytree and returns a scalar. Frozen leaves should
    be excluded by the caller (or carry zero gradients via stop_gradient).
    """
    x0, unravel = ravel_pytree(params)
    res = lbfgs_minimize(
        lambda x: loss_fn(unravel(x)),
        x0,
        max_iters=max_iters,
        history=history,
        ftol=ftol,
        gtol=gtol,
        max_ls=max_ls,
    )
    return unravel(res.x), res
