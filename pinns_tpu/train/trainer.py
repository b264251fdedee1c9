"""The training core: one fused XLA program per step, scanned into chunks.

Contrast with the reference hot loop (``Abgrall_ADMM.py:200-252``), which per
epoch runs >=4 host->device round-trips (Adam op, z update, gamma update, loss
fetch — each re-evaluating the residual graph) plus host-side numpy resampling
through feed_dict. Here ONE jitted step does
  sample -> forward+residual (Taylor-mode) -> grads -> optimizer update ->
  ADMM z/dual updates -> metrics
and ``lax.scan`` fuses `train.chunk` steps into a single device call, so the
host touches the device a few times per thousand epochs.

The hybrid schedule (Adam for epoch <= switch, then L-BFGS per outer epoch,
``Abgrall_ADMM.py:210-217``) compiles as two programs; the L-BFGS phase runs
the full inner solve on device (``pinns_tpu.opt.lbfgs``).

ADMM/resampling semantics follow the reference: the weight update uses the
CURRENT collocation batch, points are then resampled, and the z/dual updates
evaluate residuals at the NEW points (``Abgrall_ADMM.py:220-226``) — see
``pinns_tpu.losses.admm`` for discussion.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pinns_tpu.config import Experiment
from pinns_tpu.data.datasets import (
    GridDataset,
    build_ic_bc_training_set,
    ic_bc_candidates,
    interior_training_set,
    load_burgers_mat,
    load_euler_mat,
)
from pinns_tpu.data.sampling import (
    latin_hypercube,
    scale_to_bounds,
    uniform_box,
)
from pinns_tpu.losses.admm import (
    ADMMState,
    admm_init,
    admm_misfit,
    admm_penalty,
    admm_update,
)
from pinns_tpu.losses.misfit import (
    causal_residual_penalty,
    data_misfit,
    residual_penalty,
)
from pinns_tpu.models.mlp import MLPSpec, fourier_matrix, init_mlp, mlp_apply
from pinns_tpu.opt.lbfgs import lbfgs_minimize
from pinns_tpu.ops.residuals import (
    burgers_residual_aux,
    euler_entropy_production,
    euler_residuals_aux,
)
from pinns_tpu.ops.weakform import (
    burgers_flux_residual,
    euler_flux_residuals,
)
from pinns_tpu.train import checkpoint as ckpt_io
from pinns_tpu.train.evaluate import predict_fields, relative_l2
from pinns_tpu.train.metrics import MetricsLogger

EULER_FIELDS = ("rho", "u", "E")


class TrainState(NamedTuple):
    params: Any  # {'net': [...], 'coeffs': {'lambda1','lambda2'}}
    opt_state: Any
    admm: Optional[ADMMState]
    colloc: jnp.ndarray
    key: jax.Array
    epoch: jnp.ndarray  # int32 scalar
    # Optional per-run ADMM penalty override (scalar array). None -> the
    # static exp.loss.rho. Carried in the state so vmapped ensembles can
    # sweep rho — the reference's main sweep axis (scheduler.py:146-150) —
    # inside ONE program.
    rho: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class Problem:
    """An Experiment bound to its dataset and device-resident training data."""

    exp: Experiment
    dataset: GridDataset
    spec: MLPSpec
    x_data: jnp.ndarray  # (N_u, 2)
    targets: Dict[str, jnp.ndarray]  # field -> (N_u, 1)
    # When set (pinns_tpu.parallel.sharding), on-device resampling is
    # constrained to generate the collocation batch directly in its
    # data-parallel layout — no gather, no host round-trip.
    colloc_sharding: Any = None

    @property
    def lb(self):
        return self.dataset.lb

    @property
    def ub(self):
        return self.dataset.ub

    def effective_coeffs(self, params) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(lambda1, lambda2) with the freeze / transform policy applied."""
        coeffs = params["coeffs"]
        if not self.exp.pde.train_coeffs:
            coeffs = jax.lax.stop_gradient(coeffs)
        lam1 = coeffs["lambda1"]
        lam2 = coeffs["lambda2"]
        if self.exp.pde.lambda2_transform == "exp":
            lam2 = jnp.exp(lam2)
        return lam1, lam2

    @property
    def viscous_static(self) -> bool:
        """STATIC config-level predicate: can the effective viscosity
        (pde.lambda2 slot) ever differ from zero? (The 'exp' transform maps
        any raw lambda2 to exp(.) > 0; trainable coeffs can move it.)"""
        return (
            self.exp.pde.train_coeffs
            or self.exp.pde.lambda2_transform == "exp"
            or self.exp.pde.lambda2 != 0.0
        )

    def residuals_and_entropy(self, params, colloc, want_entropy: bool):
        """(residuals, per-point entropy_sq or None) from ONE Taylor pass.

        With loss.grad_weight_kappa > 0 the residual field is the
        gradient-weighted w*f, w = 1/(1 + kappa*s^2) with a stop-gradiented
        shock indicator s (u_x for Burgers, |(rho_x, u_x)| for Euler) — so
        every consumer (penalty, ADMM prox/dual updates, misfit monitor)
        regularizes the same weighted field. The entropy term (requested
        only when loss.entropy_weight > 0) is the squared admissibility
        violation: Burgers relu(U_t + F_x)^2 for U = u^2/2,
        F = lambda1 u^3/3 — corrected for viscosity when lambda2 can be
        nonzero: exact viscous solutions satisfy
        U_t + F_x - lambda2 (u u_x)_x = -lambda2 u_x^2 <= 0, so the
        violation is relu(u f - lambda2 u_x^2) (pinned on a manufactured
        viscous shock in tests/test_entropy_viscous.py). Euler:
        relu(-(S_t + u S_x))^2 for the physical entropy
        S = log p - gamma log rho. Both reuse the streams the residual
        already computed — no second derivative sweep.
        """
        kappa = self.exp.loss.grad_weight_kappa
        if self.exp.pde.kind == "burgers":
            lam1, lam2 = self.effective_coeffs(params)
            u, f, u_x, u_t = burgers_residual_aux(
                self.spec, params["net"], colloc, lam1, lam2
            )
            ent = None
            if want_entropy:
                if self.viscous_static:
                    # u f = U_t + F_x - lambda2 u u_xx; subtracting
                    # lambda2 u_x^2 completes -lambda2 (u u_x)_x, the
                    # viscous entropy balance (zero on exact solutions).
                    e = u * f - lam2 * u_x * u_x
                else:
                    e = u * u_t + lam1 * u * u * u_x
                ent = jnp.maximum(e, 0.0) ** 2
            if kappa > 0.0:
                s2 = jax.lax.stop_gradient(u_x) ** 2
                f = f / (1.0 + kappa * s2)
            return f, ent
        (rho, u, e), residuals, (y_x, y_t) = euler_residuals_aux(
            self.spec, params["net"], colloc, self.exp.pde.gamma
        )
        ent = None
        if want_entropy:
            y = jnp.concatenate([rho, u, e], axis=1)
            d = euler_entropy_production(y, y_x, y_t, self.exp.pde.gamma)
            ent = jnp.maximum(-d, 0.0) ** 2
        if kappa > 0.0:
            s2 = jax.lax.stop_gradient(y_x[:, 0:1]) ** 2 + (
                jax.lax.stop_gradient(y_x[:, 1:2]) ** 2
            )
            w = 1.0 / (1.0 + kappa * s2)
            residuals = tuple(w * fi for fi in residuals)
        return residuals, ent

    def residuals(self, params, colloc):
        """PDE residual(s) at collocation points: array (Burgers) or tuple
        (see residuals_and_entropy for the gradient-weighting semantics)."""
        return self.residuals_and_entropy(params, colloc, False)[0]

    def flux_residuals_and_entropy(self, params, centers, want_entropy: bool,
                                   scale: float = 1.0):
        """Weak-form control-volume residuals at cell centers, plus the
        weak entropy-inequality violation (loss.residual_kind='flux';
        ops/weakform.py). Inviscid Burgers and Euler cells are pure forward
        evaluations — no derivatives anywhere near a front.

        ``scale`` multiplies the configured cell half-widths: >1 gives
        COARSE control volumes, whose cell-mean conservation defect sees
        displacement-scale errors (a misplaced shock) that pointwise or
        fine-cell residuals underweight — the basis of the multi-scale
        truth-free selection diagnostic (parallel/ensemble.py
        ``selection_scores(coarse_scales=...)``). Works regardless of the
        TRAINED residual kind: weak cells only need the net + PDE
        coefficients."""
        cfg = self.exp.loss
        hx = cfg.flux_dx_frac * float(self.ub[0] - self.lb[0])
        ht = cfg.flux_dt_frac * float(self.ub[1] - self.lb[1])
        if scale != 1.0:  # guarded so default-config HLO stays bit-identical
            hx, ht = hx * scale, ht * scale
        if cfg.strong_equations and self.exp.pde.kind != "euler":
            raise ValueError(
                "loss.strong_equations is the Euler mixed formulation; "
                "Burgers has a single equation"
            )
        if self.exp.pde.kind == "burgers":
            lam1, lam2 = self.effective_coeffs(params)
            return burgers_flux_residual(
                self.spec, params["net"], centers, lam1, lam2,
                hx, ht, cfg.flux_quad, want_entropy, self.viscous_static,
            )
        # Euler artificial viscosity rides the lambda2 coefficient slot —
        # same freeze/exp-transform/identification machinery as Burgers
        _, visc = self.effective_coeffs(params)
        viscous = self.viscous_static
        rs, ent = euler_flux_residuals(
            self.spec, params["net"], centers, self.exp.pde.gamma,
            hx, ht, cfg.flux_quad, want_entropy, visc, viscous,
        )
        if cfg.strong_equations:
            # Mixed formulation (loss.strong_equations): selected equations
            # use the strong pointwise residual at the SAME points — one
            # extra Taylor-1 pass at the N centers, shared by all selected
            # equations. Scale-consistent with the cell means in the smooth
            # limit (tests/test_weakform.py).
            if any(i not in (0, 1, 2) for i in cfg.strong_equations):
                raise ValueError(
                    "loss.strong_equations indices must be in {0, 1, 2} "
                    "(mass, momentum, energy)"
                )
            strong, _ = self.residuals_and_entropy(params, centers, False)
            rs = tuple(
                strong[i] if i in cfg.strong_equations else rs[i]
                for i in range(3)
            )
        return rs, ent

    def entropy_sq(self, params, colloc):
        """Per-point squared entropy-admissibility violation (see
        residuals_and_entropy)."""
        return self.residuals_and_entropy(params, colloc, True)[1]

    @property
    def admm_flux(self) -> bool:
        """ADMM regularizes the weak-form flux residual (loss.admm_form)."""
        if self.exp.loss.admm_form not in ("strong", "flux"):
            raise ValueError(
                f"unknown loss.admm_form {self.exp.loss.admm_form!r} "
                "(expected 'strong' or 'flux')"
            )
        return (
            self.exp.loss.residual_kind == "admm"
            and self.exp.loss.admm_form == "flux"
        )

    def training_residuals(self, params, pts):
        """Residuals of the TRAINED objective at pts: weak-form cells when
        the training loss is weak-form (flux / admm_form='flux'), else the
        strong form — the consistent field for residual-driven machinery
        (RAD importance scoring, ADMM state)."""
        if self.exp.loss.residual_kind == "flux" or self.admm_flux:
            return self.flux_residuals_and_entropy(params, pts, False)[0]
        return self.residuals_chunked(params, pts)

    def residuals_chunked(self, params, colloc):
        """Residuals over the full batch, evaluated microbatch-by-microbatch
        (lax.map) so peak activation memory is n_f/microbatch — used by the
        ADMM updates at large n_f."""
        m = self.exp.sampling.microbatch
        if m <= 1:
            return self.residuals(params, colloc)
        n = colloc.shape[0]
        chunks = colloc.reshape(m, n // m, colloc.shape[1])
        out = jax.lax.map(lambda ch: self.residuals(params, ch), chunks)
        return jax.tree_util.tree_map(
            lambda f: f.reshape(n, *f.shape[2:]), out
        )


def build_problem(exp: Experiment) -> Problem:
    """Load the dataset and construct the supervised training set."""
    if exp.pde.kind == "euler":
        ds = load_euler_mat(exp.data.dataset)
    else:
        ds = load_burgers_mat(exp.data.dataset)

    if exp.data.selection == "interior":
        x_data, targets = interior_training_set(
            ds, exp.data.n_u, seed=exp.data.seed, noise=exp.data.noise
        )
    else:
        x_data, targets = build_ic_bc_training_set(
            ds, exp.data.n_u, seed=exp.data.seed, noise=exp.data.noise
        )

    dtype = jnp.dtype(exp.model.dtype)
    fourier = ()
    if exp.model.n_fourier > 0:
        fourier = fourier_matrix(
            exp.model.n_fourier,
            in_dim=exp.model.layers[0],
            sigma=exp.model.fourier_sigma,
            seed=exp.model.fourier_seed,
        )
    spec = MLPSpec(
        layers=exp.model.layers,
        lb=tuple(float(v) for v in ds.lb),
        ub=tuple(float(v) for v in ds.ub),
        dtype=dtype,
        precision=exp.model.precision,
        compute_dtype=exp.model.compute_dtype or None,
        keep_streams=exp.model.keep_streams,
        mixed_elementwise=exp.model.mixed_elementwise,
        fourier=fourier,
        n_paths=exp.model.n_paths,
        path_degree=exp.model.path_degree,
        path_sharpness=exp.model.path_sharpness,
    )
    return Problem(
        exp=exp,
        dataset=ds,
        spec=spec,
        x_data=jnp.asarray(x_data, dtype),
        targets={k: jnp.asarray(v, dtype) for k, v in targets.items()},
    )


def _curriculum_bounds(problem: Problem, epoch):
    """(lb, ub) with the time-marching curriculum applied: the sampled
    t-range grows linearly to the full domain over t_curriculum_epochs."""
    cfg = problem.exp.sampling
    lb = jnp.asarray(problem.lb, problem.spec.dtype)
    ub = jnp.asarray(problem.ub, problem.spec.dtype)
    if cfg.t_curriculum_epochs <= 0:
        return lb, ub
    frac = jnp.clip(
        (jnp.asarray(epoch, problem.spec.dtype) + 1.0)
        / cfg.t_curriculum_epochs,
        cfg.t_curriculum_floor,
        1.0,
    )
    return lb, ub.at[1].set(lb[1] + (ub[1] - lb[1]) * frac)


def _resample(problem: Problem, key: jax.Array, epoch) -> jnp.ndarray:
    """Fresh uniform collocation batch (curriculum-aware, sharded layout)."""
    lb, ub = _curriculum_bounds(problem, epoch)
    colloc = uniform_box(
        key, problem.exp.sampling.n_f, lb, ub, problem.spec.dtype
    )
    if problem.colloc_sharding is not None:
        colloc = jax.lax.with_sharding_constraint(
            colloc, problem.colloc_sharding
        )
    return colloc


def init_collocation(problem: Problem, key: jax.Array) -> jnp.ndarray:
    """Initial collocation set per the configured strategy."""
    exp = problem.exp
    n_f, strategy = exp.sampling.n_f, exp.sampling.strategy
    if strategy == "resample_uniform":
        return _resample(problem, key, 0)
    if strategy == "rad":
        # starts uniform (curriculum- and sharding-aware, like
        # resample_uniform); the Trainer re-draws it at chunk boundaries by
        # residual-importance sampling (Trainer._get_rad_resample)
        return _resample(problem, key, 0)
    if strategy == "fixed_uniform":
        return uniform_box(key, n_f, problem.lb, problem.ub, problem.spec.dtype)
    if strategy == "fixed_lhs":
        unit = latin_hypercube(key, n_f, 2, problem.spec.dtype)
        return scale_to_bounds(unit, problem.lb, problem.ub)
    if strategy == "fixed_lhs_anchored":
        # the reference anchors the FULL IC/BC candidate stack, not the N_u
        # subsample (Hwan_L2Regularization_Burgers.py:179-184)
        unit = latin_hypercube(key, n_f, 2, problem.spec.dtype)
        pts = scale_to_bounds(unit, problem.lb, problem.ub)
        anchors = jnp.asarray(
            ic_bc_candidates(problem.dataset), problem.spec.dtype
        )
        return jnp.concatenate([pts, anchors], axis=0)
    raise ValueError(f"unknown sampling strategy: {strategy!r}")


def _residual_term(problem: Problem, params, colloc, admm_state, rho=None):
    """Residual loss term, optionally accumulated over rematerialized
    microbatches so activation memory stays at n_f/microbatch scale."""
    exp = problem.exp
    cfg = exp.loss
    # Norm penalties normalize by the ACTUAL residual row count — equal to
    # sampling.n_f except under 'fixed_lhs_anchored', where the stacked
    # anchors enlarge the batch; this matches the ADMM threshold convention
    # (N_r = x_f.shape[0]) used below.
    n_f = colloc.shape[0]
    m = exp.sampling.microbatch
    rho = cfg.rho if rho is None else rho
    ew = cfg.entropy_weight
    if cfg.causal_eps > 0.0 and (
        cfg.residual_kind not in ("mean_sq", "flux") or m > 1
    ):
        raise ValueError(
            "loss.causal_eps requires residual_kind='mean_sq' or 'flux' and "
            "sampling.microbatch=1 (the weights need the whole batch's "
            "time-bin losses in one pass)"
        )

    use_flux = cfg.residual_kind == "flux" or problem.admm_flux
    if use_flux and m > 1:
        raise ValueError(
            "weak-form residuals (residual_kind='flux' / admm_form='flux') "
            "do not support microbatching yet"
        )
    if use_flux and cfg.grad_weight_kappa > 0.0:
        raise ValueError(
            "grad_weight_kappa is a strong-form pointwise knob; it does "
            "not apply to the weak-form residuals"
        )

    if m <= 1:
        if use_flux:
            residuals, ent = problem.flux_residuals_and_entropy(
                params, colloc, ew > 0.0
            )
        else:
            residuals, ent = problem.residuals_and_entropy(
                params, colloc, ew > 0.0
            )
        if cfg.residual_kind == "admm":
            term = admm_penalty(residuals, admm_state, rho, cfg.explicit_inner)
        elif cfg.causal_eps > 0.0:
            term, _ = causal_residual_penalty(
                residuals,
                colloc[:, 1],
                problem.lb[1],
                problem.ub[1],
                cfg.causal_eps,
                cfg.causal_bins,
                relative=cfg.causal_relative,
            )
        else:
            # the weak-form cell residual takes the plain mean-square
            pkind = "mean_sq" if cfg.residual_kind == "flux" else cfg.residual_kind
            if isinstance(residuals, tuple):
                term = sum(residual_penalty(f, pkind, n_f) for f in residuals)
            else:
                term = residual_penalty(residuals, pkind, n_f)
        if ew > 0.0:
            term = term + ew * jnp.sum(ent) / n_f
        return term

    n = colloc.shape[0]
    if n % m:
        raise ValueError(f"collocation count {n} not divisible by microbatch {m}")
    chunks = colloc.reshape(m, n // m, colloc.shape[1])
    dtype = problem.spec.dtype

    mb_remat = exp.sampling.microbatch_remat
    mb_unroll = exp.sampling.microbatch_unroll

    def _wrap(body):
        # identical math under every policy — only what the backward pass
        # recomputes vs reloads changes (measured frontier: BASELINE.md)
        if mb_remat == "none":
            return body
        if mb_remat == "dots":
            return jax.checkpoint(
                body, policy=jax.checkpoint_policies.dots_saveable
            )
        if mb_remat != "full":
            raise ValueError(
                f"unknown sampling.microbatch_remat: {mb_remat!r} "
                "(expected 'full' | 'dots' | 'none')"
            )
        return jax.checkpoint(body)

    if cfg.residual_kind == "admm":
        # the augmented-Lagrangian penalty is additive over points
        st_chunks = jax.tree_util.tree_map(
            lambda a: a.reshape(m, n // m, *a.shape[1:]), admm_state
        )

        def body(acc, xs):
            ch, st = xs
            f, ent = problem.residuals_and_entropy(params, ch, ew > 0.0)
            pen = admm_penalty(f, st, rho, cfg.explicit_inner)
            if ew > 0.0:
                pen = pen + ew * jnp.sum(ent) / n_f
            return acc + pen, None

        term, _ = jax.lax.scan(
            _wrap(body), jnp.zeros((), dtype), (chunks, st_chunks),
            unroll=mb_unroll,
        )
        return term

    # accumulate the primitive sums (sum f^2, sum |f|) per residual component;
    # norms that are nonlinear in the batch (l1_sq) assemble afterwards
    n_comp = 3 if exp.pde.kind == "euler" else 1
    zero = jnp.zeros((), dtype)
    init = (tuple((zero, zero) for _ in range(n_comp)), zero)

    def body(acc, ch):
        comp_acc, ent_acc = acc
        f, ent = problem.residuals_and_entropy(params, ch, ew > 0.0)
        fs = f if isinstance(f, tuple) else (f,)
        new = tuple(
            (a0 + jnp.sum(fi * fi), a1 + jnp.sum(jnp.abs(fi)))
            for (a0, a1), fi in zip(comp_acc, fs)
        )
        if ew > 0.0:
            ent_acc = ent_acc + jnp.sum(ent)
        return (new, ent_acc), None

    (accs, ent_sum), _ = jax.lax.scan(
        _wrap(body), init, chunks, unroll=mb_unroll
    )
    term = ew * ent_sum / n_f if ew > 0.0 else jnp.zeros((), dtype)
    for ssq, sabs in accs:
        if cfg.residual_kind == "mean_sq":
            term = term + ssq / n
        elif cfg.residual_kind == "l2_sq_norm":
            term = term + ssq / n_f
        elif cfg.residual_kind == "l1_sq_norm":
            term = term + sabs * sabs / n_f
        else:
            raise ValueError(f"unknown residual kind {cfg.residual_kind!r}")
    return term


def make_data_term(problem: Problem):
    """The data-misfit term of the training loss as a standalone
    ``params -> scalar`` callable — shared by the loss and by
    ground-truth-free model selection
    (:func:`pinns_tpu.parallel.ensemble.selection_scores`), so the selector
    scores exactly the misfit the members trained on."""
    exp = problem.exp
    spec = problem.spec
    n_u = exp.data.n_u
    loss_cfg = exp.loss
    field_w = loss_cfg.data_field_weights

    if exp.pde.kind == "burgers":

        def term(params):
            u_pred = mlp_apply(spec, params["net"], problem.x_data)
            return data_misfit(
                u_pred, problem.targets["u"], loss_cfg.data_kind, n_u
            )

    else:

        def term(params):
            y = mlp_apply(spec, params["net"], problem.x_data)
            return sum(
                (field_w[i] if field_w else 1.0)
                * data_misfit(
                    y[:, i : i + 1],
                    problem.targets[name],
                    loss_cfg.data_kind,
                    n_u,
                )
                for i, name in enumerate(EULER_FIELDS)
            )

    return term


def make_loss_fn(problem: Problem):
    """loss(params, colloc, admm) -> (scalar, aux-metrics dict)."""
    exp = problem.exp
    spec = problem.spec
    n_u = exp.data.n_u
    loss_cfg = exp.loss
    if loss_cfg.residual_weight != 1.0 and loss_cfg.residual_kind == "admm":
        raise ValueError(
            "residual_weight must be 1 with residual_kind='admm' — scale the "
            "penalty with loss.rho instead (the prox threshold tracks rho)"
        )
    if loss_cfg.grad_weight_kappa < 0.0:
        raise ValueError("grad_weight_kappa must be >= 0")
    field_w = loss_cfg.data_field_weights
    if field_w and exp.pde.kind != "euler":
        raise ValueError(
            "data_field_weights applies to the multi-output Euler system; "
            "for Burgers use loss.data_weight"
        )
    if field_w and len(field_w) != len(EULER_FIELDS):
        raise ValueError(
            f"data_field_weights needs {len(EULER_FIELDS)} entries, "
            f"got {len(field_w)}"
        )

    dterm = make_data_term(problem)

    def loss_fn(params, colloc, admm_state, rho=None):
        if exp.pde.kind == "burgers":
            lam1, lam2 = problem.effective_coeffs(params)
        else:
            lam1 = jnp.zeros((1,), spec.dtype)
            lam2 = jnp.zeros((1,), spec.dtype)
        data_term = dterm(params)

        res_term = _residual_term(problem, params, colloc, admm_state, rho)
        loss = loss_cfg.data_weight * data_term + (
            loss_cfg.residual_weight * res_term
        )
        aux = {
            "loss": loss,
            "data_term": data_term,
            # logged as the weighted loss CONTRIBUTION so the decomposition
            # loss = data_weight*data_term + res_term is additive and
            # consistent with the L-BFGS-phase metric (which reconstructs it
            # as loss - data_weight*data_term). The conditional skips the
            # no-op mul at the default weight, keeping the jitted step's HLO
            # (and hence the persistent compile cache) identical for every
            # default config.
            "res_term": (
                res_term
                if loss_cfg.residual_weight == 1.0
                else loss_cfg.residual_weight * res_term
            ),
            "lambda1": jnp.reshape(lam1, ()),
            "lambda2": jnp.reshape(lam2, ()),
        }
        return loss, aux

    return loss_fn


def _post_update_current(
    problem: Problem, params, admm_state, colloc, key, rho, epoch=0
):
    """'current'-points ADMM tail: z/dual update at the batch the weight step
    saw (textbook splitting; one residual evaluation per step), THEN resample
    for the next step."""
    exp = problem.exp
    rho_val = exp.loss.rho if rho is None else rho
    f_cur = problem.training_residuals(params, colloc)
    admm_state = admm_update(f_cur, admm_state, rho_val, colloc.shape[0])
    mis = admm_misfit(f_cur, admm_state)
    if exp.sampling.strategy == "resample_uniform":
        key, sub = jax.random.split(key)
        colloc = _resample(problem, sub, epoch)
    return admm_state, colloc, key, mis


def _post_update(
    problem: Problem, params, admm_state, colloc, key, rho=None, epoch=0
):
    """Shared tail of every step: resample, then ADMM updates at new points."""
    exp = problem.exp
    if exp.sampling.strategy == "resample_uniform":
        key, sub = jax.random.split(key)
        colloc = _resample(problem, sub, epoch)
    mis = jnp.zeros((), problem.spec.dtype)
    if exp.loss.residual_kind == "admm":
        rho_val = exp.loss.rho if rho is None else rho
        f_new = problem.training_residuals(params, colloc)
        # threshold normalizer = ACTUAL residual row count (anchored sets are
        # larger than sampling.n_f; reference uses N_r = x_f.shape[0],
        # Hwan_L1Regularization_ADMM_Burgers.py:56,93)
        admm_state = admm_update(
            f_new, admm_state, rho_val, colloc.shape[0]
        )
        mis = admm_misfit(f_new, admm_state)
    return admm_state, colloc, key, mis


def make_adam_step(problem: Problem, optimizer):
    """One fused Adam epoch: grad step -> resample -> ADMM updates."""
    loss_fn = make_loss_fn(problem)

    def step(state: TrainState):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.colloc, state.admm, state.rho
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        tail = (
            _post_update_current
            if problem.exp.loss.residual_kind == "admm"
            and problem.exp.loss.admm_update_points == "current"
            else _post_update
        )
        admm_state, colloc, key, mis = tail(
            problem, params, state.admm, state.colloc, state.key, state.rho,
            state.epoch,
        )
        metrics = dict(aux, admm_misfit=mis, lbfgs_iters=jnp.zeros((), jnp.int32))
        return (
            TrainState(
                params=params,
                opt_state=opt_state,
                admm=admm_state,
                colloc=colloc,
                key=key,
                epoch=state.epoch + 1,
                rho=state.rho,
            ),
            metrics,
        )

    return step


def make_lbfgs_step(problem: Problem):
    """One outer epoch of the L-BFGS phase: full inner solve on device,
    then the same resample/ADMM tail. Mirrors ``Abgrall_ADMM.py:216-226``."""
    loss_fn = make_loss_fn(problem)
    cfg = problem.exp.optimizer.lbfgs

    def step(state: TrainState):
        from jax.flatten_util import ravel_pytree

        x0, unravel = ravel_pytree(state.params)
        res = lbfgs_minimize(
            lambda x: loss_fn(unravel(x), state.colloc, state.admm, state.rho)[0],
            x0,
            max_iters=cfg.max_iters,
            history=cfg.history,
            ftol=cfg.ftol,
            gtol=cfg.gtol,
            max_ls=cfg.max_ls,
        )
        params = unravel(res.x)
        # rebuild aux from the solver's own final value: the data term is a
        # cheap n_u-point forward; res_term = f - data (avoids re-running the
        # full n_f-point residual pass just for metrics)
        lam1, lam2 = problem.effective_coeffs(params)
        if problem.exp.pde.kind == "burgers":
            u_pred = mlp_apply(problem.spec, params["net"], problem.x_data)
            data_term = data_misfit(
                u_pred, problem.targets["u"], problem.exp.loss.data_kind,
                problem.exp.data.n_u,
            )
        else:
            fw = problem.exp.loss.data_field_weights
            y = mlp_apply(problem.spec, params["net"], problem.x_data)
            data_term = sum(
                (fw[i] if fw else 1.0)
                * data_misfit(
                    y[:, i : i + 1], problem.targets[name],
                    problem.exp.loss.data_kind, problem.exp.data.n_u,
                )
                for i, name in enumerate(EULER_FIELDS)
            )
        aux = {
            "loss": res.f,
            "data_term": data_term,
            "res_term": res.f - problem.exp.loss.data_weight * data_term,
            "lambda1": jnp.reshape(lam1, ()),
            "lambda2": jnp.reshape(lam2, ()),
        }
        admm_state, colloc, key, mis = _post_update(
            problem, params, state.admm, state.colloc, state.key, state.rho,
            state.epoch,
        )
        metrics = dict(aux, admm_misfit=mis, lbfgs_iters=res.n_iters)
        return (
            TrainState(
                params=params,
                opt_state=state.opt_state,
                admm=admm_state,
                colloc=colloc,
                key=key,
                epoch=state.epoch + 1,
                rho=state.rho,
            ),
            metrics,
        )

    return step


def _make_optimizer(cfg):
    """optax Adam with the configured LR schedule (constant matches the
    reference's fixed AdamOptimizer(0.001))."""
    if cfg.lr_schedule == "constant":
        lr = cfg.learning_rate
    elif cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.schedule_epochs,
            alpha=cfg.min_lr_fraction,
        )
    elif cfg.lr_schedule == "exponential":
        lr = optax.exponential_decay(
            cfg.learning_rate, cfg.schedule_epochs, 0.1
        )
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    return optax.adam(lr)


def resolve_scan_unroll(exp, phase: str, length: int) -> int:
    """Resolve TrainConfig.scan_unroll (0 = auto) for one chunk program.

    Auto unrolls only Adam chunks of production length: small-per-step-work
    configs are op-issue-bound (see TrainConfig.scan_unroll), but unrolling
    multiplies the scan body at trace/compile time, so short chunks (tests,
    tails) keep unroll=1 — their cost is compile, not issue. Narrow nets get
    8 (measured 76.4 -> 56.6 us canonical); wide trunks at small batches are
    still partially issue-bound and get 4 (measured 294 -> 255 us on the
    Euler 5x200 config at n_f=1000); large-batch wide configs (the 1M-pt
    scale preset) are compute/HBM-bound and keep 1.
    """
    unroll = exp.train.scan_unroll
    if unroll == 0:
        unroll = 1
        if phase == "adam" and length >= 200:
            if max(exp.model.layers) <= 64:
                unroll = 8
            elif exp.sampling.n_f <= 2048:
                unroll = 4
    return max(1, min(unroll, length))


def make_chunked(step_fn, chunk: int, unroll: int = 1):
    """scan `chunk` steps into one device call; returns (state, stacked metrics).

    The input state is donated — the step rewrites every leaf, so XLA updates
    params/opt/ADMM buffers in place instead of allocating fresh ones each
    chunk (matters at 1M-point collocation/z buffers). Per-step metrics are
    packed into ONE array inside the scan (profiling showed one
    dynamic_update_slice per metric per step — 7 of the ~167 device ops each
    step were metric bookkeeping) and unpacked into the dict after the scan.
    """
    probe_metrics = None

    def chunk_fn(state, _):
        nonlocal probe_metrics
        state, metrics = step_fn(state)
        keys = sorted(metrics)
        if probe_metrics is None:
            probe_metrics = keys
        elif keys != probe_metrics:  # guard against silent mislabeling if a
            # retrace ever returned a different metric set
            raise RuntimeError(
                f"step metric keys changed between traces: {probe_metrics} "
                f"-> {keys}"
            )
        packed = jnp.stack([metrics[k].astype(jnp.float32) for k in keys])
        return state, packed

    def run(state):
        state, packed = jax.lax.scan(
            chunk_fn, state, None, length=chunk,
            unroll=min(unroll, chunk) if unroll > 1 else 1,
        )
        return state, {k: packed[:, i] for i, k in enumerate(probe_metrics)}

    return jax.jit(run, donate_argnums=0)


def _cpu_machine_key() -> str:
    """Fingerprint of this host's CPU features. XLA:CPU caches AOT machine
    code; loading artifacts compiled on a different machine type logs
    'could lead to execution errors such as SIGILL' — so CPU cache dirs are
    keyed per machine (TPU programs are target-keyed by XLA itself)."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine()


def enable_compilation_cache(path: str = "") -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    First compiles cost 20-150 s on remote-compile TPU paths; the cache makes
    every later process with the same program shape start instantly. On the
    CPU backend the cache is additionally keyed by a machine fingerprint
    (see _cpu_machine_key); the TPU cache path stays stable because its
    cached programs are load-bearing on the remote-compile relay.
    """
    import os

    if not path and getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # respect an explicit prior setting (e.g. the dryrun's)
    cache_dir = path or os.path.join(
        os.path.expanduser("~"), ".cache", "pinns_tpu_xla_cache"
    )
    if not path and getattr(jax.config, "jax_platforms", None) == "cpu":
        cache_dir = os.path.join(cache_dir, "cpu-" + _cpu_machine_key())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without these knobs
        pass


class Trainer:
    """End-to-end training orchestrator (host side).

    Responsibilities the reference spreads across ``train`` / ``run_NN`` /
    ``record_data`` / ``save_data`` (``Abgrall_ADMM.py:200-252, 311-319,
    400-409``): chunked stepping, metric logging, prediction snapshots,
    checkpoints, final rel-L2 evaluation.
    """

    def __init__(self, exp: Experiment, problem: Optional[Problem] = None):
        enable_compilation_cache()
        self.exp = exp
        self.problem = problem if problem is not None else build_problem(exp)
        self.optimizer = _make_optimizer(exp.optimizer)
        self._adam_step = make_adam_step(self.problem, self.optimizer)
        self._lbfgs_step = make_lbfgs_step(self.problem)
        self._chunks: Dict[Tuple[str, int], Any] = {}
        self.logger = MetricsLogger(
            out_dir=exp.train.out_dir or None, name=exp.name
        )
        self._predict = jax.jit(
            lambda params, x: predict_fields(self.problem, params, x)
        )
        # populated by train() when TrainConfig.swa_frac > 0: the uniform
        # tail average of the parameters, cast back to the working dtype
        self.swa_params = None
        self._swa_init = self._swa_accum = None

    # -- state ------------------------------------------------------------
    def init_state(
        self, seed: Optional[int] = None, rho: Optional[float] = None
    ) -> TrainState:
        exp = self.exp
        key = jax.random.key(exp.train.seed if seed is None else seed)
        k_net, k_colloc, k_run = jax.random.split(key, 3)
        dtype = self.problem.spec.dtype
        params = {
            "net": init_mlp(k_net, self.problem.spec),
            "coeffs": {
                "lambda1": jnp.full((1,), exp.pde.lambda1, dtype),
                "lambda2": jnp.full((1,), exp.pde.lambda2, dtype),
            },
        }
        colloc = init_collocation(self.problem, k_colloc)
        admm_state = None
        if exp.loss.residual_kind == "admm":
            # z = r(w_0) at the initial collocation set, dual = 1
            # (Abgrall_ADMM.py:92-97)
            f0 = self.problem.training_residuals(params, colloc)
            admm_state = admm_init(f0)
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            admm=admm_state,
            colloc=colloc,
            key=k_run,
            epoch=jnp.zeros((), jnp.int32),
            rho=None if rho is None else jnp.asarray(rho, dtype),
        )

    # -- stepping ---------------------------------------------------------
    def _phase(self, epoch: int) -> str:
        opt = self.exp.optimizer
        if opt.kind == "adam":
            return "adam"
        if opt.kind == "lbfgs":
            return "lbfgs"
        return "adam" if epoch < opt.switch_epoch else "lbfgs"

    def _get_chunk(self, phase: str, length: int):
        key = (phase, length)
        if key not in self._chunks:
            step = self._adam_step if phase == "adam" else self._lbfgs_step
            unroll = resolve_scan_unroll(self.exp, phase, length)
            self._chunks[key] = make_chunked(step, length, unroll=unroll)
        return self._chunks[key]

    def _get_rad_resample(self):
        """Jitted RAD re-draw (SamplingConfig strategy='rad'): importance-
        sample n_f points from a fresh uniform pool with
        p ∝ |f|^k / mean(|f|^k) + c (sum of |components| for systems); with
        ADMM, z/dual re-initialize at the new points (the reference's init
        semantics, Hwan_L1Regularization_ADMM_Burgers.py:113-115)."""
        if not hasattr(self, "_rad_fn"):
            problem = self.problem
            cfg = self.exp.sampling
            m_pool = cfg.rad_pool_factor * cfg.n_f

            def one(params, pts):
                # score with the TRAINED objective's residual field: weak-
                # form cell residuals when training weak-form (else RAD
                # would concentrate points where the strong form blows up
                # at sharpening fronts — exactly where the weak loss is
                # near zero)
                if (
                    problem.exp.loss.residual_kind == "flux"
                    or problem.admm_flux
                ):
                    return problem.flux_residuals_and_entropy(
                        params, pts, False
                    )[0]
                return problem.residuals(params, pts)

            def pool_residuals(params, pool):
                # keep per-chunk size at the trained config's n_f/microbatch
                # bound: the pool is rad_pool_factor x larger, so it gets
                # rad_pool_factor x the chunk count
                m = cfg.microbatch * cfg.rad_pool_factor
                if m <= 1:
                    return one(params, pool)
                n = pool.shape[0]
                chunks = pool.reshape(m, n // m, pool.shape[1])
                out = jax.lax.map(lambda ch: one(params, ch), chunks)
                return jax.tree_util.tree_map(
                    lambda f: f.reshape(n, *f.shape[2:]), out
                )

            def fn(state):
                key, k1, k2 = jax.random.split(state.key, 3)
                lb, ub = _curriculum_bounds(problem, state.epoch)
                pool = uniform_box(k1, m_pool, lb, ub, problem.spec.dtype)
                f = pool_residuals(state.params, pool)
                fs = f if isinstance(f, tuple) else (f,)
                score = sum(jnp.abs(fi[:, 0]) for fi in fs)
                pk = score ** cfg.rad_k
                p = pk / (jnp.mean(pk) + 1e-12) + cfg.rad_c
                idx = jax.random.categorical(
                    k2, jnp.log(p + 1e-12), shape=(cfg.n_f,)
                )
                colloc = pool[idx]
                if problem.colloc_sharding is not None:
                    colloc = jax.lax.with_sharding_constraint(
                        colloc, problem.colloc_sharding
                    )
                admm = state.admm
                if admm is not None:
                    admm = admm_init(
                        problem.training_residuals(state.params, colloc)
                    )
                return state._replace(colloc=colloc, key=key, admm=admm)

            self._rad_fn = jax.jit(fn)
        return self._rad_fn

    def train(
        self, state: Optional[TrainState] = None, epochs: Optional[int] = None
    ):
        """Run the configured schedule; returns (state, summary dict)."""
        exp = self.exp
        if state is None:
            state = self.init_state()
        total = exp.train.epochs if epochs is None else epochs
        chunk = max(1, min(exp.train.chunk, total))
        # L-BFGS outer epochs are whole inner solves; keep device calls short
        lbfgs_chunk = max(1, min(chunk // 100 or 1, 10))
        # SWA (TrainConfig.swa_frac): uniform average of the parameters at
        # chunk boundaries inside the tail window. Runs BETWEEN device calls
        # on the already-materialized state — no change to the step HLO.
        swa_start = (
            total - int(round(exp.train.swa_frac * total))
            if exp.train.swa_frac > 0.0
            else None
        )
        swa_avg, swa_n = None, 0

        t0 = time.time()
        start_epoch = int(state.epoch)
        epoch = start_epoch
        n_chunks = 0
        profiling = False
        while epoch < total:
            phase = self._phase(epoch)
            length = chunk if phase == "adam" else lbfgs_chunk
            length = min(length, total - epoch)
            if phase == "adam" and self.exp.optimizer.kind == "hybrid":
                length = min(length, self.exp.optimizer.switch_epoch - epoch)
            run = self._get_chunk(phase, length)
            if exp.train.profile_dir and n_chunks == 1:
                jax.profiler.start_trace(exp.train.profile_dir)
                profiling = True
            state, metrics = run(state)
            if profiling:
                jax.block_until_ready(state)
                jax.profiler.stop_trace()
                profiling = False
            epoch += length
            n_chunks += 1
            # log_every <= 0 means "final chunk only" (cheap default for
            # tunneled backends where each metrics fetch is a full RPC).
            # stop_tol needs the loss every chunk (the reference checks its
            # tolerance per epoch) but must not PRINT every chunk — a hybrid
            # tail's 10-epoch L-BFGS chunks would emit thousands of lines.
            want_print = (
                epoch >= total
                or self._crossed(epoch, length, exp.train.log_every)
            )
            if want_print:
                last = self._log_chunk(epoch, phase, metrics, t0)
                t0 = time.time()
            elif exp.train.stop_tol > 0.0:
                last = {"loss": float(metrics["loss"][-1])}
            # `last` is assigned above whenever stop_tol > 0 (either branch)
            if (
                exp.train.stop_tol > 0.0
                and abs(last["loss"]) <= exp.train.stop_tol
            ):
                break
            self._maybe_snapshot(epoch, length, state)
            self._maybe_checkpoint(epoch, length, state)
            if swa_start is not None and epoch > swa_start:
                swa_avg, swa_n = self._swa_update(swa_avg, swa_n, state.params)
            if exp.sampling.strategy == "rad" and epoch < total:
                state = self._get_rad_resample()(state)

        summary = self.evaluate(state)
        summary["epochs"] = epoch
        if swa_n > 0:
            # cast the f32 accumulator back to the working dtype for the
            # prediction pass; keep it on the trainer for predict/checkpoint
            self.swa_params = jax.jit(
                lambda a, p: jax.tree_util.tree_map(
                    lambda x, y: x.astype(y.dtype), a, p
                )
            )(swa_avg, state.params)
            summary["swa_snapshots"] = swa_n
            for k, v in self.evaluate(state, params=self.swa_params).items():
                summary[f"swa_{k}"] = v
            if exp.train.out_dir:
                # a loadable state at the averaged iterate (optimizer/ADMM
                # state stay the final ones — SWA only redefines params)
                self.save_checkpoint(
                    state._replace(params=self.swa_params), tag="swa"
                )
        self.logger.write_summary(summary)
        if exp.train.out_dir:
            self.save_checkpoint(state, tag="final")
        return state, summary

    # -- reporting --------------------------------------------------------
    def _log_chunk(self, epoch, phase, metrics, t0):
        # ONE device->host transfer: per-leaf fetches cost a full RPC each on
        # tunneled backends (~0.2 s/leaf observed), which would dominate the
        # loop at large chunk rates.
        keys = sorted(metrics.keys())
        stacked = jnp.stack(
            [metrics[k][-1].astype(jnp.float32) for k in keys]
        )
        values = np.asarray(stacked)  # blocks until the chunk completes
        elapsed = time.time() - t0  # measured AFTER the sync, so it reports
        # device compute, not async dispatch latency
        last = {k: float(v) for k, v in zip(keys, values)}
        self.logger.log(epoch=epoch, phase=phase, elapsed=elapsed, **last)
        return last

    @staticmethod
    def _crossed(epoch, length, every):
        # true when (epoch-length, epoch] contains a multiple of `every` —
        # chunk lengths need not divide the cadence
        return every > 0 and (epoch // every) != ((epoch - length) // every)

    def _maybe_snapshot(self, epoch, length, state):
        every = self.exp.train.snapshot_every
        if every and self.exp.train.out_dir and self._crossed(epoch, length, every):
            self.record_snapshot(state, epoch)

    def _maybe_checkpoint(self, epoch, length, state):
        every = self.exp.train.checkpoint_every
        if every and self.exp.train.out_dir and self._crossed(epoch, length, every):
            self.save_checkpoint(state, tag=f"e{epoch}")

    def _swa_update(self, swa_avg, swa_n, params):
        """One step of the running SWA mean (Izmailov et al. 2018, eq. for
        the uniform tail average): ``avg += (p - avg) / (n + 1)``.

        Accumulates in float32 regardless of the working dtype so long
        averaging windows don't lose mass to bf16 rounding. Two fixed jitted
        programs (init copy + accumulate with n TRACED, not baked in) — an
        eager tree-map here would remote-compile a fresh program per
        snapshot on tunneled backends, which stalls the loop by minutes.
        The main step HLO is untouched, so the persistent compile cache
        stays valid.
        """
        if self._swa_accum is None:
            # jit output is a fresh buffer, so the init snapshot never
            # aliases the live params the donated step deletes under us
            self._swa_init = jax.jit(
                lambda p: jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), p
                )
            )
            self._swa_accum = jax.jit(
                lambda avg, p, n: jax.tree_util.tree_map(
                    lambda a, x: a + (x.astype(jnp.float32) - a) / n, avg, p
                )
            )
        if swa_avg is None:
            return self._swa_init(params), 1
        n = swa_n + 1
        return self._swa_accum(swa_avg, params, jnp.float32(n)), n

    def predict(self, params, x) -> Dict[str, np.ndarray]:
        out = self._predict(params, jnp.asarray(x, self.problem.spec.dtype))
        return {k: np.asarray(v) for k, v in out.items()}

    def evaluate(self, state: TrainState, params=None) -> Dict[str, float]:
        """Relative L2 error per field over the full exact grid
        (``Abgrall_ADMM.py:318-319``, ``Euler_ADMM.py:342-347``).

        ``params`` overrides ``state.params`` for the prediction pass — used
        to score alternative iterates (e.g. the SWA average) against the same
        grid without rebuilding a state.
        """
        if params is None:
            params = state.params
        ds = self.problem.dataset
        preds = self.predict(params, ds.X_star)
        out = {}
        for name in ds.field_names:
            out[f"rel_l2_{name}"] = relative_l2(preds[name], ds.star[name])
        lam1, lam2 = self.problem.effective_coeffs(params)
        out["lambda1"] = float(np.asarray(lam1)[0])
        out["lambda2"] = float(np.asarray(lam2)[0])
        # graded numbers are self-identifying: 'stored' reference .mat vs
        # 'native' regenerated oracle (materially different for Euler u,
        # PARITY §2 — the stored DG artifact departs up to 28% from exact)
        out["truth"] = getattr(ds, "provenance", "unknown")
        return out

    def record_snapshot(self, state: TrainState, epoch: int):
        """Append a full-grid prediction snapshot to <out>/<name>_snapshots.csv
        — the reference's crash-resilient convergence stream
        (``record_data``/``save_data``, ``Abgrall_ADMM.py:400-409``), same
        schema (x, t, <field>_pred..., epoch) so the viz layer can animate it.
        """
        ds = self.problem.dataset
        preds = self.predict(state.params, ds.X_star)
        cols = {"x": ds.X_star[:, 0], "t": ds.X_star[:, 1]}
        for name in ds.field_names:
            cols[f"{name}_pred"] = preds[name][:, 0]
        cols["epoch"] = np.full(ds.X_star.shape[0], epoch)
        self.logger.append_snapshot(cols)

    # -- checkpointing ----------------------------------------------------
    def save_checkpoint(self, state: TrainState, tag: str = "final") -> str:
        out_dir = self.exp.train.out_dir or "."
        path = os.path.join(out_dir, f"{self.exp.name}_{tag}.ckpt")
        ckpt_io.save_checkpoint(path, state, meta={
            "experiment": self.exp.name,
            "epoch": int(state.epoch),
            # rho-override presence changes the pytree structure; the loader
            # needs it to build a matching template
            "rho": None if state.rho is None else float(state.rho),
        })
        return path

    def load_checkpoint(self, path: str) -> TrainState:
        rho = ckpt_io.load_meta(path).get("rho")
        template = self.init_state(rho=rho)
        return ckpt_io.load_checkpoint(path, template)
