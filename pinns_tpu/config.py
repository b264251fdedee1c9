"""Typed experiment configuration.

The reference configures each run with a per-script ``class Parameters`` of
class attributes overridden positionally from ``sys.argv``
(``Abgrall_ADMM.py:29-34, 412-421``) plus hard-coded dataset paths and layer
lists inside ``load_data``. Here the same knob set (N_u, N_f, rho/pen, epochs,
layers, dataset, lambda1/lambda2, optimizer schedule) is one frozen dataclass
tree, hashable so jitted step factories can close over it, with dict/CLI
overrides (see ``pinns_tpu.cli``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def _frozen(cls):
    return dataclasses.dataclass(frozen=True)(cls)


@_frozen
class ModelConfig:
    layers: Tuple[int, ...] = (2, 20, 20, 20, 20, 20, 20, 20, 20, 1)
    # Matmul precision: 'default'|'high'|'highest'. Keep 'highest' for
    # production recipes: 'default' (bf16 MXU passes) measured a ~3× rel-L2
    # regression on the final Euler mixed-formulation recipe (PARITY §4o)
    # even though it was near-parity on the older 0.2-plateau recipe (§4k).
    precision: str = "highest"
    dtype: str = "float32"
    # Mixed-precision residual path: derivative streams are stored and
    # matmul'd in this dtype (e.g. 'bfloat16') with full-precision
    # accumulation and elementwise ops; master weights, the first layer,
    # loss reductions, and the data-misfit path stay in `dtype`
    # (see ops/taylor.py). Empty = no mixing. This is the knob for the
    # arithmetic-bound million-point configs (BASELINE.md roadmap).
    compute_dtype: str = ""
    # Streams exempted from compute_dtype quantization: subset of
    # ('value', 'xx'). ('value', 'xx') is the measured f32-quality-parity
    # point; () is fastest.
    keep_streams: Tuple[str, ...] = ()
    # Run quantized streams' elementwise ops in compute_dtype too (maximum
    # throughput; larger quality cost — measured frontier in BASELINE.md).
    mixed_elementwise: bool = False
    # Random Fourier feature embedding (beyond-reference; Tancik et al.
    # 2020): n_fourier > 0 prepends [sin(2 pi B h), cos(2 pi B h)] features
    # (B ~ N(0, fourier_sigma^2), deterministic in fourier_seed) to the
    # normalized coordinates, widening the first layer — mitigates the tanh
    # trunk's spectral bias at sharp features/shocks. Derivative streams
    # propagate exactly through the embedding (ops/taylor.py).
    n_fourier: int = 0
    fourier_sigma: float = 3.0
    fourier_seed: int = 0
    # Trainable shock-path features (beyond-reference): n_paths > 0 appends
    # features tanh(a_k (x_n - s_k(t_n))) to the first layer, with the path
    # polynomials s_k (degree path_degree, normalized time) and sharpnesses
    # a_k TRAINED alongside the weights — a steep-but-smooth moving front
    # whose location the optimizer discovers, the representation lever for
    # shock/contact plateaus (PARITY.md §4c/§4d). Exact derivative streams
    # (models/mlp.py `_path_streams`).
    n_paths: int = 0
    path_degree: int = 2
    path_sharpness: float = 8.0


@_frozen
class PDEConfig:
    kind: str = "burgers"  # 'burgers' | 'euler'
    lambda1: float = 1.0  # convection coefficient (Burgers)
    # Burgers: viscosity. Euler + residual_kind='flux': artificial
    # viscosity nu on the CONSERVED variables (flux_i -= nu dU_i/dx), the
    # modified-equation model of the stored DG data's numerical dissipation
    # (dissipation matching, PARITY §4k). Euler strong form ignores it.
    lambda2: float = 0.0
    gamma: float = 1.4  # ratio of specific heats (Euler)
    train_coeffs: bool = False  # identification mode: lambda1/2 trainable
    lambda2_transform: str = "identity"  # 'identity' | 'exp' (positivity)


@_frozen
class SamplingConfig:
    n_f: int = 1000
    # 'resample_uniform': fresh on-device uniform batch every step
    #   (Abgrall_ADMM.py:220-223)
    # 'fixed_uniform':   one uniform batch at init, kept fixed
    # 'fixed_lhs':       Latin hypercube at init, kept fixed
    # 'fixed_lhs_anchored': LHS stacked with the data points
    #   (Hwan_L2Regularization_Burgers.py:183-184)
    # 'rad': residual-based adaptive distribution (beyond-reference; Wu et
    #   al. 2023): batch kept fixed within a chunk, re-drawn at every chunk
    #   boundary by importance-sampling a fresh uniform candidate pool with
    #   p ∝ |f|^rad_k / mean(|f|^rad_k) + rad_c — one extra residual
    #   evaluation per chunk (~1000 steps), concentrating points where the
    #   PDE is worst fit. With ADMM, z is re-initialized to the residuals at
    #   the new points (the reference's own init semantics,
    #   Hwan_L1Regularization_ADMM_Burgers.py:113-115).
    strategy: str = "resample_uniform"
    rad_pool_factor: int = 8  # candidate pool = factor * n_f
    rad_k: float = 1.0
    rad_c: float = 1.0
    seed: int = 1234
    # Time-marching curriculum (beyond-reference): with resample_uniform,
    # grow the sampled t-range linearly from t_curriculum_floor of the domain
    # to the full domain over this many epochs (0 = off). Shock problems
    # benefit from learning the early smooth dynamics first.
    t_curriculum_epochs: int = 0
    t_curriculum_floor: float = 0.05
    # Split the collocation batch into this many rematerialized microbatches
    # (lax.scan + jax.checkpoint) so activation memory stays at
    # n_f/microbatch scale — how million-point batches fit in HBM.
    microbatch: int = 1
    # Remat policy for the microbatch loop's backward pass:
    #   'full'  rematerialize the whole body (default; peak activation
    #           memory = one microbatch, backward recomputes the forward)
    #   'dots'  save matmul outputs, recompute only elementwise ops
    #           (jax.checkpoint_policies.dots_saveable — trades HBM for
    #           skipping the MXU recompute)
    #   'none'  store all activations (fastest when the full batch's
    #           activations fit HBM; measured frontier in BASELINE.md)
    microbatch_remat: str = "full"
    # lax.scan unroll factor for the microbatch loop: >1 lets XLA
    # software-pipeline consecutive microbatches (more VMEM, fewer
    # loop-carried barriers).
    microbatch_unroll: int = 1


@_frozen
class LossConfig:
    data_kind: str = "mse_sum"  # 'mse_sum' | 'l2_norm'
    # 'flux' (beyond-reference) replaces the pointwise strong-form residual
    # with the weak-form finite-volume conservation residual over space-time
    # control volumes centered at the collocation points (ops/weakform.py):
    # discontinuous weak solutions satisfy it exactly, so gradient descent
    # stops fighting sharp fronts — the formulation remedy for the shock/
    # contact plateaus. entropy_weight then uses the WEAK entropy
    # inequality on the same cells (selects the admissible solution).
    residual_kind: str = "admm"  # 'mean_sq'|'l2_sq_norm'|'l1_sq_norm'|'admm'|'flux'
    # Control-volume half-widths as fractions of the domain extents, and
    # Gauss-Legendre nodes per cell edge, for residual_kind='flux'.
    flux_dx_frac: float = 0.02
    flux_dt_frac: float = 0.02
    flux_quad: int = 4
    # With residual_kind='admm', which residual the ADMM machinery (penalty,
    # z/dual prox updates, misfit monitor) regularizes: 'strong' is the
    # reference's pointwise residual; 'flux' (beyond-reference) runs the
    # SAME L1/ADMM study on the weak-form control-volume residual — the
    # reference's research program on the formulation that is actually
    # defined at shocks.
    admm_form: str = "strong"
    # Mixed formulation (beyond-reference): with a weak-form training
    # residual (residual_kind='flux' or admm_form='flux') on Euler, the
    # equation indices listed here (0=mass, 1=momentum, 2=energy) are
    # evaluated with the STRONG pointwise residual instead, at the same
    # points. Motivated by the measured frontier (PARITY §4j: rho converges
    # best under the strong form, u/E under the weak form). Cell-mean and
    # pointwise residuals agree in the smooth limit
    # (tests/test_weakform.py), so mixing is scale-consistent.
    strong_equations: Tuple[int, ...] = ()
    rho: float = 10.0  # ADMM penalty (the Euler script calls it `pen`)
    # Loss-balance knobs (beyond-reference; the reference hardcodes 1.0):
    # total = data_weight * data + residual_weight * residual. For
    # residual_kind='admm' use rho to scale the penalty — residual_weight
    # would silently break the prox/threshold consistency, so it must be 1.
    data_weight: float = 1.0
    residual_weight: float = 1.0
    # Per-field data-term weights for multi-output PDEs (Euler: rho, u, E);
    # empty = all 1. Lets the misfit balance fields with different scales.
    data_field_weights: Tuple[float, ...] = ()
    # Shock-capture formulation knobs (beyond-reference; the reference's
    # L1/ADMM study is motivated by shocks, where the strong-form residual
    # blows up and dominates the loss):
    # grad_weight_kappa > 0 reweights the residual FIELD per point by
    # w = 1/(1 + kappa * s^2), s = u_x (Burgers) or |(rho_x, u_x)| (Euler) —
    # the gradient-weighted PINN of Mao et al. (CMAME 2020). Applied inside
    # the residual operator, so every residual kind (mean_sq / l1_sq / ADMM
    # penalty AND its z/dual prox updates) consistently regularizes the
    # weighted field w*f; the indicator is stop-gradiented so the weights
    # steer, not train.
    grad_weight_kappa: float = 0.0
    # causal_eps > 0 replaces the 'mean_sq' residual penalty with the
    # causal-in-time weighting of Wang, Sankaran & Perdikaris (2022): the
    # time domain splits into causal_bins uniform bins and bin b's mean-sq
    # residual is weighted by stop_grad(exp(-eps * cumulative earlier-bin
    # loss)) — later times only count once earlier times are fit, the
    # training-dynamics remedy for solutions that must propagate forward
    # from the IC (shock formation). Applies to residual_kind 'mean_sq'
    # and 'flux' (the measured best-known shock recipe combines it with
    # the weak form — preset twosin_weak, PARITY §4j).
    causal_eps: float = 0.0
    causal_bins: int = 32
    # Scale-free causal weights: w_b = exp(-eps * prefix_b / mean(L_b)),
    # so selection pressure PERSISTS as residuals vanish instead of fading
    # to 1. eps then plays at O(0.1), not the absolute form's eps=30.
    # Measured verdict (PARITY §4o): leave OFF — on the dissipation-matched
    # recipe the absolute form no longer drifts at 500k (0.045 vs §4j's old
    # 0.118) and the relative form is band-edge at 200k and WORSE at 500k
    # (0.090); there is no measured config where it wins.
    causal_relative: bool = False
    # entropy_weight > 0 adds a pointwise entropy-admissibility penalty that
    # selects the entropy solution among weak solutions the residual alone
    # cannot distinguish. Burgers: mean(relu(U_t + F_x)^2) for the entropy
    # pair U = u^2/2, F = lambda1 u^3/3. Euler: mean(relu(-(S_t + u S_x))^2)
    # for the physical entropy S = log p - gamma log rho (entropy along
    # particle paths must not decrease). When the effective viscosity can be
    # nonzero (pde.lambda2 != 0, 'exp' transform, or trainable coeffs), the
    # balance is viscosity-corrected — strong form relu(u f - lambda2 u_x^2),
    # weak form carries the viscous entropy flux on the side edges — so exact
    # viscous solutions incur NO penalty (tests/test_entropy_viscous.py);
    # the naive inviscid form would penalize correct smooth behavior there.
    entropy_weight: float = 0.0
    explicit_inner: bool = False  # Hwan ADMM's dual^T r term
    # Where the ADMM z/dual updates evaluate residuals (SURVEY.md hard part
    # #4): 'resampled' reproduces the reference — resample first, then update
    # z/dual at the NEW points, re-evaluating the residual graph
    # (Abgrall_ADMM.py:220-226); 'current' updates z/dual at the points the
    # weight step actually saw — the textbook ADMM splitting. Perf-neutral in
    # practice (XLA CSEs the residual evaluations); the choice is semantic.
    admm_update_points: str = "resampled"


@_frozen
class LBFGSConfig:
    max_iters: int = 5000  # reference ScipyOptimizerInterface maxiter
    history: int = 50  # maxcor
    max_ls: int = 50  # maxls
    # The reference passes ftol=1e-7 to SciPy (Abgrall_ADMM.py:72); in f32 on
    # device that triggers orders of magnitude before the achievable floor, so
    # the default here is effectively "run until line search exhausts f32".
    ftol: float = 1e-12
    gtol: float = 1e-7


@_frozen
class OptimizerConfig:
    kind: str = "adam"  # 'adam' | 'lbfgs' | 'hybrid'
    learning_rate: float = 1e-3  # AdamOptimizer(learning_rate=0.001)
    # Learning-rate schedule over the Adam phase (the reference uses a fixed
    # rate): 'constant' | 'cosine' (decay to lr*min_lr_fraction over
    # schedule_epochs) | 'exponential' (x0.1 every schedule_epochs).
    lr_schedule: str = "constant"
    schedule_epochs: int = 50_000
    min_lr_fraction: float = 0.01
    switch_epoch: int = 50_000  # Adam -> L-BFGS switch (Abgrall_ADMM.py:213)
    lbfgs: LBFGSConfig = LBFGSConfig()


@_frozen
class DataConfig:
    dataset: str = "twosin_burgers_shock"  # key or path
    n_u: int = 100
    selection: str = "ic_bc"  # 'ic_bc' | 'interior' (identification)
    seed: int = 1234
    noise: float = 0.0


@_frozen
class MeshConfig:
    data_parallel: int = 1  # number of shards along the collocation axis
    ensemble: int = 1  # vmapped ensemble width


@_frozen
class TrainConfig:
    epochs: int = 100_000
    chunk: int = 1000  # steps fused into one lax.scan device call
    # lax.scan unroll factor for the Adam chunk: the canonical small-net
    # step is op-issue-bound (~347 device ops of ~60-400 ns each; 87 of them
    # are loop-boundary buffer copies) — unrolling lets XLA fuse across
    # steps and delete most per-iteration copies. Measured frontier on v5e
    # (canonical config): 1 -> 76.4 us/step, 8 -> 56.6, 16 -> 55.3,
    # 32 -> 74.7 (program blowup). 0 = auto (production-length Adam chunks
    # >= 200 steps only): 8 for narrow nets (width <= 64); 4 for wide
    # trunks at small batches (n_f <= 2048 — still partially issue-bound,
    # e.g. the Euler 5x200 config measures 294 -> 255 us/step); 1 for
    # large-batch wide configs (compute/HBM-bound; unrolling only grows
    # compile time and risks the pathological wide-net remote compile).
    scan_unroll: int = 0
    log_every: int = 1000  # metrics-log cadence in epochs; <= 0 = final only
    snapshot_every: int = 0  # full-grid prediction snapshots; 0 = off
    checkpoint_every: int = 0  # 0 = only final
    seed: int = 1234
    out_dir: str = ""  # empty = no file output
    # When set, capture a jax.profiler trace of the second chunk (the first
    # includes compilation) into this directory — the framework's tracing
    # subsystem (the reference only has wall-clock prints,
    # Abgrall_ADMM.py:229-235).
    profile_dir: str = ""
    # Tolerance-based early stop: end training once |loss| <= stop_tol,
    # checked at chunk granularity (the reference's `tol` loop condition,
    # Hwan_L2Regularization_Burgers.py:74,134). 0 disables.
    stop_tol: float = 0.0
    # Stochastic weight averaging (beyond-reference; Izmailov et al. 2018):
    # > 0 maintains the uniform average of the parameters sampled at chunk
    # boundaries over the LAST swa_frac of the epoch budget, and the run
    # summary reports swa_rel_l2_* alongside the final-iterate metrics.
    # Per-step resampling makes the Adam tail a noisy stationary process;
    # averaging its iterates cancels that noise at zero step cost (the
    # accumulation happens between device calls — no new step HLO, so the
    # persistent compile cache stays valid).
    # MEASURED GUIDANCE (PARITY §4m): leave this OFF on the shipped shock
    # recipes. Causal-weighted recipes (twosin_weak): negative on all 6
    # datapoints (3 seeds x 2 backends) — the tail is still *selecting*.
    # Long constant-LR envelopes (euler_weak 1M): strongly negative
    # (u 0.137 vs 0.054) — averaging weights whose shock-path/front
    # parameters drift smears the front. Non-causal cosine-decay tails
    # (euler_weak_fast): neutral (within noise). No measured config wins.
    swa_frac: float = 0.0


@_frozen
class Experiment:
    name: str = "experiment"
    model: ModelConfig = ModelConfig()
    pde: PDEConfig = PDEConfig()
    sampling: SamplingConfig = SamplingConfig()
    loss: LossConfig = LossConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    data: DataConfig = DataConfig()
    mesh: MeshConfig = MeshConfig()
    train: TrainConfig = TrainConfig()

    def replace(self, **kw) -> "Experiment":
        return dataclasses.replace(self, **kw)


def override(exp: Experiment, updates: dict) -> Experiment:
    """Apply nested dotted-key overrides, e.g. {'sampling.n_f': 4000}."""
    for key, value in updates.items():
        parts = key.split(".")
        if len(parts) == 1:
            exp = dataclasses.replace(exp, **{parts[0]: value})
            continue
        # rebuild the nested frozen dataclasses along the path
        objs = [exp]
        for p in parts[:-1]:
            objs.append(getattr(objs[-1], p))
        value_ = value
        for i in range(len(parts) - 1, -1, -1):
            value_ = dataclasses.replace(objs[i], **{parts[i]: value_})
        exp = value_
    return exp
