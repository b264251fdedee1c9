"""The reference experiment inventory as Experiment configs (SURVEY.md §2.1).

One preset per reference training script, with the same hyperparameters, loss
normalizations, dataset, net width, sampling strategy, and optimizer schedule
— plus framework-native presets (inverse identification, scale benchmark) the
reference only gestures at.

| preset                | reference script (file:lines for key deltas)        |
|-----------------------|-----------------------------------------------------|
| hwan_l2               | Burgers/continuous_inference/Hwan_L2Regularization_Burgers.py:68-69,153-158 |
| hwan_admm             | Burgers/continuous_inference/Hwan_L1Regularization_ADMM_Burgers.py:98-100,233-238,270-271 |
| abgrall_admm          | Burgers/continuous_identification/Abgrall_ADMM.py:29-34,66-73,129-130,269-271 |
| abgrall_l1            | Burgers/continuous_identification/Abgrall_L1.py:30-32,59-60,237-239 |
| abgrall_l2            | Burgers/continuous_identification/Abgrall_L2.py:30-32,59-60,247-249 |
| burgers_admm_batch    | Burgers/continuous_identification/Burgers_ADMM_batch.py:30-32,95,118-119,244-246 |
| burgers_batch_l1sq    | Burgers/continuous_identification/Burgers_batch_L2.py:30-32,57-58,90,202-204 (filename says L2; the loss is squared-L1) |
| euler_admm            | Eulers/continuous_inference/Euler_ADMM.py:29-34,128-141,279-281 |
| euler_admm_tuned      | euler_admm + the round-2 study's winning levers (PARITY §4c) |
| twosin_weak           | best-known TwoSin shock recipe: weak-form flux + causal weighting (PARITY §4h-§4j) |
| euler_weak            | best-known Euler u/E recipe: weak-form flux + trainable shock paths (PARITY §4i-§4j) |
| euler_weak_tail       | per-member L-BFGS tail stage of the ensemble->tails->rank-select workflow (PARITY §4t) |
| burgers_forward       | canonical Raissi forward problem (burgers_shock.mat, nu=0.01/pi) |
| burgers_inverse       | identification: trainable lambda1/lambda2 from interior data |
| euler_inverse         | Euler dissipation identification from interior data (weak form, PARITY §4l) |
| burgers_scale         | 1M collocation points, data-parallel mesh (BASELINE.json config) |
"""

from __future__ import annotations

import math

from pinns_tpu.config import (
    DataConfig,
    Experiment,
    LBFGSConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    PDEConfig,
    SamplingConfig,
    TrainConfig,
)

NARROW = (2,) + (20,) * 8 + (1,)  # [2, 20 x 8, 1]
WIDE = (2,) + (200,) * 8 + (1,)  # [2, 200 x 8, 1]
EULER_TRUNK = (2,) + (200,) * 5 + (3,)  # [2, 200 x 5, 3]
NU = 0.01 / math.pi  # 0.0031831, the canonical Burgers viscosity


def _exp(**kw) -> Experiment:
    return Experiment(**kw)


PRESETS = {
    # --- Burgers continuous_inference (forward) --------------------------
    "hwan_l2": _exp(
        name="hwan_l2",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=0.0),
        sampling=SamplingConfig(n_f=10_000, strategy="fixed_lhs_anchored"),
        loss=LossConfig(data_kind="l2_norm", residual_kind="mean_sq"),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="abgrall_burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000, stop_tol=1e-4),
    ),
    "hwan_admm": _exp(
        name="hwan_admm",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=0.0),
        sampling=SamplingConfig(n_f=10_000, strategy="fixed_lhs_anchored"),
        loss=LossConfig(
            data_kind="mse_sum", residual_kind="admm", rho=10.0,
            explicit_inner=True,
        ),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000),
    ),
    # --- Burgers continuous_identification -------------------------------
    "abgrall_admm": _exp(
        name="abgrall_admm",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=0.0),
        sampling=SamplingConfig(n_f=1000, strategy="resample_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="admm", rho=10.0),
        optimizer=OptimizerConfig(kind="hybrid", switch_epoch=50_000),
        data=DataConfig(dataset="twosin_burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000),
    ),
    "abgrall_l1": _exp(
        name="abgrall_l1",
        model=ModelConfig(layers=WIDE),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=0.0),
        sampling=SamplingConfig(n_f=1000, strategy="resample_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="l1_sq_norm"),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="abgrall_burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000),
    ),
    "abgrall_l2": _exp(
        name="abgrall_l2",
        model=ModelConfig(layers=WIDE),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=0.0),
        sampling=SamplingConfig(n_f=1000, strategy="resample_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="l2_sq_norm"),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="abgrall_burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000),
    ),
    "abgrall_visc": _exp(
        # The measured Abgrall-dataset frontier recipe (round 4): abgrall_l2
        # + the identified dissipation lambda2 = 4.8e-3 (PARITY §2; the
        # PINN-side inverse run recovers lambda1 = 1.0017, nu = 4.77e-3 at
        # rel-L2 0.0031 — r4_abgrall_visc.jsonl `abg_ident`). Matching the
        # dataset's effective viscosity broke the inviscid 0.235 plateau
        # 20x: rel-L2 u = 0.0119 / 0.0159 / 0.0191 over seeds 1234/7/99 at
        # 100k epochs (52 s on one v5e chip); cosine-200k measures 0.0117.
        # The same lever on the other two Abgrall presets (same data,
        # different losses) measured honest partials: hwan_l2 0.101 ->
        # 0.078 (its l2_norm/fixed-colloc formulation floors there — 500k
        # inviscid epochs also give 0.079), abgrall_l1 0.286 -> no change
        # (the L1^2 residual's scale-free subgradient stalls Adam at a
        # noise floor; cosine decay does not move it either).
        name="abgrall_visc",
        model=ModelConfig(layers=WIDE),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=4.8e-3),
        sampling=SamplingConfig(n_f=1000, strategy="resample_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="l2_sq_norm"),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="abgrall_burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000),
    ),
    "burgers_admm_batch": _exp(
        name="burgers_admm_batch",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=NU),
        sampling=SamplingConfig(n_f=5000, strategy="resample_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="admm", rho=40.0),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000),
    ),
    "burgers_batch_l1sq": _exp(
        name="burgers_batch_l1sq",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=NU),
        sampling=SamplingConfig(n_f=1000, strategy="fixed_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="l1_sq_norm"),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="burgers_shock", n_u=100),
        train=TrainConfig(epochs=100_000),
    ),
    # --- Euler continuous_inference --------------------------------------
    "euler_admm": _exp(
        name="euler_admm",
        model=ModelConfig(layers=EULER_TRUNK),
        pde=PDEConfig(kind="euler", gamma=1.4),
        sampling=SamplingConfig(n_f=1000, strategy="resample_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="admm", rho=40.0),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="abgrall_eulers", n_u=200),
        # chunk 250: the 5x200-wide step's 1000-step scan tickles a
        # pathological compile on some toolchains; 250 compiles fast
        train=TrainConfig(epochs=100_000, chunk=250),
    ),
    "euler_admm_tuned": _exp(
        # best known recipe from the round-2 lever study
        # (benchmarks/euler_quality_study.py + euler_stage3.py, PARITY §4c):
        # rho-weighted data loss + time-marching curriculum at the 1M-epoch
        # envelope scores rho 0.060 / u 0.213 / E 0.050 vs the reference
        # config's 0.152 / 0.234 / 0.068 (Euler_ADMM.py:29-34 config).
        name="euler_admm_tuned",
        model=ModelConfig(layers=EULER_TRUNK),
        pde=PDEConfig(kind="euler", gamma=1.4),
        sampling=SamplingConfig(
            n_f=1000, strategy="resample_uniform",
            t_curriculum_epochs=100_000,
        ),
        loss=LossConfig(
            data_kind="mse_sum", residual_kind="admm", rho=40.0,
            data_field_weights=(3.0, 1.0, 1.0),
        ),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="abgrall_eulers", n_u=200),
        train=TrainConfig(epochs=1_000_000, chunk=250),
    ),
    # --- framework-native presets ----------------------------------------
    "burgers_forward": _exp(
        name="burgers_forward",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=NU),
        sampling=SamplingConfig(n_f=10_000, strategy="fixed_lhs_anchored"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="mean_sq"),
        # cosine-decayed Adam + on-device L-BFGS reaches rel-L2 5.98e-4 —
        # below the Raissi Part I literature value (6.7e-4) — in ~5 min on
        # one v5e chip, all float32
        optimizer=OptimizerConfig(
            kind="hybrid", switch_epoch=200_000,
            lr_schedule="cosine", schedule_epochs=180_000,
            lbfgs=LBFGSConfig(max_iters=20_000),
        ),
        data=DataConfig(dataset="burgers_shock", n_u=100),
        train=TrainConfig(epochs=200_010),
    ),
    "burgers_inverse": _exp(
        name="burgers_inverse",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(
            kind="burgers",
            lambda1=0.0,
            lambda2=-6.0,
            train_coeffs=True,
            lambda2_transform="exp",
        ),
        sampling=SamplingConfig(n_f=10_000, strategy="fixed_lhs"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="mean_sq"),
        optimizer=OptimizerConfig(
            kind="hybrid", switch_epoch=50_000,
            lbfgs=LBFGSConfig(max_iters=20_000),
        ),
        data=DataConfig(dataset="burgers_shock", n_u=2000, selection="interior"),
        train=TrainConfig(epochs=50_010),
    ),
    "euler_inverse": _exp(
        # Euler dissipation identification (PARITY §4l,
        # benchmarks/flux6_study.py): recover the stored DG grid's own
        # numerical dissipation from 2000 interior points with the
        # weak-form flux residual (the strong Euler form has no
        # dissipation term by construction) and a trainable
        # exp-transformed lambda2. Measured at 200k cosine Adam on one
        # v5e (~9 min): rel-L2 rho 0.0118 / u 0.0284 / E 0.0103,
        # identified nu ~= 2.1e-3 — the number the forward `euler_weak`
        # recipe freezes (rounded to the frozen-grid optimum 1e-3).
        # Companion to `burgers_inverse` for the Euler system; no
        # reference analog (the reference identifies only Burgers
        # coefficients, Abgrall_ADMM.py:57-58).
        name="euler_inverse",
        model=ModelConfig(layers=EULER_TRUNK),
        pde=PDEConfig(
            kind="euler",
            gamma=1.4,
            lambda2=-6.0,
            train_coeffs=True,
            lambda2_transform="exp",
        ),
        sampling=SamplingConfig(n_f=1000, strategy="resample_uniform"),
        loss=LossConfig(data_kind="mse_sum", residual_kind="flux"),
        optimizer=OptimizerConfig(
            kind="adam", lr_schedule="cosine", schedule_epochs=200_000,
        ),
        data=DataConfig(dataset="abgrall_eulers", n_u=2000,
                        selection="interior"),
        train=TrainConfig(epochs=200_000, chunk=250),
    ),
    "twosin_weak": _exp(
        # Best-known recipe for the TwoSin shock problem in its own
        # (clock-corrected, dissipation-matched) dynamics, from the round-2
        # weak-form studies (benchmarks/{causal,flux,flux2..flux5}_study.py;
        # PARITY §4h-§4k): weak-form control-volume residual +
        # causal-in-time weighting eps=30 + the dataset's own mild
        # dissipation (lambda2 = 1e-3; identification recovers 0.9-1.4e-3),
        # 200k cosine Adam. Measured rel-L2(u) over seeds 1234/7/99:
        # 0.048 / 0.0367 / 0.0370 — AT the 0.037 inviscid-oracle floor
        # (PARITY §2), vs the 0.398/0.384 strong-form plateau; ~60 s on
        # one v5e chip. The inviscid (lambda2=0) variant measures
        # 0.075-0.157 across seeds. lambda1=0.377 is the convection
        # coefficient the stored grid actually satisfies in label time
        # (PARITY §2); do NOT over-train: causal selection fades as
        # residuals vanish (500k drifts, §4j).
        name="twosin_weak",
        model=ModelConfig(layers=NARROW),
        pde=PDEConfig(kind="burgers", lambda1=0.377, lambda2=1e-3),
        sampling=SamplingConfig(n_f=1000, strategy="resample_uniform"),
        loss=LossConfig(
            data_kind="mse_sum", residual_kind="flux", causal_eps=30.0,
        ),
        optimizer=OptimizerConfig(
            kind="adam", lr_schedule="cosine", schedule_epochs=200_000,
        ),
        data=DataConfig(dataset="twosin_burgers_shock", n_u=100),
        train=TrainConfig(epochs=200_000, chunk=250),
    ),
    "euler_weak": _exp(
        # Best-known recipe for the Euler system (round-2 weak-form
        # studies, PARITY §4i-§4l): the weak-form flux residual frees the
        # contact from the strong-form smoothing pressure, two trainable
        # shock-path features track the moving waves, the 5x rho data
        # weight recovers the density field the ADMM machinery otherwise
        # carried, the stored DG grid's own numerical dissipation is
        # matched (lambda2 = 1e-3; identification recovers ~2e-3 at rel-L2
        # 0.012/0.028/0.010 — PARITY §4l), and the mass equation uses the
        # strong pointwise residual while momentum/energy stay weak cell
        # means (loss.strong_equations, the measured frontier split §4j).
        # Measured at the 1M-epoch envelope on one v5e: rho 0.0205 /
        # u 0.0544 / E 0.0162 — vs euler_admm_tuned 0.060/0.213/0.050 and
        # the reference config 0.152/0.234/0.068, i.e. 3-7x better per
        # field. ~32 min wall clock at 1M. Fast budget (~10 min): use
        # preset `euler_weak_fast` (cosine 200k + precision='default').
        name="euler_weak",
        model=ModelConfig(
            layers=EULER_TRUNK, n_paths=2, path_sharpness=12.0,
        ),
        pde=PDEConfig(kind="euler", gamma=1.4, lambda2=1e-3),
        sampling=SamplingConfig(
            n_f=1000, strategy="resample_uniform",
            t_curriculum_epochs=100_000,
        ),
        loss=LossConfig(
            data_kind="mse_sum", residual_kind="flux",
            data_field_weights=(5.0, 1.0, 1.0),
            strong_equations=(0,),
        ),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="abgrall_eulers", n_u=200),
        train=TrainConfig(epochs=1_000_000, chunk=250),
    ),
    "euler_weak_fast": _exp(
        # The measured fast-budget Euler recipe, shipped as a name instead
        # of a comment (round-3; VERDICT r2 item 4): euler_weak + cosine
        # 200k (wins at 200k but NOT at 1M: u 0.064 vs 0.080, tighter band
        # — PARITY §4l refinement sweep). Measured band at 200k over seeds
        # 1234/7/99: rho 0.029-0.043 / u 0.064-0.076 / E 0.020-0.025
        # (~7.4 min). An L-BFGS tail (optimizer.kind='hybrid',
        # switch_epoch=200k) reached the best fast-budget numbers measured
        # (rho/u/E .021/.045/.014) on seed 1234 but FAILED seed
        # replication (u 0.176 @ s7, 0.105 @ s99 — PARITY §4o): solo it is
        # a coin flip, so Adam-only ships; use the tail only when running
        # several seeds and picking the best. precision='default' (the §4k "4.4× faster at
        # near-parity" rider) was re-measured on THIS final recipe in
        # round 3 and is a ~3× QUALITY REGRESSION (1M solo u 0.185 vs
        # 0.054; all 8 ensemble members u 0.19-0.22 vs 0.065-0.077 at
        # highest — PARITY §4o): the §4k rider was measured on the old
        # pre-mixed-formulation recipe at its 0.2 plateau, where the loss
        # of f32 matmul accuracy was invisible. Keep 'highest' here.
        # For the best-known quality at ~34 min, use euler_weak.
        name="euler_weak_fast",
        model=ModelConfig(
            layers=EULER_TRUNK, n_paths=2, path_sharpness=12.0,
        ),
        pde=PDEConfig(kind="euler", gamma=1.4, lambda2=1e-3),
        sampling=SamplingConfig(
            n_f=1000, strategy="resample_uniform",
            t_curriculum_epochs=100_000,
        ),
        loss=LossConfig(
            data_kind="mse_sum", residual_kind="flux",
            data_field_weights=(5.0, 1.0, 1.0),
            strong_equations=(0,),
        ),
        optimizer=OptimizerConfig(
            kind="adam", lr_schedule="cosine", schedule_epochs=200_000,
        ),
        data=DataConfig(dataset="abgrall_eulers", n_u=200),
        train=TrainConfig(epochs=200_000, chunk=250),
    ),
    "euler_weak_tail": _exp(
        # The per-member L-BFGS tail stage of the shipped best-Euler
        # workflow (PARITY §4t): train an euler_weak_fast ensemble, resume
        # EACH member with this preset (50 on-device L-BFGS outer epochs
        # past the cosine schedule), then pick truth-free with
        # `export --select rank --anchor <adam members>`. Tails are
        # seed-flaky solo (§4o: 1-in-3 improved) and improved only 2-of-8
        # members per ensemble (§4r) — but rank-sum agreement of the
        # residual score and the consensus distance found the oracle
        # member on ALL THREE independent TPU instances: u 0.0338 /
        # 0.0464 / 0.0446 (bases 1234/7000/99000), regret 0.0 each,
        # vs the solo-1M record 0.0544.
        # Run tails SOLO per member on this box (the vmapped wide-net
        # L-BFGS program is the known pathological remote compile):
        #   train --preset euler_weak_fast --ensemble 8 --out-dir D
        #   for i in 0..7: train --preset euler_weak_tail \
        #       --resume D/euler_weak_fast_final_m$i.ckpt --out-dir T$i
        #   export --preset euler_weak_fast --select rank \
        #       --checkpoint T*/euler_weak_tail_final.ckpt \
        #       --anchor D/euler_weak_fast_final_m*.ckpt --out best
        name="euler_weak_tail",
        model=ModelConfig(
            layers=EULER_TRUNK, n_paths=2, path_sharpness=12.0,
        ),
        pde=PDEConfig(kind="euler", gamma=1.4, lambda2=1e-3),
        sampling=SamplingConfig(
            n_f=1000, strategy="resample_uniform",
            t_curriculum_epochs=100_000,
        ),
        loss=LossConfig(
            data_kind="mse_sum", residual_kind="flux",
            data_field_weights=(5.0, 1.0, 1.0),
            strong_equations=(0,),
        ),
        optimizer=OptimizerConfig(
            kind="hybrid", switch_epoch=200_000,
            lr_schedule="cosine", schedule_epochs=200_000,
        ),
        data=DataConfig(dataset="abgrall_eulers", n_u=200),
        train=TrainConfig(epochs=200_050, chunk=250),
    ),
    "burgers_scale": _exp(
        name="burgers_scale",
        model=ModelConfig(layers=WIDE),
        pde=PDEConfig(kind="burgers", lambda1=1.0, lambda2=NU),
        # microbatch=128 -> 8192 pts each: small enough that one microbatch's
        # activations stay VMEM-resident through the remat loop. Measured on
        # one v5e (bf16 stream policies): mb=16 5.7M pts/s, 32 7.4M, 64 11.0M,
        # 128 11.4M (peak), 256 11.2M; f32 2.5M at mb=128.
        sampling=SamplingConfig(n_f=1_048_576, strategy="resample_uniform", microbatch=128),
        loss=LossConfig(data_kind="mse_sum", residual_kind="mean_sq"),
        optimizer=OptimizerConfig(kind="adam"),
        data=DataConfig(dataset="burgers_shock", n_u=100),
        mesh=MeshConfig(data_parallel=1),
        train=TrainConfig(epochs=1000, chunk=100),
    ),
}


def get_preset(name: str) -> Experiment:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None
