"""Vmapped PINN ensembles — in-program replacement for the MPI job farm.

The reference parallelizes hyperparameter sweeps by farming independent
single-GPU training processes over MPI ranks with NVML idle-GPU polling
(``scheduler.py:70-127``, ``:157-169``). On TPU the same throughput
parallelism is ONE XLA program: stack E independent parameter pytrees (seeds
and any array-valued hyperparameters), ``vmap`` the fused train step over the
stack, and shard the ensemble axis across the mesh. No processes, no polling,
no pickled message protocol — and members training in lockstep amortize
compilation and dispatch.

The farm's actual payload was the HYBRID schedule — Adam to epoch 50 000 then
L-BFGS (``scheduler.py:146-150`` sweeping ``Abgrall_ADMM.py:66-73,210-217``)
— so the full schedule runs vmapped here: the on-device L-BFGS
(``pinns_tpu.opt.lbfgs``) is pure ``lax.while_loop`` + vector algebra and
batches cleanly (members that converge early coast under the lifted loop
predicate until the slowest member finishes).

Grid axes that change shapes or static config (layer widths, N_f, loss kind)
become separate jit specializations, orchestrated by
``pinns_tpu.parallel.sweep``.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pinns_tpu.train.metrics import MetricsLogger
from pinns_tpu.train.trainer import (
    TrainState,
    make_adam_step,
    make_lbfgs_step,
    resolve_scan_unroll,
)


def init_ensemble_states(
    trainer,
    seeds: Sequence[int],
    rhos: Optional[Sequence[float]] = None,
) -> TrainState:
    """Independent init per member, stacked along a new leading axis.

    `rhos` gives each member its own ADMM penalty — the reference's main
    sweep axis (rho in {10..40}, ``scheduler.py:146-150``) runs as a single
    vmapped program instead of one farm job per value.
    """
    if rhos is not None and len(rhos) != len(seeds):
        raise ValueError("rhos must match seeds length")
    states = [
        trainer.init_state(
            seed=int(s), rho=None if rhos is None else float(rhos[i])
        )
        for i, s in enumerate(seeds)
    ]
    return jax.tree_util.tree_map(
        lambda *xs: jax.numpy.stack(xs, axis=0), *states
    )


def make_ensemble_chunk(trainer, chunk: int, phase: str = "adam"):
    """jitted scan of `chunk` vmapped steps over the stacked ensemble state.

    `phase` selects the step ('adam' or 'lbfgs' — an L-BFGS step is one whole
    inner solve, mirroring the solo trainer's hybrid schedule). Returns
    run(stacked_state) -> (stacked_state, metrics dict of (chunk, E) arrays).
    Metrics are packed into one array inside the scan (one transfer per
    chunk, not per metric).
    """
    if trainer.exp.sampling.strategy == "rad":
        raise ValueError(
            "sampling.strategy='rad' re-draws the batch at chunk boundaries "
            "via Trainer.train and is not wired into the vmapped ensemble "
            "loop — use solo runs (or the sweep runner's serial path) for RAD"
        )
    if phase == "adam":
        step = make_adam_step(trainer.problem, trainer.optimizer)
    elif phase == "lbfgs":
        step = make_lbfgs_step(trainer.problem)
    else:
        raise ValueError(f"unknown phase {phase!r}")
    vstep = jax.vmap(step)
    probe_keys: List[str] = []

    def chunk_fn(state, _):
        state, metrics = vstep(state)
        keys = sorted(metrics)
        if not probe_keys:
            probe_keys.extend(keys)
        elif keys != probe_keys:
            raise RuntimeError(
                f"ensemble metric keys changed between traces: {probe_keys}"
                f" -> {keys}"
            )
        packed = jnp.stack(
            [metrics[k].astype(jnp.float32) for k in keys]
        )  # (K, E)
        return state, packed

    def run(state):
        # vmapped narrow-net steps are still op-issue-bound; wide nets are
        # compute-bound — same policy as the solo path
        unroll = resolve_scan_unroll(trainer.exp, phase, chunk)
        state, packed = jax.lax.scan(
            chunk_fn, state, None, length=chunk, unroll=unroll,
        )
        return state, {
            k: packed[:, i] for i, k in enumerate(probe_keys)
        }

    return jax.jit(run, donate_argnums=0)


def unstack_states(stacked: TrainState, n: int) -> List[TrainState]:
    return [
        jax.tree_util.tree_map(lambda x, i=i: x[i], stacked) for i in range(n)
    ]


def stack_states(states: Sequence[TrainState]) -> TrainState:
    """Inverse of :func:`unstack_states`: member TrainStates -> one stacked
    state. With per-member checkpoints (``<name>_e{epoch}_m{i}.ckpt``,
    written every ``train.checkpoint_every``), this resumes a crashed
    multi-hour ensemble run: load each member with
    ``Trainer.load_checkpoint``, stack, and pass as ``run_ensemble``'s
    ``stacked=`` — training continues from the stacked epoch."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def evaluate_ensemble(trainer, stacked: TrainState, n: int) -> List[dict]:
    """Per-member final evaluation (rel-L2 per field), host side."""
    return [trainer.evaluate(s) for s in unstack_states(stacked, n)]


def selection_scores(
    trainer,
    stacked: TrainState,
    n: int,
    seed: int = 0,
    n_points: int = 4096,
    anchor_params=None,
    coarse_scales: Sequence[float] = (),
) -> List[dict]:
    """Ground-truth-FREE per-member model-selection scores.

    Hybrid/L-BFGS tails are seed-flaky on the shock recipes (PARITY §4o:
    1-in-3 seeds improved solo), so the shipped workflow is
    ensemble-then-pick-best — but rel-L2 needs the exact solution a
    deployment does not have. This scores every member with quantities the
    run already owns, in ONE vmapped jitted call:

    - ``data_term``: the member's misfit on the TRAINING data (the IC/BC or
      interior labels it trained on — :func:`make_data_term`, so the scored
      misfit is exactly the trained one, per-field weights included);
    - ``resid_ms``: mean-square of the member's TRAINED residual field
      (``Problem.training_residuals`` — weak-form cells when the recipe is
      weak-form) at one fresh uniform collocation batch shared by all
      members, so members are compared on identical points none has seen;
    - ``score``: ``data_weight * data_term + resid_ms`` — the training
      objective with the ADMM/penalty machinery replaced by the plain
      mean-square residual (z/dual state is per-member optimizer state, not
      a comparable quality signal);
    - ``coarse_r{s}`` / ``coarse_ent{s}`` (one pair per entry of
      ``coarse_scales``): mean |cell-mean conservation defect| and mean
      weak entropy-inequality violation over control volumes ``s``× the
      configured ``loss.flux_dx_frac``/``flux_dt_frac`` half-widths, at the
      same fresh points. Coarse cells integrate the residual over
      displacement-scale volumes, so a misplaced shock — which a pointwise
      or fine-cell mean-square underweights (its residual spike is
      near-measure-zero) — shows up as an O(displacement) conservation
      defect. Truth-free and available for ANY trained residual kind
      (weak cells need only the net + PDE coefficients);
    - ``consensus`` (only when ``anchor_params`` is given): the member's
      mean per-field relative-L2 distance to the ANCHOR ensemble's mean
      prediction at the same points. The natural anchor is the stacked
      Adam ensemble the L-BFGS tails started from — always in hand in the
      ensemble-then-tail workflow, and a measured-good predictor in its own
      right (PARITY §4r: the Adam mean beats the median member). Rationale:
      the residual score stops discriminating inside the low-residual
      cluster (PARITY §4r — the regret-.10 pick had the LOWEST residual),
      but tail regressions move the predicted FIELDS far from the
      consensus, which this distance sees directly.

    Returns one dict per member. Measured selector quality (rank
    correlation vs oracle rel-L2 and the regret of the argmin member on the
    shipped shock recipes): PARITY §4r.
    """
    from pinns_tpu.data.sampling import uniform_box
    from pinns_tpu.train.trainer import make_data_term

    problem = trainer.problem
    spec = problem.spec
    pts = uniform_box(
        jax.random.PRNGKey(seed),
        n_points,
        jnp.asarray(problem.lb, spec.dtype),
        jnp.asarray(problem.ub, spec.dtype),
        spec.dtype,
    )
    dterm = make_data_term(problem)
    w = float(problem.exp.loss.data_weight)

    def one(params):
        d = dterm(params).astype(jnp.float32)
        res = jax.tree_util.tree_leaves(
            problem.training_residuals(params, pts)
        )
        ms = sum(
            jnp.mean(jnp.square(f.astype(jnp.float32))) for f in res
        ) / len(res)
        return d, ms

    d, ms = jax.jit(jax.vmap(one))(stacked.params)
    d, ms = np.asarray(d), np.asarray(ms)

    coarse = {}
    if coarse_scales:
        def battery(params):
            out = {}
            for s in coarse_scales:
                r, ent = problem.flux_residuals_and_entropy(
                    params, pts, True, scale=float(s)
                )
                leaves = jax.tree_util.tree_leaves(r)
                out[f"coarse_r{s:g}"] = sum(
                    jnp.mean(jnp.abs(f.astype(jnp.float32))) for f in leaves
                ) / len(leaves)
                out[f"coarse_ent{s:g}"] = jnp.mean(ent.astype(jnp.float32))
            return out

        coarse = {
            k: np.asarray(v)
            for k, v in jax.jit(jax.vmap(battery))(stacked.params).items()
        }

    consensus = None
    if anchor_params is not None:
        from pinns_tpu.train.evaluate import predict_fields

        def primaries(params):
            # primary fields only — the f/f1-f3 residual diagnostics are
            # what resid_ms already measures
            return {
                k: v.astype(jnp.float32)
                for k, v in predict_fields(problem, params, pts).items()
                if not (k == "f" or (k[0] == "f" and k[1:].isdigit()))
            }

        anchor = jax.jit(jax.vmap(primaries))(anchor_params)
        anchor_mean = {k: jnp.mean(v, axis=0) for k, v in anchor.items()}
        names = sorted(anchor_mean)

        def dist(params):
            p = primaries(params)
            per = [
                jnp.linalg.norm(p[k] - anchor_mean[k])
                / (jnp.linalg.norm(anchor_mean[k]) + 1e-12)
                for k in names
            ]
            return sum(per) / len(per)

        consensus = np.asarray(jax.jit(jax.vmap(dist))(stacked.params))

    return [
        {
            "member": i,
            "data_term": float(d[i]),
            "resid_ms": float(ms[i]),
            "score": float(w * d[i] + ms[i]),
            **{k: float(v[i]) for k, v in coarse.items()},
            **(
                {"consensus": float(consensus[i])}
                if consensus is not None
                else {}
            ),
        }
        for i in range(n)
    ]


def select_member(scores: Sequence[dict], by: str = "score") -> int:
    """Index of the best member under a :func:`selection_scores` key.

    ``by='rank'`` combines the two truth-free signals by rank-sum (Borda):
    the member minimizing rank(score) + rank(consensus), consensus
    tie-break. Rationale from the measured instances (PARITY §4r/§4t): the
    residual score and the consensus distance fail on DIFFERENT instances
    (score regret .1031 where consensus hit 0.0 on base 1234; consensus
    regret .0173 where score hit 0.0 on base 7000) — requiring agreement
    picks the oracle on both. Caveat: on unconverged ensembles (the CPU
    toys) consensus is meaningless (the anchor mean is itself garbage) and
    rank-sum inherits that failure — use 'score' far from convergence.
    Requires consensus in the scores (pass ``anchor_params``).
    """
    if by == "rank":
        if not scores or "consensus" not in scores[0]:
            raise ValueError(
                "select_member(by='rank') needs consensus scores — call "
                "selection_scores with anchor_params"
            )

        def ranks(key):
            order = sorted(range(len(scores)), key=lambda i: scores[i][key])
            r = [0] * len(scores)
            for pos, i in enumerate(order):
                r[i] = pos
            return r

        rs, rc = ranks("score"), ranks("consensus")
        return int(min(
            range(len(scores)),
            key=lambda i: (rs[i] + rc[i], scores[i]["consensus"]),
        ))
    return int(min(range(len(scores)), key=lambda i: scores[i][by]))


def ensemble_predict(trainer, stacked: TrainState, x, want_dx: bool = False) -> dict:
    """Deep-ensemble prediction (Lakshminarayanan et al. 2017): one vmapped
    forward over the member axis, returning per-field ``mean`` and ``std``
    arrays plus the raw ``members`` stack.

    The reference farm's independent runs could support this only by
    post-hoc collecting per-process CSVs; here the members live stacked on
    device, so uncertainty is one jitted call. Returns
    ``{field: {'mean': (N,1), 'std': (N,1), 'members': (E,N,1)}}``; with
    ``want_dx`` each primary field also carries ``'dx'`` — the ensemble-mean
    x-derivative |d(field)/dx| from one vmapped Taylor-1 pass (mean of the
    member derivatives == derivative of the mean, by linearity) — the
    serving-time front proxy for Mondrian binning.
    """
    from pinns_tpu.train.evaluate import predict_field_dx, predict_fields

    x = jnp.asarray(x, trainer.problem.spec.dtype)
    preds = jax.jit(
        jax.vmap(lambda p: predict_fields(trainer.problem, p, x))
    )(stacked.params)
    out = {}
    for name, stack in preds.items():
        stack32 = stack.astype(jnp.float32)
        out[name] = {
            "mean": np.asarray(jnp.mean(stack32, axis=0)),
            "std": np.asarray(jnp.std(stack32, axis=0)),
            "members": np.asarray(stack),
        }
    if want_dx:
        dxs = jax.jit(
            jax.vmap(lambda p: predict_field_dx(trainer.problem, p, x))
        )(stacked.params)
        for name, stack in dxs.items():
            out[name]["dx"] = np.abs(np.asarray(
                jnp.mean(stack.astype(jnp.float32), axis=0)
            ))
    return out


def calibration_stats(exact, mean, std, grad_mag=None, ks=(1.0, 2.0, 3.0),
                      alpha=0.05, n_cal=1024, seed=0, n_bins=4,
                      bin_feature=None, feature_name="std") -> dict:
    """Numpy core of :func:`uq_calibration` (unit-testable in isolation).

    Raw coverage at k*std for each k, the shock split (steepest-gradient
    decile of ``grad_mag``), the leaky whole-grid inflation factor ``k95``,
    and SPLIT-CONFORMAL calibration (Vovk et al.; Lei et al. 2018): a random
    held-out calibration subset of the points yields the conformal quantile
    ``k_conf95`` of the score |err|/std, and ``cov_conf95`` verifies the
    resulting band mean ± k_conf95*std on the DISJOINT remainder — by
    exchangeability its expectation is >= 1-alpha, so this is the shipped,
    honest route to 95% bands from an overconfident ensemble.
    ``cov_conf95_shock`` measures the same band's conditional coverage at
    the shock, which a single global quantile does NOT guarantee.

    MONDRIAN (std-binned) conformal sharpens exactly that flank: points
    are binned by quantiles of the PREDICTED std (available at serving
    time — no truth needed to pick a point's bin) and each bin gets its
    own conformal quantile. The bin edges are fit on one half of the
    calibration subset and the per-bin quantiles on the OTHER half, so
    the taxonomy is independent of the scores it calibrates and
    exchangeability gives ~95% coverage per bin (up to the edges' own
    sampling noise). Ensemble std peaks at fronts (PARITY §4n), so the
    shock largely lands in the top bin and inherits a near-marginal
    guarantee instead of riding the global quantile. Returns
    ``mond_edges`` (bin edges over the binning feature), ``mond_k``
    (per-bin factors), ``cov_mond95`` and ``cov_mond95_shock`` (verified
    on the disjoint remainder). Bins with fewer than 20 score-half points
    fall back to the global ``k_conf95``.

    ``bin_feature`` swaps the Mondrian taxonomy feature: by default points
    bin by their predicted std, but any serving-time-computable per-point
    array works — ``uq_calibration(mond_feature='dx')`` passes the
    predicted |d(field)/dx| (a front-AWARE feature: where std fails to
    resolve a front, the model's own derivative does not — PARITY §4n's
    rho flank). The band stays k_bin * std; only WHICH bin a point lands
    in changes. ``feature_name`` is recorded as ``mond_feature`` so
    serving applies the same taxonomy (ServedModel.band_ks)."""
    exact = np.asarray(exact, np.float64)
    mean = np.asarray(mean, np.float64)
    std = np.asarray(std, np.float64)
    err = np.abs(mean - exact)
    row = {
        f"cov{k:g}s": float(np.mean(err <= k * std + 1e-12)) for k in ks
    }
    shock_mask = None
    if grad_mag is not None:
        gm = np.asarray(grad_mag, np.float64).ravel()
        shock_mask = gm >= np.quantile(gm, 0.9)
        row["cov2s_shock"] = float(
            np.mean(err.ravel()[shock_mask]
                    <= 2.0 * std.ravel()[shock_mask] + 1e-12)
        )
    row["mean_std"] = float(np.mean(std))
    row["rmse"] = float(np.sqrt(np.mean(err**2)))
    # the std-inflation factor that WOULD give 95% coverage ON THIS grid:
    # computed on all points, so it leaks — carry it only as a rough factor
    # from a known problem to an unknown one (PARITY §4n)
    scores = err.ravel() / (std.ravel() + 1e-12)
    row["k95"] = float(np.quantile(scores, 1.0 - alpha))
    # split-conformal: calibrate on a held-out random subset, verify on the
    # rest (a user with any labeled holdout can do exactly this; on these
    # datasets the grid minus the n_u training points is such a holdout —
    # the random subset overlaps them with negligible probability)
    n = scores.size
    m = int(min(n_cal, n // 4)) or 1
    idx = np.random.default_rng(seed).permutation(n)
    cal, rest = idx[:m], idx[m:]
    level = min(1.0, np.ceil((m + 1) * (1.0 - alpha)) / m)
    k_conf = float(np.quantile(scores[cal], level, method="higher"))
    row["k_conf95"] = k_conf
    band_ok = err.ravel() <= k_conf * std.ravel() + 1e-12
    row["cov_conf95"] = float(np.mean(band_ok[rest]))
    rest_shock = None
    if shock_mask is not None:
        rest_shock = np.zeros(n, bool)
        rest_shock[rest] = True
        rest_shock &= shock_mask
        if rest_shock.any():
            row["cov_conf95_shock"] = float(np.mean(band_ok[rest_shock]))
    if n_bins > 1 and m >= 2:
        s_all = (np.asarray(bin_feature, np.float64).ravel()
                 if bin_feature is not None else std.ravel())
        row["mond_feature"] = feature_name
        # taxonomy/scores split: edges from one half, per-bin quantiles
        # from the other, so bin membership is independent of the scores
        # it calibrates (the Mondrian exchangeability requirement)
        cal_edges, cal_scores = cal[: m // 2], cal[m // 2:]
        edges = np.quantile(
            s_all[cal_edges], np.linspace(0.0, 1.0, n_bins + 1)[1:-1]
        )
        bin_of = np.searchsorted(edges, s_all, side="right")
        mond_k = []
        for b in range(n_bins):
            sel = cal_scores[bin_of[cal_scores] == b]
            if sel.size >= 20:
                lvl = min(1.0, np.ceil((sel.size + 1) * (1.0 - alpha))
                          / sel.size)
                mond_k.append(
                    float(np.quantile(scores[sel], lvl, method="higher"))
                )
            else:  # too few points for a meaningful finite-sample quantile
                mond_k.append(k_conf)
        k_pt = np.asarray(mond_k)[bin_of]
        # the band is ALWAYS k * std — bin_feature only selects WHICH k
        mond_ok = err.ravel() <= k_pt * std.ravel() + 1e-12
        row["mond_edges"] = [float(e) for e in edges]
        row["mond_k"] = mond_k
        row["cov_mond95"] = float(np.mean(mond_ok[rest]))
        if rest_shock is not None and rest_shock.any():
            row["cov_mond95_shock"] = float(np.mean(mond_ok[rest_shock]))
    return row


def mond_band_factors(cal_row: dict, std, default: float = 2.0,
                      feature=None) -> np.ndarray:
    """Per-point band factors from one :func:`calibration_stats` row: the
    Mondrian binned conformal factors when present (each point binned by
    its own value of the row's ``mond_feature`` over ``mond_edges`` —
    predicted std by default, predicted |dx| for front-aware rows; pass it
    as ``feature``, else ``std`` is used), else a constant array of the
    global ``k_conf95`` (or ``default``). The serving-side twin is
    :meth:`pinns_tpu.serve.ServedModel.band_ks` (kept separate so serve.py
    needs only jax + the artifact)."""
    edges, mond_k = cal_row.get("mond_edges"), cal_row.get("mond_k")
    std = np.asarray(std, np.float64)
    if not edges or not mond_k:
        return np.full(std.shape, float(cal_row.get("k_conf95", default)))
    needs_dx = cal_row.get("mond_feature", "std") == "dx"
    if needs_dx and feature is None:
        # a 'dx'-calibrated row with no dx given: binning std against the
        # |d/dx| edges would put every point in the wrong bin — fall back
        # to the global conformal factor instead (band_ks does the same)
        return np.full(std.shape, float(cal_row.get("k_conf95", default)))
    # mirror ServedModel.band_ks: `feature` is used ONLY when the row was
    # calibrated on dx — a dx array passed to a std-calibrated row must not
    # be silently binned against std edges
    feat = np.asarray(feature, np.float64) if needs_dx else std
    idx = np.searchsorted(np.asarray(edges, np.float64), feat, side="right")
    return np.asarray(mond_k, np.float64)[idx]


def uq_calibration(trainer, stacked: TrainState, ks=(1.0, 2.0, 3.0),
                   n_bins: int = 4, mond_feature: str = "std") -> dict:
    """Coverage calibration of the deep-ensemble uncertainty on the dense
    evaluation grid: per field, the fraction of grid points whose true error
    |mean - exact| falls within k*std for each k, plus the same 2-sigma
    coverage restricted to the steepest-gradient decile of the exact field
    (the shock/contact region, where UQ claims matter most). A perfectly
    calibrated Gaussian ensemble would give ~0.68/0.95/0.997; deep ensembles
    are typically overconfident at sharp features — this measures by how
    much — and the returned split-conformal ``k_conf95``/``cov_conf95``
    (see :func:`calibration_stats`) is the shipped fix. Returns
    {field: {'cov1s':..,'cov2s':..,'cov3s':..,'cov2s_shock':..,
    'mean_std':..,'rmse':..,'k95':..,'k_conf95':..,'cov_conf95':..,
    'mond_edges':[..],'mond_k':[..],'cov_mond95':..,'cov_mond95_shock':..}}
    — the Mondrian binned factors hold coverage conditionally at
    fronts (:func:`mond_band_factors` applies them per point).

    ``mond_feature`` selects the Mondrian taxonomy: 'std' bins by predicted
    std (the round-3 estimator — under-covers the rho shock, PARITY §4n);
    'dx' bins by the predicted |d(field)/dx| from one vmapped Taylor-1 pass
    (front-aware; equally serving-time-computable — ensemble artifacts
    export it as ``{name}_dx``)."""
    if mond_feature not in ("std", "dx"):
        raise ValueError(f"unknown mond_feature {mond_feature!r} "
                         "(expected 'std' or 'dx')")
    ds = trainer.problem.dataset
    preds = ensemble_predict(trainer, stacked, ds.X_star,
                             want_dx=mond_feature == "dx")
    out = {}
    for name, p in preds.items():
        if name not in ds.star:  # residual outputs have no exact field
            continue
        # shock split: steepest-|d/dx| decile of the exact (Nt, Nx) grid
        gx = np.abs(
            np.gradient(np.asarray(ds.fields[name], np.float64), axis=1)
        )
        grad_mag = np.broadcast_to(
            gx.reshape(-1, 1), np.asarray(p["mean"]).shape
        )
        out[name] = calibration_stats(
            ds.star[name], p["mean"], p["std"], grad_mag=grad_mag, ks=ks,
            n_bins=n_bins,
            bin_feature=p.get("dx") if mond_feature == "dx" else None,
            feature_name=mond_feature,
        )
    return out


def run_ensemble(
    trainer,
    seeds: Sequence[int],
    rhos: Optional[Sequence[float]] = None,
    epochs: Optional[int] = None,
    stacked: Optional[TrainState] = None,
    mesh=None,
) -> tuple:
    """Train a stacked ensemble through the trainer's FULL optimizer schedule.

    This is the faithful replacement for one batch of reference farm jobs:
    the hybrid Adam -> L-BFGS switch (``Abgrall_ADMM.py:210-217``), metric
    logging, prediction snapshots, and checkpoints all run per member —
    member 0 streams through the trainer's own logger (same artifact names as
    a solo run), members >= 1 get `<name>_m<i>_*` files. Returns
    (stacked_state, [per-member summary dicts]).
    """
    exp = trainer.exp
    n = len(seeds)
    # No silent caps: vmapping over members only pays when the per-member
    # step underutilizes the chip. Measured (PARITY §4l/§6): 20-wide trunks
    # get ~2.4× over serial, but a 5×200 trunk already saturates the MXU —
    # an 8-member wide-net ensemble costs ~8× the solo wall clock.
    width = max(exp.model.layers[1:-1], default=0)
    if n > 1 and width >= 100:
        print(
            f"run_ensemble: trunk width {width} saturates a chip per member — "
            f"expect ~{n}x the solo wall clock (vmap adds no speedup for wide "
            f"nets; see PARITY.md §4l). Shard members over a mesh or run "
            f"fewer seeds if that is too slow.",
            flush=True,
        )
    if stacked is None:
        stacked = init_ensemble_states(trainer, seeds, rhos=rhos)
    if mesh is not None:
        from pinns_tpu.parallel.sharding import place_ensemble

        stacked = place_ensemble(stacked, mesh)

    out_dir = exp.train.out_dir or None
    loggers = [trainer.logger]
    for i in range(1, n):
        loggers.append(
            MetricsLogger(out_dir=out_dir, name=f"{exp.name}_m{i}", console=False)
        )

    total = exp.train.epochs if epochs is None else epochs
    chunk = max(1, min(exp.train.chunk, total))
    lbfgs_chunk = max(1, min(chunk // 100 or 1, 10))
    runs = {}
    # SWA tail averaging (TrainConfig.swa_frac) over the stacked params —
    # the trainer's jitted accumulator is shape-agnostic, so the member
    # axis rides along and every member gets its own average
    swa_start = (
        total - int(round(exp.train.swa_frac * total))
        if exp.train.swa_frac > 0.0
        else None
    )
    swa_avg, swa_n = None, 0

    epoch = int(np.asarray(stacked.epoch).flat[0])
    t0 = time.time()
    while epoch < total:
        phase = trainer._phase(epoch)
        length = chunk if phase == "adam" else lbfgs_chunk
        length = min(length, total - epoch)
        if phase == "adam" and exp.optimizer.kind == "hybrid":
            length = min(length, exp.optimizer.switch_epoch - epoch)
        key = (phase, length)
        if key not in runs:
            runs[key] = make_ensemble_chunk(trainer, length, phase)
        stacked, metrics = runs[key](stacked)
        epoch += length
        if swa_start is not None and epoch > swa_start:
            swa_avg, swa_n = trainer._swa_update(swa_avg, swa_n, stacked.params)

        # stop_tol mirrors Trainer.train (Hwan_L2's tolerance stop): for an
        # ensemble, stop once EVERY member's |loss| is under the tolerance
        if exp.train.stop_tol > 0.0:
            last_losses = np.asarray(metrics["loss"][-1])
            if np.all(np.abs(last_losses) <= exp.train.stop_tol):
                total = epoch  # triggers the final log below and exits

        if epoch >= total or _crossed(epoch, length, exp.train.log_every):
            # ONE device->host fetch for all members' last-step metrics
            keys = sorted(metrics)
            values = np.asarray(
                jnp.stack([metrics[k][-1] for k in keys])
            )  # (K, E)
            elapsed = time.time() - t0
            t0 = time.time()
            for i in range(n):
                loggers[i].log(
                    epoch=epoch,
                    phase=phase,
                    member=i,
                    elapsed=elapsed,
                    **{k: float(values[j, i]) for j, k in enumerate(keys)},
                )
        if out_dir and (
            _crossed(epoch, length, exp.train.snapshot_every)
            or _crossed(epoch, length, exp.train.checkpoint_every)
        ):
            want_snap = _crossed(epoch, length, exp.train.snapshot_every)
            want_ckpt = _crossed(epoch, length, exp.train.checkpoint_every)
            for i, member in enumerate(unstack_states(stacked, n)):
                if want_snap:
                    _member_snapshot(trainer, loggers[i], member, epoch)
                if want_ckpt:
                    trainer.save_checkpoint(member, tag=f"e{epoch}_m{i}")

    # same summary schema as a solo run (incl. the epoch actually reached —
    # stop_tol can end the schedule early)
    summaries = [
        dict(s, epochs=epoch) for s in evaluate_ensemble(trainer, stacked, n)
    ]
    if swa_n > 0:
        swa_params = jax.jit(
            lambda a, p: jax.tree_util.tree_map(
                lambda x, y: x.astype(y.dtype), a, p
            )
        )(swa_avg, stacked.params)
        swa_stacked = stacked._replace(params=swa_params)
        for i, member in enumerate(unstack_states(swa_stacked, n)):
            summaries[i]["swa_snapshots"] = swa_n
            for k, v in trainer.evaluate(member).items():
                summaries[i][f"swa_{k}"] = v
            if out_dir:
                trainer.save_checkpoint(member, tag=f"swa_m{i}")
    for i, (logger, summary) in enumerate(zip(loggers, summaries)):
        logger.write_summary(dict(summary, member=i, seed=int(seeds[i])))
    if out_dir:
        for i, member in enumerate(unstack_states(stacked, n)):
            trainer.save_checkpoint(member, tag=f"final_m{i}")
    return stacked, summaries


def _member_snapshot(trainer, logger, state, epoch):
    """Full-grid prediction snapshot for one member (same CSV schema as the
    solo path, ``Abgrall_ADMM.py:400-409``)."""
    ds = trainer.problem.dataset
    preds = trainer.predict(state.params, ds.X_star)
    cols = {"x": ds.X_star[:, 0], "t": ds.X_star[:, 1]}
    for name in ds.field_names:
        cols[f"{name}_pred"] = preds[name][:, 0]
    cols["epoch"] = np.full(ds.X_star.shape[0], epoch)
    logger.append_snapshot(cols)


def _crossed(epoch: int, length: int, every: int) -> bool:
    return every > 0 and (epoch // every) != ((epoch - length) // every)
