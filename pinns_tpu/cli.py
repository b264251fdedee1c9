"""Command-line interface: train / sweep / eval / bench / plot / animate.

Replaces the reference's per-script positional-argv entry points
(``Abgrall_ADMM.py:412-421``: ``./Abgrall_ADMM.py N_u N_f rho epochs gpu``)
and the MPI scheduler launch with one typed CLI over the preset registry:

  python -m pinns_tpu train --preset abgrall_admm --set sampling.n_f=4000
  python -m pinns_tpu sweep --preset abgrall_admm \
      --grid data.n_u=100,200,400 --grid sampling.n_f=100,200,500,1000
  python -m pinns_tpu plot --preset abgrall_admm --checkpoint out/run.ckpt
  python -m pinns_tpu animate --preset abgrall_admm --snapshots out/..._snapshots.csv

The GPU-pinning knob (``Parameters.gpu``) has no TPU analog — device placement
is the mesh's job (--mesh-data shards the collocation axis over devices).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys


def _parse_value(text: str):
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def _parse_sets(pairs):
    out = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        key, value = pair.split("=", 1)
        out[key] = _parse_value(value)
    return out


def _build_exp(args):
    from pinns_tpu.config import override
    from pinns_tpu.experiments import get_preset

    exp = get_preset(args.preset)
    updates = _parse_sets(args.set)
    if getattr(args, "epochs", None) is not None:
        updates["train.epochs"] = args.epochs
    if getattr(args, "out_dir", None):
        updates["train.out_dir"] = args.out_dir
    return override(exp, updates)


def cmd_presets(_args):
    from pinns_tpu.experiments import PRESETS

    for name, exp in PRESETS.items():
        print(
            f"{name:20s} pde={exp.pde.kind:8s} loss={exp.loss.residual_kind:10s}"
            f" layers={len(exp.model.layers) - 2}x{exp.model.layers[1]}"
            f" n_u={exp.data.n_u} n_f={exp.sampling.n_f}"
            f" opt={exp.optimizer.kind} dataset={exp.data.dataset}"
        )
    return 0


def cmd_train(args):
    from pinns_tpu.train import Trainer

    exp = _build_exp(args)
    if args.ensemble == 1 and exp.mesh.ensemble > 1:
        args.ensemble = exp.mesh.ensemble
    if args.mesh_data == 1 and exp.mesh.data_parallel > 1:
        args.mesh_data = exp.mesh.data_parallel  # config-driven default
    trainer = Trainer(exp)

    if args.ensemble > 1:
        # vmapped seed ensemble (the reference job farm's replacement);
        # members = seeds train.seed .. train.seed + E - 1; runs the full
        # optimizer schedule (incl. hybrid Adam -> L-BFGS) with per-member
        # logs/snapshots/checkpoints — same artifact set as a solo run
        from pinns_tpu.parallel.ensemble import run_ensemble

        mesh = None
        if args.mesh_data > 1:
            from pinns_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(data=args.mesh_data, ensemble=args.ensemble)
        seeds = [exp.train.seed + i for i in range(args.ensemble)]
        stacked0 = None
        if args.resume:
            # resume a crashed ensemble from its per-member checkpoints:
            # --resume is the PREFIX (e.g. out/<name>_e50000) of the
            # <prefix>_m<i>.ckpt files train.checkpoint_every wrote
            import os

            from pinns_tpu.parallel.ensemble import stack_states

            members = []
            for i in range(args.ensemble):
                path = f"{args.resume}_m{i}.ckpt"
                if not os.path.exists(path):
                    raise SystemExit(
                        f"ensemble resume: missing member checkpoint {path} "
                        f"(--resume takes the prefix of the _m<i>.ckpt set)"
                    )
                members.append(trainer.load_checkpoint(path))
            stacked0 = stack_states(members)
        stacked, summaries = run_ensemble(
            trainer, seeds, mesh=mesh, stacked=stacked0
        )
        for seed, summary in zip(seeds, summaries):
            print(json.dumps(dict(summary, seed=seed)))
        if args.select:
            # ground-truth-free pick-best (PARITY §4p): training-data misfit
            # + fresh-batch residual of the trained objective, per member —
            # the deployment answer to seed spread / flaky hybrid tails
            from pinns_tpu.parallel.ensemble import (
                select_member,
                selection_scores,
            )

            scores = selection_scores(trainer, stacked, len(seeds))
            pick = select_member(scores)
            print(json.dumps({
                "selected_member": pick,
                "seed": seeds[pick],
                "checkpoint": f"{exp.name}_final_m{pick}.ckpt",
                "scores": scores,
            }))
        return 0

    state = None
    mesh = None
    if args.mesh_data > 1:
        from pinns_tpu.parallel.mesh import make_mesh
        from pinns_tpu.parallel.sharding import place_state, shard_trainer

        mesh = make_mesh(data=args.mesh_data, ensemble=1)
        shard_trainer(trainer, mesh)
        state = place_state(trainer.init_state(), mesh)
    if args.resume:
        state = trainer.load_checkpoint(args.resume)
        if mesh is not None:
            from pinns_tpu.parallel.sharding import place_state

            state = place_state(state, mesh)  # restore the sharded layout
    state, summary = trainer.train(state)
    print(json.dumps(summary))
    return 0


def _split_top_level(text: str):
    """Split on commas not nested inside (), [] or {} — so tuple-valued grid
    entries like model.layers=(2,8,1),(2,16,1) parse as two values."""
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in parts if p]


def cmd_sweep(args):
    from pinns_tpu.parallel.sweep import cartesian_grid, run_sweep

    exp = _build_exp(args)
    lists = {}
    for spec in args.grid:
        key, values = spec.split("=", 1)
        lists[key] = [_parse_value(v) for v in _split_top_level(values)]
    grid = cartesian_grid(lists)
    results = run_sweep(
        exp, grid, retries=args.retries, out_path=args.out,
        epochs=args.epochs, concurrent=False if args.serial else None,
    )
    ok = sum(1 for r in results if r.status == "ok")
    print(f"{ok}/{len(results)} configurations succeeded")
    for r in results:
        line = {"overrides": r.overrides, "status": r.status}
        if r.summary:
            line.update({k: v for k, v in r.summary.items() if k.startswith("rel_l2")})
        print(json.dumps(line))
    return 0 if ok == len(results) else 1


def cmd_eval(args):
    from pinns_tpu.train import Trainer

    if getattr(args, "artifact", None):
        return _eval_artifact(args)
    if not args.checkpoint:
        raise SystemExit("eval needs --checkpoint or --artifact")
    if not args.preset:
        raise SystemExit("eval --checkpoint needs --preset")
    exp = _build_exp(args)
    trainer = Trainer(exp)
    state = trainer.load_checkpoint(args.checkpoint)
    print(json.dumps(trainer.evaluate(state)))
    return 0


def _eval_artifact(args):
    """Grade a deployed serving artifact against the dataset's exact grid —
    no checkpoint or training state needed (the quality gate for rollouts:
    everything comes from the artifact dir + the named dataset). For
    ensemble artifacts also measures the served band's actual coverage,
    |mean - exact| <= band_k(field)*std per field (band_k is the baked
    conformal k_conf95 when the artifact was exported with --calibrate,
    else the 2.0 default)."""
    import numpy as np

    from pinns_tpu.serve import load_exported
    from pinns_tpu.train import Trainer
    from pinns_tpu.train.evaluate import relative_l2

    served = load_exported(args.artifact)
    if not args.preset:
        args.preset = served.meta["experiment"]
    exp = _build_exp(args)
    trainer = Trainer(exp)
    ds = trainer.problem.dataset
    preds = served.predict(np.asarray(ds.X_star))
    out = {"artifact": args.artifact, "experiment": exp.name,
           # 'stored' reference .mat vs 'native' regenerated oracle — the
           # two ground truths differ materially for Euler u (PARITY §2)
           "truth": getattr(ds, "provenance", "unknown")}
    for name in sorted(ds.star):
        if name not in preds:
            continue
        exact = np.asarray(ds.star[name])
        out[f"rel_l2_{name}"] = relative_l2(preds[name], exact)
        std = preds.get(f"{name}_std")
        if std is not None:
            k = served.band_k(name)
            err = np.abs(np.asarray(preds[name]) - exact)
            out[f"band_k_{name}"] = round(float(k), 4)
            out[f"band_cov_{name}"] = float(np.mean(err <= k * np.asarray(std)))
            cal = (served.meta.get("calibration") or {}).get(name, {})
            if cal.get("mond_k"):  # Mondrian binned bands (serve.band_ks)
                kpt = served.band_ks(
                    name, std, feature=preds.get(f"{name}_dx"),
                )
                out[f"band_cov_mond_{name}"] = float(
                    np.mean(err <= kpt * np.asarray(std))
                )
    print(json.dumps(out))
    return 0


def cmd_export(args):
    from pinns_tpu.serve import export_ensemble, export_predict
    from pinns_tpu.train import Trainer

    exp = _build_exp(args)
    trainer = Trainer(exp)
    if getattr(args, "select", None):
        return _export_selected(args, trainer)
    if len(args.checkpoint) == 1 and not args.calibrate:
        state = trainer.load_checkpoint(args.checkpoint[0])
        path = export_predict(trainer, state.params, args.out)
        print(path)
        return 0
    # ensemble artifact from per-member checkpoints (the files
    # `train --ensemble E` writes as <name>_final_m<i>.ckpt)
    import jax
    import numpy as np

    if len(args.checkpoint) == 1:
        raise SystemExit(
            "--calibrate needs an ensemble: pass every member checkpoint "
            "(calibration is the conformal factor over member spread)"
        )
    states = [trainer.load_checkpoint(c) for c in args.checkpoint]
    stacked_params = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *[s.params for s in states],
    )
    cal = None
    if args.calibrate:
        from pinns_tpu.parallel.ensemble import uq_calibration

        stacked = states[0]._replace(params=stacked_params)
        cal = uq_calibration(trainer, stacked, mond_feature=args.mond_feature)
        for field, row in cal.items():
            print(json.dumps({"field": field, **{
                k: ([round(float(x), 4) for x in v] if isinstance(v, list)
                    else v if isinstance(v, str) else round(float(v), 4))
                for k, v in row.items()
            }}))
    path = export_ensemble(trainer, stacked_params, args.out, calibration=cal)
    print(path)
    return 0


def _export_selected(args, trainer):
    """`export --select {score,consensus}`: ground-truth-free member
    selection over the given checkpoints, exporting the chosen member as a
    solo artifact. The principled replacement for the reference's
    pick-by-eye over per-run CSVs (``Abgrall_ADMM.py:311-319``): 'score'
    ranks by the training objective's truth-free surrogate (data misfit +
    mean-square residual at fresh points), 'consensus' by field distance
    to the anchor ensemble's mean prediction — the selector that picked
    the oracle L-BFGS-tailed member on the measured Euler instance where
    the residual score failed (PARITY §4r). Serve the ensemble MEAN (plain
    `export`, with `--calibrate` bands) when you want robustness with zero
    selection risk; select a member when chasing the tail upside."""
    import jax
    import numpy as np

    from pinns_tpu.parallel.ensemble import select_member, selection_scores
    from pinns_tpu.serve import export_predict

    if args.calibrate:
        raise SystemExit(
            "--select exports a single member (no ensemble spread to "
            "calibrate); use a plain ensemble export for calibrated bands"
        )
    if len(args.checkpoint) < 2:
        raise SystemExit("--select needs >= 2 member checkpoints to rank")

    def stack(paths):
        states = [trainer.load_checkpoint(c) for c in paths]
        return states, jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[s.params for s in states],
        )

    states, stacked_params = stack(args.checkpoint)
    anchor_params = None
    if args.select in ("consensus", "rank"):
        anchor_params = (stack(args.anchor)[1] if args.anchor
                         else stacked_params)
    stacked = states[0]._replace(params=stacked_params)
    scores = selection_scores(
        trainer, stacked, len(states),
        seed=trainer.exp.train.seed + 777, anchor_params=anchor_params,
    )
    sel = select_member(scores, by=args.select)
    print(json.dumps({"selected": sel, "by": args.select,
                      "scores": scores}))
    path = export_predict(trainer, states[sel].params, args.out)
    # record the selection in the artifact meta for rollout audit
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["selection"] = {
        "by": args.select, "selected": sel,
        "checkpoints": list(args.checkpoint),
        "anchor": list(args.anchor) if args.anchor else None,
        "scores": scores,
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1, default=str)
    print(path)
    return 0


def cmd_serve(args):
    if args.backend:
        # must happen before first device use; the JAX_PLATFORMS env var
        # does not override a sitecustomize-pinned platform, this does
        import jax

        try:
            jax.config.update("jax_platforms", args.backend)
        except RuntimeError:
            pass

    from pinns_tpu.serve import make_http_server

    server = make_http_server(args.artifact, host=args.host, port=args.port)
    host, port = server.server_address[:2]
    print(f"serving {args.artifact} at http://{host}:{port} "
          f"(GET /meta, POST /predict)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


def cmd_predict(args):
    """Batch offline inference from a serving artifact — the bulk twin of
    the HTTP service (same artifact, same fields, same calibrated-band
    policy): points in from .npz/'x' or a 2-column CSV, predictions out to
    .npz or .csv. Needs no Experiment config or checkpoint."""
    if args.backend:
        import jax

        try:
            jax.config.update("jax_platforms", args.backend)
        except RuntimeError:
            pass
    import numpy as np

    from pinns_tpu.serve import load_exported

    served = load_exported(args.artifact)
    if args.points.endswith(".npz"):
        x = np.load(args.points)["x"]
    else:
        with open(args.points) as f:
            first = f.readline()
        x = np.loadtxt(
            args.points, delimiter="," if "," in first else None,
            skiprows=1 if any(c.isalpha() for c in first) else 0,
        )
    x = np.atleast_2d(np.asarray(x, np.float32))
    out = served.predict(x)
    if args.bands:
        cal = served.meta.get("calibration") or {}
        if not cal:  # same policy as the HTTP service: no silent 2*std
            raise SystemExit(
                "artifact carries no calibration metadata; export with "
                "--calibrate to emit bands"
            )
        for k in list(out):
            if k.endswith("_std"):
                name = k[: -len("_std")]
                if name in cal:
                    out[f"{name}_band"] = served.band_ks(
                        name, out[k], feature=out.get(f"{name}_dx"),
                    ) * np.asarray(out[k], np.float64)
    if args.out.endswith(".npz"):
        np.savez(args.out, x=x,
                 **{k: np.asarray(v, np.float32) for k, v in out.items()})
    else:
        names = sorted(out)
        cols = [x[:, 0], x[:, 1]] + [
            np.asarray(out[k], np.float32).ravel() for k in names
        ]
        np.savetxt(args.out, np.column_stack(cols), delimiter=",",
                   header="x,t," + ",".join(names), comments="")
    print(args.out)
    return 0


def cmd_plot(args):
    from pinns_tpu.train import Trainer
    from pinns_tpu.viz.plots import plot_from_snapshots, plot_solution

    exp = _build_exp(args)
    trainer = Trainer(exp)
    if args.snapshots:
        path = plot_from_snapshots(
            trainer.problem.dataset, args.snapshots, epoch=args.epoch,
            out_path=args.out,
        )
    else:
        state = trainer.load_checkpoint(args.checkpoint)
        preds = trainer.predict(state.params, trainer.problem.dataset.X_star)
        path = plot_solution(
            trainer.problem.dataset,
            preds,
            x_data=trainer.problem.x_data,
            out_path=args.out,
        )
    print(path)
    return 0


def cmd_animate(args):
    from pinns_tpu.train import build_problem
    from pinns_tpu.viz.animate import animate_snapshots

    exp = _build_exp(args)
    problem = build_problem(exp)
    path = animate_snapshots(
        problem.dataset, args.snapshots, field=args.field, out_path=args.out,
        fps=args.fps,
    )
    print(path)
    return 0


def cmd_polish(args):
    """float64 L-BFGS polish of a trained checkpoint, on CPU.

    The f32 TPU line search floors around rel-L2 ~1.2e-3 on the canonical
    forward problem; the reference's SciPy L-BFGS-B ran in float64. The nets
    are tiny, so a deep f64 solve on host costs seconds and recovers the
    literature-grade tail. Writes <checkpoint>.polished.ckpt.
    """
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    # x64 is process-global; restore it on exit so in-process callers
    # (tests, notebooks) don't inherit float64 default promotion
    x64_before = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        return _cmd_polish_x64(args)
    finally:
        jax.config.update("jax_enable_x64", x64_before)


def _cmd_polish_x64(args):
    import jax
    import jax.numpy as jnp

    from pinns_tpu.opt.lbfgs import lbfgs_minimize_pytree
    from pinns_tpu.train import Trainer
    from pinns_tpu.train import checkpoint as ckpt_io
    from pinns_tpu.train.trainer import make_loss_fn

    from pinns_tpu.config import override

    exp = override(_build_exp(args), {
        "model.dtype": "float64",
        "model.precision": "highest",
    })
    trainer = Trainer(exp)
    state = trainer.load_checkpoint(args.checkpoint)

    to64 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    params = to64(state.params)
    colloc = to64(state.colloc)
    admm = None if state.admm is None else to64(state.admm)

    loss_fn = make_loss_fn(trainer.problem)
    params, res = lbfgs_minimize_pytree(
        lambda p: loss_fn(p, colloc, admm)[0],
        params,
        max_iters=args.max_iters,
        history=exp.optimizer.lbfgs.history,
        ftol=1e-15,
        gtol=1e-12,
    )
    print(
        f"f64 L-BFGS: {int(res.n_iters)} iters, loss {float(res.f):.3e}, "
        f"converged={bool(res.converged)}"
    )
    polished = state._replace(params=params, colloc=colloc, admm=admm)
    print(json.dumps(trainer.evaluate(polished)))
    out = args.out or (args.checkpoint + ".polished.ckpt")
    ckpt_io.save_checkpoint(out, polished, meta={"polished": True})
    print(out)
    return 0


def cmd_generate_data(args):
    # Data generation is tiny CPU work; don't burn (or wait on) an accelerator.
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; run wherever we are

    from pinns_tpu.data import generators as g

    native = {  # each dataset's native (nx, nt)
        "burgers_shock": (256, 100), "burgers_twosin": (513, 101),
        "twosin_dataset": (513, 101), "abgrall_dataset": (257, 257),
        "euler": (1500, 157), "euler_dataset": (300, 157),
    }[args.kind]
    nx = args.nx or native[0]
    nt = args.nt or native[1]
    if args.kind == "burgers_shock":
        data = g.make_burgers_shock_grid(nx=nx, nt=nt, nu=args.nu)
    elif args.kind == "burgers_twosin":
        data = g.burgers_fv(
            g.two_sin_ic, nx=nx, nt=nt, t_final=args.t_final, nu=args.nu,
        )
    elif args.kind == "twosin_dataset":
        # faithful reproduction of TwoSin_burgers_shock.mat (identified IC +
        # measured adaptive-CFL clock; max 1.4% vs the stored artifact)
        data = g.make_twosin_grid(nx=nx, nt=nt)
    elif args.kind == "abgrall_dataset":
        # faithful reproduction of Abgrall_burgers_shock.mat (max 1.7%)
        data = g.make_abgrall_burgers_grid(nx=nx, nt=nt)
    elif args.kind == "euler_dataset":
        # Abgrall_eulers.mat from the EXACT Riemann solution (zero oracle
        # error; the stored DG artifact itself measures rho 2.3%/u 28%/
        # E 2.7% max-column error against it — PARITY §2)
        data = g.make_abgrall_eulers_grid(nx=nx, nt=nt)
    elif args.kind == "euler":
        data = g.euler_solve(nx=nx, n_snapshots=nt, t_final=args.t_final)
    else:
        raise SystemExit(f"unknown kind {args.kind!r}")
    print(g.save_mat(args.out, data))
    return 0


def cmd_bench(_args):
    import runpy

    runpy.run_module("bench", run_name="__main__")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="pinns_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def add_common(p):
        p.add_argument("--preset", required=True)
        p.add_argument(
            "--set", action="append", metavar="KEY=VALUE",
            help="dotted config override, e.g. sampling.n_f=4000",
        )
        p.add_argument("--epochs", type=int, default=None)
        p.add_argument("--out-dir", default=None)

    p = sub.add_parser("presets", help="list available experiment presets")
    p.set_defaults(fn=cmd_presets)

    p = sub.add_parser("train", help="train a preset")
    add_common(p)
    p.add_argument("--resume", default=None,
                   help="checkpoint to resume from; with --ensemble E, the "
                   "PREFIX of the per-member set (<prefix>_m<i>.ckpt)")
    p.add_argument("--mesh-data", type=int, default=1,
                   help="shard the collocation axis over this many devices")
    p.add_argument("--ensemble", type=int, default=1)
    p.add_argument("--select", action="store_true",
                   help="after an --ensemble run, score members WITHOUT "
                   "ground truth (training-data misfit + fresh-batch "
                   "residual) and report the best member + its checkpoint "
                   "(measured selector quality: PARITY.md §4p)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("sweep", help="hyperparameter sweep")
    add_common(p)
    p.add_argument("--grid", action="append", required=True,
                   metavar="KEY=V1,V2,...")
    p.add_argument("--retries", type=int, default=1)
    p.add_argument("--out", default=None, help="JSONL results path")
    p.add_argument("--serial", action="store_true",
                   help="disable concurrent dispatch of non-vmappable "
                        "units over the local devices")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser(
        "eval",
        help="evaluate a checkpoint, or grade a serving artifact in place "
        "(rel-L2 per field + served-band coverage; no checkpoint needed)",
    )
    p.add_argument(
        "--preset", default=None,
        help="with --artifact, defaults to the artifact's own experiment",
    )
    p.add_argument(
        "--set", action="append", metavar="KEY=VALUE",
        help="dotted config override, e.g. sampling.n_f=4000",
    )
    p.add_argument("--checkpoint", default=None)
    p.add_argument(
        "--artifact", default=None,
        help="exported artifact directory (from `export`)",
    )
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser(
        "export",
        help="export checkpoint(s) as a self-contained serving artifact "
        "(StableHLO, weights baked in, symbolic batch dim); several "
        "checkpoints -> one ensemble mean+std artifact",
    )
    add_common(p)
    p.add_argument(
        "--checkpoint", required=True, nargs="+",
        help="one checkpoint for a point model, or every member checkpoint "
        "(train --ensemble E writes <name>_final_m<i>.ckpt) for an "
        "ensemble UQ artifact",
    )
    p.add_argument("--out", default="exported_model", help="artifact directory")
    p.add_argument(
        "--calibrate", action="store_true",
        help="bake split-conformal band factors (k_conf95 per field, "
        "measured on the preset's evaluation grid) into the ensemble "
        "artifact's meta.json",
    )
    p.add_argument(
        "--select", choices=("score", "consensus", "rank"),
        help="export ONE member picked ground-truth-free from the given "
        "checkpoints instead of the ensemble mean: 'score' = lowest "
        "data-misfit + mean-square residual; 'consensus' = smallest "
        "field distance to the anchor ensemble's mean prediction; "
        "'rank' = rank-sum agreement of both (picked the oracle tailed "
        "member on every measured converged instance — the two single "
        "signals each failed one, PARITY §4r/§4t). Prints the per-member "
        "scores; the chosen index and scores go in the artifact meta",
    )
    p.add_argument(
        "--anchor", nargs="+", default=None,
        help="anchor ensemble checkpoints for --select consensus (the "
        "Adam-only members the L-BFGS tails started from). Default: the "
        "--checkpoint members themselves (self-consensus = most central "
        "member)",
    )
    p.add_argument(
        "--mond-feature", choices=("std", "dx"), default="dx",
        help="Mondrian conformal binning feature: the front-aware "
        "predicted |d(field)/dx| (default — measured on the real Euler "
        "ensemble it restores shock-conditional coverage the std taxonomy "
        "misses: rho .85->.99 at the front, PARITY §4r; the artifact then "
        "exports {field}_dx and serves bands binned on it) or the "
        "round-3 predicted-std taxonomy",
    )
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "predict",
        help="batch offline inference from a serving artifact: points in "
        "(.npz with 'x', or a 2-column CSV), predictions out (.npz/.csv); "
        "--bands adds calibrated half-widths on calibrated ensembles",
    )
    p.add_argument("--artifact", required=True, help="exported artifact dir")
    p.add_argument(
        "--points", required=True,
        help=".npz with an 'x' array of shape (N, 2), or a CSV/whitespace "
        "table of (x, t) rows (a header line is skipped)",
    )
    p.add_argument("--out", default="predictions.npz",
                   help="output path; .npz or anything else as CSV")
    p.add_argument(
        "--bands", action="store_true",
        help="also emit {field}_band calibrated ~95 percent half-widths "
        "(requires an ensemble artifact exported with --calibrate)",
    )
    p.add_argument("--backend", default="",
                   help="jax platform (e.g. 'cpu'); empty = default backend")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser(
        "serve",
        help="HTTP JSON prediction server over an exported artifact "
        "(GET /meta, POST /predict with {\"x\": [[x, t], ...]})",
    )
    p.add_argument("--artifact", required=True, help="exported artifact dir")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument(
        "--backend", default="",
        help="jax platform for serving (e.g. 'cpu'); empty = default backend",
    )
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("plot", help="solution/comparison figure")
    add_common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--snapshots", default=None, help="snapshot CSV stream")
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--out", default="solution.png")
    p.set_defaults(fn=cmd_plot)

    p = sub.add_parser("animate", help="convergence animation from snapshots")
    add_common(p)
    p.add_argument("--snapshots", required=True)
    p.add_argument("--field", default=None)
    p.add_argument("--fps", type=int, default=5)
    p.add_argument("--out", default="convergence.mp4")
    p.set_defaults(fn=cmd_animate)

    p = sub.add_parser(
        "polish", help="float64 L-BFGS polish of a checkpoint (CPU)"
    )
    add_common(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--max-iters", type=int, default=20_000)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_polish)

    p = sub.add_parser(
        "generate-data", help="generate ground-truth datasets natively (no MATLAB)"
    )
    p.add_argument("--kind", required=True,
                   choices=["burgers_shock", "burgers_twosin",
                            "twosin_dataset", "abgrall_dataset",
                            "euler_dataset", "euler"])
    p.add_argument("--out", required=True, help="output .mat path")
    p.add_argument("--nx", type=int, default=None,
                   help="grid points (default: the dataset's native size)")
    p.add_argument("--nt", type=int, default=None)
    p.add_argument("--nu", type=float, default=0.01 / 3.141592653589793)
    p.add_argument("--t-final", type=float, default=1.0)
    p.set_defaults(fn=cmd_generate_data)

    p = sub.add_parser("bench", help="run the benchmark harness")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
