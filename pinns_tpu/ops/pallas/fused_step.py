"""The whole training step as ONE Pallas kernel launch.

At the canonical flagship config (N_f=1000, 8x20 net) the fused XLA step costs
~82 us while its arithmetic is ~10 us — the rest is the many small kernels XLA
schedules per scan iteration. Here the ENTIRE per-epoch body of the reference
hot loop (``Abgrall_ADMM.py:210-226``):

  loss + grads (Taylor-mode residual, third-order AD) -> Adam update ->
  on-device uniform resampling -> residuals at the new points ->
  ADMM z/dual updates -> metrics

runs inside a single kernel, with every tensor (collocation batch, ADMM
vectors, params, Adam moments) resident in VMEM for the whole step. The
gradient is not hand-derived: ``jax.value_and_grad`` is applied inside the
kernel body at trace time, so Mosaic lowers the generated backward alongside
the forward — exactness comes for free and is pinned against the XLA step in
tests.

Scope (v1): Burgers, 'admm' or sum-penalty losses, 'resample_uniform'
collocation, microbatch=1, frozen PDE coefficients, and the whole batch in
one grid cell (VMEM-capacity-guarded). Everything else falls back to the XLA
step. Randomness uses the TPU core PRNG seeded per step from the carried JAX
key, so trajectories differ from the XLA path only by RNG stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pinns_tpu.models.mlp import MLPSpec
from pinns_tpu.ops.pallas.fused_mlp import _dot

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

# optax.adam defaults (the reference uses tf.train.AdamOptimizer defaults,
# which match: lr 1e-3 passed in, b1=0.9, b2=0.999, eps=1e-8)
_B1, _B2, _EPS = 0.9, 0.999, 1e-8


def fused_step_supported(exp, spec: MLPSpec, n_devices: int = 1) -> bool:
    """Static eligibility check for the single-kernel step."""
    if not _PALLAS_IMPORTED:
        return False
    widths = max(spec.layers)
    vmem_estimate = exp.sampling.n_f * max(widths, 128) * 4 * 12
    return (
        exp.pde.kind == "burgers"
        and exp.optimizer.lr_schedule == "constant"  # kernel bakes lr in
        and not exp.pde.train_coeffs
        and exp.sampling.strategy == "resample_uniform"
        and exp.sampling.microbatch <= 1
        and exp.sampling.t_curriculum_epochs == 0
        and exp.loss.data_kind == "mse_sum"
        and exp.loss.data_weight == 1.0
        and exp.loss.residual_weight == 1.0
        # the kernel hardcodes float32 buffers and the reference's
        # 'resampled' ADMM update semantics — other configs take the XLA step
        and spec.dtype == jnp.float32
        and not spec.mixed
        and exp.loss.admm_update_points == "resampled"
        and n_devices == 1
        and vmem_estimate < 10 * 1024 * 1024
    )


def _normalize_scalar(spec: MLPSpec, x):
    """[-1,1] rescale built from scalar constants only (kernels cannot
    capture array constants)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    lb = jnp.where(col == 0, spec.lb[0], spec.lb[1]).astype(x.dtype)
    ub = jnp.where(col == 0, spec.ub[0], spec.ub[1]).astype(x.dtype)
    return 2.0 * (x - lb) / (ub - lb) - 1.0


def _taylor2_inline(spec: MLPSpec, params, x):
    """The Taylor-2 pass, written in plain jnp on values (traced in-kernel)."""
    sx = 2.0 / (spec.ub[0] - spec.lb[0])
    st = 2.0 / (spec.ub[1] - spec.lb[1])
    h = _normalize_scalar(spec, x)
    col = jax.lax.broadcasted_iota(jnp.int32, h.shape, dimension=1)
    hx = jnp.where(col == 0, sx, 0.0)
    ht = jnp.where(col == 1, st, 0.0)
    hxx = jnp.zeros_like(h)
    for layer in params[:-1]:
        w, b = layer["W"], layer["b"]
        p = _dot(h, w) + b
        px = _dot(hx, w)
        pt = _dot(ht, w)
        pxx = _dot(hxx, w)
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        spp = -2.0 * s * sp
        h, hx, ht, hxx = s, sp * px, sp * pt, spp * px * px + sp * pxx
    w, b = params[-1]["W"], params[-1]["b"]
    return _dot(h, w) + b, _dot(hx, w), _dot(ht, w), _dot(hxx, w)


def _forward_inline(spec: MLPSpec, params, x):
    h = _normalize_scalar(spec, x)
    for layer in params[:-1]:
        h = jnp.tanh(_dot(h, layer["W"]) + layer["b"])
    return _dot(h, params[-1]["W"]) + params[-1]["b"]


_B = 32  # lanes per derivative-stream block (4 streams x 32 = 128 lanes)


def _taylor2_packed_inline(spec: MLPSpec, params, x):
    """Lane-packed Taylor-2 for narrow nets (all dims <= 32): the four
    derivative streams live in four 32-lane blocks of one (N, 128) tile and
    every layer runs ONE MXU matmul against a block-diagonal weight — 4x
    fewer MXU rows than the unpacked form, for the backward pass too (AD
    differentiates straight through the packing)."""
    sx = 2.0 / (spec.ub[0] - spec.lb[0])
    st = 2.0 / (spec.ub[1] - spec.lb[1])
    n = x.shape[0]
    h = _normalize_scalar(spec, x)  # (N, 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 4 * _B), dimension=1)
    packed = (
        jnp.where(col == 0, h[:, 0:1], 0.0)
        + jnp.where(col == 1, h[:, 1:2], 0.0)
        + jnp.where(col == _B, sx, 0.0)
        + jnp.where(col == 2 * _B + 1, st, 0.0)
    )

    def block_diag4(w):
        din, dout = w.shape
        wp = jnp.concatenate(
            [w, jnp.zeros((din, _B - dout), w.dtype)], axis=1
        )
        wp = jnp.concatenate(
            [wp, jnp.zeros((_B - din, _B), w.dtype)], axis=0
        )
        zero = jnp.zeros((_B, _B), w.dtype)
        row0 = jnp.concatenate([wp, zero, zero, zero], axis=1)
        row1 = jnp.concatenate([zero, wp, zero, zero], axis=1)
        row2 = jnp.concatenate([zero, zero, wp, zero], axis=1)
        row3 = jnp.concatenate([zero, zero, zero, wp], axis=1)
        return jnp.concatenate([row0, row1, row2, row3], axis=0)

    for layer in params[:-1]:
        w, b = layer["W"], layer["b"]
        p4 = _dot(packed, block_diag4(w))
        b_pad = jnp.concatenate(
            [b, jnp.zeros((1, _B - b.shape[1]), b.dtype)], axis=1
        )
        p = p4[:, 0:_B] + b_pad
        px = p4[:, _B : 2 * _B]
        pt = p4[:, 2 * _B : 3 * _B]
        pxx = p4[:, 3 * _B : 4 * _B]
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        spp = -2.0 * s * sp
        packed = jnp.concatenate(
            [s, sp * px, sp * pt, spp * px * px + sp * pxx], axis=1
        )

    w, b = params[-1]["W"], params[-1]["b"]
    y4 = _dot(packed, block_diag4(w))
    k = spec.out_dim
    return (
        y4[:, 0:k] + b,
        y4[:, _B : _B + k],
        y4[:, 2 * _B : 2 * _B + k],
        y4[:, 3 * _B : 3 * _B + k],
    )


def _step_kernel(
    spec: MLPSpec,
    cfg: dict,  # static: n_u, n_f, rho, lr, lam1, lam2, residual_kind,
    #            explicit_inner, lb, ub
    seed_ref,
    t_ref,
    xd_ref,
    ud_ref,
    colloc_ref,
    z_ref,
    dual_ref,
    *refs,
):
    n_layers = len(spec.layers) - 1
    wb = refs[0 : 2 * n_layers]
    mu = refs[2 * n_layers : 4 * n_layers]
    nu = refs[4 * n_layers : 6 * n_layers]
    outs = refs[6 * n_layers :]
    (colloc_o, z_o, dual_o, metrics_o) = outs[0:4]
    wb_o = outs[4 : 4 + 2 * n_layers]
    mu_o = outs[4 + 2 * n_layers : 4 + 4 * n_layers]
    nu_o = outs[4 + 4 * n_layers : 4 + 6 * n_layers]

    params = [
        {"W": wb[2 * i][:], "b": wb[2 * i + 1][:]} for i in range(n_layers)
    ]
    xd, ud = xd_ref[:], ud_ref[:]
    colloc, z, dual = colloc_ref[:], z_ref[:], dual_ref[:]
    n_u, n_f, rho = cfg["n_u"], cfg["n_f"], cfg["rho"]
    lam1, lam2 = cfg["lam1"], cfg["lam2"]

    taylor = (
        _taylor2_packed_inline if max(spec.layers) <= _B else _taylor2_inline
    )

    def residual(plist, pts):
        u, ux, ut, uxx = taylor(spec, plist, pts)
        return ut + lam1 * u * ux - lam2 * uxx

    def loss_fn(plist):
        u_pred = _forward_inline(spec, plist, xd)
        r = u_pred - ud
        data_term = jnp.sum(r * r) / n_u
        f = residual(plist, colloc)
        if cfg["residual_kind"] == "admm":
            q = f - z + dual / rho
            res_term = 0.5 * rho * jnp.sum(q * q)
            if cfg["explicit_inner"]:
                res_term = res_term + jnp.sum(dual * f)
        elif cfg["residual_kind"] == "mean_sq":
            res_term = jnp.sum(f * f) / f.shape[0]
        elif cfg["residual_kind"] == "l2_sq_norm":
            res_term = jnp.sum(f * f) / n_f
        else:  # l1_sq_norm
            s = jnp.sum(jnp.abs(f))
            res_term = s * s / n_f
        return data_term + res_term, (data_term, res_term)

    (loss, (data_term, res_term)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)

    # Adam (optax.scale_by_adam semantics, bias correction with t = count+1);
    # b^t as exp(t ln b): Mosaic has no powf lowering
    import math as _math

    t = t_ref[0]
    bc1 = 1.0 - jnp.exp(t * _math.log(_B1))
    bc2 = 1.0 - jnp.exp(t * _math.log(_B2))
    new_params = []
    for i in range(n_layers):
        layer = {}
        for j, name in enumerate(("W", "b")):
            idx = 2 * i + j
            g = grads[i][name]
            m_new = _B1 * mu[idx][:] + (1.0 - _B1) * g
            v_new = _B2 * nu[idx][:] + (1.0 - _B2) * g * g
            update = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + _EPS)
            p_new = params[i][name] - cfg["lr"] * update
            mu_o[idx][:] = m_new
            nu_o[idx][:] = v_new
            wb_o[idx][:] = p_new
            layer[name] = p_new
        new_params.append(layer)

    # on-device uniform resampling (TPU core PRNG)
    pltpu.prng_seed(seed_ref[0], seed_ref[1])
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((cfg["n_f"], 2)), jnp.uint32
    )
    # top 24 bits as a positive int32 (Mosaic lacks uint32->f32 casts)
    bits24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    u01 = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    col2 = jax.lax.broadcasted_iota(jnp.int32, u01.shape, dimension=1)
    lb = jnp.where(col2 == 0, cfg["lb"][0], cfg["lb"][1])
    ub = jnp.where(col2 == 0, cfg["ub"][0], cfg["ub"][1])
    new_colloc = lb + (ub - lb) * u01
    colloc_o[:] = new_colloc

    # ADMM z/dual updates at the NEW points with the NEW params
    # (reference semantics, Abgrall_ADMM.py:220-226)
    mis = jnp.zeros((), jnp.float32)
    if cfg["residual_kind"] == "admm":
        f_new = residual(new_params, new_colloc)
        c = 1.0 / (rho * n_f)
        val = f_new + dual / rho
        z_new = jnp.sign(val) * jnp.maximum(jnp.abs(val) - c, 0.0)
        dual_new = dual + rho * (f_new - z_new)
        z_o[:] = z_new
        dual_o[:] = dual_new
        mis = jnp.mean(jnp.abs(f_new - z_new))
    else:
        z_o[:] = z
        dual_o[:] = dual

    metrics_o[:] = jnp.concatenate(
        [
            loss.reshape(1, 1),
            data_term.reshape(1, 1),
            res_term.reshape(1, 1),
            mis.reshape(1, 1),
        ],
        axis=1,
    )


def make_fused_adam_step(problem, learning_rate: float):
    """Build step(state) -> (state, metrics): one kernel launch per epoch.

    Drop-in replacement for ``make_adam_step`` under the v1 scope; state must
    use optax.adam's (ScaleByAdamState, EmptyState) opt_state and frozen
    coefficients.
    """
    exp = problem.exp
    spec = problem.spec
    n_layers = len(spec.layers) - 1
    cfg = {
        "n_u": exp.data.n_u,
        "n_f": exp.sampling.n_f,
        "rho": float(exp.loss.rho),
        "lr": float(learning_rate),
        "lam1": float(exp.pde.lambda1),
        "lam2": float(exp.pde.lambda2),
        "residual_kind": exp.loss.residual_kind,
        "explicit_inner": exp.loss.explicit_inner,
        "lb": tuple(float(v) for v in spec.lb),
        "ub": tuple(float(v) for v in spec.ub),
    }
    if exp.pde.lambda2_transform == "exp":
        import math

        cfg["lam2"] = math.exp(cfg["lam2"])

    kernel = functools.partial(_step_kernel, spec, cfg)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def step(state):
        if state.rho is not None:
            raise ValueError(
                "the fused Pallas step bakes loss.rho in statically and "
                "cannot honor TrainState.rho overrides (rho-vmapped "
                "ensembles) — use the XLA step (model.fused_step=False)"
            )
        key, sub = jax.random.split(state.key)
        seed = jax.random.key_data(sub).astype(jnp.int32).reshape(-1)[:2]
        adam_state = state.opt_state[0]
        t = (adam_state.count + 1).astype(jnp.float32).reshape(1)

        net = state.params["net"]
        flat_wb = [leaf for l in net for leaf in (l["W"], l["b"])]
        flat_mu = [
            leaf
            for l in adam_state.mu["net"]
            for leaf in (l["W"], l["b"])
        ]
        flat_nu = [
            leaf
            for l in adam_state.nu["net"]
            for leaf in (l["W"], l["b"])
        ]

        if state.admm is not None:
            z, dual = state.admm.z, state.admm.dual
        else:
            z = jnp.zeros((cfg["n_f"], 1), jnp.float32)
            dual = jnp.zeros((cfg["n_f"], 1), jnp.float32)

        shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat_wb]
        out_shape = (
            jax.ShapeDtypeStruct(state.colloc.shape, jnp.float32),  # colloc
            jax.ShapeDtypeStruct(z.shape, jnp.float32),  # z
            jax.ShapeDtypeStruct(dual.shape, jnp.float32),  # dual
            jax.ShapeDtypeStruct((1, 4), jnp.float32),  # metrics
            *shapes,  # params
            *shapes,  # mu
            *shapes,  # nu
        )
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[smem, smem, vmem, vmem, vmem, vmem, vmem]
            + [vmem] * (6 * n_layers),
            out_specs=(vmem,) * len(out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(
            seed,
            t,
            problem.x_data,
            problem.targets["u"],
            state.colloc,
            z,
            dual,
            *flat_wb,
            *flat_mu,
            *flat_nu,
        )
        colloc_n, z_n, dual_n, metrics = outs[0:4]
        wb_n = outs[4 : 4 + 2 * n_layers]
        mu_n = outs[4 + 2 * n_layers : 4 + 4 * n_layers]
        nu_n = outs[4 + 4 * n_layers : 4 + 6 * n_layers]

        def rebuild(flat):
            return [
                {"W": flat[2 * i], "b": flat[2 * i + 1]}
                for i in range(n_layers)
            ]

        params_n = dict(state.params, net=rebuild(wb_n))
        mu_tree = dict(adam_state.mu, net=rebuild(mu_n))
        nu_tree = dict(adam_state.nu, net=rebuild(nu_n))
        adam_n = adam_state._replace(
            count=adam_state.count + 1, mu=mu_tree, nu=nu_tree
        )
        opt_state_n = (adam_n,) + tuple(state.opt_state[1:])

        admm_n = state.admm
        if state.admm is not None:
            admm_n = type(state.admm)(z=z_n, dual=dual_n)

        dtype = problem.spec.dtype
        m = metrics[0]
        metrics_dict = {
            "loss": m[0].astype(dtype),
            "data_term": m[1].astype(dtype),
            "res_term": m[2].astype(dtype),
            "admm_misfit": m[3].astype(dtype),
            "lambda1": jnp.asarray(cfg["lam1"], dtype),
            "lambda2": jnp.asarray(cfg["lam2"], dtype),
            "lbfgs_iters": jnp.zeros((), jnp.int32),
        }
        new_state = type(state)(
            params=params_n,
            opt_state=opt_state_n,
            admm=admm_n,
            colloc=colloc_n.astype(state.colloc.dtype),
            key=key,
            epoch=state.epoch + 1,
            rho=state.rho,
        )
        return new_state, metrics_dict

    return step
