"""Pallas TPU kernels: fused whole-network MLP forward and Taylor-2 pass.

Why: the PINN nets are narrow (20-200 wide), so an XLA forward is a chain of
tiny HLOs — each matmul pays HBM round-trips and dispatch. These kernels keep
ALL weights and the activation tile resident in VMEM and run the entire
network in one kernel launch per batch tile:

- ``mlp_forward_pallas``: the plain forward (predict path).
- ``mlp_taylor2_pallas``: the (u, u_x, u_t, u_xx) Taylor pass used by the
  Burgers residual. The four derivative streams are STACKED along the batch
  axis, so each layer does ONE (4*TILE, W) @ (W, W) MXU matmul instead of
  four (TILE, W) ones — 4x better systolic-array utilization at these widths
  — then splits streams for the tanh nonlinearity algebra on the VPU.

Scope: inference-side paths (predict/evaluate, and the ADMM z/dual updates,
which re-evaluate residuals WITHOUT differentiation — ``Abgrall_ADMM.py:
225-226``). The training loss keeps the jnp Taylor pass (pinns_tpu.ops.taylor)
because third-order AD must flow through it; numerical parity between the two
is pinned by tests.

Status (measured, v5e single chip, 131k points, f32 HIGHEST): XLA's fusion of
the jnp Taylor pass currently WINS — 2.2 ms vs 4.2 ms (lane-packed kernel) at
W=20 and 12.2 ms vs 18.9 ms (sublane-stacked) at W=200 — so these kernels are
an exact, validated alternative path, not the default. The next kernel-level
win is a whole-train-step kernel (forward+backward+Adam in one launch), which
needs the hand-derived adjoint of the Taylor propagation.

Kernel layout notes: grid over batch tiles; weights use full-array VMEM
BlockSpecs (same block for every grid step, loaded once); batch is padded to
the tile size on the host side and sliced after. All dots request
``preferred_element_type=jnp.float32``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pinns_tpu.models.mlp import MLPSpec, Params, normalize_inputs

try:  # Pallas requires a TPU (or interpreter mode); import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

DEFAULT_TILE = 512


def auto_tile(spec: MLPSpec, streams: int = 4, budget_bytes: int = 6 << 20) -> int:
    """Pick a batch tile so the streams*tile x width working set (a few live
    copies of it) stays inside the ~16 MB VMEM budget."""
    w = max(spec.layers[1:-1] or (spec.layers[-1],))
    # ~4 live (streams*tile, w) f32 buffers per layer step
    tile = budget_bytes // max(1, 4 * streams * w * 4)
    tile = max(128, min(1024, (tile // 128) * 128))
    return tile


def _dot(a, b):
    """float32-accurate MXU matmul — without HIGHEST the MXU silently runs
    bf16 passes (~1e-3 error), which u_xx cannot tolerate."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def pallas_available() -> bool:
    if not _PALLAS_IMPORTED:
        return False
    return jax.default_backend() in ("tpu", "axon")


def _pad_batch(x: jnp.ndarray, tile: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    padded = ((n + tile - 1) // tile) * tile
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))
    return x, n


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------
def _forward_kernel(n_layers: int, x_ref, *refs):
    out_ref = refs[-1]
    wb = refs[: 2 * n_layers]
    h = x_ref[:]
    for l in range(n_layers - 1):
        w, b = wb[2 * l][:], wb[2 * l + 1][:]
        h = jnp.tanh(_dot(h, w) + b)
    w, b = wb[-2][:], wb[-1][:]
    out_ref[:] = _dot(h, w) + b


def mlp_forward_pallas(
    spec: MLPSpec,
    params: Params,
    x: jnp.ndarray,
    tile: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward pass; numerically equivalent to ``mlp_apply``."""
    if spec.fourier or spec.n_paths:
        raise ValueError(
            "pallas kernels implement the plain normalize->tanh model; "
            "Fourier/path-embedded specs use the XLA path (mlp_apply)"
        )
    tile = tile or auto_tile(spec, streams=1)
    n_layers = len(params)
    h0 = normalize_inputs(spec, x).astype(jnp.float32)
    h0, n = _pad_batch(h0, tile)
    grid = (h0.shape[0] // tile,)

    weight_specs = []
    flat_wb = []
    for layer in params:
        for name in ("W", "b"):
            flat_wb.append(layer[name].astype(jnp.float32))
            weight_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_forward_kernel, n_layers),
        out_shape=jax.ShapeDtypeStruct((h0.shape[0], spec.out_dim), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, spec.in_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((tile, spec.out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(h0, *flat_wb)
    return out[:n].astype(spec.dtype)


# ---------------------------------------------------------------------------
# Taylor-2 kernel: u, u_x, u_t, u_xx in one pass, streams batched per matmul
# ---------------------------------------------------------------------------
def _taylor2_kernel(n_layers: int, tile: int, sx: float, st: float,
                    x_ref, *refs):
    u_ref, ux_ref, ut_ref, uxx_ref = refs[-4:]
    wb = refs[: 2 * n_layers]

    t = tile
    h = x_ref[:]  # (tile, in_dim) normalized inputs
    col = jax.lax.broadcasted_iota(jnp.int32, h.shape, dimension=1)
    hx = jnp.where(col == 0, sx, 0.0).astype(h.dtype)
    ht = jnp.where(col == 1, st, 0.0).astype(h.dtype)
    hxx = jnp.zeros_like(h)
    # stack the 4 streams along the batch axis -> one MXU matmul per layer
    s4 = jnp.concatenate([h, hx, ht, hxx], axis=0)  # (4*tile, W)

    for l in range(n_layers - 1):
        w, b = wb[2 * l][:], wb[2 * l + 1][:]
        p4 = _dot(s4, w)  # (4t, W')
        p = p4[0:t] + b
        px = p4[t : 2 * t]
        pt = p4[2 * t : 3 * t]
        pxx = p4[3 * t : 4 * t]
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        spp = -2.0 * s * sp
        s4 = jnp.concatenate(
            [s, sp * px, sp * pt, spp * px * px + sp * pxx], axis=0
        )

    w, b = wb[-2][:], wb[-1][:]
    y4 = _dot(s4, w)
    u_ref[:] = y4[0:t] + b
    ux_ref[:] = y4[t : 2 * t]
    ut_ref[:] = y4[2 * t : 3 * t]
    uxx_ref[:] = y4[3 * t : 4 * t]


# --- lane-packed variant for narrow nets (W <= 32) -------------------------
# The four derivative streams live in four 32-lane blocks of ONE (tile, 128)
# register tile, and each layer's weight is a (128, 128) block-diagonal
# matrix with W on the four diagonal blocks. A (tile,128)@(128,128) MXU
# matmul costs the same cycles as a padded (tile,20)@(20,20) one — so this
# does the work of four stream matmuls in one, at ~4x fewer MXU cycles than
# the sublane-stacked form, with no concatenation traffic.
_BLOCK = 32  # lanes per stream block (f32-friendly, 4 * 32 = 128 lanes)


def _block_diag4(w: jnp.ndarray) -> jnp.ndarray:
    """(din, dout) -> (128, 128) with w at the four 32-lane diagonal blocks."""
    din, dout = w.shape
    out = jnp.zeros((4 * _BLOCK, 4 * _BLOCK), jnp.float32)
    for s in range(4):
        out = jax.lax.dynamic_update_slice(
            out, w.astype(jnp.float32), (s * _BLOCK, s * _BLOCK)
        )
    return out


def _taylor2_kernel_packed(n_layers: int, sx: float, st: float,
                           x_ref, *refs):
    u_ref, ux_ref, ut_ref, uxx_ref = refs[-4:]
    wb = refs[: 2 * n_layers]
    B = _BLOCK

    xt = x_ref[:]  # (tile, 128): normalized (x, t) in lanes 0:2, rest zero
    col = jax.lax.broadcasted_iota(jnp.int32, xt.shape, dimension=1)
    # stream 0 lanes [0:32] = h0; stream 1 lane 32 = sx; stream 2 lane 65 = st
    packed = jnp.where(col == B, sx, jnp.where(col == 2 * B + 1, st, xt))

    for l in range(n_layers - 1):
        w, b = wb[2 * l][:], wb[2 * l + 1][:]  # (128,128), (1,32)
        p4 = _dot(packed, w)  # one MXU matmul for all four streams
        p = p4[:, 0:B] + b
        px = p4[:, B : 2 * B]
        pt = p4[:, 2 * B : 3 * B]
        pxx = p4[:, 3 * B : 4 * B]
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        spp = -2.0 * s * sp
        packed = jnp.concatenate(
            [s, sp * px, sp * pt, spp * px * px + sp * pxx], axis=1
        )

    w, b = wb[-2][:], wb[-1][:]
    y4 = _dot(packed, w)
    u_ref[:] = y4[:, 0:B] + b
    ux_ref[:] = y4[:, B : 2 * B]
    ut_ref[:] = y4[:, 2 * B : 3 * B]
    uxx_ref[:] = y4[:, 3 * B : 4 * B]


def _taylor2_packed(spec: MLPSpec, params: Params, x: jnp.ndarray,
                    tile: int, interpret: bool):
    n_layers = len(params)
    sx = 2.0 / (spec.ub[0] - spec.lb[0])
    st = 2.0 / (spec.ub[1] - spec.lb[1])
    B = _BLOCK

    h0 = normalize_inputs(spec, x).astype(jnp.float32)
    h0, n = _pad_batch(h0, tile)
    h0 = jnp.pad(h0, ((0, 0), (0, 4 * B - h0.shape[1])))
    grid = (h0.shape[0] // tile,)

    flat_wb, weight_specs = [], []
    for layer in params:
        flat_wb.append(_block_diag4(layer["W"]))
        b = layer["b"].astype(jnp.float32)
        flat_wb.append(jnp.pad(b, ((0, 0), (0, B - b.shape[1]))))
        weight_specs.extend([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2)

    out_shape = jax.ShapeDtypeStruct((h0.shape[0], B), jnp.float32)
    out_spec = pl.BlockSpec((tile, B), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    u, ux, ut, uxx = pl.pallas_call(
        functools.partial(_taylor2_kernel_packed, n_layers, sx, st),
        out_shape=(out_shape,) * 4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 4 * B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=(out_spec,) * 4,
        interpret=interpret,
    )(h0, *flat_wb)
    k = spec.out_dim
    cast = lambda a: a[:n, :k].astype(spec.dtype)
    return cast(u), cast(ux), cast(ut), cast(uxx)


# --- mixed-precision (bf16-stream) variant for the compute-bound scale
# config (8x200 trunk, 1M pts, microbatch 8192). Matches the max-throughput
# stream policy of ops/taylor.py (all streams quantized, elementwise in the
# compute dtype) with two exceptions that the policy itself also makes:
# layer 0 consumes exact f32 coordinates through an f32 HIGHEST dot, and
# every matmul accumulates f32 (preferred_element_type). The four streams
# stay stacked, so each layer is ONE (4*tile, W) bf16 MXU matmul with all
# weights + the activation tile VMEM-resident across the whole network.
def _taylor2_kernel_mixed(n_layers: int, tile: int, sx: float, st: float,
                          cdtype, x_ref, *refs):
    u_ref, ux_ref, ut_ref, uxx_ref = refs[-4:]
    wb = refs[: 2 * n_layers]
    t = tile

    h = x_ref[:]  # (tile, in_dim) f32 normalized inputs
    col = jax.lax.broadcasted_iota(jnp.int32, h.shape, dimension=1)
    hx = jnp.where(col == 0, sx, 0.0).astype(h.dtype)
    ht = jnp.where(col == 1, st, 0.0).astype(h.dtype)
    hxx = jnp.zeros_like(h)
    s4 = jnp.concatenate([h, hx, ht, hxx], axis=0)  # (4*tile, in_dim) f32

    for l in range(n_layers - 1):
        w, b = wb[2 * l][:], wb[2 * l + 1][:]
        if l == 0:  # exact coordinates — f32 HIGHEST, K=2 (cheap)
            p4 = _dot(s4, w)
        else:
            p4 = jax.lax.dot_general(
                s4, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        p = p4[0:t] + b
        px = p4[t : 2 * t]
        pt = p4[2 * t : 3 * t]
        pxx = p4[3 * t : 4 * t]
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        spp = -2.0 * s * sp
        s4 = jnp.concatenate(
            [s, sp * px, sp * pt, spp * px * px + sp * pxx], axis=0
        ).astype(cdtype)

    w, b = wb[-2][:], wb[-1][:]
    y4 = jax.lax.dot_general(
        s4, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    u_ref[:] = y4[0:t] + b
    ux_ref[:] = y4[t : 2 * t]
    ut_ref[:] = y4[2 * t : 3 * t]
    uxx_ref[:] = y4[3 * t : 4 * t]


def mlp_taylor2_pallas_mixed(
    spec: MLPSpec,
    params: Params,
    x: jnp.ndarray,
    tile: int = 0,
    interpret: bool = False,
):
    """Mixed-precision fused Taylor-2 pass for the scale config: streams and
    hidden weights in ``spec.compute_dtype`` (bf16), f32 accumulation and
    outputs — the kernel counterpart of the max-throughput policy of
    ``ops/taylor.py``. Benchmark candidate for BASELINE roadmap item 2 ("the
    remaining upside sits in Mosaic-level scheduling"); measured verdict in
    BASELINE.md once captured on the chip."""
    if spec.fourier or spec.n_paths:
        raise ValueError(
            "pallas kernels implement the plain normalize->tanh model; "
            "Fourier/path-embedded specs use the XLA path (mlp_taylor_2)"
        )
    if spec.in_dim != 2:
        raise ValueError("mlp_taylor2_pallas_mixed expects in_dim == 2 (x, t)")
    cdtype = spec.cdtype if spec.mixed else jnp.bfloat16
    tile = tile or auto_tile(spec, streams=4, budget_bytes=4 << 20)
    n_layers = len(params)
    sx = 2.0 / (spec.ub[0] - spec.lb[0])
    st = 2.0 / (spec.ub[1] - spec.lb[1])

    h0 = normalize_inputs(spec, x).astype(jnp.float32)
    h0, n = _pad_batch(h0, tile)
    grid = (h0.shape[0] // tile,)

    weight_specs = []
    flat_wb = []
    for i, layer in enumerate(params):
        # layer 0 stays f32 (exact coordinates); hidden + output weights are
        # pre-quantized once on the host — same quantization point as the
        # stream policy's per-dot w.astype(cdtype)
        wd = jnp.float32 if i == 0 else cdtype
        flat_wb.append(layer["W"].astype(wd))
        flat_wb.append(layer["b"].astype(jnp.float32))
        weight_specs.extend([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2)

    out_shape = jax.ShapeDtypeStruct((h0.shape[0], spec.out_dim), jnp.float32)
    out_spec = pl.BlockSpec((tile, spec.out_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    u, ux, ut, uxx = pl.pallas_call(
        functools.partial(
            _taylor2_kernel_mixed, n_layers, tile, sx, st, cdtype
        ),
        out_shape=(out_shape,) * 4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, spec.in_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=(out_spec,) * 4,
        interpret=interpret,
    )(h0, *flat_wb)
    cast = lambda a: a[:n].astype(spec.dtype)
    return cast(u), cast(ux), cast(ut), cast(uxx)


def make_taylor2_mixed_op(spec: MLPSpec, tile: int = 0, interpret: bool = False):
    """Differentiable wrapper for the mixed kernel: Pallas forward, backward
    by re-computing the jnp mixed Taylor pass and taking its VJP (the same
    recompute a remat policy performs, so memory behavior matches the scale
    config's microbatch remat). The backward is EXACTLY the XLA path's —
    only the primal values come from the kernel — so training trajectories
    differ from all-XLA runs only through the forward's (tested, policy-
    equivalent) quantization points. Used by taylor2_kernel_bench to decide
    whether the kernel earns a place in the production step."""
    from pinns_tpu.ops.taylor import mlp_taylor_2

    @jax.custom_vjp
    def op(params, x):
        return mlp_taylor2_pallas_mixed(
            spec, params, x, tile=tile, interpret=interpret
        )

    def fwd(params, x):
        return op(params, x), (params, x)

    def bwd(res, g):
        params, x = res
        _, vjp = jax.vjp(lambda p, xx: mlp_taylor_2(spec, p, xx), params, x)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def mlp_taylor2_pallas(
    spec: MLPSpec,
    params: Params,
    x: jnp.ndarray,
    tile: int = 0,
    interpret: bool = False,
):
    """Fused (u, u_x, u_t, u_xx); numerically equivalent to ``mlp_taylor_2``.

    Narrow nets (all dims <= 32, e.g. the reference's 8x20) dispatch to the
    lane-packed kernel; wider nets use the sublane-stacked kernel.
    """
    if spec.fourier or spec.n_paths:
        raise ValueError(
            "pallas kernels implement the plain normalize->tanh model; "
            "Fourier/path-embedded specs use the XLA path (mlp_taylor_2)"
        )
    if max(spec.layers) <= _BLOCK:
        return _taylor2_packed(
            spec, params, x, tile or 1024, interpret
        )
    tile = tile or auto_tile(spec, streams=4)
    if spec.in_dim != 2:
        raise ValueError("mlp_taylor2_pallas expects in_dim == 2 (x, t)")
    n_layers = len(params)
    # static chain-rule factors of the [-1, 1] input rescale
    sx = 2.0 / (spec.ub[0] - spec.lb[0])
    st = 2.0 / (spec.ub[1] - spec.lb[1])

    h0 = normalize_inputs(spec, x).astype(jnp.float32)
    h0, n = _pad_batch(h0, tile)
    grid = (h0.shape[0] // tile,)

    weight_specs = []
    flat_wb = []
    for layer in params:
        for name in ("W", "b"):
            flat_wb.append(layer[name].astype(jnp.float32))
            weight_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out_shape = jax.ShapeDtypeStruct((h0.shape[0], spec.out_dim), jnp.float32)
    out_spec = pl.BlockSpec((tile, spec.out_dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    u, ux, ut, uxx = pl.pallas_call(
        functools.partial(_taylor2_kernel, n_layers, tile, sx, st),
        out_shape=(out_shape,) * 4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, spec.in_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=(out_spec,) * 4,
        interpret=interpret,
    )(h0, *flat_wb)
    cast = lambda a: a[:n].astype(spec.dtype)
    return cast(u), cast(ux), cast(ut), cast(uxx)
