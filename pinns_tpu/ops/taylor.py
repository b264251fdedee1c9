"""Taylor-mode propagation of directional derivatives through the tanh MLP.

This is the TPU-native replacement for the reference's chained reverse-mode
``tf.gradients`` calls (three sweeps for Burgers —
``/root/reference/Burgers/continuous_identification/Abgrall_ADMM.py:170-180``
— and eight sweeps over products for Euler — ``Euler_ADMM.py:176-198``).
Instead of re-walking the graph per derivative, we propagate the tuple
(value, d/dx, d/dt, d2/dx2) analytically layer by layer in ONE forward pass:

  P = H  @ W + b          Px = Hx @ W        Pt = Ht @ W        Pxx = Hxx @ W
  s = tanh(P)             s' = 1 - s^2       s'' = -2 s s'
  H = s                   Hx = s' Px         Ht = s' Pt         Hxx = s'' Px^2 + s' Pxx

i.e. 4 MXU matmuls + a few VPU elementwise ops per layer, all fused by XLA
into a single program. The whole thing is plain jnp, so reverse-mode
``jax.grad`` for training differentiates straight through it (third-order
mixed AD), and it composes with jit / vmap / pjit sharding.

Equivalent nested-jvp formulations live in ``pinns_tpu.ops.derivatives`` and
are used in tests to cross-validate these closed forms.

Mixed precision (``spec.compute_dtype``, e.g. bfloat16): streams are STORED
and fed to matmuls in the compute dtype — bf16 matmuls are 6x the MXU rate
of HIGHEST-precision f32 and halve the stream HBM traffic — but quality
survives because the error enters ONLY at the per-layer quantization points:
  1. every dot accumulates into the full-precision dtype
     (``preferred_element_type``) and all elementwise ops (tanh, the
     product-rule combines) run full-precision — no compounding roundoff;
  2. the FIRST layer consumes exact (un-quantized) coordinates — bf16 has
     only ~3 decimal digits, which would alias collocation points;
  3. master weights, every loss reduction, and the data-misfit path
     (``mlp_apply``) never leave the accumulation dtype;
  4. ``spec.keep_streams`` exempts chosen streams ('value', 'xx') from
     quantization entirely — the measured parity knob (ablation in
     BASELINE.md: the value and u_xx streams carry the quality; the first
     t/x derivative streams tolerate bf16).
Gradients flow through the casts (their transposes re-cast), so weight
gradients arrive in the master dtype.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pinns_tpu.models.mlp import (
    MLPSpec,
    Params,
    embed_streams,
    normalize_inputs,
)


class _StreamPolicy:
    """Per-stream mixed-precision policy.

    `store` quantizes a stream at the layer boundary (identity for kept
    streams / unmixed specs); `dot` runs the matmul in the stream's dtype —
    quantized streams take single-pass compute-dtype MXU with full-precision
    accumulation, kept streams take spec.precision in full dtype.
    """

    def __init__(self, spec: MLPSpec):
        self.spec = spec
        self.cdtype = spec.cdtype

    def quantized(self, stream: str) -> bool:
        return self.spec.mixed and stream not in self.spec.keep_streams

    def store(self, v, stream: str):
        return v.astype(self.cdtype) if self.quantized(stream) else v

    def act(self, v, stream: str, first: bool = False):
        """Dot-output dtype for the elementwise stage: compute_dtype in the
        maximum-throughput mode, accumulation dtype otherwise."""
        if first or not (self.quantized(stream) and self.spec.mixed_elementwise):
            return v
        return v.astype(self.cdtype)

    def dot(self, h, w, stream: str, first: bool = False):
        if first or not self.quantized(stream):
            return jnp.dot(h, w, precision=self.spec.lax_precision)
        return jnp.dot(
            h,
            w.astype(self.cdtype),
            preferred_element_type=self.spec.dtype,
        )


def mlp_taylor_1(
    spec: MLPSpec, params: Params, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Value and first directional derivatives along input dims 0 and 1.

    Args:
      spec: static MLP description (in_dim must be 2: columns are (x, t)).
      params: MLP pytree.
      x: (N, 2) evaluation points.

    Returns:
      (y, y_x, y_t), each (N, out_dim): network outputs and their partial
      derivatives w.r.t. the raw (un-normalized) x and t inputs.
    """
    if spec.in_dim != 2:
        raise ValueError("mlp_taylor_1 expects in_dim == 2 (x, t)")
    pol = _StreamPolicy(spec)

    # Initial streams: value + tangent rows of the (possibly Fourier-
    # embedded) normalized inputs, chain rule through the rescale included.
    h, hx, ht, _ = embed_streams(spec, normalize_inputs(spec, x), params[0])

    for i, layer in enumerate(params[:-1]):
        w, b = layer["W"], layer["b"]
        first = i == 0  # exact coordinates — never quantized
        p = pol.act(pol.dot(h, w, "value", first) + b, "value", first)
        px = pol.act(pol.dot(hx, w, "deriv", first), "deriv", first)
        pt = pol.act(pol.dot(ht, w, "deriv", first), "deriv", first)
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        h = pol.store(s, "value")
        hx = pol.store(sp * px, "deriv")
        ht = pol.store(sp * pt, "deriv")

    w, b = params[-1]["W"], params[-1]["b"]
    y = pol.dot(h, w, "value") + b
    y_x = pol.dot(hx, w, "deriv")
    y_t = pol.dot(ht, w, "deriv")
    return y, y_x, y_t


def mlp_taylor_2_stacked(
    spec: MLPSpec, params: Params, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same math as :func:`mlp_taylor_2`, but the four derivative streams are
    stacked along the batch axis so each layer runs ONE (4N, W) matmul
    instead of four (N, W) ones. Pure data movement — identical numerics,
    fully differentiable; whether it wins depends on how well XLA handles
    the small-matmul shapes (benchmarked on TPU; see BASELINE.md). Benchmark
    variant only — runs fully in spec.dtype (no mixed-precision path)."""
    if spec.in_dim != 2:
        raise ValueError("mlp_taylor_2_stacked expects in_dim == 2 (x, t)")
    prec = spec.lax_precision
    n = x.shape[0]

    h, hx, ht, hxx = embed_streams(spec, normalize_inputs(spec, x), params[0])
    # the stacked layout needs full-batch streams
    hx = jnp.broadcast_to(hx, h.shape)
    ht = jnp.broadcast_to(ht, h.shape)
    hxx = jnp.zeros_like(h) if hxx is None else hxx
    s4 = jnp.concatenate([h, hx, ht, hxx], axis=0)  # (4N, embed_dim)

    for layer in params[:-1]:
        w, b = layer["W"], layer["b"]
        p4 = jnp.dot(s4, w, precision=prec)
        p = p4[0:n] + b
        px = p4[n : 2 * n]
        pt = p4[2 * n : 3 * n]
        pxx = p4[3 * n : 4 * n]
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        spp = -2.0 * s * sp
        s4 = jnp.concatenate(
            [s, sp * px, sp * pt, spp * px * px + sp * pxx], axis=0
        )

    w, b = params[-1]["W"], params[-1]["b"]
    y4 = jnp.dot(s4, w, precision=prec)
    return y4[0:n] + b, y4[n : 2 * n], y4[2 * n : 3 * n], y4[3 * n : 4 * n]


def mlp_taylor_2(
    spec: MLPSpec, params: Params, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Value, first derivatives, and second derivative along input dim 0.

    Returns (y, y_x, y_t, y_xx), each (N, out_dim). The second-derivative
    recurrence uses tanh'' = -2 tanh (1 - tanh^2), so y_xx costs one extra
    matmul per layer instead of a full reverse-over-reverse sweep.
    """
    if spec.in_dim != 2:
        raise ValueError("mlp_taylor_2 expects in_dim == 2 (x, t)")
    pol = _StreamPolicy(spec)

    # hxx is None (identically zero) for the affine rescale; the Fourier
    # embedding adds a nonzero curvature stream -B^2 sin/cos.
    h, hx, ht, hxx = embed_streams(spec, normalize_inputs(spec, x), params[0])

    for i, layer in enumerate(params[:-1]):
        w, b = layer["W"], layer["b"]
        first = i == 0  # exact coordinates — never quantized
        p = pol.act(pol.dot(h, w, "value", first) + b, "value", first)
        px = pol.act(pol.dot(hx, w, "deriv", first), "deriv", first)
        pt = pol.act(pol.dot(ht, w, "deriv", first), "deriv", first)
        pxx = (
            None
            if hxx is None
            else pol.act(pol.dot(hxx, w, "xx", first), "xx", first)
        )
        s = jnp.tanh(p)
        sp = 1.0 - s * s
        spp = -2.0 * s * sp
        h = pol.store(s, "value")
        hxx = pol.store(
            spp * px * px if pxx is None else spp * px * px + sp * pxx, "xx"
        )
        hx = pol.store(sp * px, "deriv")
        ht = pol.store(sp * pt, "deriv")

    w, b = params[-1]["W"], params[-1]["b"]
    y = pol.dot(h, w, "value") + b
    y_x = pol.dot(hx, w, "deriv")
    y_t = pol.dot(ht, w, "deriv")
    y_xx = pol.dot(hxx, w, "xx")
    return y, y_x, y_t, y_xx
