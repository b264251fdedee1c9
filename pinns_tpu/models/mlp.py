"""Tanh MLP with domain-normalized inputs, as a pure-function pytree model.

Reference parity (behavior, not code): the per-script ``initialize_NN`` /
``xavier_init`` / ``neural_net`` trio, e.g.
``/root/reference/Burgers/continuous_identification/Abgrall_ADMM.py:136-164``:

- per-layer weights drawn truncated-normal (+/- 2 sigma) with
  std = sqrt(2 / (fan_in + fan_out)); biases zero;
- inputs affinely rescaled to [-1, 1] via domain bounds lb/ub before the first
  layer (``Abgrall_ADMM.py:156``);
- tanh hidden layers, linear head.

TPU-first deltas: params are a plain pytree (list of {'W','b'} dicts) so they
compose with jit / vmap (stacked ensembles) / pjit sharding; matmul precision
is an explicit knob (f32 inputs can run on the MXU as bf16 passes — 'default'
— or as float32-accurate 'highest', which PINN second derivatives need).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp

Params = list  # list of {'W': (din, dout), 'b': (1, dout)} dicts


_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static (hashable) description of a domain-normalized tanh MLP.

    Attributes:
      layers: layer widths, e.g. (2, 20, 20, ..., 1). layers[0] is the input
        dimension (x, t), layers[-1] the number of PDE fields.
      lb / ub: domain lower/upper bounds per input dimension; inputs are
        rescaled to [-1, 1] with them.
      dtype: parameter / accumulation dtype (jnp.float32 by default).
      precision: matmul precision — 'highest' keeps float32 MXU accuracy,
        which the u_xx path requires; 'default' allows bf16 MXU passes.
      compute_dtype: when set (e.g. jnp.bfloat16), the RESIDUAL path
        (ops/taylor.py) stores its derivative streams and feeds its matmuls
        in this dtype while EVERY dot accumulates into `dtype`, elementwise
        ops run in `dtype`, the first layer consumes exact coordinates, and
        master weights / loss reductions / mlp_apply stay full-precision —
        the mixed policy for the arithmetic-bound million-point configs.
        None means compute == dtype (no mixing).
      keep_streams: streams exempted from the compute_dtype quantization
        (stored + matmul'd in full `dtype` at `precision`): subset of
        {'value', 'xx'}.
      mixed_elementwise: run the elementwise ops (tanh, product-rule
        combines) of quantized streams in compute_dtype too — the maximum-
        throughput mode; off, they run in `dtype` with quantization only at
        the matmul boundaries. Measured frontier on v5e in BASELINE.md.
    """

    layers: tuple
    lb: tuple
    ub: tuple
    dtype: Any = jnp.float32
    precision: str = "highest"
    compute_dtype: Any = None
    keep_streams: tuple = ()
    mixed_elementwise: bool = False
    # Random Fourier feature embedding (beyond-reference; Tancik et al. 2020):
    # rows of the frequency matrix B (shape (F, in_dim)) as a nested tuple so
    # the spec stays static/hashable — the embedding [h, sin(2*pi*B h),
    # cos(2*pi*B h)] of the NORMALIZED coordinates feeds the first layer,
    # mitigating the tanh trunk's spectral bias at sharp features. Empty =
    # no embedding. Build with `fourier_matrix(...)` (ModelConfig knobs
    # n_fourier / fourier_sigma / fourier_seed).
    fourier: tuple = ()

    def __post_init__(self):
        if self.compute_dtype is not None:
            object.__setattr__(self, "compute_dtype", jnp.dtype(self.compute_dtype))
        object.__setattr__(self, "keep_streams", tuple(self.keep_streams))
        bad = set(self.keep_streams) - {"value", "xx"}
        if bad:
            raise ValueError(f"unknown keep_streams {sorted(bad)}")
        object.__setattr__(self, "layers", tuple(int(w) for w in self.layers))
        object.__setattr__(self, "lb", tuple(float(v) for v in self.lb))
        object.__setattr__(self, "ub", tuple(float(v) for v in self.ub))
        object.__setattr__(
            self,
            "fourier",
            tuple(tuple(float(v) for v in row) for row in self.fourier),
        )
        if self.fourier and any(
            len(row) != self.layers[0] for row in self.fourier
        ):
            raise ValueError(
                f"fourier rows must have length layers[0]={self.layers[0]}"
            )
        if len(self.lb) != self.layers[0] or len(self.ub) != self.layers[0]:
            raise ValueError(
                f"lb/ub must have length layers[0]={self.layers[0]}, "
                f"got {len(self.lb)}/{len(self.ub)}"
            )

    @property
    def lax_precision(self) -> jax.lax.Precision:
        return _PRECISIONS[self.precision]

    @property
    def cdtype(self):
        """Residual-path compute dtype (== dtype unless mixing)."""
        return (
            jnp.dtype(self.dtype)
            if self.compute_dtype is None
            else jnp.dtype(self.compute_dtype)
        )

    @property
    def mixed(self) -> bool:
        return self.cdtype != jnp.dtype(self.dtype)

    @property
    def in_dim(self) -> int:
        return self.layers[0]

    @property
    def n_fourier(self) -> int:
        return len(self.fourier)

    @property
    def embed_dim(self) -> int:
        """First-layer input width: raw coords plus sin/cos feature pairs."""
        return self.in_dim + 2 * self.n_fourier

    @property
    def out_dim(self) -> int:
        return self.layers[-1]

    @property
    def n_params(self) -> int:
        widths = (self.embed_dim,) + self.layers[1:]
        return sum(
            din * dout + dout for din, dout in zip(widths[:-1], widths[1:])
        )


def init_mlp(key: jax.Array, spec: MLPSpec) -> Params:
    """Initialize params: truncated-normal W (std sqrt(2/(din+dout))), zero b.

    Matches the reference's ``xavier_init`` (``Abgrall_ADMM.py:147-151``):
    TF1 ``truncated_normal`` redraws beyond 2 sigma, which is exactly
    ``jax.random.truncated_normal(-2, 2) * std``.
    """
    n_layers = len(spec.layers) - 1
    keys = jax.random.split(key, n_layers)
    params = []
    widths = (spec.embed_dim,) + spec.layers[1:]  # Fourier-expanded input
    for k, din, dout in zip(keys, widths[:-1], widths[1:]):
        std = math.sqrt(2.0 / (din + dout))
        w = std * jax.random.truncated_normal(
            k, -2.0, 2.0, (din, dout), dtype=spec.dtype
        )
        b = jnp.zeros((1, dout), dtype=spec.dtype)
        params.append({"W": w, "b": b})
    return params


def normalize_inputs(spec: MLPSpec, x: jax.Array) -> jax.Array:
    """Affine rescale of inputs to [-1, 1] (``Abgrall_ADMM.py:156``)."""
    lb = jnp.asarray(spec.lb, dtype=spec.dtype)
    ub = jnp.asarray(spec.ub, dtype=spec.dtype)
    return 2.0 * (x - lb) / (ub - lb) - 1.0


def input_scale(spec: MLPSpec) -> jax.Array:
    """d(normalized input)/d(raw input) per dimension: 2 / (ub - lb)."""
    lb = jnp.asarray(spec.lb, dtype=spec.dtype)
    ub = jnp.asarray(spec.ub, dtype=spec.dtype)
    return 2.0 / (ub - lb)


def fourier_matrix(
    n_features: int, in_dim: int = 2, sigma: float = 3.0, seed: int = 0
) -> tuple:
    """Frequency matrix B ~ N(0, sigma^2), shape (F, in_dim), as the nested
    tuple MLPSpec.fourier expects. Deterministic in `seed` (the embedding is
    part of the model definition, not a trainable)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    b = sigma * rng.standard_normal((n_features, in_dim))
    return tuple(tuple(float(v) for v in row) for row in b)


def _fourier_b(spec: MLPSpec) -> jax.Array:
    """(in_dim, F) matrix 2*pi*B^T — the phase is z = h @ (2 pi B^T)."""
    b = jnp.asarray(spec.fourier, dtype=spec.dtype)  # (F, in_dim)
    return 2.0 * jnp.pi * b.T


def embed_inputs(spec: MLPSpec, h: jax.Array) -> jax.Array:
    """[h, sin z, cos z] with z = 2*pi*(h @ B^T); identity when no fourier."""
    if not spec.fourier:
        return h
    z = jnp.dot(h, _fourier_b(spec), precision=spec.lax_precision)
    return jnp.concatenate([h, jnp.sin(z), jnp.cos(z)], axis=1)


def embed_streams(spec: MLPSpec, h: jax.Array):
    """Embedding value and its first/second derivative streams w.r.t. the
    RAW inputs (chain rule through the [-1,1] rescale included).

    Returns (phi, dphi_dx, dphi_dt, d2phi_dx2); the second-derivative entry
    is None without fourier (affine embedding), and the tangents are then
    constant (1, in_dim) rows — broadcasting them per-point would add a
    per-layer (N,2) materialization the op-issue-bound narrow step pays
    for. With fourier the tangents are genuinely per-point (N, embed_dim).
    Feeds the Taylor-mode initial streams (ops/taylor.py).
    """
    scale = input_scale(spec)  # (in_dim,)
    if not spec.fourier:
        dx = jnp.array([[1.0, 0.0]], dtype=spec.dtype) * scale
        dt = jnp.array([[0.0, 1.0]], dtype=spec.dtype) * scale
        return h, dx, dt, None
    bt = _fourier_b(spec)  # (in_dim, F)
    z = jnp.dot(h, bt, precision=spec.lax_precision)
    sin_z, cos_z = jnp.sin(z), jnp.cos(z)
    zeros = jnp.zeros_like(h)
    # d z / d raw_x = scale_x * bt[0], / d raw_t = scale_t * bt[1]
    zx = scale[0] * bt[0]  # (F,)
    zt = scale[1] * bt[1]
    ex = jnp.broadcast_to(
        jnp.array([[1.0, 0.0]], dtype=spec.dtype) * scale, h.shape
    )
    et = jnp.broadcast_to(
        jnp.array([[0.0, 1.0]], dtype=spec.dtype) * scale, h.shape
    )
    phi = jnp.concatenate([h, sin_z, cos_z], axis=1)
    dphi_dx = jnp.concatenate([ex, cos_z * zx, -sin_z * zx], axis=1)
    dphi_dt = jnp.concatenate([et, cos_z * zt, -sin_z * zt], axis=1)
    d2phi_dx2 = jnp.concatenate(
        [zeros, -sin_z * zx * zx, -cos_z * zx * zx], axis=1
    )
    return phi, dphi_dx, dphi_dt, d2phi_dx2


def mlp_apply(spec: MLPSpec, params: Params, x: jax.Array) -> jax.Array:
    """Forward pass: normalize -> [Fourier embed] -> tanh layers -> head.

    x: (N, in_dim) -> (N, out_dim). Matches ``neural_net``
    (``Abgrall_ADMM.py:153-164``) semantics (plus the optional embedding).
    """
    h = embed_inputs(spec, normalize_inputs(spec, x))
    prec = spec.lax_precision
    for layer in params[:-1]:
        h = jnp.tanh(jnp.dot(h, layer["W"], precision=prec) + layer["b"])
    last = params[-1]
    return jnp.dot(h, last["W"], precision=prec) + last["b"]


def stack_params(params_list: Sequence[Params]) -> Params:
    """Stack an ensemble of same-shaped param pytrees along a new leading axis.

    The stacked pytree is what ``jax.vmap``-ed training steps consume — the
    TPU-native replacement for the reference's MPI job farm of independent
    runs (``scheduler.py:70-127``).
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def unstack_params(stacked: Params, n: int) -> list:
    """Inverse of :func:`stack_params`."""
    return [
        jax.tree_util.tree_map(lambda x, i=i: x[i], stacked) for i in range(n)
    ]
