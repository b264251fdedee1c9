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
        which the u_xx path requires; 'default' allows bf16 MXU passes but
        measured a ~3× quality regression on the final Euler weak-form
        recipe (PARITY §4o) — use compute_dtype for measured mixing instead.
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
    # Trainable shock-path features (beyond-reference): n_paths > 0 appends
    # K = n_paths coordinate features phi_k = tanh(a_k * (x_n - s_k(t_n)))
    # to the first-layer input, where s_k is a trainable degree-`path_degree`
    # polynomial in normalized time and a_k a trainable sharpness
    # (initialized to path_sharpness). Each feature is a steep-but-smooth
    # moving front the trunk can compose to localize a shock/contact jump
    # whose PATH the optimizer discovers — the representation lever for the
    # discontinuity plateaus (PARITY.md §4c/§4d: the contact/shock error is
    # a representation limit of the smooth trunk, not an information limit).
    # The path parameters live in params[0] ('path_c' (K, degree+1),
    # 'path_a' (K,)), so they train, ensemble-vmap, checkpoint, and shard
    # like any weight. Derivative streams propagate exactly (all-smooth ops).
    n_paths: int = 0
    path_degree: int = 2
    path_sharpness: float = 8.0

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
        if self.n_paths < 0 or self.path_degree < 0:
            raise ValueError("n_paths and path_degree must be >= 0")
        if self.n_paths and self.layers[0] != 2:
            raise ValueError(
                "shock-path features assume (x, t) inputs (in_dim == 2)"
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
        """First-layer input width: raw coords, sin/cos pairs, path features."""
        return self.in_dim + 2 * self.n_fourier + self.n_paths

    @property
    def out_dim(self) -> int:
        return self.layers[-1]

    @property
    def n_params(self) -> int:
        widths = (self.embed_dim,) + self.layers[1:]
        n = sum(
            din * dout + dout for din, dout in zip(widths[:-1], widths[1:])
        )
        return n + self.n_paths * (self.path_degree + 2)  # path_c + path_a


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
    if spec.n_paths:
        # Trainable shock-path features ride on the first layer's dict so
        # every pytree transform (optax, vmap ensembles, L-BFGS flatten,
        # checkpoints, tp shardings) carries them without special cases.
        # Initial paths: constant-in-time fronts spread across the domain
        # interior (deterministic — the optimizer moves them), sharpness
        # from the spec.
        k = spec.n_paths
        c = jnp.zeros((k, spec.path_degree + 1), dtype=spec.dtype)
        centers = (2.0 * (jnp.arange(k, dtype=spec.dtype) + 0.5) / k) - 1.0
        params[0]["path_c"] = c.at[:, 0].set(centers)
        params[0]["path_a"] = jnp.full((k,), spec.path_sharpness, spec.dtype)
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


def _path_streams(spec: MLPSpec, layer0: dict, h: jax.Array):
    """Shock-path features of the NORMALIZED coords h = (x_n, t_n) and their
    derivative streams w.r.t. the RAW inputs.

    phi_k = tanh(z_k), z_k = a_k * (x_n - s_k(t_n)),
    s_k(t_n) = sum_j c_kj t_n^j (trainable c, a in layer0).

    Returns (phi, phi_x, phi_t, phi_xx), each (N, K). All-smooth closed
    forms: phi' = 1 - phi^2, phi'' = -2 phi phi'; the time chain runs
    through s'(t_n), and the [-1,1] rescale contributes input_scale factors.
    """
    c = layer0["path_c"]  # (K, D+1)
    a = layer0["path_a"]  # (K,)
    scale = input_scale(spec)
    xn, tn = h[:, 0:1], h[:, 1:2]
    deg = spec.path_degree
    powers = jnp.concatenate(
        [tn**j for j in range(deg + 1)], axis=1
    )  # (N, D+1); t^0 = 1
    s = jnp.dot(powers, c.T, precision=spec.lax_precision)  # (N, K)
    if deg >= 1:
        dpow = jnp.concatenate(
            [float(j) * tn ** (j - 1) for j in range(1, deg + 1)], axis=1
        )  # (N, D)
        sp = jnp.dot(dpow, c[:, 1:].T, precision=spec.lax_precision)
    else:
        sp = jnp.zeros_like(s)
    z = a * (xn - s)
    phi = jnp.tanh(z)
    d1 = 1.0 - phi * phi
    d2 = -2.0 * phi * d1
    zx = a * scale[0]  # (K,) — constant per path
    zt = -(a * scale[1]) * sp  # (N, K)
    return phi, d1 * zx, d1 * zt, d2 * (zx * zx)


def embed_inputs(spec: MLPSpec, h: jax.Array, layer0: dict = None) -> jax.Array:
    """[h, sin z, cos z, paths]; identity when no fourier and no paths."""
    if spec.fourier:
        z = jnp.dot(h, _fourier_b(spec), precision=spec.lax_precision)
        out = jnp.concatenate([h, jnp.sin(z), jnp.cos(z)], axis=1)
    else:
        out = h
    if spec.n_paths:
        phi, _, _, _ = _path_streams(spec, layer0, h)
        out = jnp.concatenate([out, phi], axis=1)
    return out


def embed_streams(spec: MLPSpec, h: jax.Array, layer0: dict = None):
    """Embedding value and its first/second derivative streams w.r.t. the
    RAW inputs (chain rule through the [-1,1] rescale included).

    Returns (phi, dphi_dx, dphi_dt, d2phi_dx2); the second-derivative entry
    is None without fourier/paths (affine embedding), and the tangents are
    then constant (1, in_dim) rows — broadcasting them per-point would add
    a per-layer (N,2) materialization the op-issue-bound narrow step pays
    for. With fourier or shock-path features the tangents are genuinely
    per-point (N, embed_dim). Feeds the Taylor-mode initial streams
    (ops/taylor.py). `layer0` (params[0]) carries the trainable path
    parameters when spec.n_paths > 0.
    """
    scale = input_scale(spec)  # (in_dim,)
    if not spec.fourier and not spec.n_paths:
        dx = jnp.array([[1.0, 0.0]], dtype=spec.dtype) * scale
        dt = jnp.array([[0.0, 1.0]], dtype=spec.dtype) * scale
        return h, dx, dt, None
    zeros = jnp.zeros_like(h)
    ex = jnp.broadcast_to(
        jnp.array([[1.0, 0.0]], dtype=spec.dtype) * scale, h.shape
    )
    et = jnp.broadcast_to(
        jnp.array([[0.0, 1.0]], dtype=spec.dtype) * scale, h.shape
    )
    vals, dxs, dts, dxxs = [h], [ex], [et], [zeros]
    if spec.fourier:
        bt = _fourier_b(spec)  # (in_dim, F)
        z = jnp.dot(h, bt, precision=spec.lax_precision)
        sin_z, cos_z = jnp.sin(z), jnp.cos(z)
        # d z / d raw_x = scale_x * bt[0], / d raw_t = scale_t * bt[1]
        zx = scale[0] * bt[0]  # (F,)
        zt = scale[1] * bt[1]
        vals += [sin_z, cos_z]
        dxs += [cos_z * zx, -sin_z * zx]
        dts += [cos_z * zt, -sin_z * zt]
        dxxs += [-sin_z * zx * zx, -cos_z * zx * zx]
    if spec.n_paths:
        phi, phi_x, phi_t, phi_xx = _path_streams(spec, layer0, h)
        vals.append(phi)
        dxs.append(phi_x)
        dts.append(phi_t)
        dxxs.append(phi_xx)
    cat = lambda xs: jnp.concatenate(xs, axis=1)  # noqa: E731
    return cat(vals), cat(dxs), cat(dts), cat(dxxs)


def mlp_apply(spec: MLPSpec, params: Params, x: jax.Array) -> jax.Array:
    """Forward pass: normalize -> [Fourier embed] -> tanh layers -> head.

    x: (N, in_dim) -> (N, out_dim). Matches ``neural_net``
    (``Abgrall_ADMM.py:153-164``) semantics (plus the optional embedding).
    """
    h = embed_inputs(spec, normalize_inputs(spec, x), params[0])
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
