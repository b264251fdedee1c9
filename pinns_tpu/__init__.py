"""pinns_tpu — a TPU-native physics-informed neural network framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
jonwittmer/PINNs reference suite (forward "continuous inference" and inverse
"continuous identification" for 1D viscous Burgers and the 1D compressible
Euler system, with L2 / L1-penalty / ADMM residual regularization), re-designed
TPU-first:

- pure-function pytree models compiled to a single fused XLA program per
  training step (the reference runs >=4 TF1 ``sess.run`` round-trips per epoch,
  ``Abgrall_ADMM.py:210-226``);
- Taylor-mode analytic propagation of (u, u_x, u_t, u_xx) through the tanh MLP
  — 4 MXU matmuls per layer in one pass — replacing chained reverse-mode
  ``tf.gradients`` (``Abgrall_ADMM.py:170-180``, ``Euler_ADMM.py:176-198``);
- on-device collocation resampling, on-device L-BFGS (two-loop recursion +
  strong-Wolfe line search under ``lax.while_loop``) replacing host SciPy
  L-BFGS-B;
- data-parallel collocation sharding over a ``jax.sharding.Mesh`` with
  psum-reduced losses, and vmapped parameter ensembles replacing the
  reference's MPI/NVML GPU job farm (``scheduler.py``).
"""

from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply, normalize_inputs
from pinns_tpu.ops.taylor import mlp_taylor_1, mlp_taylor_2
from pinns_tpu.ops.residuals import burgers_residual, euler_residuals
from pinns_tpu.ops.prox import soft_threshold

__version__ = "0.1.0"
