from pinns_tpu.ops.taylor import mlp_taylor_1, mlp_taylor_2
from pinns_tpu.ops.derivatives import derivs_1_jvp, derivs_2_jvp
from pinns_tpu.ops.residuals import (
    burgers_residual,
    burgers_residual_aux,
    euler_residuals,
    euler_residuals_aux,
)
from pinns_tpu.ops.prox import soft_threshold
