from pinns_tpu.losses.misfit import data_misfit, residual_penalty
from pinns_tpu.losses.admm import (
    ADMMState,
    admm_init,
    admm_penalty,
    admm_update,
    admm_misfit,
)
