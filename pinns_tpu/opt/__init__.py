from pinns_tpu.opt.lbfgs import (
    LBFGSResult,
    lbfgs_minimize,
    lbfgs_minimize_pytree,
)
