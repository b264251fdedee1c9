from pinns_tpu.data.datasets import (
    GridDataset,
    load_burgers_mat,
    load_euler_mat,
    build_ic_bc_training_set,
)
from pinns_tpu.data.sampling import (
    latin_hypercube,
    uniform_box,
    scale_to_bounds,
)
