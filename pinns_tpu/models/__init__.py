from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply, normalize_inputs
