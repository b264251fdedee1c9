from pinns_tpu.ops.pallas.fused_mlp import (
    mlp_forward_pallas,
    mlp_taylor2_pallas,
    pallas_available,
)
