from pinns_tpu.parallel.mesh import make_mesh, multihost_init
from pinns_tpu.parallel.sharding import shard_trainer, place_state
from pinns_tpu.parallel.ensemble import (
    init_ensemble_states,
    make_ensemble_chunk,
    evaluate_ensemble,
    stack_states,
    unstack_states,
    ensemble_predict,
    selection_scores,
    select_member,
    run_ensemble,
    calibration_stats,
    mond_band_factors,
    uq_calibration,
)
