#!/usr/bin/env bash
# The reference's full hyperparameter sweep envelope (scheduler.py:146-150:
# N_u in {100,200,400} x N_f in {100,200,500,1000}, 1e6 epochs each, farmed
# over MPI ranks with 12-24 h SLURM walltime) as one pinns_tpu command.
#
# Shape-changing axes (data.n_u, sampling.n_f) become separate jit
# specializations; value-only axes (loss.rho, train.seed) would additionally
# collapse into vmapped ensembles.
set -euo pipefail
EPOCHS="${EPOCHS:-1000000}"
OUT="${OUT:-sweep_results.jsonl}"

# The preset's own hybrid Adam->L-BFGS schedule (Abgrall_ADMM.py:210-217)
# runs as-is — vmapped ensembles support the L-BFGS phase on device.
python -m pinns_tpu sweep \
    --preset abgrall_admm \
    --grid data.n_u=100,200,400 \
    --grid sampling.n_f=100,200,500,1000 \
    --epochs "${EPOCHS}" \
    --retries 1 \
    --out "${OUT}"
