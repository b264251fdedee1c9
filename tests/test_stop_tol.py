import os

import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def test_stop_tol_ends_training_early():
    exp = override(
        get_preset("abgrall_l2"),
        {
            "model.layers": (2, 12, 12, 1),
            "sampling.n_f": 128,
            "train.epochs": 2000,
            "train.chunk": 50,
            "train.stop_tol": 1e6,  # trivially satisfied after first chunk
        },
    )
    state, summary = Trainer(exp).train()
    assert summary["epochs"] == 50  # stopped after the first chunk


def test_stop_tol_disabled_by_default():
    exp = override(
        get_preset("abgrall_l2"),
        {
            "model.layers": (2, 12, 12, 1),
            "sampling.n_f": 128,
            "train.epochs": 100,
            "train.chunk": 50,
        },
    )
    _, summary = Trainer(exp).train()
    assert summary["epochs"] == 100
