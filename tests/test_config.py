import dataclasses

import pytest

from pinns_tpu.config import Experiment, LBFGSConfig, override


def test_override_top_level():
    exp = override(Experiment(), {"name": "renamed"})
    assert exp.name == "renamed"


def test_override_nested():
    exp = override(
        Experiment(),
        {"sampling.n_f": 4242, "optimizer.lbfgs.max_iters": 7, "loss.rho": 3.5},
    )
    assert exp.sampling.n_f == 4242
    assert exp.optimizer.lbfgs.max_iters == 7
    assert exp.loss.rho == 3.5
    # everything else untouched
    assert exp.model.layers == Experiment().model.layers


def test_override_unknown_key_raises():
    with pytest.raises(TypeError):
        override(Experiment(), {"sampling.bogus_knob": 1})
    with pytest.raises(TypeError):
        override(Experiment(), {"bogus": 1})


def test_override_does_not_mutate_original():
    base = Experiment()
    override(base, {"sampling.n_f": 999})
    assert base.sampling.n_f == 1000


def test_experiment_is_hashable():
    # jitted step factories close over the config; it must stay hashable
    hash(Experiment())
    hash(LBFGSConfig())


def test_replace_shortcut():
    exp = Experiment().replace(name="x")
    assert exp.name == "x"


def test_shipped_presets_keep_f32_matmul_precision():
    # PARITY 4o: matmul precision='default' (bf16 MXU passes) measured a
    # ~3x rel-L2 regression on the final Euler mixed-formulation recipe
    # (1M solo u 0.185 vs 0.054; all 8 ensemble members ~0.2). Guard that
    # no shipped preset reintroduces the lever — measured mixing goes
    # through ModelConfig.compute_dtype instead.
    from pinns_tpu.experiments import PRESETS

    for name, exp in PRESETS.items():
        assert exp.model.precision == "highest", (
            f"preset {name!r} ships model.precision={exp.model.precision!r}; "
            "PARITY 4o measured 'default' as a quality regression"
        )
