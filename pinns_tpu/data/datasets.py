"""Dense space-time solution grids and IC/BC training-set construction.

Reference parity: per-script ``load_data`` (e.g. ``Abgrall_ADMM.py:264-309``,
``Euler_ADMM.py:274-333``; the Hwan scripts inline the same logic at module
scope, ``Hwan_L2Regularization_Burgers.py:160-190``):

- ``scipy.io.loadmat`` of {x:(Nx,1), t:(Nt,1), usol:(Nx,Nt)} (Burgers) or
  {.., rhosol, usol, Enersol:(Nx,Nt)} (Euler); solution transposed to (Nt,Nx);
- meshgrid flattened to X_star:(Nt*Nx, 2) with columns (x, t);
- supervised training candidates = initial-condition row (t = t[0]) stacked
  with left/right boundary columns (x = x[0], x = x[-1]);
- a random subsample of N_u of those candidates (without replacement) is the
  data-fit set.

The known datasets ship with the reference tree (read in place, never copied):
  burgers_shock.mat (256x100), Abgrall_burgers_shock.mat (257x257),
  TwoSin_burgers_shock.mat (513x101), Abgrall_eulers.mat (300x157).
Equivalent grids can be regenerated natively with
``pinns_tpu.data.generators`` (no MATLAB needed).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

DEFAULT_DATA_ROOT = os.environ.get(
    "PINNS_TPU_DATA_ROOT", "/root/reference"
)

BURGERS_DATASETS = {
    "burgers_shock": "Burgers/Data/burgers_shock.mat",
    "abgrall_burgers_shock": "Burgers/Data/Abgrall_burgers_shock.mat",
    "twosin_burgers_shock": "Burgers/Data/TwoSin_burgers_shock.mat",
}
EULER_DATASETS = {
    "abgrall_eulers": "Eulers/Data/Abgrall_eulers.mat",
}


@dataclasses.dataclass
class GridDataset:
    """A dense (t, x) solution grid plus flattened evaluation set.

    fields maps field name -> (Nt, Nx) array ('u' for Burgers;
    'rho', 'u', 'E' for Euler). X_star is (Nt*Nx, 2) with columns (x, t);
    star maps field name -> (Nt*Nx, 1) flattened exact solution.
    """

    x: np.ndarray  # (Nx, 1)
    t: np.ndarray  # (Nt, 1)
    fields: Dict[str, np.ndarray]  # each (Nt, Nx)
    name: str = "dataset"

    def __post_init__(self):
        self.x = np.asarray(self.x, np.float32).reshape(-1, 1)
        self.t = np.asarray(self.t, np.float32).reshape(-1, 1)
        self.fields = {
            k: np.asarray(v, np.float32) for k, v in self.fields.items()
        }
        xg, tg = np.meshgrid(self.x.ravel(), self.t.ravel())
        self.X_grid, self.T_grid = xg, tg
        self.X_star = np.hstack(
            [xg.reshape(-1, 1), tg.reshape(-1, 1)]
        ).astype(np.float32)
        self.star = {
            k: v.reshape(-1, 1) for k, v in self.fields.items()
        }
        self.lb = self.X_star.min(axis=0)
        self.ub = self.X_star.max(axis=0)

    @property
    def field_names(self) -> Tuple[str, ...]:
        return tuple(self.fields.keys())

    @property
    def n_points(self) -> int:
        return self.X_star.shape[0]


def _loadmat(path: str) -> dict:
    import scipy.io

    return scipy.io.loadmat(path)


def _generate_fallback(name: str) -> Optional[dict]:
    """Regenerate a known dataset natively when its .mat file is absent —
    the framework is self-sufficient without the reference tree. Every known
    grid regenerates to its measured fidelity vs the stored artifact
    (round-4 refinements): burgers_shock via the Cole-Hopf closed form
    (<1e-3), TwoSin via the identified IC + measured tau(k) clock (max
    1.4%), Abgrall_burgers_shock via the refined IC/clock/viscosity (max
    1.7%) — both Burgers floors measured to be the stored producers' own
    scheme signatures — and Abgrall_eulers via the EXACT Riemann solution
    (zero oracle error; the stored DG artifact itself measures rho 2.3% /
    u 28% / E 2.7% max-column error against it)."""
    from pinns_tpu.data import generators as g

    if name == "burgers_shock":
        return g.make_burgers_shock_grid(nx=256, nt=100)
    if name == "twosin_burgers_shock":
        return g.make_twosin_grid()
    if name == "abgrall_burgers_shock":
        return g.make_abgrall_burgers_grid()
    if name == "abgrall_eulers":
        return g.make_abgrall_eulers_grid()
    return None


def _load_or_generate(name_or_path: str, key_map: dict, root: str) -> dict:
    rel = key_map.get(name_or_path)
    path = os.path.join(root, rel) if rel else name_or_path
    if os.path.exists(path):
        return dict(_loadmat(path), _name=os.path.splitext(os.path.basename(path))[0])
    fallback = _generate_fallback(name_or_path)
    if fallback is not None:
        return dict(fallback, _name=name_or_path)
    raise FileNotFoundError(
        f"dataset {name_or_path!r} not found at {path} and has no native "
        f"generator — produce one with `python -m pinns_tpu generate-data` "
        f"or set PINNS_TPU_DATA_ROOT"
    )


def load_burgers_mat(
    name_or_path: str = "twosin_burgers_shock", root: str = DEFAULT_DATA_ROOT
) -> GridDataset:
    """Load a Burgers {x, t, usol} grid. Accepts a dataset key or a path;
    regenerates `burgers_shock` natively if the file is absent."""
    d = _load_or_generate(name_or_path, BURGERS_DATASETS, root)
    return GridDataset(
        x=d["x"],
        t=d["t"],
        # usol stored (Nx, Nt); reference transposes to (Nt, Nx)
        fields={"u": np.real(d["usol"]).T},
        name=d["_name"],
    )


def load_euler_mat(
    name_or_path: str = "abgrall_eulers", root: str = DEFAULT_DATA_ROOT
) -> GridDataset:
    """Load the Euler {x, t, rhosol, usol, Enersol} grid; regenerates it
    natively (FV solve) if the file is absent."""
    d = _load_or_generate(name_or_path, EULER_DATASETS, root)
    return GridDataset(
        x=d["x"],
        t=d["t"],
        fields={
            "rho": np.real(d["rhosol"]).T,
            "u": np.real(d["usol"]).T,
            "E": np.real(d["Enersol"]).T,
        },
        name=d["_name"],
    )


def ic_bc_candidates(ds: GridDataset) -> np.ndarray:
    """The full IC row + boundary column candidate stack (Nx + 2 Nt, 2) —
    what the reference anchors into fixed collocation sets
    (``Hwan_L2Regularization_Burgers.py:179-184``: the vstack uses the FULL
    X_u_train, before the N_u subsample)."""
    xg, tg = ds.X_grid, ds.T_grid
    ic = np.hstack([xg[0:1, :].T, tg[0:1, :].T])
    left = np.hstack([xg[:, 0:1], tg[:, 0:1]])
    right = np.hstack([xg[:, -1:], tg[:, -1:]])
    return np.vstack([ic, left, right]).astype(np.float32)


def build_ic_bc_training_set(
    ds: GridDataset,
    n_u: int,
    seed: int = 1234,
    rng: Optional[np.random.Generator] = None,
    noise: float = 0.0,
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """IC row + boundary columns, subsampled to n_u points without replacement.

    Mirrors ``Abgrall_ADMM.py:286-304`` / ``Euler_ADMM.py:300-327``: candidate
    set = [t=t0 row; x=x0 column; x=x_last column]; then
    ``np.random.choice(..., N_u, replace=False)``. Optional iid Gaussian noise
    on the targets (the reference's identification setup mentions noisy data).

    Returns (X_data:(n_u,2), targets: field -> (n_u,1)).
    """
    candidates = ic_bc_candidates(ds)

    targets_full = {}
    for k, grid in ds.fields.items():
        targets_full[k] = np.vstack(
            [grid[0:1, :].T, grid[:, 0:1], grid[:, -1:]]
        ).astype(np.float32)

    if rng is None:
        rng = np.random.default_rng(seed)
    idx = rng.choice(candidates.shape[0], size=n_u, replace=False)
    x_data = candidates[idx]
    targets = {k: v[idx] for k, v in targets_full.items()}
    if noise > 0.0:
        for k in targets:
            targets[k] = targets[k] + noise * targets[k].std() * rng.standard_normal(
                targets[k].shape
            ).astype(np.float32)
    return x_data, targets


def interior_training_set(
    ds: GridDataset,
    n_u: int,
    seed: int = 1234,
    rng: Optional[np.random.Generator] = None,
    noise: float = 0.0,
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Random interior (full-grid) sample — the Raissi identification setup:
    N_u points drawn from the whole space-time grid, optionally noisy."""
    if rng is None:
        rng = np.random.default_rng(seed)
    idx = rng.choice(ds.n_points, size=n_u, replace=False)
    x_data = ds.X_star[idx]
    targets = {k: v[idx] for k, v in ds.star.items()}
    if noise > 0.0:
        for k in targets:
            targets[k] = targets[k] + noise * targets[k].std() * rng.standard_normal(
                targets[k].shape
            ).astype(np.float32)
    return x_data, targets
