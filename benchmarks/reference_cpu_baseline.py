"""Measure the reference's per-epoch computation pattern on CPU.

The reference is TF1 (not installed here); this is a faithful CPU stand-in in
torch eager that reproduces the reference ADMM hot loop's work per epoch
(``Abgrall_ADMM.py:200-252``):

  1. Adam training step: forward -> residual via three chained reverse-mode
     gradient sweeps (u_t, u_x, u_xx with create_graph) -> backprop -> Adam.
  2. z-update: RE-evaluates the residual graph at the freshly resampled
     collocation points (the reference's ``sess.run(self.z_update)``).
  3. gamma-update: re-evaluates the residual graph AGAIN
     (``sess.run(self.gamma_update)``).
  4. host-side numpy collocation resampling each epoch.

Canonical config: N_u=100, N_f=1000, rho=10, layers [2, 20x8, 1]
(``Abgrall_ADMM.py:29-34, 269``).

Run:  python benchmarks/reference_cpu_baseline.py [epochs]
Prints JSON {"pts_per_sec": ..., "epochs_per_sec": ...}. The measured value
is recorded in BASELINE.md and used as the denominator in bench.py.
"""

import json
import math
import sys
import time

import numpy as np
import torch

torch.manual_seed(1234)
np.random.seed(1234)
torch.set_num_threads(6)  # reference sets OMP_NUM_THREADS=6

N_U, N_F, RHO = 100, 1000, 10.0
LAYERS = [2] + [20] * 8 + [1]
LB = np.array([-1.0, 0.0])
UB = np.array([1.0, 1.0])


def init_net():
    ws, bs = [], []
    for din, dout in zip(LAYERS[:-1], LAYERS[1:]):
        std = math.sqrt(2.0 / (din + dout))
        ws.append(torch.nn.Parameter(torch.randn(din, dout) * std))
        bs.append(torch.nn.Parameter(torch.zeros(1, dout)))
    return ws, bs


def forward(ws, bs, x, t):
    X = torch.cat([x, t], dim=1)
    lb = torch.tensor(LB, dtype=torch.float32)
    ub = torch.tensor(UB, dtype=torch.float32)
    h = 2.0 * (X - lb) / (ub - lb) - 1.0
    for w, b in zip(ws[:-1], bs[:-1]):
        h = torch.tanh(h @ w + b)
    return h @ ws[-1] + bs[-1]


def net_f(ws, bs, x, t, lam1=1.0, lam2=0.0):
    """Chained reverse-mode sweeps, as tf.gradients does (Abgrall_ADMM.py:170-180)."""
    u = forward(ws, bs, x, t)
    ones = torch.ones_like(u)
    u_t = torch.autograd.grad(u, t, ones, create_graph=True)[0]
    u_x = torch.autograd.grad(u, x, ones, create_graph=True)[0]
    u_xx = torch.autograd.grad(u_x, x, torch.ones_like(u_x), create_graph=True)[0]
    return u, u_t + lam1 * u * u_x - lam2 * u_xx


def main(epochs=200):
    ws, bs = init_net()
    params = ws + bs
    opt = torch.optim.Adam(params, lr=1e-3)

    x_data = torch.rand(N_U, 1) * 2 - 1
    t_data = torch.rand(N_U, 1)
    u_data = torch.rand(N_U, 1)

    x_phys = torch.tensor(
        np.random.uniform(LB[0], UB[0], (N_F, 1)), dtype=torch.float32,
        requires_grad=True,
    )
    t_phys = torch.tensor(
        np.random.uniform(LB[1], UB[1], (N_F, 1)), dtype=torch.float32,
        requires_grad=True,
    )
    z = net_f(ws, bs, x_phys, t_phys)[1].detach().clone()
    gamma = torch.ones(N_F, 1)
    c = 1.0 / (RHO * N_F)

    # warmup
    for _ in range(5):
        opt.zero_grad()
        u_pred = forward(ws, bs, x_data, t_data)
        _, f = net_f(ws, bs, x_phys, t_phys)
        loss = (1 / N_U) * torch.sum((u_data - u_pred) ** 2) + (
            RHO / 2
        ) * torch.sum((f - z + gamma / RHO) ** 2)
        loss.backward()
        opt.step()

    t0 = time.time()
    for _ in range(epochs):
        # 1. Adam step on current collocation batch
        opt.zero_grad()
        u_pred = forward(ws, bs, x_data, t_data)
        _, f = net_f(ws, bs, x_phys, t_phys)
        loss = (1 / N_U) * torch.sum((u_data - u_pred) ** 2) + (
            RHO / 2
        ) * torch.sum((f - z + gamma / RHO) ** 2)
        loss.backward()
        opt.step()

        # host-side resample (reference: np.random.uniform each epoch)
        x_phys = torch.tensor(
            np.random.uniform(LB[0], UB[0], (N_F, 1)), dtype=torch.float32,
            requires_grad=True,
        )
        t_phys = torch.tensor(
            np.random.uniform(LB[1], UB[1], (N_F, 1)), dtype=torch.float32,
            requires_grad=True,
        )

        # 2. z-update: separate residual re-evaluation
        _, f_z = net_f(ws, bs, x_phys, t_phys)
        val = (f_z + gamma / RHO).detach()
        z = torch.where(
            val > c, val - c, torch.where(val < -c, val + c, torch.zeros_like(val))
        )
        # 3. gamma-update: ANOTHER residual re-evaluation
        _, f_g = net_f(ws, bs, x_phys, t_phys)
        gamma = (gamma + RHO * (f_g - z)).detach()
    dt = time.time() - t0

    eps = epochs / dt
    print(
        json.dumps(
            {
                "config": "abgrall_admm canonical (N_u=100, N_f=1000, 8x20)",
                "epochs_per_sec": round(eps, 2),
                "pts_per_sec": round(eps * N_F, 1),
                "threads": torch.get_num_threads(),
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
