#!/usr/bin/env python3
"""Benchmark: collocation points/sec on the flagship Burgers ADMM step.

Primary metric: canonical config (N_u=100, N_f=1000, rho=10, 8x20 tanh MLP —
``Abgrall_ADMM.py:29-34,269``), full fused train step (forward + Taylor-mode
residual + grads + Adam + on-device resample + ADMM z/dual updates), scanned
in chunks of 1000 — i.e., the same per-epoch work as the reference hot loop
(``Abgrall_ADMM.py:210-226``) including its separate z/gamma residual
re-evaluations, executed as one XLA program.

vs_baseline: ratio against the measured CPU reference-pattern throughput
(torch eager faithful reimplementation of the TF1 loop, 6 threads —
``benchmarks/reference_cpu_baseline.py``; see BASELINE.md).

Also reported (extra fields): the 1M-point wide-net scale config
(``burgers_scale`` preset) points/sec on this chip.

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# Watchdog: on the tunneled backend a dead relay hangs jax.devices()/compile
# forever; fail loudly instead so the caller gets a diagnostic, not a stall.
# Generous default — first fresh compiles here have measured at 400-1200 s.
BENCH_TIMEOUT_S = int(os.environ.get("BENCH_TIMEOUT_S", "3000"))

# Relay-health probe + retry budget: a tiny jit(grad) program is compiled in a
# SUBPROCESS (so a hung relay kills the child, not us) before any real work.
# On failure we back off and retry — transient relay outages have lasted
# minutes-to-hours here — until the budget runs out, then emit a fallback
# JSON line citing the last successful capture instead of dying silently.
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "600"))
PROBE_BUDGET_S = int(os.environ.get("BENCH_PROBE_BUDGET_S", "2400"))
_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_CACHE.json")

_PROBE_SRC = """
import os
import jax, jax.numpy as jnp
# sitecustomize pins jax_platforms on this box; honor an explicit env
# override so the probe can be exercised on CPU (see CLAUDE.md gotcha).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
f = jax.jit(jax.grad(lambda x: jnp.sum(jnp.tanh(x) ** 2)))
assert float(f(jnp.ones((37,))).sum()) != 0.0
print("PROBE_OK", jax.devices()[0])
"""


def _probe_backend_once(timeout_s):
    """(ok, diag) — ok iff a fresh subprocess can init the backend and jit a
    tiny grad; diag carries the stderr tail of a fast failure for the log.

    Timeout calibration (measured 2026-08-19): a healthy relay answers in
    ~13 s, but right after another session exits the claim leg has measured
    105-300+ s — 240 s false-negatived on a relay that later served fine,
    so the default is 600 s (clipped by the caller to the remaining retry
    budget). On timeout the child gets SIGTERM + a 10 s grace before
    SIGKILL: killing the axon client hard can leave its relay-side grant
    dangling, which is exactly what slows the NEXT dial.
    """
    p = subprocess.Popen(
        [sys.executable, "-c", _PROBE_SRC],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        out, err = p.communicate(timeout=timeout_s)
        if p.returncode == 0 and "PROBE_OK" in out:
            return True, ""
        tail = (err or "").strip().splitlines()[-3:]
        return False, f"rc={p.returncode} stderr: " + " | ".join(tail)
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            p.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()
            # bounded: a grandchild holding the inherited pipe open must not
            # hang us past the SIGKILL (p.wait has no pipe-EOF dependency)
            try:
                p.communicate(timeout=10)
            except subprocess.TimeoutExpired:
                p.wait()
        return False, f"timeout after {timeout_s:.0f}s"


def _probe_with_retries():
    """Probe until success or PROBE_BUDGET_S is exhausted. Returns bool."""
    deadline = time.time() + PROBE_BUDGET_S
    # first backoff is long on purpose: a failed probe usually means the
    # relay is mid-claim-churn, and re-dialing immediately adds another
    # session to the pile-up (measured cascade, 2026-08-19).
    delay = 120.0
    attempt = 1
    while True:
        t0 = time.time()
        # clip the attempt to the remaining budget (+ a grace margin so a
        # borderline-healthy relay can still answer the final attempt):
        # without this, an attempt started with seconds of budget left
        # would block the full PROBE_TIMEOUT_S past the deadline.
        attempt_timeout = min(
            PROBE_TIMEOUT_S, max(30.0, deadline + 60.0 - time.time())
        )
        ok, diag = _probe_backend_once(attempt_timeout)
        if ok:
            print(f"bench.py: relay probe ok (attempt {attempt})", file=sys.stderr)
            return True
        left = deadline - time.time()
        print(
            f"bench.py: relay probe failed (attempt {attempt}, "
            f"{time.time() - t0:.0f}s, {diag}); "
            f"{left:.0f}s of retry budget left",
            file=sys.stderr,
        )
        if left <= delay:
            return False
        time.sleep(delay)
        delay = min(delay * 2, 480.0)
        attempt += 1


def _emit_fallback_and_exit():
    """Backend unreachable: print ONE JSON line that says so, carrying the
    last driver/self-captured numbers (with provenance) so the record is not
    empty, then exit nonzero — a cached number is a note, not a measurement."""
    cached = None
    try:
        with open(_CACHE_PATH) as f:
            cached = json.load(f)
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "collocation_pts_per_sec_flagship_admm_step",
                "value": None,
                "unit": "pts/sec/chip",
                "vs_baseline": None,
                "error": "tpu_relay_unreachable_after_retries",
                "probe_budget_s": PROBE_BUDGET_S,
                "cached_last_success": cached,
            }
        )
    )
    sys.stdout.flush()
    os._exit(66)

# Measured by benchmarks/reference_cpu_baseline.py on this image's CPU
# (6 threads, canonical abgrall_admm config). Regenerate with:
#   python benchmarks/reference_cpu_baseline.py 300
CPU_REFERENCE_PTS_PER_SEC = 14_931.0


def _bench_chunk(trainer, chunk_len, n_chunks, n_f):
    """Chained-state timing: chunks are chained through the state (forces
    real sequential execution), and the run is long enough that the constant
    host<->device sync cost (~0.1-0.2 s per sync on tunneled backends) is
    amortized to noise; best-of-3 rejects relay latency spikes."""
    state = trainer.init_state()
    run = trainer._get_chunk("adam", chunk_len)
    # compile + warmup
    state, _ = run(state)
    jax.block_until_ready(state)

    def timed(k, state):
        t0 = time.time()
        for _ in range(k):
            state, metrics = run(state)
        jax.block_until_ready(state)
        assert bool(jnp.isfinite(metrics["loss"][-1]))
        return time.time() - t0, state

    # make per-sample compute >> the (noisy, ~0.1-1 s) relay sync cost, then
    # take the best of three samples
    best = float("inf")
    for _ in range(3):
        t, state = timed(n_chunks, state)
        best = min(best, t)
    dt = best / (n_chunks * chunk_len)
    return n_f / dt, 1.0 / dt


def main():
    from pinns_tpu.config import override
    from pinns_tpu.experiments import get_preset
    from pinns_tpu.train import Trainer

    # --- primary: canonical flagship config ---------------------------------
    exp = get_preset("abgrall_admm")
    trainer = Trainer(exp)
    pts_per_sec, steps_per_sec = _bench_chunk(
        trainer, chunk_len=1000, n_chunks=50, n_f=exp.sampling.n_f
    )

    # --- secondary: batch-scaled narrow config (throughput knee ~65k pts) ---
    # chunk 250: long enough for auto scan-unroll (>= 200), short enough for
    # the remote-compile path (1000-step chunks at this n_f compile slowly)
    big = override(get_preset("abgrall_admm"), {"sampling.n_f": 65536})
    big_pts, _ = _bench_chunk(
        Trainer(big), chunk_len=250, n_chunks=12, n_f=65536
    )

    # --- secondary: 1M-point scale config -----------------------------------
    scale = override(get_preset("burgers_scale"), {"train.chunk": 10})
    scale_tr = Trainer(scale)
    scale_pts, scale_steps = _bench_chunk(
        scale_tr, chunk_len=10, n_chunks=2, n_f=scale.sampling.n_f
    )

    # --- secondary: same scale config under the bf16 mixed policy -----------
    mixed = override(
        get_preset("burgers_scale"),
        {
            "train.chunk": 10,
            "model.compute_dtype": "bfloat16",
            "model.mixed_elementwise": True,
        },
    )
    mixed_pts, _ = _bench_chunk(
        Trainer(mixed), chunk_len=10, n_chunks=4, n_f=mixed.sampling.n_f
    )

    result = {
        "metric": "collocation_pts_per_sec_flagship_admm_step",
        "value": round(pts_per_sec, 1),
        "unit": "pts/sec/chip",
        "vs_baseline": round(pts_per_sec / CPU_REFERENCE_PTS_PER_SEC, 2),
        "extra": {
            "steps_per_sec_canonical": round(steps_per_sec, 1),
            "admm_65k_pts_per_sec": round(big_pts, 1),
            "scale_1M_pts_per_sec": round(scale_pts, 1),
            "scale_1M_mixed_pts_per_sec": round(mixed_pts, 1),
            "scale_steps_per_sec": round(scale_steps, 2),
            "device": str(jax.devices()[0]),
            "cpu_baseline_pts_per_sec": CPU_REFERENCE_PTS_PER_SEC,
        },
    }
    print(json.dumps(result))
    try:  # remember this capture so a future relay outage has provenance
        with open(_CACHE_PATH, "w") as f:
            json.dump(
                {
                    "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "provenance": "live bench.py capture on " + result["extra"]["device"],
                    "result": result,
                },
                f,
            )
    except OSError:
        pass


def _watchdog():
    # A thread, not SIGALRM: a dead relay blocks the main thread inside a
    # C call, where Python-level signal handlers never get to run. os._exit
    # from a daemon thread works regardless of main-thread state.
    print(
        f"bench.py: no result within BENCH_TIMEOUT_S={BENCH_TIMEOUT_S}s — "
        "the TPU relay is likely down (jax.devices()/compile hangs "
        "indefinitely when it is). Probe with a small jit(grad) program; "
        "see CLAUDE.md environment rules.",
        file=sys.stderr,
    )
    sys.stderr.flush()
    os._exit(66)


if __name__ == "__main__":
    import threading

    if not _probe_with_retries():
        _emit_fallback_and_exit()
    timer = threading.Timer(BENCH_TIMEOUT_S, _watchdog)
    timer.daemon = True
    timer.start()
    main()
    timer.cancel()
