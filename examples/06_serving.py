"""Train -> export -> serve: the full deployment path in one program.

The reference has no serving story (training scripts dump CSVs); here a
trained model becomes ONE self-contained StableHLO artifact (weights baked
in, symbolic batch dim) that loads with jax alone on any backend
(`serve.load_exported`), and `serve.make_http_server` exposes it as a JSON
prediction service with nothing but the standard library.

    python examples/06_serving.py [--quick]

Trains a small Burgers model, exports it, reloads the artifact WITHOUT the
experiment config, checks prediction parity, then round-trips a request
through a live HTTP server. The same flow works for ensemble artifacts
(`export_ensemble`): the service then returns `{field}` (mean) and
`{field}_std` (uncertainty) per request — see example 05 for training one.
Export with `calibration=uq_calibration(...)` to bake conformal band
factors into the artifact: GET /meta then exposes per-field `k_conf95`
plus the Mondrian std-binned factors (`mond_edges`/`mond_k`), and a
request body `{"x": ..., "bands": true}` makes /predict return
`{field}_band` — the per-point calibrated ~95% half-width, Mondrian when
baked — so clients need zero band math (raw ensemble sigma is measured
~10x overconfident at fronts — PARITY 4n).
CLI equivalents:

    python -m pinns_tpu export --preset burgers_forward --checkpoint C --out D
    python -m pinns_tpu serve --artifact D --port 8080
    curl -X POST -d '{"x": [[0.5, 0.3]]}' http://127.0.0.1:8080/predict
    python -m pinns_tpu predict --artifact D --points pts.npz --out preds.npz
"""

import json
import sys
import threading
import urllib.request

import numpy as np

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.serve import export_predict, load_exported, make_http_server
from pinns_tpu.train import Trainer

quick = "--quick" in sys.argv
exp = override(
    get_preset("burgers_forward"),
    {
        "train.epochs": 2_000 if quick else 50_000,
        "train.chunk": 500,
        "train.log_every": 0,
        "optimizer.kind": "adam",
    },
)
trainer = Trainer(exp)
state, summary = trainer.train()
print(f"trained: rel-L2(u) = {summary['rel_l2_u']:.3e}")

# export: one directory, loadable with jax alone
path = export_predict(trainer, state.params, "serving_artifact")
print(f"exported -> {path}")

served = load_exported(path)  # no Experiment/preset needed from here on
x = np.asarray(trainer.problem.dataset.X_star[:501], np.float32)
want = trainer.predict(state.params, x)
got = served.predict(x)
assert np.allclose(got["u"], want["u"], rtol=1e-5, atol=1e-6)
print(f"artifact parity: max|du| = {np.abs(got['u'] - want['u']).max():.2e}")

# serve it over HTTP (stdlib only) and round-trip a request
server = make_http_server(path, port=0)
host, port = server.server_address[:2]
threading.Thread(target=server.serve_forever, daemon=True).start()
req = urllib.request.Request(
    f"http://{host}:{port}/predict",
    data=json.dumps({"x": x[:3].tolist()}).encode(),
    headers={"Content-Type": "application/json"},
)
with urllib.request.urlopen(req, timeout=120) as r:
    out = json.loads(r.read())
server.shutdown()
print(f"http round-trip: u = {[round(v[0], 5) for v in out['u']]}")
