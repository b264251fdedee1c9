import json

import numpy as np

from pinns_tpu.train.metrics import MetricsLogger


def test_jsonl_and_snapshot_outputs(tmp_path, capsys):
    lg = MetricsLogger(out_dir=str(tmp_path), name="run1")
    lg.log(epoch=10, phase="adam", elapsed=1.5, loss=0.25, admm_misfit=0.01)
    lg.write_summary({"rel_l2_u": 0.12, "lambda1": 1.0})
    lg.append_snapshot(
        {"x": np.zeros(3), "t": np.ones(3), "u_pred": np.arange(3.0),
         "epoch": np.full(3, 10)}
    )
    lg.append_snapshot(
        {"x": np.zeros(3), "t": np.ones(3), "u_pred": np.arange(3.0),
         "epoch": np.full(3, 20)}
    )
    lg.close()

    out = capsys.readouterr().out
    assert "It: 10" in out and "Loss: 2.500e-01" in out
    assert "Error u:" in out  # summary line

    lines = [json.loads(l) for l in open(tmp_path / "run1_metrics.jsonl")]
    assert lines[0]["loss"] == 0.25 and "time" in lines[0]
    assert lines[1]["summary"]["rel_l2_u"] == 0.12

    rows = open(tmp_path / "run1_snapshots.csv").read().strip().splitlines()
    assert rows[0] == "x,t,u_pred,epoch"
    assert len(rows) == 7  # header + 2 x 3 rows


def test_no_out_dir_is_console_only(capsys):
    lg = MetricsLogger()
    lg.log(epoch=1, loss=1.0)
    lg.append_snapshot({"x": np.zeros(2)})  # no-op without out_dir
    assert "It: 1" in capsys.readouterr().out
