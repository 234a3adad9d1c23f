"""Utils: metric logger JSONL, throughput meter, profiler no-op path."""

import json
import time

from dynseg.utils.logging import MetricLogger
from dynseg.utils.profiling import Meter, trace


def test_metric_logger_writes_jsonl(tmp_path):
    lines = []
    lg = MetricLogger(str(tmp_path), echo=lines.append)
    lg.log("iter 1", iter=1, loss=0.5)
    lg("plain message")
    lg.close()
    assert lines == ["iter 1", "plain message"]
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["iter"] == 1 and recs[0]["loss"] == 0.5
    assert recs[1]["msg"] == "plain message"
    assert "ts" in recs[0]


def test_meter_rate():
    m = Meter()
    assert m.rate == 0.0
    m.add(100)          # first add only starts the clock
    time.sleep(0.05)
    m.add(100)
    # >= 0.05 s elapsed for 100 counted units: rate is positive and
    # bounded above; no lower wall-clock bound (CI stalls — review r2)
    assert 0.0 < m.rate <= 100 / 0.05
    m.reset()
    assert m.rate == 0.0


def test_trace_noop():
    with trace(None):
        pass
    with trace(""):
        pass


def test_metric_logger_serializes_numpy_scalars(tmp_path):
    """review r2 (round 2): a numpy/jax scalar kwarg crashed json.dumps
    mid-training; the logger now coerces (floats, arrays->lists, repr)."""
    import numpy as np

    lg = MetricLogger(str(tmp_path), echo=lambda *_: None)
    lg.log("val", loss=np.float32(0.5), arr=np.arange(3), obj=object())
    lg.close()
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[-1])
    assert rec["loss"] == 0.5 and rec["arr"] == [0, 1, 2]
    assert isinstance(rec["obj"], str)
