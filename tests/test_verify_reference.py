"""scripts/verify_reference.py — the one-command reconstruction-vs-source
verifier (verdict r2 #1). Tested against a fake mini-reference so the
real pass is known-good the day the mount is populated."""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "verify_reference", os.path.join(REPO, "scripts", "verify_reference.py"))
vr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vr)

FAKE_SOURCE = '''\
import tensorflow as tf

def dilated_icpr_rate6(x, is_training, weight_decay, crop_size):
    conv1 = _conv_layer(x, [5, 5, 3, 64], rate=1)
    pool1 = tf.nn.max_pool(conv1, [1, 3, 3, 1], [1, 1, 1, 1], 'SAME')
    conv2 = _conv_layer(pool1, [5, 5, 64, 64], rate=2)
    return conv2

def dilated_grsl(x):
    return x

def main():
    parser.add_argument('--operation')
    parser.add_argument('--net_type')
    parser.add_argument('--distribution_type',
                        choices=['single_fixed', 'multi_fixed',
                                 'uniform', 'multinomial'])
    loss = tf.nn.sparse_softmax_cross_entropy_with_logits(logits, y)
    opt = tf.train.MomentumOptimizer(lr, 0.9)
    saver = tf.train.Saver()
    kappa = cohen_kappa_score(a, b)
'''


def _write_fake_reference(root):
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "dynamic.py"), "w") as f:
        f.write(FAKE_SOURCE)


def test_empty_reference_exits_2(tmp_path, capsys):
    empty = tmp_path / "ref"
    empty.mkdir()
    rc = vr.main(["--reference", str(empty),
                  "--out", str(tmp_path / "diff.md")])
    assert rc == 2
    out = capsys.readouterr().out
    assert "STILL EMPTY" in out
    assert not (tmp_path / "diff.md").exists()


def test_missing_reference_exits_2(tmp_path):
    rc = vr.main(["--reference", str(tmp_path / "nope"),
                  "--out", str(tmp_path / "diff.md")])
    assert rc == 2


def test_populated_reference_writes_report(tmp_path, capsys):
    ref = tmp_path / "ref"
    _write_fake_reference(str(ref))
    out_md = tmp_path / "diff.md"
    rc = vr.main(["--reference", str(ref), "--out", str(out_md)])
    assert rc == 0
    report = out_md.read_text()
    # facts present in the fake source are confirmed with file:line anchors
    assert "[CONFIRMED] net-icpr_rate6" in report
    assert "dynamic.py:3" in report
    assert "[CONFIRMED] dist-types" in report
    assert "[CONFIRMED] loss-softmax-ce" in report
    assert "[CONFIRMED] checkpointing" in report
    # facts absent from the fake source are flagged, not silently passed
    assert "[NOT FOUND] net-grsl_rate8" in report
    assert "[NOT FOUND]" in report
    # manual items carry a context excerpt
    assert "[MANUAL] optimizer" in report
    assert "MomentumOptimizer" in report
    # architecture side-by-side: our table + extracted source body
    assert "dilated_icpr_rate6: ((5, 64, 1, True)" in report
    assert "_conv_layer(x, [5, 5, 3, 64], rate=1)" in report
    # builders missing from source land in NOT FOUND
    assert "arch-dilated_grsl_rate8" in report or \
        "dilated_grsl_rate8: builder function NOT FOUND" in report
    summary = capsys.readouterr().out
    assert "report written" in summary


def test_function_extraction_stops_at_next_def():
    files = [("dynamic.py", FAKE_SOURCE.splitlines())]
    rel, ln, body = vr._extract_function(files, "dilated_icpr_rate6")
    assert rel == "dynamic.py" and ln == 3
    assert any("conv2" in l for l in body)
    assert not any("def dilated_grsl" in l for l in body)
