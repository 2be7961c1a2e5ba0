"""benchmarks/parity_drill.py end-to-end on a synthetic tree with an
exported reference-format torch checkpoint."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.parity_drill import build_table, main as drill_main  # noqa: E402

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.data.synthetic import make_fundus_tree
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.utils.torch_compat import export_torch_checkpoint


@pytest.fixture(scope="module")
def drill_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("drill"))
    make_fundus_tree(root, per_domain_train=2, per_domain_test=2, size=48)
    cfg = TrainConfig(
        dataset="fundus", rec=False, ram=False, image_size=48,
        save_path=os.path.join(root, "run"),
    ).resolve()
    state, _ = init_state(cfg, jax.random.PRNGKey(0))
    pth = os.path.join(root, "reference_format.pth")
    export_torch_checkpoint(pth, state, with_rec=False)
    return root, pth


def _argv(root, pth, extra=()):
    return [
        "--dataset", "fundus", "--data_dir", root, "--model_file", pth,
        "--test_domain_idx", "3", "--batch_size", "2", "--image_size", "48",
        "--out_dir", os.path.join(root, "drill_out"),
    ] + list(extra)


def test_drill_runs_and_reports(drill_env, capsys):
    root, pth = drill_env
    rows = drill_main(_argv(root, pth))
    out = capsys.readouterr().out
    assert "parity drill: fundus" in out and "no --expect values" in out
    got = {r["metric"]: r["ours"] for r in rows}
    assert set(got) == {"cup_dice", "disc_dice", "hd_oc", "hd_od", "asd_oc", "asd_od"}
    assert all(np.isfinite(v) for v in got.values())

    # feeding our own numbers back as the 'reference' must PASS every row
    expect = [f"{k}={v}" for k, v in got.items()]
    rows2 = drill_main(_argv(root, pth, ["--expect"] + expect))
    assert all(r["verdict"] == "PASS" for r in rows2)
    assert "north star" in capsys.readouterr().out

    # an unreachable reference dice must FAIL (exit code 1)
    with pytest.raises(SystemExit):
        drill_main(_argv(root, pth, ["--expect", "cup_dice=5.0"]))


def test_drill_sweep_all_targets(drill_env, capsys):
    """--sweep runs every fundus leave-one-out target from a ckpt_dir using
    the documented naming conventions and prints the combined table."""
    import json
    import shutil

    root, pth = drill_env
    ckpt_dir = os.path.join(root, "ckpts")
    # exercise three lookup conventions at once
    os.makedirs(os.path.join(ckpt_dir, "target1"), exist_ok=True)
    os.makedirs(os.path.join(ckpt_dir, "2"), exist_ok=True)
    shutil.copy(pth, os.path.join(ckpt_dir, "target0.pth"))
    shutil.copy(pth, os.path.join(ckpt_dir, "target1", "final_model.pth"))
    shutil.copy(pth, os.path.join(ckpt_dir, "2", "model_0.7312.pth"))
    shutil.copy(pth, os.path.join(ckpt_dir, "3.pth"))

    argv = [
        "--dataset", "fundus", "--data_dir", root, "--sweep",
        "--ckpt_dir", ckpt_dir, "--batch_size", "2", "--image_size", "48",
        "--out_dir", os.path.join(root, "sweep_out"),
    ]
    results = drill_main(argv)
    out = capsys.readouterr().out
    assert "sweep: 4/4 targets ran" in out
    assert set(results) == {0, 1, 2, 3}
    assert all(rows is not None for rows in results.values())

    # expect_file: our own numbers back -> overall PASS
    expect = {
        str(idx): {r["metric"]: r["ours"] for r in rows}
        for idx, rows in results.items()
    }
    efile = os.path.join(root, "refs.json")
    with open(efile, "w") as f:
        json.dump(expect, f)
    drill_main(argv + ["--expect_file", efile])
    assert "north star overall: PASS" in capsys.readouterr().out


def test_build_table_directions():
    class R:
        dice, hd, asd = 0.90, 10.0, 2.0

    # ours 0.90 vs ref 0.94 -> ratio ~0.957 >= 0.95 PASS; hd 10 vs ref 9.0:
    # 10 <= 9/0.95=9.47? no -> FAIL; asd 2.0 vs 2.0 -> PASS
    rows = build_table("prostate", R, {"dice": 0.94, "hd": 9.0, "asd": 2.0})
    verdicts = {r["metric"]: r["verdict"] for r in rows}
    assert verdicts == {"dice": "PASS", "hd": "FAIL", "asd": "PASS"}
