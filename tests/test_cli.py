"""CLI end-to-end: train a couple of steps, then run both eval CLIs against
the produced checkpoint on synthetic data (in-process main() calls)."""
import os

import numpy as np
import pytest

from ramdsir_tpu.cli import test_fundus_slice, test_prostate_volume, train
from ramdsir_tpu.data.synthetic import make_fundus_tree, make_prostate_tree, make_prostate_volumes


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("cli"))
    make_fundus_tree(r, per_domain_train=12, per_domain_test=2, size=32)
    make_prostate_tree(r, per_domain=4, size=32)
    make_prostate_volumes(r, per_domain=1, depth=10, size=32)
    return r


def test_train_cli_and_fundus_eval_cli(root):
    save = os.path.join(root, "run_cli")
    train.main([
        "--data_root", root, "--dataset", "fundus", "--domain_idxs", "0,1,2",
        "--test_domain_idx", "3", "--ram", "--rec", "--is_out_domain",
        "--consistency", "--consistency_type", "kd", "--save_path", save,
        "--image_size", "32", "--test_batch_size", "2", "--epochs", "1",
        "--max_steps", "2",
    ])
    ckpt = os.path.join(save, "final_model.ckpt")
    assert os.path.exists(ckpt)

    res = test_fundus_slice.main([
        "--model_file", ckpt, "--data_dir", root, "--datasetTest", "3",
        "--test_prediction_save_path", os.path.join(save, "eval"),
        "--batch_size", "2", "--image_size", "32",
    ])
    assert np.isfinite(res.cup_dice) and np.isfinite(res.hd_oc)
    assert os.path.exists(os.path.join(save, "eval", "test3_log.csv"))


def test_prostate_eval_cli(root):
    # train a prostate model for 1 step through the python API (faster), then
    # exercise the volume CLI path end to end
    from ramdsir_tpu.config import TrainConfig
    from ramdsir_tpu.train.loop import fit

    save = os.path.join(root, "run_pro")
    cfg = TrainConfig(
        data_root=root, dataset="prostate", image_size=32, test_domain_idx=5,
        domain_idxs=(0, 1, 2, 3, 4), save_path=save, ram=True, rec=True,
        consistency=True, consistency_type="mse", epochs=1, test_batch_size=4,
    )
    fit(cfg, max_steps=1)
    ckpt = os.path.join(save, "final_model.ckpt")

    res = test_prostate_volume.main([
        "--model_file", ckpt, "--data_dir", root, "--datasetTest", "5",
        "--test_prediction_save_path", os.path.join(save, "eval"),
        "--batch_size", "4",
    ])
    assert 0.0 <= res.dice <= 1.0
    assert os.path.exists(os.path.join(save, "eval", "test5_log.csv"))


def test_resume_from_checkpoint(root):
    from ramdsir_tpu.config import TrainConfig
    from ramdsir_tpu.train.loop import fit

    save = os.path.join(root, "run_resume")
    cfg = TrainConfig(
        data_root=root, dataset="fundus", image_size=32, test_domain_idx=3,
        domain_idxs=(0, 1, 2), save_path=save, ram=True, rec=True,
        epochs=1, test_batch_size=2,
    )
    s1 = fit(cfg, max_steps=1)
    cfg2 = cfg
    cfg2 = type(cfg)(**{**cfg.__dict__, "checkpoint_resume": s1["final_checkpoint"],
                        "save_path": save + "_2"})
    s2 = fit(cfg2, max_steps=2)
    assert s2["steps"] == 2  # resumed from step 1, ran one more
