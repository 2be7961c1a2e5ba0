"""Prostate 3-D volume eval CLI — counterpart of the reference
`test_prostate_volume.py`: NIfTI volumes, min-max [-1,1], 3-slice windows,
largest-CC cleanup, volume Dice/HD95/ASD, CSV log.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import jax

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.train.checkpoint import load_any_checkpoint
from ramdsir_tpu.train.evaluate import append_csv_log, eval_prostate_volumes
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_predict_fn


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Test on Prostate dataset (3D volume)")
    p.add_argument("--model_file", type=str, required=True)
    p.add_argument("--dataset", type=str, default="prostate")
    p.add_argument("--data_dir", default="../dataset")
    p.add_argument("--datasetTest", type=int, default=3)
    p.add_argument("--in_channels", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--test_prediction_save_path", type=str, required=True)
    p.add_argument("--save_result", action="store_true")
    p.add_argument("--freeze_bn", action="store_true")
    p.add_argument("--norm", type=str, default="bn")
    p.add_argument("--activation", type=str, default="relu")
    return p.parse_args(argv)


def main(argv=None):
    from ramdsir_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    a = parse_args(argv)
    output_path = os.path.join(a.test_prediction_save_path, "test" + str(a.datasetTest))
    os.makedirs(output_path, exist_ok=True)

    cfg = TrainConfig(
        dataset="prostate", in_channels=a.in_channels, num_classes=a.num_classes,
        norm=a.norm, activation=a.activation, rec=False, ram=False,
        save_path=output_path,
    ).resolve()
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    state, _ = load_any_checkpoint(a.model_file, state)
    predict = make_predict_fn(cfg, models, bn_adapt=not a.freeze_bn)

    res = eval_prostate_volumes(
        predict, state, a.data_dir, a.datasetTest,
        batch_size=a.batch_size, with_distances=True, dataset_name=a.dataset,
        save_dir=output_path if a.save_result else None,
    )
    print("\n==>val_dice : %.2f" % (100 * res.dice))
    print("\n==>average_hd : %.2f" % res.hd)
    print("\n==>average_asd : %.2f" % res.asd)
    append_csv_log(
        osp.join(output_path, "../test" + str(a.datasetTest) + "_log.csv"),
        ["batch-size: ", a.batch_size, a.model_file,
         "dice coefficence: ", res.dice,
         "average_hd: ", res.hd, "average_asd: ", res.asd],
    )
    return res


if __name__ == "__main__":
    main()
