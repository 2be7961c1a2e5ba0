"""Fundus 2-D slice eval CLI — counterpart of the reference
`test_fundus_slice.py` (same flags, same metrics: cup/disc Dice, HD95, ASD
with the empty-prediction sentinel 100, CSV append log).

Default behavior matches the reference's BN adaptation: BatchNorm uses the
test-batch statistics unless --freeze_bn is given
(test_fundus_slice.py:75-86).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import jax

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.train.checkpoint import load_any_checkpoint
from ramdsir_tpu.train.evaluate import append_csv_log, eval_fundus
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_predict_fn


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Test on Fundus dataset (2D slice)")
    p.add_argument("--model_file", type=str, required=True)
    p.add_argument("--dataset", type=str, default="fundus")
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
    p.add_argument("--image_size", type=int, default=256)
    return p.parse_args(argv)


def main(argv=None):
    from ramdsir_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    a = parse_args(argv)
    output_path = os.path.join(a.test_prediction_save_path, "test" + str(a.datasetTest))
    os.makedirs(output_path, exist_ok=True)

    cfg = TrainConfig(
        dataset="fundus", in_channels=a.in_channels, num_classes=a.num_classes,
        norm=a.norm, activation=a.activation, rec=False, ram=False,
        image_size=a.image_size, save_path=output_path,
    ).resolve()
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    state, _ = load_any_checkpoint(a.model_file, state)
    predict = make_predict_fn(cfg, models, bn_adapt=not a.freeze_bn)

    res = eval_fundus(
        predict, state, a.data_dir, a.datasetTest,
        batch_size=a.batch_size, image_size=a.image_size,
        with_distances=True, dataset_name=a.dataset,
        save_dir=output_path if a.save_result else None,
    )
    print("\n==>val_cup_dice : %.2f" % (100 * res.cup_dice))
    print("\n==>val_disc_dice : %.2f" % (100 * res.disc_dice))
    print("\n==>average_hd_OC : %.2f" % res.hd_oc)
    print("\n==>average_hd_OD : %.2f" % res.hd_od)
    print("\n==>average_asd_OC : %.2f" % res.asd_oc)
    print("\n==>average_asd_OD : %.2f" % res.asd_od)
    append_csv_log(
        osp.join(output_path, "../test" + str(a.datasetTest) + "_log.csv"),
        ["batch-size: ", a.batch_size, a.model_file,
         "cup dice coefficence: ", res.cup_dice,
         "disc dice coefficence: ", res.disc_dice,
         "average_hd_OC: ", res.hd_oc, "average_hd_OD: ", res.hd_od,
         "average_asd_OC: ", res.asd_oc, "average_asd_OD: ", res.asd_od],
    )
    return res


if __name__ == "__main__":
    main()
