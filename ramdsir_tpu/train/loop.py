"""The end-to-end training loop (fit): loaders -> jitted step -> eval ->
keep-best checkpoints.  Orchestration-parity with code/train.py:195-601.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.data.fundus import FundusMultiDataset
from ramdsir_tpu.data.loaders import FusedMultiDomainLoader
from ramdsir_tpu.data.prostate import ProstateMultiDataset
from ramdsir_tpu.data.transforms import np_random_scale_crop
from ramdsir_tpu.parallel.mesh import get_mesh, replicate_state, shard_batch
from ramdsir_tpu.train.checkpoint import BestKeeper, load_checkpoint, save_run_config
from ramdsir_tpu.train.evaluate import (
    append_csv_log,
    eval_fundus,
    eval_prostate_volumes,
)
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_predict_fn, make_train_step
from ramdsir_tpu.utils.logging import MetricsWriter
from ramdsir_tpu.utils.profiler import StepTimer


def build_train_loaders(cfg: TrainConfig, data_root: str, seed: int = 0):
    """Per-source-domain datasets with their hard-coded sub-batch sizes
    (train.py:549-566) behind a fused loader: workers assemble the complete
    combined batch off the main thread; epoch length = longest domain."""
    datasets = []
    bsl = cfg.batch_size_list
    for idx, d in enumerate(cfg.domain_idxs):
        rng = np.random.default_rng(seed + idx)
        if cfg.dataset == "fundus":
            # deterministic Resize runs inside the dataset's decode cache;
            # the random scale/crop suffix uses the GIL-friendly cv2 path
            size = cfg.image_size
            np_aug = lambda im, mk, _rng=rng: np_random_scale_crop(im, mk, size, _rng)
            ds = FundusMultiDataset(
                base_dir=data_root,
                domain_idx_list=[d],
                np_transform=np_aug,
                is_freq=cfg.ram,
                is_out_domain=cfg.is_out_domain,
                test_domain_idx=cfg.test_domain_idx,
                donor_size=cfg.image_size,
                rng=rng,
                resize_to=cfg.image_size,
            )
        else:
            ds = ProstateMultiDataset(
                base_dir=data_root,
                domain_idx_list=[d],
                is_freq=cfg.ram,
                is_out_domain=cfg.is_out_domain,
                test_domain_idx=cfg.test_domain_idx,
                rng=rng,
            )
        datasets.append(ds)
    keys = ("img", "donor", "mask") if cfg.ram else ("img", "mask")
    return FusedMultiDomainLoader(
        datasets, bsl[: len(datasets)], keys, seed=seed, prefetch=cfg.prefetch + 2
    )


def _log_viz(writer: MetricsWriter, viz: Dict, step: int, cfg: TrainConfig) -> None:
    """TB image grids matching the reference's tags (train.py:306-329)."""
    from ramdsir_tpu.utils.logging import decode_seg_map, make_grid

    img = np.asarray(viz["image"])
    writer.add_image("train/Image", make_grid(img[..., :3]), step)
    if "image_freq" in viz:
        writer.add_image("train/Image_Freq", make_grid(np.asarray(viz["image_freq"])[..., :3]), step)
    if "image_rec" in viz:
        writer.add_image("train/Image_Rec", make_grid(np.asarray(viz["image_rec"])[..., :3]), step)
    pred = np.asarray(viz["pred"])
    mask = np.asarray(viz["mask"])
    if cfg.dataset == "fundus":
        writer.add_image("train/Soft_Predicted_OC", make_grid(pred[..., 0]), step)
        writer.add_image("train/Soft_Predicted_OD", make_grid(pred[..., 1]), step)
        writer.add_image("train/GT_OC", make_grid(mask[..., 0], normalize=False), step)
        writer.add_image("train/GT_OD", make_grid(mask[..., 1], normalize=False), step)
    else:
        pred_lbl = np.stack([decode_seg_map(p) for p in pred.argmax(-1)])
        gt_lbl = np.stack([decode_seg_map(m) for m in mask])
        writer.add_image("train/Predicted", make_grid(pred_lbl, normalize=False), step)
        writer.add_image("train/GT", make_grid(gt_lbl, normalize=False), step)


def fit(cfg: TrainConfig, eval_every: int = 1, max_steps: Optional[int] = None) -> Dict:
    """Train; returns summary dict. eval_every/max_steps allow smoke runs."""
    cfg = cfg.resolve()
    data_root = os.path.join(cfg.data_root, cfg.dataset)
    save_dir = cfg.save_path
    os.makedirs(save_dir, exist_ok=True)
    save_run_config(save_dir, dataclasses.asdict(cfg))

    domain_iter = build_train_loaders(cfg, data_root, seed=cfg.seed)
    steps_per_epoch = len(domain_iter)
    total_iters = steps_per_epoch * cfg.epochs

    rng = jax.random.PRNGKey(cfg.seed)
    state, models = init_state(cfg, rng)
    if cfg.checkpoint_resume:
        state, _ = load_checkpoint(cfg.checkpoint_resume, state)
        print(f"resumed from {cfg.checkpoint_resume} at step {int(state.step)}")

    mesh = None
    n_dev = cfg.num_devices or 1
    if n_dev > 1:
        mesh = get_mesh(n_dev)
        state = replicate_state(state, mesh)

    train_step = make_train_step(cfg, models, total_iters)
    predict = make_predict_fn(cfg, models, bn_adapt=False)

    writer = MetricsWriter(os.path.join(save_dir, "log"))
    keeper = BestKeeper(save_dir)
    timer = StepTimer()

    step = int(state.step)
    done = False
    summary: Dict = {}
    # Metrics are jax scalars (futures under async dispatch); buffering them
    # and flushing in bulk keeps the host feeding the device instead of
    # blocking on every step's values.
    pending = []

    def flush_metrics():
        if not pending:
            return
        # ONE device->host transfer for the whole buffer (readback latency
        # dominates on tunneled devices; per-scalar pulls are pathological).
        names = list(pending[0][1].keys())
        stacked = np.asarray(
            jax.device_get(
                jnp.stack([jnp.stack([m[k] for k in names]) for _, m in pending])
            )
        )
        for (s, _), row in zip(pending, stacked):
            writer.add_scalars(dict(zip(names, row)), s, prefix="loss/")
        pending.clear()

    for epoch in range(cfg.epochs):
        if done:
            break
        t_ep = time.time()
        for batch in domain_iter:
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            key = jax.random.fold_in(rng, step)
            state, metrics, viz = train_step(state, batch, key)
            timer.tick(batch["img"].shape[0])
            if step % cfg.log_interval == 0:
                pending.append((step, metrics))
                if len(pending) >= 32:
                    flush_metrics()
            if cfg.log_images_every and step % cfg.log_images_every == 0:
                _log_viz(writer, viz, step, cfg)  # reference train.py:306-329
            step += 1
            if max_steps is not None and step >= max_steps:
                done = True
                break
        flush_metrics()

        if (epoch + 1) % eval_every == 0 or done:
            if cfg.dataset == "fundus":
                res = eval_fundus(
                    predict, state, cfg.data_root, cfg.test_domain_idx,
                    batch_size=cfg.test_batch_size, image_size=cfg.image_size,
                )
                avg = res.avg_dice_pct
                append_csv_log(
                    os.path.join(save_dir, f"{cfg.test_domain_idx}_val_log.csv"),
                    ["batch-size: ", cfg.test_batch_size, epoch,
                     "cup dice coefficence: ", res.cup_dice,
                     "disc dice coefficence: ", res.disc_dice],
                )
                summary.update(cup_dice=res.cup_dice, disc_dice=res.disc_dice)
            else:
                res = eval_prostate_volumes(
                    predict, state, cfg.data_root, cfg.test_domain_idx,
                    batch_size=cfg.test_batch_size,
                )
                avg = res.dice_pct
                append_csv_log(
                    os.path.join(save_dir, f"{cfg.test_domain_idx}_val_log.csv"),
                    ["batch-size: ", cfg.test_batch_size, epoch, "dice coefficence: ", res.dice],
                )
                summary.update(dice=res.dice)
            writer.add_scalar("eval/avg_dice", avg, step)
            keeper.update(avg, state, meta={"epoch": epoch, "score": avg})
            print(
                f"epoch {epoch}: eval avg dice {avg:.2f} | best {keeper.best:.2f} | "
                f"{timer.items_per_sec:.1f} img/s | epoch {time.time()-t_ep:.1f}s"
            )

    final_path = keeper.save_final(state, meta={"steps": step})
    writer.close()
    summary.update(
        best=keeper.best, steps=step, images_per_sec=timer.items_per_sec, final_checkpoint=final_path
    )
    return summary
