"""Long-horizon convergence parity: our jitted step vs the torch reference
twin, hundreds of steps at 64^2 on the same synthetic tree (VERDICT r4
missing #1 / next-step #3).

tests/test_torch_trajectory.py certifies 10 steps; this drill runs the SAME
lockstep protocol (identical init via torch_compat, identical batches and
RAM arrays, the measured jittered-twin fp-noise envelope as the budget) for
--steps (default 300) optimizer steps on REAL loader batches from a
synthetic fundus tree, and adds the metric the north star is stated in:
eval Dice on the held-out domain, sampled every --eval_every steps for
ours, the clean twin, and the envelope twin.

Verdict per eval point: |dice_ours - dice_torch| must stay within
max(K * runmax_{s<=t} max_i |dice_env_i - dice_torch|, floor) — the
envelope twins ARE honest reference implementations (fp-jittered
gradients at the measured f32 disagreement scale), so our divergence from
the oracle may not exceed a small multiple of fp-noise chaos.  Two jitter
realizations and a running max because chaos divergence is non-decreasing
in expectation while any single realization can momentarily cross the
clean trajectory.  Loss curves are compared as trailing-window means
(per-step losses are chaotic past ~20 steps; the MEAN tracks the
optimization trajectory).

Run (CPU, ~15-30 min):  python benchmarks/convergence_drill.py --steps 300
                        [--dataset prostate]
Results land in one JSON line; paste the table into BENCH_NOTES.md.

Reference being certified: /root/reference/code/train.py:214-361 (the
fundus loop: dual forward, BCE+dice both heads, KD consistency, per-domain
rec MSE, Adam groups with encoder lr/2, post-step poly LR) and
train.py:363-528 (the prostate loop: CE + dice_multi on 5-domain DSBN,
same dual/KD/rec structure).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K_DICE = 6.0  # budget multiple of the envelope twin's dice divergence
DICE_FLOOR = 0.02  # absolute dice floor (fp chaos can cancel at a point)
K_LOSS = 6.0
LOSS_FLOOR = 0.02  # relative, on trailing-mean losses


def _torch_eval_dice(twin, imgs_n, masks, thr=0.75):
    """Eval-mode dice of the torch twin on [-1,1] NHWC images."""
    import torch

    twin.enc.eval()
    twin.dec.eval()
    with torch.no_grad():
        t = torch.from_numpy(imgs_n.transpose(0, 3, 1, 2))
        logits = twin.dec(twin.enc(t))
        if twin.is_fundus:
            probs = torch.sigmoid(logits).numpy()
        else:
            probs = torch.softmax(logits, dim=1)[:, 1:2].numpy()
    twin.enc.train()
    twin.dec.train()
    return _dice_2ch(probs.transpose(0, 2, 3, 1), masks, thr)


def _dice_2ch(probs_nhwc, masks_nhwc, thr=0.75):
    """Mean (cup+disc)/2 dice of thresholded probabilities (no postproc —
    identical computation for both frameworks, so differences are MODEL
    differences)."""
    pred = probs_nhwc >= thr
    tgt = masks_nhwc >= 0.5
    dices = []
    for c in range(pred.shape[-1]):
        p, t = pred[..., c], tgt[..., c]
        inter = (p & t).sum()
        denom = p.sum() + t.sum()
        dices.append((2.0 * inter + 1.0) / (denom + 1.0))
    return float(np.mean(dices))


def run(steps=300, eval_every=25, hw=64, seed=0, out_json="", dataset="fundus"):
    import jax
    import jax.numpy as jnp

    from ramdsir_tpu.config import TrainConfig
    from ramdsir_tpu.data.fundus import FundusDataset
    from ramdsir_tpu.data.prostate import ProstateDataset
    from ramdsir_tpu.data.synthetic import make_fundus_tree, make_prostate_tree
    from ramdsir_tpu.data.transforms import Compose, Resize
    from ramdsir_tpu.ops.ram import ram_augment_fundus, ram_augment_prostate
    from ramdsir_tpu.train.loop import build_train_loaders
    from ramdsir_tpu.train.state import init_state
    from ramdsir_tpu.train.steps import make_predict_fn, make_train_step

    import tests.test_torch_trajectory as traj_mod

    is_fundus = dataset == "fundus"
    root = tempfile.mkdtemp(prefix="conv_drill_")
    # 24 held-out eval images: the eval-Dice metric's OWN variance must be
    # small next to the trajectory divergence it judges (a 6-image split
    # made the envelope twin swing +-0.09 between adjacent eval points)
    if is_fundus:
        make_fundus_tree(root, per_domain_train=24, per_domain_test=24, size=hw)
        extra = dict(domain_idxs=(0, 1, 2), test_domain_idx=3)
    else:
        make_prostate_tree(root, per_domain=24, size=hw)
        extra = dict(domain_idxs=(0, 1, 2, 3, 4), test_domain_idx=5)
    cfg = TrainConfig(
        dataset=dataset, data_root=root, image_size=hw,
        ram=True, rec=True, consistency=True, consistency_type="kd",
        save_path=os.path.join(root, "run"), device_data=False,
        loader="thread", **extra,
    ).resolve()
    bsl = cfg.batch_size_list  # the reference's hard-coded [2,4,10] table
    state, models = init_state(cfg, jax.random.PRNGKey(seed))
    # the twins' poly-LR horizon must equal ours; restore the module global
    # afterwards (the pytest smoke shares a process with the 10-step
    # trajectory tests, whose twins read the same horizon)
    prev_total_iters = traj_mod.TOTAL_ITERS
    traj_mod.TOTAL_ITERS = steps
    twin = traj_mod.TorchReferenceTrainer(state, cfg, len(bsl), bsl)
    # TWO jitter realizations: a single jittered twin is one sample of the
    # chaos process and can land arbitrarily close to the clean twin at any
    # eval point (observed: |env-torch| = 0.006 at a point where a second
    # realization was 0.09 away); the envelope is the max over realizations
    envs = [
        traj_mod.TorchReferenceTrainer(
            state, cfg, len(bsl), bsl, grad_jitter=1.0, jitter_seed=s
        )
        for s in (1234, 4321)
    ]
    step = make_train_step(cfg, models, total_iters=steps, batch_size_list=bsl)
    predict = make_predict_fn(cfg, models, bn_adapt=False)

    # held-out test split at train resolution
    test_imgs, test_masks = [], []
    if is_fundus:
        testset = FundusDataset(
            base_dir=os.path.join(root, "fundus"), domain_idx=3, split="test",
            transform=Compose([Resize((hw, hw))]),
        )
        from ramdsir_tpu.data.transforms import fundus_multilabel

        for i in range(len(testset)):
            s = testset[i]
            test_imgs.append(np.asarray(s["img"], np.float32))
            test_masks.append(
                fundus_multilabel(np.asarray(s["mask"])).astype(np.float32)
            )
        test_imgs = np.stack(test_imgs)  # (N, hw, hw, 3) in [0,255]
        test_masks = np.stack(test_masks)  # (N, hw, hw, 2)
        test_imgs_n = test_imgs / 127.5 - 1.0
    else:
        testset = ProstateDataset(os.path.join(root, "prostate"), domain_idx=5)
        for i in range(len(testset)):
            s = testset[i]
            test_imgs.append(np.asarray(s["img"], np.float32))
            # binary foreground channel -> _dice_2ch degenerates to plain
            # class-1 dice (softmax-2 argmax == p1 >= 0.5 == thr 0.5)
            test_masks.append((np.asarray(s["mask"]) == 1)[..., None].astype(np.float32))
        test_imgs = np.stack(test_imgs)  # (N, hw, hw, 3) already [-1,1]-ish
        test_masks = np.stack(test_masks)  # (N, hw, hw, 1)
        test_imgs_n = test_imgs

    thr = 0.75 if is_fundus else 0.5

    def our_eval_dice():
        probs = np.asarray(predict(state, jnp.asarray(test_imgs)))
        if not is_fundus:
            probs = probs[..., 1:2]  # softmax class-1 probability
        return _dice_2ch(probs, test_masks, thr)

    base_key = jax.random.PRNGKey(77)
    curves = {"step": [], "dice_ours": [], "dice_torch": [],
              "dice_env": [], "dice_env2": []}
    losses = {"ours": [], "torch": [], "env": []}
    i = 0
    epoch = 0
    t0 = time.time()
    try:
      while i < steps:
        it = build_train_loaders(cfg, os.path.join(root, dataset), seed=cfg.seed + epoch)
        for batch in it:
            if i >= steps:
                break
            batch = {k: np.asarray(v) for k, v in batch.items()
                     if k in ("img", "donor", "mask")}
            # fundus loaders yield uint8 multilabel masks; the torch twin's
            # BCELoss wants float (the jitted step casts, torch won't).
            # Prostate masks stay int (the twin's CE wants class indices).
            if is_fundus:
                batch["mask"] = batch["mask"].astype(np.float32)
            key = jax.random.fold_in(base_key, i)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics, _ = step(state, jb, key)
            losses["ours"].append(float(np.asarray(metrics["loss"])))
            aug = ram_augment_fundus if is_fundus else ram_augment_prostate
            img_n, img_freq = aug(jb["img"], jb["donor"], key)
            img_n, img_freq = np.asarray(img_n), np.asarray(img_freq)
            losses["torch"].append(twin.step(img_n, img_freq, batch["mask"])["loss"])
            env_losses = [
                e.step(img_n, img_freq, batch["mask"])["loss"] for e in envs
            ]
            losses["env"].append(env_losses[0])
            i += 1
            if i % eval_every == 0 or i == steps:
                curves["step"].append(i)
                curves["dice_ours"].append(our_eval_dice())
                curves["dice_torch"].append(
                    _torch_eval_dice(twin, test_imgs_n, test_masks, thr))
                curves["dice_env"].append(
                    _torch_eval_dice(envs[0], test_imgs_n, test_masks, thr))
                curves["dice_env2"].append(
                    _torch_eval_dice(envs[1], test_imgs_n, test_masks, thr))
                print(
                    f"step {i:4d}: dice ours {curves['dice_ours'][-1]:.4f} "
                    f"torch {curves['dice_torch'][-1]:.4f} "
                    f"env {curves['dice_env'][-1]:.4f} "
                    f"| loss ours {losses['ours'][-1]:.4f} "
                    f"torch {losses['torch'][-1]:.4f} "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
        epoch += 1
    finally:
        traj_mod.TOTAL_ITERS = prev_total_iters

    # verdicts.  The dice budget at step t is the RUNNING MAX of the
    # envelope twins' divergence up to t: chaotic trajectory divergence is
    # non-decreasing in expectation, and the instantaneous |env - torch|
    # can collapse to ~0 whenever two trajectories happen to cross (both
    # observed in the first recorded run; BENCH_NOTES round 5).
    rows, ok_all = [], True
    env_runmax = 0.0
    for j, s in enumerate(curves["step"]):
        do, dt = curves["dice_ours"][j], curves["dice_torch"][j]
        de = max(abs(curves["dice_env"][j] - dt), abs(curves["dice_env2"][j] - dt))
        env_runmax = max(env_runmax, de)
        budget = max(K_DICE * env_runmax, DICE_FLOOR)
        ok = abs(do - dt) <= budget
        ok_all &= ok
        rows.append(dict(step=s, dice_ours=round(do, 4), dice_torch=round(dt, 4),
                         dice_env=round(curves["dice_env"][j], 4),
                         dice_env2=round(curves["dice_env2"][j], 4),
                         budget=round(budget, 4),
                         ok=ok))
    w = max(5, steps // 10)
    tails = {k: float(np.mean(v[-w:])) for k, v in losses.items()}
    loss_budget = max(K_LOSS * abs(tails["env"] - tails["torch"]) / max(abs(tails["torch"]), 1e-2),
                      LOSS_FLOOR)
    loss_rel = abs(tails["ours"] - tails["torch"]) / max(abs(tails["torch"]), 1e-2)
    loss_ok = loss_rel <= loss_budget
    result = {
        "dataset": dataset, "steps": steps, "hw": hw, "eval_points": rows,
        "tail_loss_mean": {k: round(v, 5) for k, v in tails.items()},
        "tail_loss_rel_diff": round(loss_rel, 5),
        "tail_loss_budget": round(loss_budget, 5),
        "dice_ok": ok_all, "loss_ok": loss_ok,
        "overall": "PASS" if (ok_all and loss_ok) else "FAIL",
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--eval_every", type=int, default=25)
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_json", default="")
    p.add_argument("--dataset", choices=("fundus", "prostate"), default="fundus")
    a = p.parse_args(argv)
    r = run(a.steps, a.eval_every, a.hw, a.seed, a.out_json, dataset=a.dataset)
    if r["overall"] != "PASS":
        sys.exit(1)


if __name__ == "__main__":
    main()
