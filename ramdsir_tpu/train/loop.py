"""The end-to-end training loop (fit): loaders -> jitted step -> eval ->
keep-best checkpoints.  Orchestration-parity with code/train.py:195-601.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.data.fundus import FundusMultiDataset
from ramdsir_tpu.data.loaders import (
    FusedMultiDomainLoader,
    ProcessFusedMultiDomainLoader,
)
from ramdsir_tpu.data.prostate import ProstateMultiDataset
from ramdsir_tpu.data.transforms import ScaleCropAug
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


def build_train_loaders(
    cfg: TrainConfig, data_root: str, seed: int = 0, rows: Optional[slice] = None
):
    """Per-source-domain datasets with their hard-coded sub-batch sizes
    (train.py:549-566) behind a fused loader: workers assemble the complete
    combined batch off the main thread; epoch length = longest domain.

    rows: on multi-host jobs, the slice of the global domain-major batch
    this process materializes (parallel.distributed.local_batch_slice)."""
    datasets = []
    bsl = cfg.batch_size_list
    for idx, d in enumerate(cfg.domain_idxs):
        rng = np.random.default_rng(seed + idx)
        if cfg.dataset == "fundus":
            # deterministic Resize runs inside the dataset's decode cache;
            # the random scale/crop suffix uses the GIL-free cv2 path. The
            # loader passes a per-sample counter-derived rng (reproducible
            # under any worker scheduling); ScaleCropAug is picklable for
            # process workers.
            np_aug = ScaleCropAug(cfg.image_size)
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
    if cfg.device_data and rows is None:  # multi-host keeps the host loader
        # HBM-resident dataset: the host's per-step work is a few dozen
        # int32 indices; gather (+ fundus scale-crop)/donor/RAM run inside
        # the step.
        if cfg.dataset == "fundus":
            from ramdsir_tpu.data.device_pipeline import DeviceFundusPipeline

            return DeviceFundusPipeline(
                datasets, bsl[: len(datasets)], data_root, cfg.image_size,
                cfg.test_domain_idx, is_out_domain=cfg.is_out_domain, seed=seed,
                precompute_donor_amp=cfg.ram_precompute_donor_amp and cfg.ram,
            )
        from ramdsir_tpu.data.device_pipeline import DeviceProstatePipeline

        return DeviceProstatePipeline(
            datasets, bsl[: len(datasets)], data_root,
            cfg.test_domain_idx, is_out_domain=cfg.is_out_domain, seed=seed,
            precompute_donor_amp=cfg.ram_precompute_donor_amp and cfg.ram,
        )
    keys = ("img", "donor", "mask") if cfg.ram else ("img", "mask")
    if cfg.loader == "process":
        # Process workers decode/augment truly in parallel (the reference
        # runs 24-40 DataLoader worker processes, train.py:558-559); the
        # round-1 thread loader topped out ~200 img/s on the GIL.
        return ProcessFusedMultiDomainLoader(
            datasets, bsl[: len(datasets)], keys, seed=seed,
            num_workers=cfg.num_workers, rows=rows,
        )
    return FusedMultiDomainLoader(
        datasets, bsl[: len(datasets)], keys, seed=seed, prefetch=cfg.prefetch + 2,
        num_workers=cfg.num_workers or 6, rows=rows,
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


def _device_stream(domain_iter, mesh, depth: int = 2):
    """Host batches -> in-flight device arrays, `depth` steps ahead.

    `device_put` is asynchronous: issuing the next batch's transfer while
    the current step computes overlaps h2d with MXU work instead of
    serializing them (double-buffering).  Yields (real_batch_rows, batch).
    """
    from collections import deque

    def put(b):
        n = next(iter(b.values())).shape[0]
        if mesh is not None:
            return n, shard_batch(b, mesh, pad_to_multiple=True)
        return n, {k: jax.device_put(np.ascontiguousarray(v)) for k, v in b.items()}

    buf = deque()
    for b in domain_iter:
        buf.append(put(b))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def fit(cfg: TrainConfig, eval_every: int = 1, max_steps: Optional[int] = None) -> Dict:
    """Train; returns summary dict. eval_every/max_steps allow smoke runs."""
    from ramdsir_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = cfg.resolve()
    if cfg.deterministic:
        # Reference train.py:608-614 (cudnn.deterministic + seeds).  JAX is
        # deterministic by construction (explicit PRNG keys, XLA's static
        # schedules); what remains is host-side randomness: seed the global
        # RNGs any third-party code might draw from.  The data pipeline is
        # already counter-seeded per sample (see FusedMultiDomainLoader).
        import random

        random.seed(cfg.seed)
        np.random.seed(cfg.seed)
    is_main = jax.process_index() == 0
    if jax.process_count() > 1 and cfg.log_images_every:
        # TB image grids are a single-host extension: the viz slices come
        # back sharded across hosts and no one process can pull them.
        # Scalars/eval/checkpoints are unaffected (the reference has no
        # multi-host path at all).
        cfg = dataclasses.replace(cfg, log_images_every=0)
        if is_main:
            print("multi-host: TB image grids disabled (log_images_every=0)")
    data_root = os.path.join(cfg.data_root, cfg.dataset)
    save_dir = cfg.save_path
    os.makedirs(save_dir, exist_ok=True)
    save_run_config(save_dir, dataclasses.asdict(cfg))

    rows = None
    if jax.process_count() > 1 and (not cfg.device_data or cfg.trace_dir):
        # Multi-host HOST-loader path (bigger-than-HBM data, or per-step
        # trace windows): every process derives the SAME epoch plan (same
        # seed) and materializes only its rows of the global domain-major
        # batch; shard_batch assembles the global array from local shards.
        # With the device pipeline (default) there is no row slicing —
        # every process holds the (replicated) dataset and the full index
        # plan, and the scan windows shard the batch axis globally.
        from ramdsir_tpu.parallel.distributed import local_batch_slice

        rows = local_batch_slice(sum(cfg.batch_size_list[: len(cfg.domain_idxs)]))
    domain_iter = build_train_loaders(cfg, data_root, seed=cfg.seed, rows=rows)
    steps_per_epoch = len(domain_iter)
    total_iters = steps_per_epoch * cfg.epochs

    rng = jax.random.PRNGKey(cfg.seed)
    state, models = init_state(cfg, rng)
    if cfg.checkpoint_resume:
        state, _ = load_checkpoint(cfg.checkpoint_resume, state)
        print(f"resumed from {cfg.checkpoint_resume} at step {int(state.step)}")

    mesh = None
    # DataParallel semantics (reference train.py:205-208): use EVERY visible
    # device by default (all hosts' devices on a pod); --num_devices
    # restricts the mesh explicitly.
    n_dev = cfg.num_devices or jax.device_count()
    if n_dev > 1:
        mesh = get_mesh(n_dev)
        state = replicate_state(state, mesh)

    dev_data = getattr(domain_iter, "device_data", None)
    if dev_data is not None and mesh is not None:
        # dataset arrays replicated over the mesh (idx gathers shard the
        # batch; the source arrays live on every device — ~100 MB)
        from ramdsir_tpu.parallel.mesh import replicated

        # multi-host: device_put of a locally-committed array to a global
        # sharding is rejected — hand it the host copy instead (each
        # process provides the identical full array, once at startup)
        src = np.asarray if jax.process_count() > 1 else (lambda a: a)
        dev_data = {k: jax.device_put(src(v), replicated(mesh)) for k, v in dev_data.items()}
    # lax.scan window: W steps per XLA dispatch when the whole dataset is
    # device-resident — the host does NOTHING per step (no h2d, no key
    # fold_in, no dispatch), which is what actually feeds a fast chip from
    # a weak/tunneled host.  --trace_dir needs per-step dispatch boundaries,
    # so it forces W=1.
    scan_w = 1
    seg_epochs = 1
    if dev_data is not None and not cfg.trace_dir:
        # Scan SEGMENTS span every epoch up to the next eval boundary: the
        # host needs no control between them, and on relay-tunneled devices
        # each program dispatch costs a ~0.85 s round-trip once the
        # in-flight queue saturates — per-epoch windows (21 steps ~ 0.8 s)
        # then leave the chip idle ~50% (measured; BENCH_NOTES).  With
        # eval_every=1 (the reference cadence) segments stay one epoch.
        seg_epochs = max(1, min(eval_every, cfg.epochs))
        seg_steps = steps_per_epoch * seg_epochs
        if cfg.scan_window:
            scan_w = cfg.scan_window
        else:
            # auto: prefer a divisor of the segment length (a remainder
            # window is a second compiled program), biggest one within the
            # cap; the cap keeps the metrics table / TB-grid cadence sane.
            # A max_steps smaller than the segment truncates the run — pick
            # a divisor of IT instead, or the tail window is a fresh
            # program shape (a ~300 s relay compile).
            effective = seg_steps if max_steps is None else min(seg_steps, max_steps)
            cap = 256
            divs = [d for d in range(2, cap + 1) if effective % d == 0]
            scan_w = max(divs) if divs else min(effective, cap)
    if jax.process_count() > 1 and dev_data is not None and scan_w <= 1:
        raise ValueError(
            "multi-host device-resident training runs through scan windows "
            "(the per-step path assumes process-local batch rows); set "
            "scan_window >= 2 or device_data=False"
        )
    train_step = make_train_step(
        cfg, models, total_iters, pad_to_multiple=n_dev if n_dev > 1 else None,
        device_data=dev_data, donate=True, scan=scan_w > 1,
    )
    predict = make_predict_fn(cfg, models, bn_adapt=False)

    writer = MetricsWriter(os.path.join(save_dir, "log"))
    keeper = BestKeeper(save_dir)
    timer = StepTimer()

    step = int(state.step)
    done = False
    summary: Dict = {}
    # Metrics are jax scalars (futures under async dispatch).  Readback
    # strategy matters enormously on tunneled devices (measured here: a
    # d2h pull costs ~3.3 s of wall time REGARDLESS of size): steps/windows
    # append their scalars into an on-device ring; the host pulls the whole
    # ring in one transfer every `cap` steps / at eval / at the end.
    from ramdsir_tpu.utils.logging import DeviceMetricsRing, DeviceVizRing

    ring = DeviceMetricsRing(writer, log_interval=cfg.log_interval)
    # Image grids park on device and ride the eval-boundary sync home in
    # one transfer — an eager np.asarray(viz) here costs a ~3.3 s d2h
    # round-trip per 100 steps on this relay (~40% of the step budget).
    vizring = DeviceVizRing()

    def _flush_viz():
        vizring.flush(lambda viz, s: _log_viz(writer, viz, s, cfg))

    def run_scan_segment(state, plan, pbar):
        nonlocal step, done
        seg_len = plan["img_idx"].shape[0]
        b_real = plan["img_idx"].shape[1]
        if n_dev > 1 and b_real % n_dev:
            pad = (-b_real) % n_dev
            plan = {
                k: np.concatenate([v, np.zeros((v.shape[0], pad), v.dtype)], axis=1)
                for k, v in plan.items()
            }
        pos = 0
        from jax.sharding import NamedSharding, PartitionSpec

        spec = NamedSharding(mesh, PartitionSpec(None, "data")) if mesh else None
        while pos < seg_len and not done:
            w = min(scan_w, seg_len - pos)
            if max_steps is not None:
                w = min(w, max_steps - step)
            if w <= 0:
                done = True
                break
            _t0 = time.perf_counter()
            win = {k: v[pos : pos + w] for k, v in plan.items()}
            win = {
                k: (jax.device_put(v, spec) if spec else jax.device_put(v))
                for k, v in win.items()
            }
            _t1 = time.perf_counter()
            state, mtable, viz = train_step(state, win, rng, dev_data)
            _t2 = time.perf_counter()
            if is_main:  # logging (and its d2h pulls) is process 0's job
                ring.append(step, mtable)  # (W,)-valued dict; pulled when full
            _t3 = time.perf_counter()
            # ticks fire at dispatch (everything above is async); the
            # timing window is extended to actual completion by timer.mark()
            # after the sync at eval boundaries / end of training — device
            # syncs cost seconds on tunneled chips, so they are NOT per
            # window
            for _ in range(w):
                timer.tick(b_real)
            pbar.update(w)
            if timer.items_per_sec:
                pbar.set_postfix_str(f"{timer.items_per_sec:.0f} img/s", refresh=False)
            if (
                is_main
                and cfg.log_images_every
                and any((step + i) % cfg.log_images_every == 0 for i in range(w))
            ):
                vizring.append(step + w - 1, viz)
            if os.environ.get("RAMDSIR_TIMING"):
                print(
                    f"window step={step} w={w}: put {1e3*(_t1-_t0):.0f}ms "
                    f"dispatch {1e3*(_t2-_t1):.0f}ms "
                    f"append {1e3*(_t3-_t2):.0f}ms "
                    f"viz {1e3*(time.perf_counter()-_t3):.0f}ms",
                    flush=True,
                )
            step += w
            pos += w
            if max_steps is not None and step >= max_steps:
                done = True
        return state

    try:
        epoch = 0
        while epoch < cfg.epochs and not done:
            t_ep = time.time()
            # One segment = the epochs up to the next eval boundary (scan
            # mode; 1 epoch otherwise).  Plans are built per epoch and
            # concatenated — identical step sequence to the per-epoch loop.
            n_ep = seg_epochs if scan_w > 1 else 1
            n_ep = min(n_ep, cfg.epochs - epoch)
            # per-epoch progress bar (reference train.py:223 wraps the iter
            # loop in tqdm); disabled when stdout isn't a TTY (CI, logs)
            from tqdm import tqdm

            pbar = tqdm(
                total=steps_per_epoch * n_ep,
                desc=f"epoch {epoch}" + (f"-{epoch + n_ep - 1}" if n_ep > 1 else ""),
                unit="step", leave=False, disable=None, mininterval=2.0,
            )
            if scan_w > 1:
                plans = [domain_iter.epoch_plan() for _ in range(n_ep)]
                plan = {k: np.concatenate([p[k] for p in plans], axis=0) for k in plans[0]}
                state = run_scan_segment(state, plan, pbar)
                pbar.close()
                # fall through to the shared eval/checkpoint block
                batch_iter = ()
            else:
                batch_iter = _device_stream(domain_iter, mesh, depth=max(2, cfg.prefetch))
            for b_real, batch in batch_iter:
                key = jax.random.fold_in(rng, step)
                # profiler trace window: steps 2-12 (skip the compile step)
                if cfg.trace_dir and step == 2:
                    jax.profiler.start_trace(cfg.trace_dir)
                state, metrics, viz = train_step(state, batch, key, dev_data)
                if cfg.trace_dir and step == 12:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    print(f"profiler trace (steps 2-12) written to {cfg.trace_dir}")
                timer.tick(b_real)
                if is_main and step % cfg.log_interval == 0:
                    ring.append(step, metrics)  # pulled when the ring fills
                if is_main and cfg.log_images_every and step % cfg.log_images_every == 0:
                    vizring.append(step, viz)  # reference train.py:306-329
                pbar.update(1)
                if timer.items_per_sec:
                    pbar.set_postfix_str(f"{timer.items_per_sec:.0f} img/s", refresh=False)
                step += 1
                if max_steps is not None and step >= max_steps:
                    done = True
                    break
            pbar.close()
            # `epoch` now names the LAST epoch of the segment (the one the
            # eval row / checkpoint meta is attributed to, like the per-epoch
            # loop); the while-step below advances past it.
            epoch = epoch + n_ep - 1

            if (epoch + 1) % eval_every == 0 or done:
                # REAL device sync: block_until_ready can return before
                # execution finishes on relay-tunneled devices (measured);
                # an actual readback is the only trustworthy barrier.
                int(jax.device_get(state.step))
                timer.mark()  # close the throughput window at completed work
                ring.flush()  # scalars reach TB before the eval row does
                _flush_viz()  # parked image grids ride the same boundary
                if not is_main:
                    # eval/CSV/checkpoints are process 0's job (no
                    # collectives below, so control flow may diverge)
                    epoch += 1
                    continue
                eval_state = state
                if jax.process_count() > 1:
                    # the mesh-free predict jit can't consume the global
                    # replicated state; pull it once and rebind to this
                    # process's devices (2M params — cheap per eval)
                    eval_state = jax.tree.map(
                        lambda x: jax.device_put(jax.device_get(x)), state
                    )
                if cfg.dataset == "fundus":
                    res = eval_fundus(
                        predict, eval_state, cfg.data_root, cfg.test_domain_idx,
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
                        predict, eval_state, cfg.data_root, cfg.test_domain_idx,
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
            epoch += 1

    finally:
        # stop loader worker processes (no-op for thread loaders)
        getattr(domain_iter, "shutdown", lambda: None)()

    int(jax.device_get(state.step))  # real sync (see eval-block note)
    timer.mark()  # include the in-flight tail steps' execution time
    ring.flush()
    _flush_viz()
    final_path = keeper.save_final(state, meta={"steps": step}) if is_main else None
    writer.close()
    summary.update(
        best=keeper.best, steps=step, images_per_sec=timer.items_per_sec, final_checkpoint=final_path
    )
    return summary
