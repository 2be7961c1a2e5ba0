"""Jitted train/predict steps.

One `jax.jit`-compiled function covers what the reference spreads over the
hot loop (code/train.py:223-331 fundus, :393-498 prostate): on-device RAM
augmentation, the dual forward (clean + frequency-mixed), all losses, the
Adam update, and the per-iteration poly LR with param-group factors.

Parallelism: the functions are pure and shape-static; under a
`jax.sharding.Mesh` with the batch sharded on the 'data' axis, XLA inserts
the gradient psum and the (global-batch sync) BN reductions over ICI —
matching the reference's effective single-device BN numerics.  See
ramdsir_tpu.parallel.mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ramdsir_tpu.config import CONSISTENCY_WEIGHT, POLY_POWER, TrainConfig
from ramdsir_tpu.ops.losses import (
    bce_with_logits_loss,
    binary_kd_loss,
    binary_mse_consistency,
    cross_entropy_loss,
    dice_loss,
    dice_loss_multi,
    kd_loss,
    mse_loss,
)
from ramdsir_tpu.ops.ram import ram_augment_fundus, ram_augment_prostate
from ramdsir_tpu.train.state import TrainState, adam_optimizer


def _apply_with_stats(module, params, stats, *args, train: bool, **kwargs):
    """Apply a flax module threading the batch_stats collection."""
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    if train and stats:
        out, mut = module.apply(variables, *args, train=True, mutable=["batch_stats"], **kwargs)
        return out, mut["batch_stats"]
    out = module.apply(variables, *args, train=train, **kwargs)
    return out, stats


def make_train_step(
    cfg: TrainConfig,
    models: Dict[str, Any],
    total_iters: int,
    batch_size_list: Optional[List[int]] = None,
    pad_to_multiple: Optional[int] = None,
    device_data: Optional[Dict[str, jax.Array]] = None,
    donate: bool = False,
    scan: bool = False,
    debug_grads: bool = False,
) -> Callable:
    """Build the jitted train step.

    Batch dict (host-produced, raw-range images):
      fundus:   img/donor (B,H,W,3) float32 in [0,255], mask (B,H,W,2) float
      prostate: img/donor (B,H,W,3) float32 in [-1,1], mask (B,H,W) int32
    The per-domain sub-batch boundaries come from `batch_size_list`
    (train.py:35-45); slices are static so the DSIR per-domain loop unrolls.

    pad_to_multiple: device count of the data-parallel mesh.  When the
    global batch isn't divisible by it (prostate: 10 on 8 devices), fit()
    zero-pads the batch to the next multiple; the step computes all BN
    statistics over the REAL rows only (static `n_valid` slice into every
    norm) and slices losses back to real rows, so padded numerics equal the
    unpadded batch exactly while shapes stay mesh-divisible.

    device_data: HBM-resident dataset arrays (data.device_pipeline).  The
    step then accepts {img_idx, donor_idx} int32 batches and performs the
    gather + random scale-crop + donor lookup on device — the host leaves
    the hot path entirely.
    """
    is_fundus = cfg.dataset == "fundus"
    if cfg.consistency and cfg.consistency_type not in ("mse", "kd"):
        # reference train.py:196-201 asserts on unknown types
        raise ValueError(f"unknown consistency_type {cfg.consistency_type!r} (use 'mse' or 'kd')")
    # Truncate to the actual number of source domains: fit() builds one
    # sub-batch per domain_idx, while cfg.batch_size_list always has one
    # entry per potential source domain (5 for prostate).  The reference
    # loops range(len(domain_idx_list)) (train.py:263-276) and so handles
    # e.g. prostate with --domain_idxs 0,1,2 fine; without this slice the
    # DSIR domain loop would index past the real batch.
    bsl = list(batch_size_list or cfg.batch_size_list)[: len(cfg.domain_idxs)]
    b_real = sum(bsl)
    pad = (-b_real) % pad_to_multiple if pad_to_multiple else 0
    n_valid = b_real if pad else None  # None -> no slicing anywhere
    opt = adam_optimizer()
    lambda_rec = cfg.lambda_rec
    base_lr = float(cfg.lr)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # 2-class softmax heads (prostate) use the logit-difference map forms:
    # (B,H,W,2) probability maps tile the 128-lane minor dim at 2/128
    # occupancy (~9 ms/step of loss fusions in the 384^2 trace), while the
    # (B,H,W) forms are exact (softmax over 2 == sigmoid of the difference)
    # — equality pinned in tests/test_losses.py::test_binary_head_*
    binary_head = (not is_fundus) and cfg.num_classes == 2

    def seg_head(logits, mask):
        """Supervised losses from raw-dtype logits; returns (repr, sup, dice)
        where `repr` feeds the consistency loss and viz:
          fundus -> sigmoid probabilities (B,H,W,2)
          binary -> f32 logit-difference map (B,H,W)
          generic -> softmax probabilities (B,H,W,C)
        """
        if is_fundus:
            lg = logits.astype(jnp.float32)
            pred = jax.nn.sigmoid(lg)
            return pred, bce_with_logits_loss(lg, mask), dice_loss(pred, mask)
        if binary_head:
            head_hw["hw"] = logits.shape[1:3]  # trace-time; viz unflattens
            l = logits[..., 1].astype(jnp.float32) - logits[..., 0].astype(jnp.float32)
            # FLAT (B, H*W) maps: the (B, H, W) forms get a batch-minor XLA
            # layout (10 of 128 lanes — the r5 trace measured the backward
            # grad-accumulate of this map at 29 GB/s, 1.9 ms/step); flat
            # puts H*W in the minor dim, full lanes.  Every binary loss is
            # elementwise + global mean, so the reshape is exact.
            l = l.reshape(l.shape[0], -1)
            m = mask.reshape(mask.shape[0], -1)
            # CE over 2 softmax classes == BCE-with-logits on the difference;
            # dice_loss_multi(C=2, ignore_index=0) == plain dice on class 1
            return l, bce_with_logits_loss(l, m), dice_loss(
                jax.nn.sigmoid(l), (m == 1)
            )
        lg = logits.astype(jnp.float32)
        pred = jax.nn.softmax(lg, axis=-1)
        return (
            pred,
            cross_entropy_loss(lg, mask),
            dice_loss_multi(pred, mask, cfg.num_classes, ignore_index=0),
        )

    def consistency_fn(repr2, repr1):
        if cfg.consistency_type == "kd":
            # eps guards the log against fp32 sigmoid/softmax saturation
            if binary_head:
                return binary_kd_loss(repr2, repr1, eps=1e-8)
            return kd_loss(repr2, repr1, eps=1e-8)
        if binary_head:
            return binary_mse_consistency(repr2, repr1)
        return mse_loss(repr2, repr1)

    head_hw = {}  # (H, W) of the seg logits, recorded at trace time

    def viz_probs(repr1):
        """Viz slice as (n,H,W,C) probabilities whatever the head repr."""
        if binary_head:
            # repr is the flat (n, H*W) logit-difference map (see seg_head)
            h, w = head_hw["hw"]
            l = repr1.reshape(repr1.shape[0], h, w)
            return jnp.stack([jax.nn.sigmoid(-l), jax.nn.sigmoid(l)], axis=-1)
        return repr1

    def loss_fn(params, batch_stats, batch, key):
        stats = dict(batch_stats)
        metrics = {}

        if cfg.ram:
            if "donor_amp" in batch:
                # device pipeline with precomputed banded donor spectra: the
                # per-step donor rfft2 is gone (ops/ram.py, numerics
                # identical — tests/test_ram.py::test_banded_mixup_*)
                from ramdsir_tpu.ops.ram import (
                    ram_augment_fundus_banded,
                    ram_augment_prostate_banded,
                )

                aug_b = ram_augment_fundus_banded if is_fundus else ram_augment_prostate_banded
                img, img_freq = aug_b(
                    batch["img"], batch["donor_amp"], key, use_dft=cfg.ram_banded_dft
                )
            else:
                aug = ram_augment_fundus if is_fundus else ram_augment_prostate
                img, img_freq = aug(
                    batch["img"], batch["donor"], key, use_pallas=cfg.ram_use_pallas
                )
        else:
            img = batch["img"] / 127.5 - 1.0 if is_fundus else batch["img"]
            img_freq = None
        mask = batch["mask"][:b_real]

        def forward_impl(params, stats, x):
            feats, enc_stats = _apply_with_stats(
                models["encoder"], params["encoder"], stats["encoder"],
                x.astype(compute_dtype), train=True, n_valid=n_valid,
            )
            logits, seg_stats = _apply_with_stats(
                models["seg_decoder"], params["seg_decoder"], stats["seg_decoder"],
                feats, train=True, n_valid=n_valid,
            )
            new_stats = dict(stats)
            new_stats["encoder"], new_stats["seg_decoder"] = enc_stats, seg_stats
            # raw-dtype logits: seg_head casts to f32 at the use site (bf16
            # values are exact in f32, so deferring the cast changes nothing)
            return feats, logits[:b_real], new_stats

        if cfg.remat:
            # Recompute the forward in the backward pass: activation memory
            # drops from O(depth) feature maps to the checkpoint boundary,
            # buying larger global batches / image sizes per chip.
            forward_impl = jax.checkpoint(forward_impl)

        def forward(x, stats):
            return forward_impl(params, stats, x)

        feats_f_last = None
        if cfg.ram and cfg.fused_dual and cfg.norm == "bn":
            # ONE forward over the FLAT [clean; freq] concat (2B rows on the
            # plain batch axis): convs see 2B rows with no extra leading
            # dim, while BatchNorm(dual=True) computes per-half statistics
            # and composes the two sequential running-stat updates
            # internally (models/norm.py) — numerics identical to the
            # reference's two consecutive passes (train.py:263-287).  The
            # earlier vmapped formulation computed the same thing but its
            # (2, B, ...) intermediates forced relayout copies at every
            # conv boundary (~2 ms/step traced); the flat concat's
            # (2B,)<->(2,B,) reshapes are layout-free.
            half = img.shape[0]
            enc_d = models["encoder"].clone(dual=True)
            dec_d = models["seg_decoder"].clone(dual=True)

            def fwd_flat(x2, st):
                feats, enc_s = _apply_with_stats(
                    enc_d, params["encoder"], st["encoder"],
                    x2, train=True, n_valid=n_valid,
                )
                logits, seg_s = _apply_with_stats(
                    dec_d, params["seg_decoder"], st["seg_decoder"],
                    feats, train=True, n_valid=n_valid,
                )
                return feats[-1], logits, enc_s, seg_s

            if cfg.remat:
                fwd_flat = jax.checkpoint(fwd_flat)
            x2 = jnp.concatenate([img, img_freq], axis=0).astype(compute_dtype)
            last, logits_all, enc_s, seg_s = fwd_flat(x2, stats)
            logits1 = logits_all[:b_real]
            logits2 = logits_all[half : half + b_real]
            feats_f_last = last[half:]
            stats = dict(stats)
            stats["encoder"], stats["seg_decoder"] = enc_s, seg_s
        elif cfg.ram and cfg.fused_dual:
            # vmapped fallback for non-BN norms: ONE forward over the
            # stacked (2, B, ...) clean/freq batch — conv batch merges the
            # leading axis so convs still see 2B rows, and per-slice
            # normalizer reductions stay per-half, exactly like the
            # reference's two sequential passes (train.py:263-287).
            def fwd_one(x):
                feats, enc_s = _apply_with_stats(
                    models["encoder"], params["encoder"], stats["encoder"],
                    x.astype(compute_dtype), train=True, n_valid=n_valid,
                )
                logits, seg_s = _apply_with_stats(
                    models["seg_decoder"], params["seg_decoder"], stats["seg_decoder"],
                    feats, train=True, n_valid=n_valid,
                )
                return feats[-1], logits[:b_real], enc_s, seg_s

            if cfg.remat:
                fwd_one = jax.checkpoint(fwd_one)
            last2, logits12, enc_s2, seg_s2 = jax.vmap(fwd_one)(
                jnp.stack([img, img_freq])
            )
            logits1, logits2 = logits12[0], logits12[1]
            feats_f_last = last2[1]
            # Running stats: the reference applies the clean pass's update
            # and THEN the freq pass's.  Each vmapped half produced
            # new_i = (1-m)*old + m*b_i; the sequential composition
            # (1-m)*((1-m)*old + m*b1) + m*b2 equals
            # (1-m)*new_1 + (new_2 - (1-m)*old) — closed form, no extra
            # pass.  Momentum MUST match the norms' (models/norm.py).
            from ramdsir_tpu.models.norm import BN_MOMENTUM as m_

            def _merge_seq(old, new2):
                return (1.0 - m_) * new2[0] + (new2[1] - (1.0 - m_) * old)

            stats = dict(stats)
            for name, new_tree in (("encoder", enc_s2), ("seg_decoder", seg_s2)):
                if stats.get(name):
                    stats[name] = jax.tree.map(_merge_seq, stats[name], new_tree)
        else:
            _, logits1, stats = forward(img, stats)
        pred1, loss_sup1, loss_dice1 = seg_head(logits1, mask)

        loss = loss_sup1 + loss_dice1
        # metric keys become the reference's TB tags verbatim once the ring
        # prepends 'loss/' (train.py:299 fundus, :468 prostate):
        # loss_bce_1/2 (fundus BCE heads), loss_ce_1/2 (prostate CE heads)
        sup_tag = "loss_bce" if is_fundus else "loss_ce"
        metrics.update({f"{sup_tag}_1": loss_sup1, "loss_dice_1": loss_dice1})

        if cfg.ram:
            if not cfg.fused_dual:
                feats_f, logits2, stats = forward(img_freq, stats)
                feats_f_last = feats_f[-1]
            pred2, loss_sup2, loss_dice2 = seg_head(logits2, mask)
            loss = loss + loss_sup2 + loss_dice2

            loss_consistency = jnp.float32(0.0)
            if cfg.consistency:
                loss_consistency = consistency_fn(pred2, pred1)
            loss = loss + CONSISTENCY_WEIGHT * loss_consistency

            avg_rec = jnp.float32(0.0)
            rec_samples = []
            if cfg.rec:
                rec_stats = stats["rec_decoder"]
                if cfg.fused_dsbn:
                    # ONE decoder pass over the whole batch with per-sample
                    # domain labels (segment-stat DSBN): identical numerics
                    # to the per-sub-batch loop, but the convs see the full
                    # batch instead of 2-10-image slivers.
                    # padded tail rows get domain 0; they're excluded from the
                    # segment statistics by n_valid and from every loss slice
                    domains = jnp.asarray(
                        np.concatenate([np.repeat(np.arange(len(bsl)), bsl), np.zeros(pad, np.int64)]),
                        jnp.int32,
                    )
                    rec_out, rec_stats = _apply_with_stats(
                        models["rec_decoder"], params["rec_decoder"], rec_stats,
                        feats_f_last, train=True, domain=domains, n_valid=n_valid,
                    )
                    rec_soft_all = jnp.tanh(rec_out.astype(jnp.float32))
                    # Per-domain mean MSE without materializing per-domain
                    # slices (each slice cost a real copy on TPU — ~1 ms/step
                    # traced): ONE fused squared-error row-reduce, then a
                    # static (D, B) segment matmul whose weights bake in the
                    # per-domain 1/(bs*H*W*C) normalizer.  Same math as the
                    # reference's per-domain MSELoss loop (train.py:263-276).
                    diff2 = jnp.square(rec_soft_all[:b_real] - img[:b_real])
                    per_row = jnp.sum(diff2, axis=(1, 2, 3))  # (b_real,)
                    seg = np.zeros((len(bsl), b_real), np.float32)
                    left = 0
                    for train_idx, bs in enumerate(bsl):
                        seg[train_idx, left : left + bs] = 1.0 / (
                            bs * float(np.prod(diff2.shape[1:]))
                        )
                        if cfg.log_images_every:
                            # viz-only slices (~2 ms/step of formatting in
                            # the prostate trace) — skip when grids are off
                            rec_samples.append(rec_soft_all[left : left + 1])
                        left += bs
                    loss_rec_d = jnp.asarray(seg) @ per_row  # (D,)
                    loss = loss + lambda_rec * jnp.sum(loss_rec_d)
                    avg_rec = jnp.sum(loss_rec_d)
                else:
                    left = 0
                    for train_idx, bs in enumerate(bsl):
                        right = left + bs
                        rec_out, rec_stats = _apply_with_stats(
                            models["rec_decoder"], params["rec_decoder"], rec_stats,
                            feats_f_last[left:right], train=True,
                            domain=jnp.int32(train_idx),
                        )
                        rec_soft = jnp.tanh(rec_out.astype(jnp.float32))
                        rec_samples.append(rec_soft[0:1])
                        loss_rec = mse_loss(rec_soft, img[left:right])
                        loss = loss + lambda_rec * loss_rec
                        avg_rec = avg_rec + loss_rec
                        left = right
                stats = dict(stats)
                stats["rec_decoder"] = rec_stats
            metrics.update(
                {
                    f"{sup_tag}_2": loss_sup2,
                    "loss_dice_2": loss_dice2,
                    "loss_consistency": loss_consistency,
                    # reference TB logs avg_rec_loss/4 regardless of domain count
                    "loss_rec": avg_rec / 4.0,
                }
            )
        metrics["loss"] = loss
        # Small viz sample (reference logs grids of batch[0:9:4] every 100
        # iters, train.py:306-329).  Slicing inside jit keeps the transfer
        # tiny; host pulls these only when it actually logs images.  With
        # image logging disabled the slices are skipped entirely — as step
        # OUTPUTS they would be materialized every step (~1.3 ms/step of
        # f32 formatting, measured).
        viz = {}
        if cfg.log_images_every:
            viz = {
                "image": img[0:9:4],
                "pred": viz_probs(pred1[0:9:4]),
                "mask": mask[0:9:4],
            }
            if cfg.ram:
                viz["image_freq"] = img_freq[0:9:4]
                if cfg.rec and rec_samples:
                    viz["image_rec"] = jnp.concatenate(rec_samples, axis=0)[0:3]
        return loss, (stats, metrics, viz)

    group_factor = {"encoder": 0.5 if cfg.rec else 1.0}

    use_device_data = device_data is not None

    def _update(state: TrainState, batch: Dict[str, jax.Array], key: jax.Array):
        """One optimizer step from a materialized batch (shared by the
        per-step and the lax.scan window programs)."""
        (_, (new_stats, metrics, viz)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key
        )
        if debug_grads:
            # raw gradients for oracle tests (tests/test_torch_step_parity.py)
            metrics = dict(metrics, _grads=grads)
        updates, new_opt_state = opt.update(grads, state.opt_state)
        # poly LR (train.py:287-296): the reference sets the schedule AFTER
        # optimizer.step() from the pre-increment iter counter, so step i
        # executes with lr = base * (1 - max(i-1, 0)/total)^0.9 — steps 0 AND
        # 1 both run at the base LR.  Replicated exactly (trajectory parity,
        # tests/test_torch_step_parity.py multi-step).
        lr_iter = jnp.maximum(state.step.astype(jnp.float32) - 1.0, 0.0)
        lr = base_lr * (1.0 - lr_iter / total_iters) ** POLY_POWER
        new_params = {}
        for name, tree in updates.items():
            f = group_factor.get(name, 1.0)
            new_params[name] = jax.tree.map(
                lambda p, u: p - lr * f * u, state.params[name], tree
            )
        metrics["lr"] = lr
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            metrics,
            viz,
        )

    def _gather_step(state: TrainState, idx_row: Dict[str, jax.Array], key: jax.Array, data):
        # `data` (HBM-resident dataset arrays) is a runtime argument, not a
        # closure capture: captured concrete arrays would be baked into the
        # jaxpr as ~100 MB compile-time constants.
        from ramdsir_tpu.data.device_pipeline import gather_and_augment, gather_prostate

        k_aug, key = jax.random.split(key)
        if is_fundus:
            batch = gather_and_augment(
                data, idx_row["img_idx"], idx_row["donor_idx"], k_aug, cfg.image_size
            )
        else:
            batch = gather_prostate(data, idx_row["img_idx"], idx_row["donor_idx"])
        return _update(state, batch, key)

    # donate=True lets XLA update params/opt-state/batch-stats in place
    # instead of double-buffering them (~3x param bytes of HBM back).  The
    # caller must then treat the input state as consumed — fit() and
    # bench.py rebind `state` every step and never touch the old one.
    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(
        state: TrainState,
        batch: Dict[str, jax.Array],
        key: jax.Array,
        data: Optional[Dict[str, jax.Array]] = None,
    ):
        if use_device_data:
            return _gather_step(state, batch, key, data)
        return _update(state, batch, key)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def scan_train_steps(
        state: TrainState,
        plan: Dict[str, jax.Array],
        base_key: jax.Array,
        data: Dict[str, jax.Array],
    ):
        """W training steps in ONE XLA program (zero host work per step).

        plan: {img_idx, donor_idx} int32 of shape (W, B) — one row per step,
        produced by DeviceFundusPipeline.epoch_plan().  The per-step PRNG
        key is fold_in(base_key, state.step), identical to the sequence the
        per-step loop uses, so scan windows and single steps are
        numerically interchangeable (tests/test_scan.py).  Step 0 runs
        unrolled to give the viz its carry shape; metrics come back stacked
        (W,) per key.
        """
        def step_once(st, row):
            key = jax.random.fold_in(base_key, st.step)
            return _gather_step(st, row, key, data)

        first = jax.tree.map(lambda x: x[0], plan)
        state, m0, viz = step_once(state, first)
        rest = jax.tree.map(lambda x: x[1:], plan)

        def body(carry, row):
            st, _ = carry
            st, m, v = step_once(st, row)
            return (st, v), m

        (state, viz), ms = jax.lax.scan(body, (state, viz), rest)
        metrics = {k: jnp.concatenate([m0[k][None], ms[k]]) for k in m0}
        return state, metrics, viz

    if scan:
        if not use_device_data:
            raise ValueError("scan=True requires the device-resident dataset")
        return scan_train_steps
    return train_step


def make_predict_fn(
    cfg: TrainConfig, models: Dict[str, Any], bn_adapt: bool = False
) -> Callable:
    """Jitted inference: probabilities from raw-range images.

    bn_adapt=True reproduces the eval CLIs' default "BatchNorm adaptation"
    (test_fundus_slice.py:75-86): normalization uses the *test batch*
    statistics; the mutated running stats are discarded (they never affect
    train-mode outputs, so this is prediction-equivalent to the reference's
    in-place module mutation).

    n_valid (static): number of REAL rows when the batch is padded to keep
    one compiled shape.  Under bn_adapt the batch statistics then come from
    the real rows only, matching the reference, which runs the smaller tail
    batch as-is (test_fundus_slice.py:100-110).  Each distinct n_valid costs
    one extra compile (typically one per dataset: the tail size).

    cfg.predict_dtype="bfloat16" runs the eval forward at the TRAINING
    forward's precision (convs bf16, norm stats f32) instead of the
    reference's f32 — ~2x MXU rate; probabilities still return f32.
    Default stays f32 (exact reference semantics).
    """
    is_fundus = cfg.dataset == "fundus"
    pdt = jnp.bfloat16 if cfg.predict_dtype == "bfloat16" else jnp.float32

    @partial(jax.jit, static_argnames=("n_valid",))
    def predict(
        state: TrainState, img: jax.Array, n_valid: Optional[int] = None
    ) -> jax.Array:
        x = (img / 127.5 - 1.0 if is_fundus else img).astype(pdt)
        train_flag = bool(bn_adapt)
        feats, _ = _apply_with_stats(
            models["encoder"], state.params["encoder"], state.batch_stats["encoder"],
            x, train=train_flag, n_valid=n_valid,
        )
        logits, _ = _apply_with_stats(
            models["seg_decoder"], state.params["seg_decoder"], state.batch_stats["seg_decoder"],
            feats, train=train_flag, n_valid=n_valid,
        )
        logits = logits.astype(jnp.float32)
        if is_fundus:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)

    return predict
