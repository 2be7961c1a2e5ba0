"""FULL train-step parity vs an independent torch oracle.

tests/test_torch_parity.py pins the forward pass; this test pins the whole
reference training iteration (code/train.py:246-296): dual forward
(clean + frequency-mixed), BCE+dice on both, symmetric-KL KD consistency
(train.py:85-88), per-domain DSBN rec decoder with MSE x lambda_rec
(train.py:264-276), the Adam update with the encoder-lr/2 param group
(train.py:571-575), and the sequential BN running-stat updates — against a
torch implementation built from torch primitives with OUR weights loaded.

This exercises the exact integration points where the fused-dual vmap
merge, the fused-DSBN segment stats, and the s2d packed stages live: all
fusions ON (the shipped defaults) must reproduce torch's sequential
eager math.

Known, documented divergences kept out of scope (PARITY.md): BCE from
logits (equal off-saturation), KD eps=1e-8 (equal off-saturation),
poly-LR off-by-one (first step uses base LR in both — this test runs one
step).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.ops.ram import ram_augment_fundus
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.train.steps import make_train_step
from ramdsir_tpu.utils.torch_compat import flax_module_to_torch_sd, torch_sd_to_flax

from tests.test_torch_parity import TDecoder, TEncoder, TRecDecoder

BSL = [2, 2, 2]
B = sum(BSL)
HW = 64
LAMBDA_REC = 0.1


def _torch_dice(score, target):
    smooth = 1e-5
    intersect = torch.sum(score * target)
    y_sum = torch.sum(target * target)
    z_sum = torch.sum(score * score)
    return 1 - (2 * intersect + smooth) / (z_sum + y_sum + smooth)


def _torch_kd(inp, tgt):
    kl = tnn.KLDivLoss(reduction="mean")
    return kl(inp.log(), tgt) + kl(tgt.log(), inp)


@pytest.fixture(scope="module")
def oracle():
    """Run one step on both sides; return everything for the asserts."""
    cfg = TrainConfig(
        dataset="fundus", ram=True, rec=True, consistency=True,
        consistency_type="kd", image_size=HW, domain_idxs=(0, 1, 2),
        test_domain_idx=0, save_path="/tmp/step_parity", device_data=False,
    ).resolve()
    assert cfg.s2d_levels == 2 and cfg.fused_dual and cfg.fused_dsbn  # shipped defaults
    state, models = init_state(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(42)
    batch = {
        "img": jnp.asarray(rng.uniform(0, 255, (B, HW, HW, 3)).astype(np.float32)),
        "donor": jnp.asarray(rng.uniform(0, 255, (B, HW, HW, 3)).astype(np.float32)),
        "mask": jnp.asarray((rng.uniform(size=(B, HW, HW, 2)) > 0.5).astype(np.float32)),
    }
    key = jax.random.PRNGKey(11)

    step = make_train_step(
        cfg, models, total_iters=1000, batch_size_list=BSL, debug_grads=True
    )
    new_state, metrics, _ = step(state, batch, key)
    our_grads = metrics.pop("_grads")

    # ---- torch twin ----
    # the step derives (img, img_freq) from (img, donor, key) via the RAM
    # mixup; reproduce the exact arrays by calling the same op directly
    img_n, img_freq = ram_augment_fundus(batch["img"], batch["donor"], key)
    t_img = torch.from_numpy(np.asarray(img_n).transpose(0, 3, 1, 2))
    t_freq = torch.from_numpy(np.asarray(img_freq).transpose(0, 3, 1, 2))
    t_mask = torch.from_numpy(np.asarray(batch["mask"]).transpose(0, 3, 1, 2))

    tenc, tdec, trec = TEncoder(), TDecoder(), TRecDecoder(domains=3)
    for mod, name in ((tenc, "encoder"), (tdec, "seg_decoder"), (trec, "rec_decoder")):
        mod.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in
             flax_module_to_torch_sd(
                 state.params[name], state.batch_stats[name]
             ).items()},
            strict=False,
        )
        mod.train()

    # reference optimizer: Adam param groups, encoder at lr/2 (train.py:571-575)
    opt = torch.optim.Adam(
        [
            {"params": tenc.parameters(), "lr": cfg.lr / 2},
            {"params": tdec.parameters(), "lr": cfg.lr},
            {"params": trec.parameters(), "lr": cfg.lr},
        ],
        lr=cfg.lr, betas=(0.9, 0.999),
    )

    # reference hot loop (train.py:246-287)
    feats = tenc(t_img)
    pred1 = torch.sigmoid(tdec(feats))
    loss_bce_1 = tnn.BCELoss()(pred1, t_mask)
    loss_dice_1 = _torch_dice(pred1, t_mask)

    freq_feats = tenc(t_freq)
    pred2 = torch.sigmoid(tdec(freq_feats))
    loss_bce_2 = tnn.BCELoss()(pred2, t_mask)
    loss_dice_2 = _torch_dice(pred2, t_mask)
    loss_consistency = _torch_kd(pred2, pred1)

    loss = torch.zeros(())
    avg_rec = 0.0
    left = 0
    for d, bs in enumerate(BSL):
        right = left + bs
        rec_soft = torch.tanh(trec(freq_feats[-1][left:right], d))
        loss_rec = tnn.MSELoss()(rec_soft, t_img[left:right])
        loss = loss + LAMBDA_REC * loss_rec
        avg_rec += float(loss_rec)
        left = right
    loss = loss + loss_bce_1 + loss_bce_2 + loss_dice_1 + loss_dice_2 + 0.5 * loss_consistency

    opt.zero_grad()
    loss.backward()

    torch_grads = {}
    for mod, name in ((tenc, "encoder"), (tdec, "seg_decoder"), (trec, "rec_decoder")):
        gsd = {n: p.grad.detach().numpy() for n, p in mod.named_parameters()}
        gp, _ = torch_sd_to_flax(gsd, state.params[name], {})
        torch_grads[name] = gp

    opt.step()

    torch_losses = {
        "loss_bce_1": float(loss_bce_1),
        "loss_dice_1": float(loss_dice_1),
        "loss_bce_2": float(loss_bce_2),
        "loss_dice_2": float(loss_dice_2),
        "loss_consistency": float(loss_consistency),
        "loss_rec": avg_rec / 4.0,  # reference TB convention
        "loss": float(loss),
    }
    torch_post = {}
    torch_stats = {}
    for mod, name in ((tenc, "encoder"), (tdec, "seg_decoder"), (trec, "rec_decoder")):
        sd = {k: v.detach().numpy() for k, v in mod.state_dict().items()}
        p, s = torch_sd_to_flax(sd, state.params[name], state.batch_stats[name])
        torch_post[name] = p
        torch_stats[name] = s

    return dict(
        cfg=cfg, metrics=metrics, new_state=new_state, our_grads=our_grads,
        torch_losses=torch_losses, torch_grads=torch_grads,
        torch_post=torch_post, torch_stats=torch_stats,
    )


def test_loss_components(oracle):
    for k, want in oracle["torch_losses"].items():
        got = float(np.asarray(oracle["metrics"][k]))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5, err_msg=k)


def test_gradients(oracle):
    """Every parameter's gradient matches torch autograd through the dual
    forward + KD + per-domain rec — scale-aware tolerance per tensor.

    Tolerance notes (both measured, not guessed):
    * every conv bias that feeds straight into a BatchNorm has a
      MATHEMATICALLY ZERO gradient (BN subtracts the mean, so a pre-BN
      constant can't affect the loss); both frameworks produce pure fp
      cancellation noise there (torch ~1e-9, ours ~1e-5 — different
      reduction orders), hence the absolute floor.
    * the earliest encoder stages' BN affine gradients are genuinely
      ILL-CONDITIONED in f32: running the SAME torch oracle in float64
      shows torch's own f32 gradients off by up to ~90% relative on
      convd1.bn1 (cancellation across the longest backprop chain).  Any
      two f32 graph factorizations legitimately disagree at the percent
      level there, so the relative term is 2%.  A real integration bug
      (wrong loss term, wrong slice, wrong stat) moves gradients by
      10-100% of tensor scale across MANY tensors and still fails."""
    flat_ours = jax.tree_util.tree_leaves_with_path(oracle["our_grads"])
    flat_torch = {jax.tree_util.keystr(p): g for p, g in
                  jax.tree_util.tree_leaves_with_path(oracle["torch_grads"])}
    assert flat_ours
    dots = norm_a = norm_b = 0.0
    for path, ga in flat_ours:
        kstr = jax.tree_util.keystr(path)
        gb = np.asarray(flat_torch[kstr])
        ga = np.asarray(ga)
        tol = 3e-4 + 2e-2 * np.abs(gb).max()
        # robust per-tensor check: f32 cancellation noise legitimately puts
        # a handful of near-zero elements past any fixed atol (observed:
        # ~10 of 590k on the bottleneck kernel, location shifting with the
        # conv factorization), so require the overwhelming majority within
        # tol and cap every element at a few x tol.  A real integration bug
        # moves whole tensors by 10-100% of scale and fails both.
        err = np.abs(ga - gb)
        frac_bad = float(np.mean(err > tol))
        assert frac_bad <= 1e-4, f"{kstr}: {frac_bad:.2%} elements beyond tol"
        assert float(err.max()) <= 5 * tol, f"{kstr}: max err {err.max():.2e} vs tol {tol:.2e}"
        dots += float(np.sum(ga.astype(np.float64) * gb))
        norm_a += float(np.sum(ga.astype(np.float64) ** 2))
        norm_b += float(np.sum(gb.astype(np.float64) ** 2))
    # global direction must agree tightly even where single leaves are noisy
    assert dots / np.sqrt(norm_a * norm_b) > 0.9999


def test_post_step_params(oracle):
    """Adam(lr groups) + first-step base LR: params after one step match.
    Near-zero grads make the first Adam step ~sign(g)*factor, so the bound
    is a multiple of lr (see tests/test_fused_dual.py)."""
    lr = oracle["cfg"].lr
    ours = oracle["new_state"].params
    want = oracle["torch_post"]
    for name in ("encoder", "seg_decoder", "rec_decoder"):
        for (pa_path, pa), (_, pb) in zip(
            jax.tree_util.tree_leaves_with_path(ours[name]),
            jax.tree_util.tree_leaves_with_path(want[name]),
        ):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), atol=2.5 * lr,
                err_msg=f"{name}{jax.tree_util.keystr(pa_path)}",
            )


def test_bn_running_stats(oracle):
    """Sequential clean->freq running-stat updates (incl. the fused-dual
    closed-form merge and DSBN banks) match torch's in-place updates."""
    ours = oracle["new_state"].batch_stats
    want = oracle["torch_stats"]
    for name in ("encoder", "seg_decoder", "rec_decoder"):
        for (path, sa), (_, sb) in zip(
            jax.tree_util.tree_leaves_with_path(ours[name]),
            jax.tree_util.tree_leaves_with_path(want[name]),
        ):
            np.testing.assert_allclose(
                np.asarray(sa), np.asarray(sb), rtol=1e-4, atol=1e-5,
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )
