"""Torch checkpoint interchange + visualization utilities."""
import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.train.state import init_state
from ramdsir_tpu.utils.torch_compat import (
    export_torch_checkpoint,
    flax_module_to_torch_sd,
    import_torch_checkpoint,
    torch_sd_to_flax,
)
from ramdsir_tpu.utils.viz import (
    construct_color_img,
    entropy_map,
    mask_contour,
    overlay_contours,
    save_per_img,
    untransform,
    untransform_prostate,
)


@pytest.fixture(scope="module")
def state_and_cfg():
    cfg = TrainConfig(
        dataset="fundus", image_size=32, domain_idxs=(0, 1, 2), test_domain_idx=3,
        save_path="x", ram=True, rec=True,
    ).resolve()
    state, models = init_state(cfg, jax.random.PRNGKey(0))
    return cfg, state, models


def test_torch_sd_roundtrip(state_and_cfg):
    cfg, state, _ = state_and_cfg
    for name in ("encoder", "seg_decoder", "rec_decoder"):
        sd = flax_module_to_torch_sd(state.params[name], state.batch_stats.get(name, {}))
        # kernels are NCHW in the torch view
        any_w = next(v for k, v in sd.items() if k.endswith("conv1.weight"))
        assert any_w.shape[2:] == (3, 3)
        p, s = torch_sd_to_flax(sd, state.params[name], state.batch_stats.get(name, {}))
        for a, b in zip(jax.tree.leaves(state.params[name]), jax.tree.leaves(p)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.batch_stats.get(name, {})), jax.tree.leaves(s)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_checkpoint_file_roundtrip(state_and_cfg, tmp_path):
    cfg, state, _ = state_and_cfg
    path = str(tmp_path / "ref_format.pth")
    export_torch_checkpoint(path, state)
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert set(payload) == {"encoder_state_dict", "seg_decoder_state_dict", "rec_decoder_state_dict"}
    # perturb then re-import restores original values
    state2 = import_torch_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dsbn_banks_in_torch_view(state_and_cfg):
    cfg, state, _ = state_and_cfg
    sd = flax_module_to_torch_sd(state.params["rec_decoder"], state.batch_stats["rec_decoder"])
    bank_keys = [k for k in sd if ".bns." in k and k.endswith("weight")]
    assert bank_keys, "expected per-domain BN banks in torch naming"
    assert any(".bns.2." in k for k in bank_keys)  # 3 domains


def test_overlay_and_heatmaps(tmp_path):
    img = np.zeros((32, 32, 3), np.uint8) + 50
    pred = np.zeros((2, 32, 32), bool)
    pred[0, 8:16, 8:16] = True  # "cup" channel -> BLUE (utils.py:164-173)
    pred[1, 4:28, 4:28] = True  # "disc" channel -> GREEN
    gt = np.zeros((32, 32), bool)
    gt[10:20, 10:20] = True  # -> RED (utils.py:185-211)
    out = overlay_contours(img, pred, gt)
    for color in ([0, 0, 255], [0, 255, 0], [255, 0, 0]):
        assert (out == color).all(-1).any(), color
    p = save_per_img(img, str(tmp_path), "a/b img.png extra", pred, gt)
    assert os.path.exists(p) and p.endswith(".png")  # ref always writes .png


def test_overlay_reference_stamp_semantics():
    """Pixel semantics of the reference's contour stamping
    (utils.py:148-211): ~3 px lines from the 7-point stamp, pred borders
    zeroed, GT fill-holed, draw order green -> blue -> red."""
    from ramdsir_tpu.utils.viz import _contour_points

    # a 1-pixel mask at (5,5): 4 crossings -> points (5,4.5),(5,5.5),
    # (4.5,5),(5.5,5); stamped set = the 3x3 block around it plus the
    # truncation corners the reference's +-1 offsets reach
    m = np.zeros((12, 12), bool)
    m[5, 5] = True
    pts = _contour_points(m)
    assert len(pts) == 4
    img = np.zeros((12, 12, 3), np.uint8)
    out = overlay_contours(img, pred=m.astype(float))
    stamped = set(zip(*np.nonzero((out == [0, 255, 0]).all(-1))))
    want = set()
    for p in [(5.0, 4.5), (5.0, 5.5), (4.5, 5.0), (5.5, 5.0)]:
        for dr, dc in ((0, 0), (1, 0), (1, 1), (0, 1), (-1, 0), (-1, -1), (0, -1)):
            want.add((int(p[0] + dr), int(p[1] + dc)))
    assert stamped == want

    # pred border zeroing: a mask touching the frame still closes its contour
    edge = np.zeros((12, 12), bool)
    edge[0:4, 0:4] = True
    out = overlay_contours(img, pred=edge.astype(float))
    assert (out == [0, 255, 0]).all(-1).any()

    # GT fill-hole: a hollow GT square draws NO inner red ring
    hollow = np.zeros((16, 16), bool)
    hollow[3:13, 3:13] = True
    hollow[6:10, 6:10] = False
    solid = np.zeros((16, 16), bool)
    solid[3:13, 3:13] = True
    out_h = overlay_contours(np.zeros((16, 16, 3), np.uint8), gt=hollow)
    out_s = overlay_contours(np.zeros((16, 16, 3), np.uint8), gt=solid)
    np.testing.assert_array_equal(out_h, out_s)

    # precedence: overlapping pred channels -> channel 0 (blue, drawn
    # second) wins over channel 1 (green) like the reference's loop order
    both = np.zeros((2, 16, 16), bool)
    both[0, 4:12, 4:12] = True
    both[1, 4:12, 4:12] = True
    out = overlay_contours(np.zeros((16, 16, 3), np.uint8), pred=both)
    assert (out == [0, 0, 255]).all(-1).any()
    assert not (out == [0, 255, 0]).all(-1).any()

    probs = np.random.default_rng(0).dirichlet([1, 1], size=(16, 16))
    ent = entropy_map(probs)
    assert ent.shape == (16, 16) and (ent >= 0).all()
    heat = construct_color_img(ent)
    assert heat.shape == (16, 16, 3)


def test_contour_is_thin():
    m = np.zeros((16, 16), bool)
    m[4:12, 4:12] = True
    c = mask_contour(m)
    assert c.sum() == 8 * 4 - 4  # perimeter cells


def test_untransforms():
    x = np.array([-1.0, 0.0, 1.0])
    np.testing.assert_allclose(untransform(x), [0, 127.5, 255])
    y = untransform_prostate(np.array([2.0, 4.0]))
    np.testing.assert_allclose(y, [0, 255])


def test_graft_entry_single_chip_small():
    """entry() compiles; use tiny input to keep CPU time sane."""
    import __graft_entry__ as ge

    fwd, (params, stats, img) = ge.entry()
    small = np.asarray(img)[:2, :32, :32, :]
    out = jax.jit(fwd)(params, stats, small)
    assert out.shape == (2, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
