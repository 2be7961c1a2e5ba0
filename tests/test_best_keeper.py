"""BestKeeper keep-best semantics (reference code/train.py:336-361).

The reference replaces on `avg_dice >= previous_best` (train.py:337): ties
REWRITE the best file with the newer model, and the very first eval always
saves because previous_best starts at 0.0.  PARITY.md #8.
"""
import os

import jax
import jax.numpy as jnp
import pytest

from ramdsir_tpu.train.checkpoint import BestKeeper, load_checkpoint
from ramdsir_tpu.train.state import TrainState


def _state(step: int) -> TrainState:
    return TrainState(
        params={"w": jnp.full((2,), float(step))},
        batch_stats={},
        opt_state={"m": jnp.zeros((2,))},
        step=jnp.int32(step),
    )


def test_first_eval_always_saves(tmp_path):
    keeper = BestKeeper(str(tmp_path))
    assert keeper.update(0.0, _state(1)) is True
    assert os.path.exists(os.path.join(tmp_path, "model_0.00.ckpt"))


def test_tie_resaves_newer_model(tmp_path):
    keeper = BestKeeper(str(tmp_path))
    keeper.update(0.5, _state(1))
    # tie: the reference's >= rewrites the best file with the NEWER state
    assert keeper.update(0.5, _state(2)) is True
    st, _ = load_checkpoint(
        os.path.join(tmp_path, "model_0.50.ckpt"), _state(0)
    )
    assert int(st.step) == 2
    # regression: strictly worse is rejected
    assert keeper.update(0.4, _state(3)) is False
    assert keeper.best == pytest.approx(0.5)


def test_best_is_weights_only_and_loads(tmp_path):
    """Rolling-best checkpoints store weights+stats only (the reference's
    model_*.pth content — no Adam moments, 3x fewer d2h bytes); loading one
    keeps the template's fresh optimizer state."""
    keeper = BestKeeper(str(tmp_path))
    st = _state(7)
    st = st.replace(opt_state={"m": jnp.full((2,), 9.0)})
    keeper.update(0.9, st)
    template = _state(0)
    loaded, _ = load_checkpoint(os.path.join(tmp_path, "model_0.90.ckpt"), template)
    assert int(loaded.step) == 7
    assert float(loaded.params["w"][0]) == 7.0
    # optimizer state falls back to the template's (fresh) moments
    assert float(loaded.opt_state["m"][0]) == 0.0
    # the file is actually smaller than a full save
    from ramdsir_tpu.train.checkpoint import save_checkpoint

    full = os.path.join(tmp_path, "full.ckpt")
    save_checkpoint(full, st)
    assert os.path.getsize(os.path.join(tmp_path, "model_0.90.ckpt")) < os.path.getsize(full)


def test_resume_adoption_sorts_numerically(tmp_path):
    # lexicographic sort would adopt model_9.50 over model_12.00
    for score in (9.5, 12.0):
        BestKeeper(str(tmp_path))  # ensure dir
        path = os.path.join(tmp_path, "model_%.2f.ckpt" % score)
        from ramdsir_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(path, _state(int(score)))
    keeper = BestKeeper(str(tmp_path))
    assert keeper.best == pytest.approx(12.0)
    assert keeper._best_path.endswith("model_12.00.ckpt")
