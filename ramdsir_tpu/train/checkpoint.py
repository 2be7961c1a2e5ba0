"""Checkpointing: keep-best + final artifacts, full resume.

Contract-parity with the reference (code/train.py:337-361): a rolling best
checkpoint named `model_<dice>.ckpt` (previous best deleted) plus
`final_model.ckpt`.  Improvement over the reference: optimizer state and
the step counter are saved too, so training RESUMES exactly (the reference
can only restart from scratch — SURVEY.md §5).

Format: flax msgpack of the whole TrainState pytree + a small JSON header.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import serialization

from ramdsir_tpu.train.state import TrainState


def save_checkpoint(
    path: str,
    state: TrainState,
    meta: Optional[Dict[str, Any]] = None,
    weights_only: bool = False,
) -> None:
    """weights_only drops the Adam moments (2/3 of the state's bytes) —
    the content the reference's rolling-best `model_*.pth` actually stores
    (train.py:337-349 saves module state_dicts, never the optimizer).  On
    relay-tunneled devices the d2h pull is the dominant save cost (~45 MB
    full state at ~0.3 MB/s), so the rolling best saves 3x faster; the
    final/resume checkpoint keeps the full state."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    sd = serialization.to_state_dict(
        state.replace(opt_state=()) if weights_only else state
    )
    if weights_only:
        sd.pop("opt_state", None)
    payload = {"state": jax.device_get(sd), "meta": meta or {}}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str, template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    sd = payload["state"]
    if "opt_state" not in sd or sd["opt_state"] in ((), {}, None):
        # weights-only checkpoint (rolling best, reference .pth content):
        # keep the template's (fresh) optimizer state
        sd = dict(sd, opt_state=serialization.to_state_dict(template.opt_state))
    state = serialization.from_state_dict(template, sd)
    # msgpack may round-trip the step as numpy; keep it a jnp scalar
    state = state.replace(step=jnp.asarray(state.step, jnp.int32))
    return state, payload.get("meta", {})


def load_any_checkpoint(path: str, template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    """Load either a native .ckpt or a reference torch .pth checkpoint.

    The reference eval scripts consume `{encoder,seg_decoder}_state_dict`
    .pth files (test_fundus_slice.py:67-70); routing .pth through the
    weight-interchange layer lets the eval CLIs score reference-trained
    checkpoints directly for parity runs.
    """
    if path.endswith((".pth", ".pt")):
        from ramdsir_tpu.utils.torch_compat import import_torch_checkpoint

        return import_torch_checkpoint(path, template), {}
    return load_checkpoint(path, template)


class BestKeeper:
    """Keep-best-delete-previous + final (train.py:337-361)."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        self.best: float = 0.0
        self._best_path: Optional[str] = None
        os.makedirs(save_dir, exist_ok=True)
        # resume awareness: adopt an existing best file if present (numeric
        # sort on the embedded score — lexicographic would rank 9.50 > 12.00)
        scored = []
        for p in glob.glob(os.path.join(save_dir, "model_*.ckpt")):
            try:
                scored.append((float(os.path.basename(p)[6:-5]), p))
            except ValueError:
                pass
        if scored:
            self.best, self._best_path = max(scored)

    def update(self, score: float, state: TrainState, meta: Optional[Dict] = None) -> bool:
        # reference train.py:337 replaces on `avg_dice >= previous_best`:
        # ties REWRITE the best file with the newer model, and the first
        # eval always saves (previous_best starts 0.0).  PARITY.md #8.
        if score < self.best:
            return False
        if self._best_path and os.path.exists(self._best_path):
            os.remove(self._best_path)
        self._best_path = os.path.join(self.save_dir, "model_%.2f.ckpt" % score)
        # rolling best = weights + BN stats, like the reference's .pth
        # (no optimizer moments) — 3x fewer d2h bytes per save
        save_checkpoint(self._best_path, state, meta, weights_only=True)
        self.best = score
        return True

    def save_final(self, state: TrainState, meta: Optional[Dict] = None) -> str:
        path = os.path.join(self.save_dir, "final_model.ckpt")
        save_checkpoint(path, state, meta)
        return path


def save_run_config(save_dir: str, cfg_dict: Dict[str, Any]) -> None:
    """Provenance snapshot — the reference copies its whole source tree
    (train.py:534-536); we record the resolved config + package version."""
    os.makedirs(save_dir, exist_ok=True)
    import ramdsir_tpu

    with open(os.path.join(save_dir, "run_config.json"), "w") as f:
        json.dump({"version": ramdsir_tpu.__version__, "config": cfg_dict}, f, indent=2, default=str)
