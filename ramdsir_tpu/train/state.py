"""Train state: parameters, BN statistics, Adam state, step counter.

The reference's mutable torch modules + optimizer (code/train.py:568-587)
become one immutable pytree; the whole step is a pure function of it.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ramdsir_tpu.config import TrainConfig
from ramdsir_tpu.models import Decoder, Encoder, RecDecoder

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8  # train.py:573-587


@struct.dataclass
class TrainState:
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def build_models(cfg: TrainConfig) -> Dict[str, Any]:
    """Encoder/Decoder/RecDecoder instances (train.py:568-572)."""
    s2d = cfg.s2d_levels if cfg.norm in ("bn", "dsbn") else 0
    models = {
        "encoder": Encoder(
            c=cfg.in_channels, norm=cfg.norm, activation=cfg.activation, s2d_levels=s2d
        ),
        "seg_decoder": Decoder(
            num_classes=cfg.num_classes, norm=cfg.norm, activation=cfg.activation,
            s2d_levels=s2d,
        ),
    }
    if cfg.rec:
        models["rec_decoder"] = RecDecoder(
            num_classes=cfg.in_channels,
            norm="dsbn",
            activation=cfg.activation,
            num_domains=cfg.num_domains,
            s2d_levels=s2d,
        )
    return models


def adam_optimizer() -> optax.GradientTransformation:
    """Adam core (direction only; LR and param-group factors are applied in
    the train step so the poly schedule and the encoder lr/2 group exactly
    mirror train.py:289-296)."""
    return optax.scale_by_adam(b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS)


def init_state(
    cfg: TrainConfig,
    rng: jax.Array,
    image_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    h = w = cfg.image_size
    if image_hw is not None:
        h, w = image_hw
    models = build_models(cfg)

    # One jitted program for the whole init: eager flax init dispatches
    # hundreds of tiny ops, which is pathological on high-latency device
    # transports (and slow everywhere).
    def _init_all(rng):
        keys = jax.random.split(rng, 3)
        x = jnp.zeros((1, h, w, cfg.in_channels), jnp.float32)
        enc_vars = models["encoder"].init(keys[0], x, train=False)
        feats = models["encoder"].apply(enc_vars, x, train=False)
        seg_vars = models["seg_decoder"].init(keys[1], feats, train=False)
        out = {"encoder": enc_vars, "seg_decoder": seg_vars}
        if cfg.rec:
            out["rec_decoder"] = models["rec_decoder"].init(
                keys[2], feats[-1], domain=jnp.int32(0), train=False
            )
        return out

    all_vars = jax.jit(_init_all)(rng)
    params = {k: v["params"] for k, v in all_vars.items()}
    batch_stats = {k: v.get("batch_stats", {}) for k, v in all_vars.items()}

    opt_state = adam_optimizer().init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return state, models
