"""NN helper grab-bag — counterpart of the reference's utils/nn_utils.py.

The reference ships these unused by its entry points (SURVEY.md §2 #13);
they are provided for API completeness, re-expressed functionally:
  * get_probability / get_prediction (:12-26, :96-115)
  * to_one_hot (:29-45), make_same_size (:48-59)
  * Timer (:118-149) -> see also utils.profiler.StepTimer
  * mkdir (:152-175), get_logger (:213-233)
  * MAML-style put_theta/get_updated_network (:178-210): in JAX a
    fast-weights step is just a tree_map over params — `sgd_fast_weights`.
  * all_reduce/all_gather (:246-258): real collectives live in jitted code
    as jax.lax.psum/all_gather over the mesh axis (see parallel.mesh);
    thin host-side wrappers are provided here for eager use.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp


def get_probability(logits: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid for single-channel/multilabel, softmax otherwise (NHWC)."""
    if logits.shape[-1] <= 2:
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=-1)


def get_prediction(probs: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Hard labels from probabilities: threshold if multilabel, else argmax."""
    if probs.ndim == 4 and probs.shape[-1] == 2:
        return (probs > threshold).astype(jnp.int32)
    return jnp.argmax(probs, axis=-1).astype(jnp.int32)


def to_one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(..., ) int -> (..., C) one-hot float."""
    return jax.nn.one_hot(labels, num_classes)


def make_same_size(x: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-resize NHWC `x` to the spatial size of `reference`."""
    b, h, w, c = x.shape[0], reference.shape[1], reference.shape[2], x.shape[-1]
    return jax.image.resize(x, (b, h, w, c), method="bilinear")


def sgd_fast_weights(params, grads, lr: float):
    """MAML-style inner update: theta' = theta - lr * grad (functional)."""
    return jax.tree.map(lambda p, g: p - lr * g, params, grads)


def all_reduce_mean(x, axis_name: str = "data"):
    """Inside shard_map/jit: mean over the mesh axis."""
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "data"):
    """Inside shard_map/jit: gather shards along a new leading axis."""
    return jax.lax.all_gather(x, axis_name)


class Timer:
    """Context-manager wall timer (reference Timer semantics)."""

    def __init__(self, name: str = "", verbose: bool = False):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[{self.name}] {self.elapsed:.4f}s")
        return False


def mkdir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def get_logger(name: str, log_file: Optional[str] = None, level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger
