"""Torch checkpoint interchange.

Converts between this framework's flax parameter pytrees (NHWC, kernels
(kh, kw, in, out)) and the reference's torch state dicts
(`{encoder,seg_decoder,rec_decoder}_state_dict` with NCHW kernels
(out, in, kh, kw)) — the format written at code/train.py:343-349 and read
by the eval CLIs (test_fundus_slice.py:67-70).  This lets reference-trained
checkpoints be evaluated here (and vice versa) for numerical parity checks.

Loading torch .pth files requires the baked-in CPU torch; saving uses plain
numpy and can be read with torch.load(..., weights_only=True) == False via
pickle of numpy arrays (we write torch tensors when torch is available).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


# flax auto-names norm submodules by class; a param path containing one of
# these parts belongs to a norm layer, everything else is a conv.  This is a
# STRUCTURAL check (module-class prefixes on whole path parts), not a
# substring match — a conv field named e.g. `bn_adapter` can't misroute.
_NORM_MODULE_PREFIXES = (
    "BatchNorm",
    "DomainSpecificBatchNorm",
    "GroupNorm",
    "InstanceNorm",
    "LayerNorm",
)


def _is_norm_path(parts) -> bool:
    return any(p.startswith(_NORM_MODULE_PREFIXES) for p in parts)


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _set_path(tree: Dict, path: str, value) -> None:
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def flax_module_to_torch_sd(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """One module's {params, batch_stats} -> torch-style state dict."""
    sd: Dict[str, np.ndarray] = {}
    flat = _flatten(params)
    for path, arr in flat.items():
        parts = path.split(".")
        if parts[-1] == "kernel":  # conv: (kh,kw,in,out) -> (out,in,kh,kw)
            name = ".".join(parts[:-1]) + ".weight"
            sd[name] = arr.transpose(3, 2, 0, 1)
        elif parts[-1] == "bias" and not _is_norm_path(parts):
            sd[".".join(parts[:-1]) + ".bias"] = arr
        elif parts[-1] in ("scale", "bias"):
            # norm affine: flax 'bn1.BatchNorm_0.scale' -> torch 'bn1.weight'
            base = [p for p in parts[:-1] if not p.startswith(_NORM_MODULE_PREFIXES)]
            suffix = "weight" if parts[-1] == "scale" else "bias"
            if "DomainSpecificBatchNorm" in path:
                for d in range(arr.shape[0]):
                    sd[".".join(base) + f".bns.{d}.{suffix}"] = arr[d]
            else:
                sd[".".join(base) + f".{suffix}"] = arr
        else:
            sd[path] = arr
    for path, arr in _flatten(batch_stats).items():
        parts = path.split(".")
        base = [p for p in parts[:-1] if not p.startswith(_NORM_MODULE_PREFIXES)]
        suffix = "running_mean" if parts[-1] == "mean" else "running_var"
        if "DomainSpecificBatchNorm" in path:
            for d in range(arr.shape[0]):
                sd[".".join(base) + f".bns.{d}.{suffix}"] = arr[d]
        else:
            sd[".".join(base) + f".{suffix}"] = arr
    return sd


def torch_sd_to_flax(sd: Dict[str, Any], params_template: Dict, stats_template: Dict):
    """torch state dict -> (params, batch_stats) matching the templates."""
    flat_p = _flatten(params_template)
    flat_s = _flatten(stats_template)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    new_p: Dict = {}
    new_s: Dict = {}
    for path, arr in flat_p.items():
        parts = path.split(".")
        if parts[-1] == "kernel":
            t = sd[".".join(parts[:-1]) + ".weight"]
            _set_path(new_p, path, t.transpose(2, 3, 1, 0).astype(arr.dtype))
        elif parts[-1] in ("scale", "bias") and _is_norm_path(parts):
            base = [p for p in parts[:-1] if not p.startswith(_NORM_MODULE_PREFIXES)]
            suffix = "weight" if parts[-1] == "scale" else "bias"
            if "DomainSpecificBatchNorm" in path:
                banks = [sd[".".join(base) + f".bns.{d}.{suffix}"] for d in range(arr.shape[0])]
                _set_path(new_p, path, np.stack(banks).astype(arr.dtype))
            else:
                _set_path(new_p, path, sd[".".join(base) + f".{suffix}"].astype(arr.dtype))
        else:
            _set_path(new_p, path, sd[path].astype(arr.dtype))
    for path, arr in flat_s.items():
        parts = path.split(".")
        base = [p for p in parts[:-1] if not p.startswith(_NORM_MODULE_PREFIXES)]
        suffix = "running_mean" if parts[-1] == "mean" else "running_var"
        if "DomainSpecificBatchNorm" in path:
            banks = [sd[".".join(base) + f".bns.{d}.{suffix}"] for d in range(arr.shape[0])]
            _set_path(new_s, path, np.stack(banks).astype(arr.dtype))
        else:
            _set_path(new_s, path, sd[".".join(base) + f".{suffix}"].astype(arr.dtype))
    return new_p, new_s


def export_torch_checkpoint(path: str, state, with_rec: bool = True) -> None:
    """Write the reference's checkpoint format (torch tensors when available)."""
    payload = {}
    names = ["encoder", "seg_decoder"] + (["rec_decoder"] if with_rec and "rec_decoder" in state.params else [])
    for name in names:
        payload[f"{name}_state_dict"] = flax_module_to_torch_sd(
            state.params[name], state.batch_stats.get(name, {})
        )
    try:
        import torch

        payload = {
            k: {kk: torch.from_numpy(np.ascontiguousarray(vv)) for kk, vv in v.items()}
            for k, v in payload.items()
        }
        torch.save(payload, path)
    except ImportError:  # pragma: no cover
        import pickle

        with open(path, "wb") as f:
            pickle.dump(payload, f)


def import_torch_checkpoint(path: str, state):
    """Load a reference-format .pth into a TrainState (params+stats only)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    new_params = dict(state.params)
    new_stats = dict(state.batch_stats)
    for name in list(new_params):
        key = f"{name}_state_dict"
        if key not in payload:
            continue
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in payload[key].items()}
        p, s = torch_sd_to_flax(sd, new_params[name], new_stats.get(name, {}))
        new_params[name] = p
        new_stats[name] = s
    return state.replace(params=new_params, batch_stats=new_stats)
