"""Import PyTorch HydraNet checkpoints into hydranet_tpu variable pytrees.

Equivalent capability to the reference's checkpoint loading with
`deparallel_model` DDP-prefix stripping (/root/reference/model/train.py:96-126,
demo.py:42-50), plus cross-framework tensor layout conversion:

- conv weights: torch OIHW -> flax HWIO (works for grouped/depthwise too)
- batchnorm: weight/bias -> scale/bias, running_mean/var -> batch_stats
- per-task overlay merge (load lane, then seg, then det last so its backbone
  wins — train.py:111-126) is supported by calling `import_state_dict` with
  `strict=False` repeatedly.

The importer translates flax variable paths to reference state_dict keys via
pattern rules, so it doubles as the golden-parity bridge used by tests/.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Mapping, Tuple

import numpy as np


def deparallel_state_dict(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip the leading component (e.g. 'module.') from every key —
    reference train.py:96-104."""
    return {".".join(k.split(".")[1:]): v for k, v in state.items()}


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


# --- flax path -> torch key translation -------------------------------------

def _translate_backbone(parts: Tuple[str, ...]) -> Tuple[str, str]:
    """('stem'|'stage_i', ...) under the backbone module."""
    head, rest = parts[0], parts[1:]
    if head == "stem":
        # stem/conv/kernel ; stem/bn/bn/{scale,bias,mean,var}
        if rest[0] == "conv":
            return "net.stem.conv.weight", "conv"
        return f"net.stem.bn.{_bn_leaf(rest[-1])}", "bn"
    m = re.fullmatch(r"stage_(\d+)", head)
    stage = m.group(1)
    block = rest[0]  # block_j
    sub = rest[1:]
    base = f"net.stage_{stage}.blocks.{block}"
    name = sub[0]
    leaf = sub[-1]
    if name in ("conv1", "conv2", "conv3"):
        idx = {"conv1": 1, "conv2": 2, "conv3": 3}[name]
        return f"{base}.conv_block_{idx}.0.weight", "conv"
    if name in ("bn1", "bn2", "bn3"):
        idx = {"bn1": 1, "bn2": 2, "bn3": 3}[name]
        return f"{base}.conv_block_{idx}.1.{_bn_leaf(leaf)}", "bn"
    if name == "se_fc1":
        return f"{base}.se.1.{'weight' if leaf == 'kernel' else 'bias'}", "conv"
    if name == "se_fc2":
        return f"{base}.se.3.{'weight' if leaf == 'kernel' else 'bias'}", "conv"
    if name == "shortcut_conv":
        return f"{base}.shortcut.0.weight", "conv"
    if name == "shortcut_bn":
        return f"{base}.shortcut.1.{_bn_leaf(leaf)}", "bn"
    raise KeyError(parts)


def _bn_leaf(leaf: str) -> str:
    return {
        "scale": "weight",
        "bias": "bias",
        "mean": "running_mean",
        "var": "running_var",
    }[leaf]


def _translate_sepconv(prefix: str, sub: Tuple[str, ...]) -> Tuple[str, str]:
    """SeparableConvBlock paths: depthwise_conv/conv/kernel,
    pointwise_conv/conv/{kernel,bias}, norm/bn/..."""
    name, leaf = sub[0], sub[-1]
    if name == "depthwise_conv":
        return f"{prefix}.depthwise_conv.conv.weight", "conv"
    if name == "pointwise_conv":
        return (f"{prefix}.pointwise_conv.conv."
                f"{'weight' if leaf == 'kernel' else 'bias'}", "conv")
    if name == "norm":
        return f"{prefix}.bn.{_bn_leaf(leaf)}", "bn"
    raise KeyError((prefix, sub))


def _translate_downchannel(prefix: str, sub: Tuple[str, ...]) -> Tuple[str, str]:
    """_DownChannel paths: conv/conv/{kernel,bias}, bn/bn/..."""
    name, leaf = sub[0], sub[-1]
    if name == "conv":
        return f"{prefix}.0.conv.{'weight' if leaf == 'kernel' else 'bias'}", "conv"
    if name == "bn":
        return f"{prefix}.1.{_bn_leaf(leaf)}", "bn"
    raise KeyError((prefix, sub))


def _translate_neck(parts: Tuple[str, ...]) -> Tuple[str, str]:
    m = re.fullmatch(r"cell_(\d+)", parts[0])
    base = f"bifpn.{m.group(1)}"
    name = parts[1]
    sub = parts[2:]
    if re.fullmatch(r"conv\d_(up|down)", name):
        return _translate_sepconv(f"{base}.{name}", sub)
    if name.endswith("down_channel") or name.endswith("down_channel_2"):
        return _translate_downchannel(f"{base}.{name}", sub)
    if name == "p5_to_p6":
        return _translate_downchannel(f"{base}.p5_to_p6", sub)
    if re.fullmatch(r"p\d_w[12]", name):
        return f"{base}.{name}", "vec"
    raise KeyError(parts)


def _translate_detect(parts: Tuple[str, ...]) -> Tuple[str, str]:
    tower = parts[0]  # regressor | classifier
    name = parts[1]
    sub = parts[2:]
    m = re.fullmatch(r"conv_(\d+)", name)
    if m:
        return _translate_sepconv(f"{tower}.conv_list.{m.group(1)}", sub)
    m = re.fullmatch(r"bn_(\d+)_(\d+)", name)
    if m:
        return (f"{tower}.bn_list.{m.group(1)}.{m.group(2)}."
                f"{_bn_leaf(sub[-1])}", "bn")
    if name == "header":
        return _translate_sepconv(f"{tower}.header", sub)
    raise KeyError(parts)


def _translate_seg(parts: Tuple[str, ...]) -> Tuple[str, str]:
    m = re.fullmatch(r"decoder_(\d+)", parts[0])
    idx = int(m.group(1))
    leaf = parts[-1]
    is_output = parts[1] == "conv" and len(parts) == 3  # Conv3x3 directly
    if is_output:
        return f"decoder.{idx}.conv.{'weight' if leaf == 'kernel' else 'bias'}", "conv"
    # ConvBlock: conv/conv/{kernel,bias}
    return f"decoder.{idx}.conv.conv.{'weight' if leaf == 'kernel' else 'bias'}", "conv"


def _translate_lane(parts: Tuple[str, ...]) -> Tuple[str, str]:
    towers = {"cls": "conv_cls_conv", "up": "conv_up_conv", "down": "conv_down_conv"}
    m = re.fullmatch(r"(cls|up|down)_(conv1|bn|conv2)", parts[0])
    tower = towers[m.group(1)]
    which = m.group(2)
    leaf = parts[-1]
    if which == "conv1":
        return f"{tower}.0.weight", "conv"
    if which == "bn":
        return f"{tower}.1.{_bn_leaf(leaf)}", "bn"
    return f"{tower}.3.{'weight' if leaf == 'kernel' else 'bias'}", "conv"


def translate_path(parts: Tuple[str, ...]) -> Tuple[str, str]:
    """Translate a flax variable path (without the params/batch_stats
    collection prefix) into (torch state_dict key, kind)."""
    head = parts[0]
    if head == "backbone":
        key, kind = _translate_backbone(parts[1:])
        return f"backbone.{key}", kind
    if head == "neck":
        key, kind = _translate_neck(parts[1:])
        return f"neck.{key}", kind
    if head == "detectheader":
        key, kind = _translate_detect(parts[1:])
        return f"detectheader.{key}", kind
    if head == "segheader":
        key, kind = _translate_seg(parts[1:])
        return f"segheader.{key}", kind
    if head == "laneheader":
        key, kind = _translate_lane(parts[1:])
        return f"laneheader.{key}", kind
    # Bare sub-module trees (tests drive single components): try each family.
    for fn in (_translate_backbone, _translate_neck, _translate_detect,
               _translate_seg, _translate_lane):
        try:
            return fn(parts)
        except (KeyError, AttributeError, IndexError):
            continue
    raise KeyError(parts)


def import_state_dict(variables: Mapping[str, Any],
                      state_dict: Mapping[str, Any],
                      strict: bool = True) -> Dict[str, Any]:
    """Produce a new flax variables dict with tensors taken from a reference
    PyTorch state_dict. With strict=False, flax leaves missing from the
    state_dict keep their current values (overlay merge, train.py:111-126)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(dict(variables))[0]
    treedef = jax.tree_util.tree_structure(dict(variables))
    new_leaves = []
    used = set()
    for path, leaf in flat:
        parts = tuple(p.key for p in path)
        try:
            key, kind = translate_path(parts[1:])  # drop collection name
        except KeyError:
            if strict:
                raise
            new_leaves.append(leaf)
            continue
        if key not in state_dict:
            if strict:
                raise KeyError(f"{key} (for flax path {parts}) not in state_dict")
            new_leaves.append(leaf)
            continue
        w = _to_numpy(state_dict[key])
        used.add(key)
        if kind == "conv" and w.ndim == 4:
            w = _conv_to_flax(w)
        if w.shape != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {key}: torch {w.shape} vs "
                             f"flax {np.shape(leaf)} at {parts}")
        new_leaves.append(w.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint and strip any DDP prefix."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if any(k.startswith("module.") for k in state):
        state = {k[len("module."):]: v for k, v in state.items()}
    return state
