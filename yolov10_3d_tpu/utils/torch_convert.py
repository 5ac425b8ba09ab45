"""Torch-checkpoint -> flax pytree weight converter.

The reference saves full pickled nn.Modules (trainer.py:514-541); its
state_dict names are dotted module paths like ``model.6.m.0.cv1.conv.weight``.
Our flax modules are named so that a flax parameter path, joined with ``_``,
equals the torch prefix with dots replaced by underscores — so conversion is a
pure dictionary re-keying plus layout transposes:

    conv weight  (O, I/g, kH, kW)  ->  kernel (kH, kW, I/g, O)
    linear weight (O, I)           ->  kernel (I, O)
    bn weight/bias                 ->  params/.../bn/{scale,bias}
    bn running_mean/var            ->  batch_stats/.../bn/{mean,var}

DFL projection weights (block.py:44 — a frozen arange) are dropped: our decode
is the closed-form expectation (nn/modules.py dfl_decode).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import numpy as np


def _normalize(key: str) -> Tuple[str, str]:
    """Split a torch state_dict key into (normalized prefix, leaf name)."""
    parts = key.split(".")
    return "_".join(parts[:-1]), parts[-1]


def index_torch_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Group state_dict entries by normalized module prefix."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        prefix, leaf = _normalize(k)
        out.setdefault(prefix, {})[leaf] = np.asarray(v)
    return out


def convert_torch_state_dict(
    sd: Mapping[str, np.ndarray], variables: Mapping[str, Any], strict: bool = True
) -> Dict[str, Any]:
    """Fill a flax `variables` tree ({'params': ..., 'batch_stats': ...}) from a
    torch state_dict (values as numpy arrays). Returns a new tree.

    strict=True raises if a flax leaf has no torch counterpart or shapes
    mismatch (DFL-style frozen buffers on the torch side are ignored);
    strict=False keeps the flax leaf for ANY missing module, missing leaf,
    or shape mismatch (lenient partial load — review finding: the flag
    previously only tolerated missing modules) and logs unconsumed torch
    keys at the end.
    """
    idx = index_torch_state_dict(sd)
    used = set()

    class _Lenient(Exception):
        pass

    def fill(tree, path, collection):
        if not isinstance(tree, Mapping):
            prefix = "_".join(path[:-1])
            leaf = path[-1]
            mod = idx.get(prefix)
            if mod is None:
                if strict:
                    raise KeyError(f"no torch module for flax path {'/'.join(path)}")
                return tree
            if not strict:
                try:
                    return _fill_leaf(tree, prefix, leaf, mod, collection)
                except (KeyError, ValueError):
                    return tree  # lenient: keep the flax init for this leaf
            return _fill_leaf(tree, prefix, leaf, mod, collection)
        return {k: fill(v, path + (k,), collection) for k, v in tree.items()}

    def _fill_leaf(tree, prefix, leaf, mod, collection):
        if True:
            if collection == "params":
                if leaf in ("in_proj_weight", "in_proj_bias"):
                    # torch nn.MultiheadAttention fused projections are stored
                    # as leaves on the attention module itself; our
                    # MultiheadAttention uses the identical (3d, d) layout
                    w = mod[leaf]
                    used.add(prefix + "." + leaf)
                elif leaf == "kernel":
                    w = mod["weight"]
                    used.add(prefix + ".weight")
                    if w.ndim == 4:
                        w = w.transpose(2, 3, 1, 0)
                    elif w.ndim == 2:
                        w = w.transpose(1, 0)
                elif leaf == "scale":
                    w = mod["weight"]
                    used.add(prefix + ".weight")
                elif leaf == "bias":
                    w = mod["bias"]
                    used.add(prefix + ".bias")
                elif leaf == "embedding":
                    # flax nn.Embed <- torch nn.Embedding.weight, same layout
                    w = mod["weight"]
                    used.add(prefix + ".weight")
                elif leaf in mod:
                    # verbatim leaf parameters/buffers (SAM rel_pos_h/w,
                    # pos_embed, positional_encoding_gaussian_matrix, ...)
                    w = mod[leaf]
                    used.add(prefix + "." + leaf)
                else:
                    raise KeyError(f"unknown param leaf {leaf} at {prefix}")
            else:  # batch_stats
                name = {"mean": "running_mean", "var": "running_var"}[leaf]
                w = mod[name]
                used.add(prefix + "." + name)
            if tuple(w.shape) != tuple(tree.shape):
                raise ValueError(
                    f"shape mismatch at {prefix}.{leaf}: torch {w.shape} vs flax {tree.shape}"
                )
            return jax.numpy.asarray(w, dtype=tree.dtype)

    out = {}
    for coll, tree in variables.items():
        out[coll] = fill(tree, (), coll)
    # the used-set exists to REPORT unconsumed torch keys (it was dead —
    # review finding): typo'd prefixes / extra buffers surface instead of
    # silently vanishing
    # compare in the normalized (prefix.leaf) key space `used` records in
    leftover = {
        k for k in sd
        if "num_batches_tracked" not in k
        and ".dfl." not in k  # frozen arange projection, dropped by design
        # (module docstring) — whitelist it so the warning stays meaningful
        and ".".join(_normalize(k)) not in used
    }
    if leftover:
        from . import LOGGER

        LOGGER.warning(
            f"{len(leftover)} torch keys not consumed by the conversion "
            f"(first few): {sorted(leftover)[:5]}"
        )
    return out


def graft_backbone(
    target_vars: Mapping[str, Any], source_vars: Mapping[str, Any], head_index: int
) -> Dict[str, Any]:
    """Copy every non-head layer's weights from a pretrained model into a new
    one (reference yolov10_3D/train.py:50-62: the 3D trainer grafts a COCO
    YOLOv10 backbone into all layers except the 3D head). Layers are matched
    by name (model_i) and leaf shape; mismatches keep the target init."""
    import jax

    head_key = f"model_{head_index}"

    def merge(dst, src):
        if not isinstance(dst, Mapping):
            if (
                src is not None
                and hasattr(src, "shape")
                and tuple(src.shape) == tuple(dst.shape)
            ):
                return jax.numpy.asarray(src, dtype=dst.dtype)
            return dst
        out = {}
        for k, v in dst.items():
            out[k] = merge(v, src.get(k) if isinstance(src, Mapping) else None)
        return out

    result = {}
    for coll, tree in target_vars.items():
        src_tree = source_vars.get(coll, {})
        out = {}
        for layer_name, sub in tree.items():
            if layer_name == head_key or layer_name not in src_tree:
                out[layer_name] = sub
            else:
                out[layer_name] = merge(sub, src_tree[layer_name])
        result[coll] = out
    return result


def unconverted_keys(sd: Mapping[str, np.ndarray], variables: Mapping[str, Any]):
    """Diagnostic: torch keys that would not be consumed by conversion."""
    idx = index_torch_state_dict(sd)
    flax_prefixes = set()

    def walk(tree, path):
        if not isinstance(tree, Mapping):
            flax_prefixes.add("_".join(path[:-1]))
            return
        for k, v in tree.items():
            walk(v, path + (k,))

    for tree in variables.values():
        walk(tree, ())
    missing = [p for p in idx if p not in flax_prefixes]
    return missing
