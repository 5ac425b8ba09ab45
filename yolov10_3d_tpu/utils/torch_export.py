"""Flax pytree -> torch-checkpoint weight converter (the reverse of
``torch_convert.py``).

Lets a model trained HERE hand its weights back to the reference stack: the
exported ``.pt`` holds a reference-compatible ``state_dict`` (dotted module
paths, OIHW conv layout, BN running stats + num_batches_tracked, the frozen
DFL arange, and the v10Detect3d ``o2o_heads.*`` alias keys) so a reference
user can do ``YOLO('yolov10s.yaml'); model.model.load_state_dict(sd)``
(reference tasks.py:811 ``attempt_load_one_weight`` consumes full pickled
modules; state_dict + YAML is the unpickle-free equivalent and what the
parity recipe tools/parity_run.py diffs against).

Name reconstruction: a flax path joined with ``_`` equals the torch dotted
path with ``.`` -> ``_`` (see torch_convert.py docstring). The reverse split
is ambiguous only for torch attribute names that CONTAIN underscores, so we
re-merge tokens greedily against the known multi-token atoms of the
supported model families (v3/v5/v6/v8/v9/v10 YAMLs + v10-3D + RT-DETR heads).
Key-exactness is pinned against the reference oracle in
tests/test_torch_export.py.

Layout transforms (inverse of torch_convert.py):
    kernel (kH, kW, I/g, O) -> weight (O, I/g, kH, kW)
    kernel (I, O)           -> weight (O, I)
    scale/bias              -> weight/bias
    batch_stats mean/var    -> running_mean/running_var (+ num_batches_tracked)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

# torch attribute names containing underscores, harvested from the reference
# modules used by the supported families (nn/modules/*.py). Greedy
# longest-match re-merging of "_"-split tokens against this set reconstructs
# the dotted path exactly.
_ATOMS = {
    # v10 dual head (head.py:510-520)
    "one2one_cv2",
    "one2one_cv3",
    # v10Detect3d (head.py:627-652, 869-870) + DepthPredictor
    "o2m_heads",
    "o2o_heads",
    "dep_un",
    "fgdm_predictor",
    "depth_classifier",
    "depth_head",
    "proj_conv",
    "depth_bin_values",
    # misc conv blocks
    "conv_transpose",
    "channel_attention",
    "spatial_attention",
    "offset_conv",
    "regular_conv",
    "im_pools",
    # RT-DETR decoder (head.py RTDETRDecoder + transformer.py)
    "enc_output",
    "enc_score_head",
    "enc_bbox_head",
    "dec_score_head",
    "dec_bbox_head",
    "query_pos_head",
    "tgt_embed",
    "denoising_class_embed",
    "input_proj",
    "self_attn",
    "cross_attn",
    "sampling_offsets",
    "attention_weights",
    "value_proj",
    "output_proj",
    "in_proj_weight",
    "in_proj_bias",
}
_ATOM_TOKENS = sorted({tuple(a.split("_")) for a in _ATOMS}, key=len, reverse=True)

# v10Detect3d branch registration order (reference head.py:869): o2o_heads[j]
# aliases these direct attributes, and state_dict carries both key sets.
_BRANCHES_3D = ("cls", "o2d", "s2d", "o3d", "s3d", "hd", "dep", "dep_un")


def _dotted(prefix_segments) -> str:
    """Flax path segments -> dotted torch path.

    Each flax segment maps to one-or-more torch attrs (list attrs flatten as
    ``name_0_1``), so underscores inside a segment are either torch-name
    underscores (atoms) or list indices. Atoms never span a module boundary,
    and flax segment boundaries ARE module boundaries — so atom re-merging
    runs PER SEGMENT (a global scan wrongly merged PSA's ``attn.proj`` +
    ``.conv`` into DepthPredictor's ``proj_conv``)."""
    out = []
    for seg in prefix_segments:
        tokens = seg.split("_")
        i = 0
        n = len(tokens)
        while i < n:
            for atom in _ATOM_TOKENS:
                k = len(atom)
                if tuple(tokens[i : i + k]) == atom:
                    out.append("_".join(atom))
                    i += k
                    break
            else:
                out.append(tokens[i])
                i += 1
    return ".".join(out)


def flax_to_torch_state_dict(
    variables: Mapping[str, Any],
    reg_max: int = 16,
) -> Dict[str, np.ndarray]:
    """Convert a flax ``{'params', 'batch_stats'}`` tree to a reference-style
    torch state_dict (as numpy arrays; callers torch.save after
    ``{k: torch.from_numpy(v)}``).

    Emits, beyond the 1:1 parameter mapping:
      * ``num_batches_tracked`` (int64 0) beside every BN running_mean —
        torch only consults it under ``momentum=None``;
      * the frozen DFL arange ``<head>.dfl.conv.weight`` for Detect-family
        heads (inferred from the presence of a ``cv2_0_*`` box branch);
      * ``o2o_heads.{j}.*`` alias keys for v10Detect3d (head.py:869 registers
        the branch modules twice; both key sets appear in a real state_dict).
    """
    sd: Dict[str, np.ndarray] = {}
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})

    def emit_params(tree, tokens):
        if not isinstance(tree, Mapping):
            leaf = tokens[-1]
            prefix = _dotted(tokens[:-1])
            w = np.asarray(tree)
            if leaf == "kernel":
                if w.ndim == 4:
                    w = w.transpose(3, 2, 0, 1)
                elif w.ndim == 2:
                    w = w.transpose(1, 0)
                sd[f"{prefix}.weight"] = w
            elif leaf == "scale":
                sd[f"{prefix}.weight"] = w
            elif leaf == "embedding":
                sd[f"{prefix}.weight"] = w
            elif leaf in ("in_proj_weight", "in_proj_bias"):
                sd[f"{prefix}.{leaf}"] = w
            else:  # bias + verbatim leaves (rel_pos_h, pos_embed, ...)
                sd[f"{prefix}.{leaf}"] = w
            return
        for k, v in tree.items():
            emit_params(v, tokens + [k])

    def emit_stats(tree, tokens):
        if not isinstance(tree, Mapping):
            leaf = tokens[-1]
            prefix = _dotted(tokens[:-1])
            name = {"mean": "running_mean", "var": "running_var"}[leaf]
            sd[f"{prefix}.{name}"] = np.asarray(tree)
            sd.setdefault(f"{prefix}.num_batches_tracked", np.zeros((), np.int64))
            return
        for k, v in tree.items():
            emit_stats(v, tokens + [k])

    emit_params(params, [])
    emit_stats(batch_stats, [])

    # frozen DFL arange for Detect-family heads: a layer subtree owning a
    # cv2_0_0 box branch decodes through DFL(reg_max) on the torch side
    for layer_name, sub in params.items():
        if isinstance(sub, Mapping) and any(
            k.startswith("cv2_0_") or k.startswith("one2one_cv2_0_") for k in sub
        ):
            head = _dotted([layer_name])
            sd[f"{head}.dfl.conv.weight"] = (
                np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
            )

    # v10Detect3d alias keys: o2o_heads.{j}.<rest> duplicates <branch>.<rest>
    for layer_name, sub in params.items():
        if not (isinstance(sub, Mapping) and any(k.startswith("o2m_heads_") for k in sub)):
            continue
        head = _dotted([layer_name])
        for key in [k for k in sd if k.startswith(f"{head}.")]:
            rest = key[len(head) + 1 :]
            for j, br in enumerate(_BRANCHES_3D):
                if rest.startswith(br + "."):
                    sd[f"{head}.o2o_heads.{j}.{rest[len(br) + 1:]}"] = sd[key]
                    break
    return sd


def export_torch_checkpoint(
    path: str,
    variables: Mapping[str, Any],
    model_yaml: Optional[str] = None,
    names: Optional[Mapping[int, str]] = None,
    train_args: Optional[Mapping[str, Any]] = None,
    reg_max: int = 16,
) -> str:
    """Write a ``.pt`` file the reference stack can consume:
    ``{"state_dict": {k: torch.Tensor}, "model_yaml", "names", "train_args"}``.
    Requires torch (baked into this image; the converter itself is numpy)."""
    import torch

    sd = flax_to_torch_state_dict(variables, reg_max=reg_max)
    payload = {
        # np.array(copy=True): jax exports non-writable views, torch warns
        "state_dict": {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        "model_yaml": model_yaml,
        "names": dict(names) if names else None,
        "train_args": dict(train_args) if train_args else None,
        "format": "yolov10_3d_tpu.torch_export/1",
    }
    torch.save(payload, path)
    return path
