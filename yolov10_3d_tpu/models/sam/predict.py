"""SAM predictor: promptable segmentation + automatic mask generation
(reference: models/sam/predict.py ``Predictor``).

TPU-first design: the image embedding is computed once per image by a jitted
encoder; every prompt batch runs through ONE jitted decode function with
fixed shapes — point prompts are padded to the next power-of-two count with
label -1 (the prompt encoder's native padding semantics), so arbitrary
numbers of prompts reuse a handful of compiled programs. AMG decodes the
whole point grid as a single (grid, 1, 2) batch instead of a host loop.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import amg
from .build import PIXEL_MEAN, PIXEL_STD, Sam, build_sam


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class SAMPredictor:
    """Promptable inference around a Sam module + variables."""

    mask_threshold: float = 0.0

    def __init__(self, model: Sam, variables, iou: float = 0.9):
        self.model = model
        self.variables = variables
        self.iou = iou
        self.features = None
        self.im_hw: Tuple[int, int] = (model.img_size, model.img_size)
        self.src_hw: Tuple[int, int] = self.im_hw
        self.prompts: Dict = {}
        self._encode = jax.jit(
            lambda v, x: model.apply(v, x, method=Sam.encode_image)
        )
        self._decode_cache: Dict = {}

    # -- image ----------------------------------------------------------
    def preprocess(self, image: np.ndarray) -> jnp.ndarray:
        """HWC uint8 RGB -> normalized, top-left resized (B,S,S,3)
        (reference predict.py:77/105: LetterBox(center=False) + mean/std)."""
        from ...data.preprocess import letterbox

        s = self.model.img_size
        self.src_hw = image.shape[:2]
        img, _, _ = letterbox(image, (s, s), center=False, scaleup=True)
        x = (img.astype(np.float32) - np.asarray(PIXEL_MEAN)) / np.asarray(PIXEL_STD)
        return jnp.asarray(x[None])

    def set_image(self, image: np.ndarray) -> None:
        """Encode an image once; prompts then reuse the cached embedding
        (reference predict.py:401)."""
        x = self.preprocess(np.asarray(image))
        self.features = self._encode(self.variables, x)

    def reset_image(self) -> None:
        self.features = None

    def set_prompts(self, prompts: Dict) -> None:
        self.prompts = dict(prompts)

    # -- prompt inference -------------------------------------------------
    def _decode_fn(self, n_points: int, has_boxes: bool, has_masks: bool, multimask: bool):
        key = (n_points, has_boxes, has_masks, multimask)
        if key not in self._decode_cache:

            def fn(v, feats, coords, labels, boxes, masks):
                return self.model.apply(
                    v,
                    feats,
                    points=(coords, labels) if n_points else None,
                    boxes=boxes if has_boxes else None,
                    masks=masks if has_masks else None,
                    multimask_output=multimask,
                    method=Sam.predict_masks,
                )

            self._decode_cache[key] = jax.jit(fn)
        return self._decode_cache[key]

    def prompt_inference(
        self,
        bboxes=None,
        points=None,
        labels=None,
        masks=None,
        multimask_output: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (masks (N, H/4, W/4) logits, scores (N,)). Point prompts
        are (N, 2) pixel coords in source-image space; boxes (N, 4) xyxy
        (reference predict.py:152 prompt_inference)."""
        assert self.features is not None, "call set_image() first"
        s = self.model.img_size
        r = min(s / self.src_hw[0], s / self.src_hw[1])

        n_prompts = 0
        coords = lab = None
        pts = lbl = None
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.float32)) * r
            lbl = (
                np.ones(len(pts), np.int32)
                if labels is None
                else np.asarray(labels, np.int32).reshape(-1)
            )
            n_prompts = len(pts)
        bx0 = None
        if bboxes is not None:
            bx0 = np.atleast_2d(np.asarray(bboxes, np.float32)) * r
            n_prompts = max(n_prompts, len(bx0))
        mk0 = None
        if masks is not None:
            mk0 = np.asarray(masks, np.float32)[..., None]  # (N, 256, 256, 1)
            n_prompts = max(n_prompts, len(mk0))
        # ALL prompt kinds pad to ONE pow2 batch: the prompt encoder concats
        # sparse embeddings along axis=1, so mixed point+box prompts must
        # share the batch dim (review finding: 3 points + 3 boxes crashed)
        n = _next_pow2(max(n_prompts, 1))
        if pts is not None:
            coords = np.zeros((n, 1, 2), np.float32)
            lab = -np.ones((n, 1), np.int32)  # -1 = padding label
            coords[: len(pts), 0] = pts
            lab[: len(pts), 0] = lbl
        bx = None
        if bx0 is not None:
            bx = np.zeros((n, 4), np.float32)
            bx[: len(bx0)] = bx0
        mk = None
        if mk0 is not None:
            mk = np.zeros((n, *mk0.shape[1:]), np.float32)
            mk[: len(mk0)] = mk0

        fn = self._decode_fn(
            0 if coords is None else coords.shape[0],
            bx is not None,
            mk is not None,
            multimask_output,
        )
        out_masks, out_scores = fn(
            self.variables,
            self.features,
            None if coords is None else jnp.asarray(coords),
            None if lab is None else jnp.asarray(lab),
            None if bx is None else jnp.asarray(bx),
            None if mk is None else jnp.asarray(mk),
        )
        m = np.asarray(out_masks, np.float32)
        sc = np.asarray(out_scores, np.float32)
        m, sc = m[:n_prompts], sc[:n_prompts]  # drop the shared pow2 padding
        # (N, d, h, w) -> (N*d, h, w) as in reference predict.py:208
        return m.reshape(-1, *m.shape[2:]), sc.reshape(-1)

    def __call__(self, image=None, bboxes=None, points=None, labels=None,
                 masks=None, multimask_output=False, **kw):
        """One-shot: set image (if given) and run prompts, or generate()
        when no prompts are supplied (reference predict.py:122 inference)."""
        if image is not None:
            self.set_image(image)
        bboxes = self.prompts.pop("bboxes", bboxes)
        points = self.prompts.pop("points", points)
        labels = self.prompts.pop("labels", labels)
        masks_p = self.prompts.pop("masks", masks)
        if all(p is None for p in (bboxes, points, masks_p)):
            return self.generate(**kw)
        return self.prompt_inference(bboxes, points, labels, masks_p, multimask_output)

    # -- automatic mask generation ---------------------------------------
    def generate(
        self,
        points_stride: int = 32,
        points_batch_size: int = 64,
        conf_thres: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 0.95,
        crop_n_layers: int = 0,
        crop_overlap_ratio: float = 512 / 1500,
        crop_nms_thresh: float = 0.7,
    ):
        """Segment everything via a point grid (reference predict.py:210).

        Single-crop path decodes the full grid in fixed-size batches on
        device; returns (masks (N, s/4, s/4) bool, scores (N,), boxes (N, 4))
        in encoder-input coordinates.
        """
        from ...ops.nms import nms_numpy

        assert self.features is not None, "call set_image() first"
        s = self.model.img_size
        grids = amg.build_all_layer_point_grids(points_stride, crop_n_layers, 1)
        crop_regions, layer_idxs = amg.generate_crop_boxes((s, s), crop_n_layers, crop_overlap_ratio)

        all_masks, all_scores, all_boxes = [], [], []
        for crop_region, layer_idx in zip(crop_regions, layer_idxs):
            x0, y0, x1, y1 = crop_region
            w, h = x1 - x0, y1 - y0
            pts = grids[layer_idx] * np.array([[w, h]]) + np.array([[x0, y0]])
            keep_masks, keep_scores = [], []
            for (batch_pts,) in amg.batch_iterator(points_batch_size, pts):
                # prompt_inference rescales by r==1 here (segment-all uses
                # encoder-input coords already)
                src = self.src_hw
                self.src_hw = (s, s)
                m, sc = self.prompt_inference(points=batch_pts, multimask_output=True)
                self.src_hw = src
                stab = np.asarray(
                    amg.calculate_stability_score(
                        jnp.asarray(m), self.mask_threshold, stability_score_offset
                    )
                )
                keep = (sc > conf_thres) & (stab > stability_score_thresh)
                keep_masks.append(m[keep])
                keep_scores.append(sc[keep])
            if not keep_masks:
                continue
            m = np.concatenate(keep_masks)
            sc = np.concatenate(keep_scores)
            if len(m) == 0:
                continue
            binm = m > self.mask_threshold
            # masks decode from the FULL-image embedding with full-image grid
            # points (no per-crop re-encode), so boxes are already in image
            # coordinates — no uncrop anywhere (a second offset shifted every
            # non-full-crop box off its mask; review finding). The edge
            # filter expects crop-frame boxes, so shift into the crop frame
            # for the test only.
            boxes = np.asarray(amg.batched_mask_to_box(jnp.asarray(binm)), np.float32)
            x0y0 = np.array([crop_region[0], crop_region[1]] * 2, np.float32)
            edge = np.asarray(
                amg.is_box_near_crop_edge(
                    jnp.asarray(boxes - x0y0), crop_region, [0, 0, s, s]
                )
            )
            if crop_region != [0, 0, s, s]:
                binm, sc, boxes = binm[~edge], sc[~edge], boxes[~edge]
            keep = nms_numpy(boxes, sc, self.iou)
            all_masks.append(binm[keep])
            all_scores.append(sc[keep])
            all_boxes.append(boxes[keep])
        if not all_masks:
            z = self.model.img_size // 4
            return np.zeros((0, z, z), bool), np.zeros(0), np.zeros((0, 4))
        return (
            np.concatenate(all_masks),
            np.concatenate(all_scores),
            np.concatenate(all_boxes),
        )

    @staticmethod
    def remove_small_regions(masks: np.ndarray, min_area: int = 0, nms_thresh: float = 0.7):
        """Drop small holes/islands then NMS duplicates
        (reference predict.py:434)."""
        from ...ops.nms import nms_numpy

        if len(masks) == 0:
            return masks, []
        new_masks, scores = [], []
        for mask in masks:
            m = mask.astype(np.uint8)
            m, ch1 = amg.remove_small_regions(m, min_area, "holes")
            m, ch2 = amg.remove_small_regions(m, min_area, "islands")
            new_masks.append(m)
            scores.append(float(not (ch1 or ch2)))
        new_masks = np.stack(new_masks)
        boxes = np.asarray(amg.batched_mask_to_box(jnp.asarray(new_masks)), np.float32)
        keep = nms_numpy(boxes, np.asarray(scores, np.float32), nms_thresh)
        return new_masks[keep], keep
