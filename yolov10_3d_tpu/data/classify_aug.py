"""Classification-task augmentation (reference `data/augment.py:1011-1149`
``classify_transforms`` / ``classify_augmentations``, wired by
``ClassificationDataset``, reference `data/dataset.py:227-283`).

Train: random-resized-crop -> flips -> auto-augment policy (randaugment /
autoaugment / augmix) or HSV color jitter -> random erasing. Val/infer:
shortest-edge resize to ``size/crop_fraction`` + center crop.

Implemented on PIL + numpy — the same primitive library torchvision applies
to PIL inputs, so the individual ops (posterize, solarize, equalize,
autocontrast, the enhancers) are literally the functions the reference ends
up calling — with an explicit ``np.random.Generator`` so the loader's
per-epoch seeding stays deterministic (no torch RNG in the data path).
Geometric ops pivot at the image center like torchvision's. The op spaces
and magnitude-bin mappings follow torchvision's RandAugment(num_ops=2,
magnitude=9, bins=31) and AutoAugment(IMAGENET policy); AugMix follows the
paper semantics (severity 3, width 3, depth 1-3, Dirichlet/Beta(1,1) mixing).
All outputs are uint8 RGB — normalization stays in the jitted preprocess,
where the reference puts ToTensor/Normalize (mean 0, std 1, augment.py:20-21).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np


def _to_pil(img: np.ndarray):
    from PIL import Image

    return Image.fromarray(np.ascontiguousarray(img))


# ------------------------------------------------------------------ crops
def random_resized_crop(
    img: np.ndarray,
    size: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """torchvision RandomResizedCrop semantics: 10 tries of (area, log-aspect)
    sampling, then the largest in-ratio center crop; bilinear resize."""
    from PIL import Image

    h, w = img.shape[:2]
    area = float(h * w)
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * float(rng.uniform(*scale))
        ar = math.exp(float(rng.uniform(*log_ratio)))
        cw = int(round(math.sqrt(target_area * ar)))
        ch = int(round(math.sqrt(target_area / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x1 = int(rng.integers(0, w - cw + 1))
            y1 = int(rng.integers(0, h - ch + 1))
            break
    else:  # fallback: center crop clamped into the ratio range
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw, ch = w, int(round(w / ratio[0]))
        elif in_ratio > ratio[1]:
            ch, cw = h, int(round(h * ratio[1]))
        else:
            cw, ch = w, h
        x1, y1 = (w - cw) // 2, (h - ch) // 2
    crop = _to_pil(img[y1 : y1 + ch, x1 : x1 + cw])
    return np.asarray(crop.resize((size, size), Image.BILINEAR))


def classify_val_transform(
    img: np.ndarray, size: int, crop_fraction: float = 1.0
) -> np.ndarray:
    """Eval/infer path (reference augment.py:1011-1056): resize the SHORTEST
    edge to floor(size/crop_fraction) preserving aspect, then center-crop
    ``size`` x ``size`` — aspect preserved, borders lost, never padded."""
    from PIL import Image

    scale_size = max(int(math.floor(size / max(crop_fraction, 1e-6))), size)
    pil = _to_pil(img)
    w, h = pil.size
    if w <= h:
        nw, nh = scale_size, max(int(round(h * scale_size / w)), scale_size)
    else:
        nh, nw = scale_size, max(int(round(w * scale_size / h)), scale_size)
    pil = pil.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - size) // 2, (nh - size) // 2
    return np.asarray(pil.crop((left, top, left + size, top + size)))


# -------------------------------------------------------------- op kernel
def _affine(pil, matrix):
    from PIL import Image

    return pil.transform(pil.size, Image.AFFINE, matrix, resample=Image.BILINEAR)


def _apply_op(pil, name: str, mag: float):
    """One augmentation primitive on a PIL image (torchvision's op names)."""
    from PIL import ImageEnhance, ImageOps

    w, h = pil.size
    if name == "Identity":
        return pil
    if name == "ShearX":  # pivot at center: x' = x + m*(y - cy)
        return _affine(pil, (1.0, mag, -mag * h / 2, 0.0, 1.0, 0.0))
    if name == "ShearY":
        return _affine(pil, (1.0, 0.0, 0.0, mag, 1.0, -mag * w / 2))
    if name == "TranslateX":
        return _affine(pil, (1.0, 0.0, mag, 0.0, 1.0, 0.0))
    if name == "TranslateY":
        return _affine(pil, (1.0, 0.0, 0.0, 0.0, 1.0, mag))
    if name == "Rotate":
        from PIL import Image

        return pil.rotate(mag, resample=Image.BILINEAR)
    if name == "Brightness":
        return ImageEnhance.Brightness(pil).enhance(1.0 + mag)
    if name == "Color":
        return ImageEnhance.Color(pil).enhance(1.0 + mag)
    if name == "Contrast":
        return ImageEnhance.Contrast(pil).enhance(1.0 + mag)
    if name == "Sharpness":
        return ImageEnhance.Sharpness(pil).enhance(1.0 + mag)
    if name == "Posterize":
        return ImageOps.posterize(pil, max(int(mag), 1))
    if name == "Solarize":
        return ImageOps.solarize(pil, int(mag))
    if name == "AutoContrast":
        return ImageOps.autocontrast(pil)
    if name == "Equalize":
        return ImageOps.equalize(pil)
    if name == "Invert":
        return ImageOps.invert(pil)
    raise ValueError(f"unknown aug op {name}")


# ------------------------------------------------------------- RandAugment
_RA_BINS = 31


def _ra_space(w: int, h: int):
    """torchvision RandAugment op space: (name, 31 magnitude bins, signed)."""
    lin = np.linspace
    return [
        ("Identity", None, False),
        ("ShearX", lin(0.0, 0.3, _RA_BINS), True),
        ("ShearY", lin(0.0, 0.3, _RA_BINS), True),
        ("TranslateX", lin(0.0, 150.0 / 331.0 * w, _RA_BINS), True),
        ("TranslateY", lin(0.0, 150.0 / 331.0 * h, _RA_BINS), True),
        ("Rotate", lin(0.0, 30.0, _RA_BINS), True),
        ("Brightness", lin(0.0, 0.9, _RA_BINS), True),
        ("Color", lin(0.0, 0.9, _RA_BINS), True),
        ("Contrast", lin(0.0, 0.9, _RA_BINS), True),
        ("Sharpness", lin(0.0, 0.9, _RA_BINS), True),
        ("Posterize", 8 - np.round(np.arange(_RA_BINS) / ((_RA_BINS - 1) / 4)), False),
        ("Solarize", lin(255.0, 0.0, _RA_BINS), False),
        ("AutoContrast", None, False),
        ("Equalize", None, False),
    ]


def rand_augment(
    img: np.ndarray,
    rng: np.random.Generator,
    num_ops: int = 2,
    magnitude: int = 9,
) -> np.ndarray:
    """RandAugment (Cubuk et al. 2020) with torchvision's default op space,
    num_ops=2, magnitude=9 of 31 bins — what `T.RandAugment()` does inside
    the reference's classify_augmentations (augment.py:1117-1121)."""
    pil = _to_pil(img)
    space = _ra_space(*pil.size)
    for _ in range(num_ops):
        name, mags, signed = space[int(rng.integers(len(space)))]
        mag = float(mags[magnitude]) if mags is not None else 0.0
        if signed and rng.random() < 0.5:
            mag = -mag
        pil = _apply_op(pil, name, mag)
    return np.asarray(pil)


# ------------------------------------------------------------- AutoAugment
# torchvision AutoAugmentPolicy.IMAGENET: 25 sub-policies of
# (op, probability, magnitude-bin[0..9] or None)
_AA_IMAGENET = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, None), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, None)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, None)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, None), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, None)),
    (("Equalize", 0.0, None), ("Equalize", 0.8, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, None)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, None)),
    (("Color", 0.4, 0), ("Equalize", 0.6, None)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
]
_AA_BINS = 10


def _aa_space(w: int, h: int):
    lin = np.linspace
    return {
        "ShearX": (lin(0.0, 0.3, _AA_BINS), True),
        "ShearY": (lin(0.0, 0.3, _AA_BINS), True),
        "TranslateX": (lin(0.0, 150.0 / 331.0 * w, _AA_BINS), True),
        "TranslateY": (lin(0.0, 150.0 / 331.0 * h, _AA_BINS), True),
        "Rotate": (lin(0.0, 30.0, _AA_BINS), True),
        "Brightness": (lin(0.0, 0.9, _AA_BINS), True),
        "Color": (lin(0.0, 0.9, _AA_BINS), True),
        "Contrast": (lin(0.0, 0.9, _AA_BINS), True),
        "Sharpness": (lin(0.0, 0.9, _AA_BINS), True),
        "Posterize": (8 - np.round(np.arange(_AA_BINS) / ((_AA_BINS - 1) / 4)), False),
        "Solarize": (lin(255.0, 0.0, _AA_BINS), False),
        "AutoContrast": (None, False),
        "Equalize": (None, False),
        "Invert": (None, False),
    }


def auto_augment_imagenet(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """AutoAugment (Cubuk et al. 2019), torchvision IMAGENET policy: pick one
    of 25 sub-policies, apply its two (op, p, magnitude) stages."""
    pil = _to_pil(img)
    space = _aa_space(*pil.size)
    policy = _AA_IMAGENET[int(rng.integers(len(_AA_IMAGENET)))]
    for name, p, mbin in policy:
        if rng.random() > p:
            continue
        mags, signed = space[name]
        mag = float(mags[mbin]) if mags is not None and mbin is not None else 0.0
        if signed and rng.random() < 0.5:
            mag = -mag
        pil = _apply_op(pil, name, mag)
    return np.asarray(pil)


# ----------------------------------------------------------------- AugMix
def augmix(
    img: np.ndarray,
    rng: np.random.Generator,
    severity: int = 3,
    width: int = 3,
    depth: int = -1,
    alpha: float = 1.0,
) -> np.ndarray:
    """AugMix (Hendrycks et al. 2020) paper semantics: `width` augmentation
    chains of 1-3 ops each, convex-combined with Dirichlet(alpha) weights,
    then Beta(alpha, alpha)-blended with the original. Op space = the
    geometric/histogram ops + the color quartet (torchvision all_ops=True);
    magnitudes scale with severity/10 of the RandAugment ranges."""
    pil = _to_pil(img)
    w, h = pil.size
    s = severity / 10.0
    ops = [
        ("ShearX", 0.3 * s, True),
        ("ShearY", 0.3 * s, True),
        ("TranslateX", w / 3.0 * s, True),
        ("TranslateY", h / 3.0 * s, True),
        ("Rotate", 30.0 * s, True),
        ("Posterize", 8 - round(4 * s), False),
        ("Solarize", 255.0 * (1 - s), False),
        ("AutoContrast", 0.0, False),
        ("Equalize", 0.0, False),
        ("Brightness", 0.9 * s, True),
        ("Color", 0.9 * s, True),
        ("Contrast", 0.9 * s, True),
        ("Sharpness", 0.9 * s, True),
    ]
    ws = rng.dirichlet([alpha] * width).astype(np.float32)
    m = float(rng.beta(alpha, alpha))
    base = np.asarray(pil, np.float32)
    mix = np.zeros_like(base)
    for i in range(width):
        chain = pil
        d = depth if depth > 0 else int(rng.integers(1, 4))
        for _ in range(d):
            name, mag, signed = ops[int(rng.integers(len(ops)))]
            if signed and rng.random() < 0.5:
                mag = -mag
            chain = _apply_op(chain, name, mag)
        mix += ws[i] * np.asarray(chain, np.float32)
    out = m * base + (1.0 - m) * mix
    return np.clip(out, 0, 255).astype(np.uint8)


# ------------------------------------------------------------ color jitter
def color_jitter(
    img: np.ndarray,
    rng: np.random.Generator,
    hue: float,
    saturation: float,
    value: float,
) -> np.ndarray:
    """torchvision ColorJitter(brightness=v, contrast=v, saturation=s, hue=h)
    — exactly how the reference maps its hsv_* gains (augment.py:1141) —
    applied in a random order with factors uniform in [1-g, 1+g] (hue shift
    uniform in [-h, h] of the hue wheel)."""
    from PIL import ImageEnhance

    pil = _to_pil(img)
    order = rng.permutation(4)
    for which in order:
        if which == 0 and value > 0:  # brightness
            f = float(rng.uniform(max(0.0, 1 - value), 1 + value))
            pil = ImageEnhance.Brightness(pil).enhance(f)
        elif which == 1 and value > 0:  # contrast
            f = float(rng.uniform(max(0.0, 1 - value), 1 + value))
            pil = ImageEnhance.Contrast(pil).enhance(f)
        elif which == 2 and saturation > 0:
            f = float(rng.uniform(max(0.0, 1 - saturation), 1 + saturation))
            pil = ImageEnhance.Color(pil).enhance(f)
        elif which == 3 and hue > 0:
            shift = int(round(float(rng.uniform(-hue, hue)) * 255))
            if shift:
                from PIL import Image

                hsv = np.asarray(pil.convert("HSV")).copy()
                hsv[..., 0] = ((hsv[..., 0].astype(np.int16) + shift) % 256).astype(np.uint8)
                pil = Image.fromarray(hsv, "HSV").convert("RGB")
    return np.asarray(pil)


# ---------------------------------------------------------- random erasing
def random_erasing(
    img: np.ndarray,
    rng: np.random.Generator,
    p: float,
    scale: Tuple[float, float] = (0.02, 0.33),
    ratio: Tuple[float, float] = (0.3, 3.3),
) -> np.ndarray:
    """torchvision RandomErasing(p, value=0) semantics (reference
    augment.py:1146): zero a random (area, aspect)-sampled rectangle."""
    if p <= 0 or rng.random() >= p:
        return img
    h, w = img.shape[:2]
    area = float(h * w)
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target = area * float(rng.uniform(*scale))
        ar = math.exp(float(rng.uniform(*log_ratio)))
        eh = int(round(math.sqrt(target * ar)))
        ew = int(round(math.sqrt(target / ar)))
        if eh < h and ew < w:
            y = int(rng.integers(0, h - eh + 1))
            x = int(rng.integers(0, w - ew + 1))
            img = img.copy()
            img[y : y + eh, x : x + ew] = 0
            return img
    return img


# ------------------------------------------------------------- composition
def classify_train_augment(
    img: np.ndarray,
    size: int,
    rng: np.random.Generator,
    hyp: Optional[Dict] = None,
) -> np.ndarray:
    """The reference's train pipeline (classify_augmentations as wired by
    ClassificationDataset, dataset.py:268-283): RandomResizedCrop(scale=
    (1-hyp.scale, 1)) -> flips(fliplr/flipud) -> auto_augment policy (color
    jitter is disabled whenever a policy is on, augment.py:1113-1141) ->
    RandomErasing(hyp.erasing). uint8 RGB in, uint8 RGB (size, size, 3) out."""
    hyp = hyp or {}
    scale_lo = max(1.0 - float(hyp.get("scale", 0.4) or 0.0), 0.02)
    img = random_resized_crop(img, size, rng, scale=(scale_lo, 1.0))
    if rng.random() < float(hyp.get("fliplr", 0.5) or 0.0):
        img = img[:, ::-1]
    if rng.random() < float(hyp.get("flipud", 0.0) or 0.0):
        img = img[::-1]
    aa = hyp.get("auto_augment", "randaugment")
    if aa == "randaugment":
        img = rand_augment(img, rng)
    elif aa == "autoaugment":
        img = auto_augment_imagenet(img, rng)
    elif aa == "augmix":
        img = augmix(img, rng)
    elif aa:
        raise ValueError(
            f'invalid auto_augment "{aa}": expected one of "randaugment", '
            '"autoaugment", "augmix" or empty (augment.py:1134-1137)'
        )
    else:  # jitter only when no policy is active (augment.py:1112-1141)
        img = color_jitter(
            img, rng,
            hue=float(hyp.get("hsv_h", 0.015) or 0.0),
            saturation=float(hyp.get("hsv_s", 0.4) or 0.0),
            value=float(hyp.get("hsv_v", 0.4) or 0.0),
        )
    return np.ascontiguousarray(
        random_erasing(img, rng, float(hyp.get("erasing", 0.0) or 0.0))
    )
