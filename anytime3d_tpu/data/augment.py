"""Pure-NumPy/cv2 image augmentation with explicit RNG.

Reference semantics: src/dataset_loader/datasetUtils.py —
``imageRandomAugmentation`` (:91-152: pad-to-aspect, random scale 0.8-1.2,
translate ±20% affine warp, resize, returns transform params for label
remap) and the ``imgAug`` photometric pipeline (:64-89, imgaug-based) rebuilt
here with cv2 primitives (imgaug is not available and pulls a host-side
dependency chain; everything below is vectorized NumPy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in the target image
    cv2 = None


def photometric_augment(rng: np.random.Generator, image: np.ndarray) -> np.ndarray:
    """Random photometric jitter: brightness, contrast, blur, invert, additive
    noise — the imgAug pipeline analogue (datasetUtils.py:64-89). Input uint8
    or float [0,255]; returns same dtype range float32."""
    img = image.astype(np.float32)
    if rng.random() < 0.5:  # brightness
        img = img + rng.uniform(-25, 25)
    if rng.random() < 0.5:  # contrast
        img = (img - 127.5) * rng.uniform(0.7, 1.3) + 127.5
    if rng.random() < 0.2 and cv2 is not None:  # blur
        k = int(rng.integers(1, 3)) * 2 + 1
        img = cv2.GaussianBlur(img, (k, k), 0)
    if rng.random() < 0.1:  # invert (datasetUtils.py:77 Invert(0.1))
        img = 255.0 - img
    if rng.random() < 0.3:  # gaussian noise
        img = img + rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.float32)


def noisy(
    rng: np.random.Generator, noise_type: str, image: np.ndarray
) -> np.ndarray:
    """Parametric noise models matching the reference's ``noisy``
    (datasetUtils.py:15-52): 'gauss' | 's&p' | 'poisson' | 'speckle'.
    Operates on float images in [0, 255]."""
    img = image.astype(np.float32)
    if noise_type == "gauss":
        return img + rng.normal(0.0, 10.0, img.shape)
    if noise_type == "s&p":
        amount, s_vs_p = 0.004, 0.5
        out = img.copy()
        n_salt = int(np.ceil(amount * img.size * s_vs_p))
        n_pepper = int(np.ceil(amount * img.size * (1.0 - s_vs_p)))
        coords = tuple(rng.integers(0, d, n_salt) for d in img.shape)
        out[coords] = 255.0
        coords = tuple(rng.integers(0, d, n_pepper) for d in img.shape)
        out[coords] = 0.0
        return out
    if noise_type == "poisson":
        vals = 2 ** np.ceil(np.log2(len(np.unique(img.astype(np.uint8)))))
        return rng.poisson(np.clip(img, 0, None) / 255.0 * vals) / vals * 255.0
    if noise_type == "speckle":
        return img + img * rng.normal(0.0, 0.1, img.shape)
    raise ValueError(f"unknown noise type {noise_type!r}")


def image_random_augmentation(
    rng: np.random.Generator,
    image: np.ndarray,
    image_size: Tuple[int, int],  # (cols, rows) output
    augmentation: bool = True,
    add_noise: bool = False,
    scale_range: Tuple[float, float] = (0.8, 1.2),
    translate_frac: float = 0.2,
    pad_to_aspect: bool = True,
):
    """Geometric + optional photometric augmentation.

    Returns ``(image_out, params)`` where ``params`` = (scale, tx_frac,
    ty_frac, pad_left_frac, pad_top_frac, content_w_frac, content_h_frac)
    describing the full pixel transform so box/point labels can be remapped
    with ``remap_bbox`` (the reference returns equivalent params,
    datasetUtils.py:137-152).
    """
    out_c, out_r = image_size
    img = image.astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    in_r, in_c = img.shape[:2]

    # pad to output aspect ratio, content centered
    pad_l = pad_t = 0
    if pad_to_aspect:
        target_ar = out_c / out_r
        ar = in_c / in_r
        if ar < target_ar:  # too narrow: pad cols
            new_c = int(round(in_r * target_ar))
            pad_l = (new_c - in_c) // 2
            img = np.pad(img, ((0, 0), (pad_l, new_c - in_c - pad_l), (0, 0)))
        elif ar > target_ar:  # too wide: pad rows
            new_r = int(round(in_c / target_ar))
            pad_t = (new_r - in_r) // 2
            img = np.pad(img, ((pad_t, new_r - in_r - pad_t), (0, 0), (0, 0)))
    padded_r, padded_c = img.shape[:2]

    if augmentation:
        scale = float(rng.uniform(*scale_range))
        tx = float(rng.uniform(-translate_frac, translate_frac))
        ty = float(rng.uniform(-translate_frac, translate_frac))
    else:
        scale, tx, ty = 1.0, 0.0, 0.0

    if cv2 is not None:
        m = np.array(
            [
                [scale, 0.0, (1 - scale) * padded_c / 2.0 + tx * padded_c],
                [0.0, scale, (1 - scale) * padded_r / 2.0 + ty * padded_r],
            ],
            np.float32,
        )
        img = cv2.warpAffine(img, m, (padded_c, padded_r))
        img = cv2.resize(img, (out_c, out_r))
    else:  # numpy fallback: nearest resize only
        ys = (np.arange(out_r) * padded_r / out_r).astype(int)
        xs = (np.arange(out_c) * padded_c / out_c).astype(int)
        img = img[ys][:, xs]

    if add_noise:
        img = photometric_augment(rng, img)

    params = (
        scale,
        tx,
        ty,
        pad_l / padded_c,
        pad_t / padded_r,
        in_c / padded_c,
        in_r / padded_r,
    )
    return img.astype(np.float32), params


def remap_bbox(bbox_frac: np.ndarray, params) -> np.ndarray:
    """Remap [x0, y0, x1, y1] fractions of the ORIGINAL image through the
    transform described by ``image_random_augmentation`` params, into
    fractions of the output image."""
    scale, tx, ty, pad_l, pad_t, w_frac, h_frac = params
    b = np.asarray(bbox_frac, np.float32).copy()
    # original -> padded fractions
    b[..., [0, 2]] = pad_l + b[..., [0, 2]] * w_frac
    b[..., [1, 3]] = pad_t + b[..., [1, 3]] * h_frac
    # affine about padded center + translation
    b[..., [0, 2]] = (b[..., [0, 2]] - 0.5) * scale + 0.5 + tx
    b[..., [1, 3]] = (b[..., [1, 3]] - 0.5) * scale + 0.5 + ty
    return b


def random_flip_horizontal(
    rng: np.random.Generator, image: np.ndarray, prob: float = 0.5
) -> tuple[np.ndarray, bool]:
    """Horizontal flip; callers negate azimuth when flipped
    (pascal3D.py:227-248)."""
    if rng.random() < prob:
        return image[:, ::-1].copy(), True
    return image, False
