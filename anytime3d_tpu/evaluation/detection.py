"""Multi-object detection evaluation: box P/R + orientation error.

The reference ships the multi-object path as inference-only demo code
(nolbo_test.py:81-188 draws boxes, no metrics); this protocol closes the
loop for the detector *training* path this framework adds: greedy
score-ordered matching of predicted boxes to ground-truth grid targets at an
IoU threshold, reported as detection precision/recall plus the mean absolute
orientation error of matched pairs.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np

from anytime3d_tpu.models.detector import DetectorReconstructor


def grid_targets_to_boxes(objness: np.ndarray, bbox: np.ndarray):
    """Decode (gh, gw, P, ·) grid targets back to normalized [x0, y0, x1, y1]
    boxes (inverse of data/pascal3d.py::build_grid_targets).

    bbox layout is (h, w, x, y) cell-relative, matching the training target.
    Returns (boxes (N, 4), cell_indices (N, 3)).
    """
    gh, gw, p = objness.shape[:3]
    out, idx = [], []
    for r in range(gh):
        for c in range(gw):
            for k in range(p):
                if objness[r, c, k, 0] <= 0.5:
                    continue
                h, w, x, y = bbox[r, c, k]
                cx, cy = (c + x) / gw, (r + y) / gh
                out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
                idx.append([r, c, k])
    return np.asarray(out, np.float32).reshape(-1, 4), np.asarray(idx, np.int32).reshape(-1, 3)


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    area = (
        (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    )
    return inter / area if area > 0 else 0.0


def average_precision(
    detections, gt_count: int, iou_thresh: float = 0.5
) -> float:
    """VOC-style AP at one IoU threshold from score-ranked detections.

    ``detections``: list of (score, is_tp) over the WHOLE eval set, matched
    greedily per image (each GT consumed at most once — the matching in
    ``evaluate_detector``); ``gt_count``: total ground-truth boxes. Computes
    the precision envelope over the recall axis (the all-points
    interpolation). The reference draws boxes without metrics
    (nolbo_test.py:81-188); this is the standard closing protocol.
    """
    if gt_count == 0:
        return 0.0
    if not detections:
        return 0.0
    order = np.argsort([-s for s, _ in detections], kind="stable")
    tp_cum = fp_cum = 0
    precisions, recalls = [], []
    for i in order:
        if detections[i][1]:
            tp_cum += 1
        else:
            fp_cum += 1
        precisions.append(tp_cum / (tp_cum + fp_cum))
        recalls.append(tp_cum / gt_count)
    # monotone precision envelope, integrate over recall steps
    prec = np.asarray(precisions)
    rec = np.asarray(recalls)
    for i in range(len(prec) - 2, -1, -1):
        prec[i] = max(prec[i], prec[i + 1])
    ap, prev_r = 0.0, 0.0
    for p, r in zip(prec, rec):
        ap += p * (r - prev_r)
        prev_r = r
    return float(ap)


def evaluate_detector(
    model: DetectorReconstructor,
    params,
    batch_fn: Callable[[int], Dict],
    num_batches: int = 8,
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    top_1_per_cell: bool = True,
    collect_diagnostics: bool = False,
) -> Dict[str, float]:
    """Detection precision/recall at ``iou_thresh`` + matched orientation MAE.

    ``batch_fn`` yields collated multi-object batches (images + grid
    targets, data/collate.py). Detections come from the jitted
    ``DetectorReconstructor.detect`` path, one image at a time (B=1 contract,
    nolbo_test.py:86).

    ``collect_diagnostics=True`` additionally returns ``fn_records`` /
    ``tp_records``: per-ground-truth dicts with the box's normalized area,
    its max IoU with any OTHER ground-truth box in the image (crowding), and
    the mean pixel brightness inside the box — the per-FN breakdown VERDICT
    r4 asked for (small objects? overlap? shading?).
    """
    detect = jax.jit(
        lambda p, img: model.apply(
            {"params": p}, img, obj_thresh, iou_thresh, top_1_per_cell,
            method=DetectorReconstructor.detect,
        )
    )
    tp = fp = fn_ = 0
    ori_err, n_matched = 0.0, 0
    scored: list = []  # (score, is_tp) across the whole set, for AP
    fn_records: list = []
    tp_records: list = []

    def _gt_record(image, gt_boxes, g):
        x0, y0, x1, y1 = gt_boxes[g]
        h_px, w_px = image.shape[:2]
        c0, c1 = int(max(x0, 0) * w_px), int(min(x1, 1) * w_px)
        r0, r1 = int(max(y0, 0) * h_px), int(min(y1, 1) * h_px)
        crop = image[r0:max(r1, r0 + 1), c0:max(c1, c0 + 1)]
        overlap = max(
            (_iou(gt_boxes[g], gt_boxes[o]) for o in range(len(gt_boxes)) if o != g),
            default=0.0,
        )
        return {
            "area": float(max(x1 - x0, 0) * max(y1 - y0, 0)),
            "max_gt_overlap": float(overlap),
            "brightness": float(crop.mean()) if crop.size else 0.0,
        }

    for b in range(num_batches):
        batch = batch_fn(b)
        images = np.asarray(batch["images"])
        for i in range(images.shape[0]):
            det = detect(params, images[i : i + 1])
            valid = np.asarray(det["valid"])
            boxes = np.asarray(det["bbox2d"])[valid]
            sin_p = np.asarray(det["ori_sin"])[valid]
            cos_p = np.asarray(det["ori_cos"])[valid]
            order = np.argsort(-boxes[:, 4]) if len(boxes) else []

            gt_boxes, gt_idx = grid_targets_to_boxes(
                np.asarray(batch["objness"][i]), np.asarray(batch["bbox"][i])
            )
            taken = np.zeros(len(gt_boxes), bool)
            for j in order:
                best, best_iou = -1, iou_thresh
                for g in range(len(gt_boxes)):
                    if taken[g]:
                        continue
                    iou = _iou(boxes[j, :4], gt_boxes[g])
                    if iou >= best_iou:
                        best, best_iou = g, iou
                if best >= 0:
                    taken[best] = True
                    tp += 1
                    scored.append((float(boxes[j, 4]), True))
                    r, c, k = gt_idx[best]
                    gs = np.asarray(batch["sin"][i][r, c, k])
                    gc = np.asarray(batch["cos"][i][r, c, k])
                    ang = np.arctan2(sin_p[j], cos_p[j]) - np.arctan2(gs, gc)
                    ang = np.abs(np.arctan2(np.sin(ang), np.cos(ang)))
                    ori_err += float(ang.mean())
                    n_matched += 1
                else:
                    fp += 1
                    scored.append((float(boxes[j, 4]), False))
            fn_ += int((~taken).sum())
            if collect_diagnostics:
                for g in range(len(gt_boxes)):
                    rec = _gt_record(images[i], gt_boxes, g)
                    (tp_records if taken[g] else fn_records).append(rec)
    out = {
        "det_precision": tp / max(tp + fp, 1),
        "det_recall": tp / max(tp + fn_, 1),
        "map50": average_precision(scored, gt_count=tp + fn_, iou_thresh=iou_thresh),
        "ori_mae_rad": ori_err / max(n_matched, 1),
        "num_tp": float(tp),
        "num_fp": float(fp),
        "num_fn": float(fn_),
    }
    if collect_diagnostics:
        out["fn_records"] = fn_records
        out["tp_records"] = tp_records
    return out
