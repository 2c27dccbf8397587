"""Point-cloud reconstruction metrics.

Behavioral spec: reference ``src/NPHM/evaluation/metrics.py:46-206``
(eval_pointcloud / distance_p2p / get_threshold_percentage): bidirectional
nearest-neighbor distances -> completeness/accuracy, Chamfer-L1/L2, absolute-
dot normal consistency, and F-scores at {1, 5, 10, 20} mm thresholds, with an
optional rescale to metric millimeters via the stored per-scan 1/s transform.

Nearest-neighbor queries stay on the host (scipy cKDTree), exactly as the
reference does — at 250k points this is not a TPU-relevant workload.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.spatial import cKDTree as KDTree


def distance_p2p(pointcloud_pred, pointcloud_gt, normals_pred, normals_gt):
    """Minimal distances from each pred point to the gt cloud (+ |n.n'|)."""
    kdtree = KDTree(pointcloud_gt)
    dist, idx = kdtree.query(pointcloud_pred)
    if normals_pred is None:
        return dist, None
    normals_pred = normals_pred / np.linalg.norm(
        normals_pred, axis=-1, keepdims=True
    )
    normals_gt = normals_gt / np.linalg.norm(normals_gt, axis=-1, keepdims=True)
    dot = (normals_gt[idx] * normals_pred).sum(axis=-1)
    return dist, np.abs(dot)


def get_threshold_percentage(dist, thresholds):
    return [(dist <= t).mean() for t in thresholds]


def eval_pointcloud(
    pointcloud_pred,
    pointcloud_gt,
    normals_pred=None,
    normals_gt=None,
    return_error_pcs: bool = False,
    metric_space: bool = True,
    subject: Optional[int] = None,
    expression: Optional[int] = None,
    scale_to_metric: Optional[float] = None,
):
    """Bidirectional point-cloud metrics.

    metric_space=True rescales both clouds to millimeters using the stored
    per-scan similarity transform (1/s); pass ``scale_to_metric`` directly or
    (subject, expression) to look it up via the DataManager.
    """
    if not metric_space:
        thresholds = [0.005, 0.01, 0.015, 0.02]
    else:
        thresholds = [1, 5, 10, 20]  # millimeters

    pointcloud_pred = np.asarray(pointcloud_pred, np.float64)
    pointcloud_gt = np.asarray(pointcloud_gt, np.float64)

    if metric_space:
        if scale_to_metric is None:
            from nphm_tpu.data.manager import DataManager

            tr = DataManager().get_transform_from_metric(subject, expression)
            scale_to_metric = float(1.0 / tr["s"])
        pointcloud_pred = pointcloud_pred * scale_to_metric
        pointcloud_gt = pointcloud_gt * scale_to_metric

    completeness, completeness_normals = distance_p2p(
        pointcloud_gt, pointcloud_pred, normals_gt, normals_pred
    )
    recall = get_threshold_percentage(completeness, thresholds)
    completeness_pc = completeness
    completeness_pc_normals = completeness_normals
    completeness2 = (completeness**2).mean()
    completeness_m = completeness.mean()

    accuracy, accuracy_normals = distance_p2p(
        pointcloud_pred, pointcloud_gt, normals_pred, normals_gt
    )
    precision = get_threshold_percentage(accuracy, thresholds)
    accuracy_pc = accuracy
    accuracy_pc_normals = accuracy_normals
    accuracy2 = (accuracy**2).mean()
    accuracy_m = accuracy.mean()

    chamfer_l2 = 0.5 * completeness2 + 0.5 * accuracy2
    chamfer_l1 = 0.5 * (completeness_m + accuracy_m)

    F = [
        2 * precision[i] * recall[i] / (precision[i] + recall[i])
        if (precision[i] + recall[i]) > 0
        else 0.0
        for i in range(len(precision))
    ]

    if normals_pred is not None:
        acc_n = accuracy_normals.mean()
        comp_n = completeness_normals.mean()
        normals_correctness = 0.5 * comp_n + 0.5 * acc_n
    else:
        acc_n = comp_n = normals_correctness = np.nan

    out = {
        "completeness": completeness_m,
        "accuracy": accuracy_m,
        "normals completeness": comp_n,
        "normals accuracy": acc_n,
        "normals consistency": normals_correctness,
        "completeness2": completeness2,
        "accuracy2": accuracy2,
        "chamfer_l2": chamfer_l2,
        "chamfer_l1": chamfer_l1,
        "f_score_05": F[0],  # 1mm in metric space
        "f_score_10": F[1],  # 5mm
        "f_score_15": F[2],  # 10mm
        "f_score_20": F[3],  # 20mm
    }
    out = {k: float(v) for k, v in out.items()}  # JSON-serializable
    if return_error_pcs:
        return out, {
            "completeness": completeness_pc,
            "accuracy": accuracy_pc,
            "completeness_normals": completeness_pc_normals,
            "accuracy_normals": accuracy_pc_normals,
        }
    return out
