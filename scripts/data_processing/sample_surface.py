#!/usr/bin/env python
"""Identity-supervision data prep: surface samples with normals per subject.

CLI-compatible with reference scripts/data_processing/sample_surface.py:
per subject (parallel worker pool), sample N points + interpolated normals on
the raw neutral scan (area-weighted barycentric — replaces
pcu.sample_mesh_random), cut below the throat plane, label face/non-face by
nearest-neighbor distance (< 5/25) to the masked registration template
vertices, and save NUM_SPLITS chunk files ``{expr}_{i}_{face,non_face}.npy``.

    python scripts/data_processing/sample_surface.py [--n_samples 25000000]
"""

import argparse
import os
import traceback
from multiprocessing import Pool

import numpy as np
from scipy.spatial import cKDTree as KDTree

import sys as _sys
import os as _os

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

from nphm_tpu import env_paths
from nphm_tpu.data.manager import DataManager
from nphm_tpu.data.sampling import sample_mesh_surface

FACE_DIST_THRESHOLD = 5.0 / 25.0

_ARGS = None


def sample_fields(n_samps, s, e, face_mask, rng):
    manager = DataManager()
    mesh = manager.get_raw_mesh(s, e)
    regi = manager.get_registration_mesh(s, e)

    surf_points, surf_normals = sample_mesh_surface(mesh, n_samps, rng)

    above = manager.cut_throat(surf_points, s, e)
    surf_points = surf_points[above, :]
    surf_normals = surf_normals[above, :]

    # face region: proximity to the masked registration vertices
    face_vertices = regi.vertices[face_mask, :]
    kdtree = KDTree(face_vertices)
    d_region, _ = kdtree.query(surf_points)
    face_region = d_region < FACE_DIST_THRESHOLD

    n_off = min(_ARGS.n_samples_off, int((~face_region).sum()))
    rnd_idx_non_face = rng.integers(0, max((~face_region).sum(), 1), n_off)
    return {
        "face": {
            "points": surf_points[face_region, :],
            "normals": surf_normals[face_region, :],
        },
        "non_face": {
            "points": surf_points[~face_region, :][rnd_idx_non_face, :],
            "normals": surf_normals[~face_region, :][rnd_idx_non_face, :],
        },
    }


def run_subject(s):
    manager = DataManager()
    rng = np.random.default_rng(s)
    face_mask = np.load(os.path.join(env_paths.ASSETS, "face.npy"))
    e = manager.get_neutral_expression(subject=s, neutral_type="open")
    if e is None:
        return
    if os.path.exists(
        manager.get_train_path_identity_face(s, e, rnd_file=env_paths.NUM_SPLITS - 1)
    ):
        print("SKIPPING:", s, e)
        return
    try:
        print(s, e)
        results = sample_fields(_ARGS.n_samples, s, e, face_mask, rng)
        data_face = np.concatenate(
            [results["face"]["points"], results["face"]["normals"]], axis=1
        ).astype(np.float32)
        data_non_face = np.concatenate(
            [results["non_face"]["points"], results["non_face"]["normals"]], axis=1
        ).astype(np.float32)

        out_dir_s = manager.get_train_dir_identity(s)
        os.makedirs(out_dir_s, exist_ok=True)
        for i, chunk in enumerate(
            np.array_split(data_face, env_paths.NUM_SPLITS, axis=0)
        ):
            np.save(manager.get_train_path_identity_face(s, e, rnd_file=i), chunk)
        for i, chunk in enumerate(
            np.array_split(data_non_face, env_paths.NUM_SPLITS, axis=0)
        ):
            np.save(
                manager.get_train_path_identity_non_face(s, e, rnd_file=i), chunk
            )
    except Exception:
        print("EXCEPTION", s, e)
        print(traceback.format_exc())


def main():
    global _ARGS
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_samples", type=int, default=25_000_000)
    parser.add_argument("--n_samples_off", type=int, default=1_000_000)
    parser.add_argument("--n_workers", type=int, default=10)
    parser.add_argument("--subjects", type=int, nargs="*", default=None)
    _ARGS = parser.parse_args()

    manager = DataManager()
    subjects = _ARGS.subjects or manager.get_all_subjects()
    print(f"FOUND {len(subjects)} subjects!")
    os.makedirs(env_paths.SUPERVISION_IDENTITY, exist_ok=True)

    if _ARGS.n_workers <= 1:
        for s in subjects:
            run_subject(s)
    else:
        with Pool(_ARGS.n_workers) as p:
            p.map(run_subject, subjects)


if __name__ == "__main__":
    main()
