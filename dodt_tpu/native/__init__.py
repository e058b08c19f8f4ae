"""ctypes bindings for the native (C++) components.

Libraries are built by build_native.sh; all callers degrade gracefully
to the pure-Python twins when the .so files are absent.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))


def _load(name: str):
    path = os.path.join(_DIR, name)
    if not os.path.exists(path):
        return None
    return ctypes.CDLL(path)


def build(force: bool = False) -> bool:
    """Build the native libs in place. Returns True on success."""
    if not force and available():
        return True
    try:
        subprocess.run(["bash", os.path.join(_DIR, "build_native.sh")],
                       check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def available() -> bool:
    return (os.path.exists(os.path.join(_DIR, "libkitti_ap.so")) and
            os.path.exists(os.path.join(_DIR, "libkitti_loader.so")))


_ap_lib = None
_loader_lib = None


def _get_ap_lib():
    global _ap_lib
    if _ap_lib is None:
        lib = _load("libkitti_ap.so")
        if lib is None:
            return None
        lib.kitti_ap.restype = ctypes.c_double
        lib.kitti_ap.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32),    # gt_counts
            np.ctypeslib.ndpointer(np.float64),  # gt_boxes7
            np.ctypeslib.ndpointer(np.float64),  # gt_bbox4
            np.ctypeslib.ndpointer(np.int32),    # ignored_gt
            np.ctypeslib.ndpointer(np.int32),    # dc_counts
            np.ctypeslib.ndpointer(np.float64),  # dc_bbox4
            np.ctypeslib.ndpointer(np.int32),    # det_counts
            np.ctypeslib.ndpointer(np.float64),  # det_boxes7
            np.ctypeslib.ndpointer(np.float64),  # det_bbox4
            np.ctypeslib.ndpointer(np.float64),  # det_scores
            np.ctypeslib.ndpointer(np.int32),    # ignored_det
        ]
        _ap_lib = lib
    return _ap_lib


def _get_loader_lib():
    global _loader_lib
    if _loader_lib is None:
        lib = _load("libkitti_loader.so")
        if lib is None:
            return None
        lib.load_velodyne_cam.restype = ctypes.c_int
        lib.load_velodyne_cam.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int,
        ]
        _loader_lib = lib
    return _loader_lib


# ---------------------------------------------------------------- AP

_METRIC_IDS = {"image": 0, "ground": 1, "3d": 2}


def kitti_ap_native(gt_counts, gt_boxes7, gt_bbox4, ignored_gt,
                    dc_counts, dc_bbox4,
                    det_counts, det_boxes7, det_bbox4, det_scores,
                    ignored_det, metric: str, min_iou: float) -> float:
    lib = _get_ap_lib()
    if lib is None:
        raise RuntimeError("libkitti_ap.so not built")
    return lib.kitti_ap(
        _METRIC_IDS[metric], min_iou, len(gt_counts),
        np.ascontiguousarray(gt_counts, np.int32),
        np.ascontiguousarray(gt_boxes7, np.float64).reshape(-1),
        np.ascontiguousarray(gt_bbox4, np.float64).reshape(-1),
        np.ascontiguousarray(ignored_gt, np.int32),
        np.ascontiguousarray(dc_counts, np.int32),
        np.ascontiguousarray(dc_bbox4, np.float64).reshape(-1),
        np.ascontiguousarray(det_counts, np.int32),
        np.ascontiguousarray(det_boxes7, np.float64).reshape(-1),
        np.ascontiguousarray(det_bbox4, np.float64).reshape(-1),
        np.ascontiguousarray(det_scores, np.float64),
        np.ascontiguousarray(ignored_det, np.int32))


# ------------------------------------------------------------ loader

def load_velodyne_cam(path: str, velo_to_rect: np.ndarray,
                      p2: np.ndarray, image_shape,
                      ego_trans=None, ego_rot=None,
                      capacity: int = 262144) -> np.ndarray:
    """Read + transform + FOV-filter a velodyne file natively.
    Returns (N, 3) float32 camera-frame points."""
    lib = _get_loader_lib()
    if lib is None:
        raise RuntimeError("libkitti_loader.so not built")
    out = np.empty((capacity, 3), np.float32)
    t_ptr = r_ptr = None
    if ego_trans is not None:
        t_arr = np.ascontiguousarray(ego_trans, np.float64)
        r_arr = np.ascontiguousarray(ego_rot, np.float64)
        t_ptr = t_arr.ctypes.data_as(ctypes.c_void_p)
        r_ptr = r_arr.ctypes.data_as(ctypes.c_void_p)
    n = lib.load_velodyne_cam(
        path.encode(), np.ascontiguousarray(velo_to_rect,
                                            np.float64).reshape(-1),
        np.ascontiguousarray(p2, np.float64).reshape(-1),
        int(image_shape[0]), int(image_shape[1]), t_ptr, r_ptr,
        out, capacity)
    if n < 0:
        raise IOError(f"failed to read {path}")
    return out[:n].copy()
