"""ctypes mirror of the C ABI in deploy/src/interface/hydranet.h — one
definition shared by every Python-side driver (test_c_abi.py,
golden_compare.py, latency_sweep.py) so a struct change cannot silently
desynchronize a caller-allocated HN_Output (the C side writes into
Python-owned memory; a stale mirror is heap corruption, not a wrong
number).
"""

from __future__ import annotations

import ctypes
import os

HN_MAX_LANE_POINTS = 256
HN_MAX_LANES = 16
HN_MAX_DETECTIONS = 100


class HN_Point(ctypes.Structure):
    _fields_ = [("x", ctypes.c_float), ("y", ctypes.c_float)]


class HN_Lane(ctypes.Structure):
    _fields_ = [("score", ctypes.c_float), ("num_points", ctypes.c_int),
                ("points", HN_Point * HN_MAX_LANE_POINTS)]


class HN_Detection(ctypes.Structure):
    _fields_ = [("x1", ctypes.c_float), ("y1", ctypes.c_float),
                ("x2", ctypes.c_float), ("y2", ctypes.c_float),
                ("score", ctypes.c_float), ("class_id", ctypes.c_int)]


class HN_Output(ctypes.Structure):
    _fields_ = [("num_lanes", ctypes.c_int),
                ("lanes", HN_Lane * HN_MAX_LANES),
                ("num_detections", ctypes.c_int),
                ("detections", HN_Detection * HN_MAX_DETECTIONS),
                ("seg_mask", ctypes.POINTER(ctypes.c_ubyte)),
                ("seg_height", ctypes.c_int), ("seg_width", ctypes.c_int),
                ("preprocess_ms", ctypes.c_double),
                ("run_ms", ctypes.c_double),
                ("postprocess_ms", ctypes.c_double),
                ("h2d_ms", ctypes.c_double),
                ("exec_ms", ctypes.c_double),
                ("d2h_ms", ctypes.c_double),
                ("rtt_ms", ctypes.c_double)]


def load_library(repo_root: str) -> ctypes.CDLL:
    lib = ctypes.CDLL(os.path.join(repo_root,
                                   "deploy/build/libhydranet_api.so"))
    lib.Hydranet_Init.argtypes = [ctypes.POINTER(ctypes.c_void_p),
                                  ctypes.c_char_p]
    lib.Hydranet_Detect.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(HN_Output),
        ctypes.POINTER(ctypes.c_ubyte)]
    lib.Hydranet_Detect_Pipelined.argtypes = lib.Hydranet_Detect.argtypes
    lib.Hydranet_Flush.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(HN_Output),
                                   ctypes.POINTER(ctypes.c_ubyte)]
    lib.Hydranet_BatchSize.argtypes = [ctypes.c_void_p]
    lib.Hydranet_Detect_Batched.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(HN_Output)]
    return lib
