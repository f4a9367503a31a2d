"""ctypes binding + build-on-demand for the native fastaug core
(native/fastaug.cpp). See that file for what it replaces in the reference.
"""

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_REPO_ROOT, 'native', 'fastaug.cpp')
_SO = osp.join(_REPO_ROOT, 'native', 'libfastaug.so')
_lock = threading.Lock()
_lib = None


def _build():
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-fopenmp',
           '-o', _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load_fastaug(rebuild=False):
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    with _lock:
        if _lib is not None and not rebuild:
            return _lib
        if rebuild or not osp.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.fastaug_version.restype = ctypes.c_int
        assert lib.fastaug_version() == 1
        lib.fastaug_batch.restype = None
        _lib = lib
        return lib


def fastaug_available():
    try:
        load_fastaug()
        return True
    except Exception:
        return False


class FastAugBatch:
    """Native batch augmenter: list of (img HxWx3 uint8 RGB, gt HxW uint8)
    -> (imgs (B,ch,cw,3) f32 normalized, gts (B,ch,cw) i32).

    Drop-in replacement for the python train pipeline's
    Resize/RandomCrop/RandomFlip/PhotoMetricDistortion/Normalize/Pad chain
    (same op semantics; its own deterministic RNG stream).
    """

    def __init__(self, crop_size=(512, 512), img_scale=(2048, 512),
                 ratio_range=(0.5, 2.0), cat_max_ratio=0.75,
                 ignore_index=255, flip_prob=0.5, brightness_delta=32,
                 contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                 hue_delta=18, mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375)):
        self.lib = load_fastaug()
        self.crop_size = tuple(crop_size)
        self.img_scale = tuple(img_scale)
        self.ratio_range = tuple(ratio_range)
        self.cat_max_ratio = float(cat_max_ratio)
        self.ignore_index = int(ignore_index)
        self.flip_prob = float(flip_prob)
        self.brightness_delta = float(brightness_delta)
        self.contrast_range = tuple(contrast_range)
        self.saturation_range = tuple(saturation_range)
        self.hue_delta = float(hue_delta)
        self.mean = np.ascontiguousarray(mean, np.float32)
        self.std = np.ascontiguousarray(std, np.float32)

    def __call__(self, samples, seed=0):
        b = len(samples)
        ch, cw = self.crop_size
        imgs = [np.ascontiguousarray(s[0], np.uint8) for s in samples]
        gts = [np.ascontiguousarray(s[1], np.uint8) for s in samples]
        heights = np.array([im.shape[0] for im in imgs], np.int32)
        widths = np.array([im.shape[1] for im in imgs], np.int32)
        img_ptrs = (ctypes.POINTER(ctypes.c_uint8) * b)(
            *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
              for im in imgs])
        gt_ptrs = (ctypes.POINTER(ctypes.c_uint8) * b)(
            *[g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
              for g in gts])
        out_imgs = np.empty((b, ch, cw, 3), np.float32)
        out_gts = np.empty((b, ch, cw), np.int32)

        self.lib.fastaug_batch(
            img_ptrs, gt_ptrs,
            heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(b), ctypes.c_int(ch), ctypes.c_int(cw),
            ctypes.c_float(max(self.img_scale)),
            ctypes.c_float(min(self.img_scale)),
            ctypes.c_float(self.ratio_range[0]),
            ctypes.c_float(self.ratio_range[1]),
            ctypes.c_float(self.cat_max_ratio),
            ctypes.c_int(self.ignore_index),
            ctypes.c_float(self.flip_prob),
            ctypes.c_float(self.brightness_delta),
            ctypes.c_float(self.contrast_range[0]),
            ctypes.c_float(self.contrast_range[1]),
            ctypes.c_float(self.saturation_range[0]),
            ctypes.c_float(self.saturation_range[1]),
            ctypes.c_float(self.hue_delta),
            self.mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_uint64(seed),
            out_imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_gts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return out_imgs, out_gts
