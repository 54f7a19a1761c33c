"""Native (C++) obj36 TSV decoder binding.

``load_obj_tsv_native`` mirrors :func:`lako_tpu.data.vision.load_obj_tsv`
exactly (same list-of-dicts schema, reference
data_process/data/utils.py:20-89) but parses and base64-decodes rows across
a thread pool in ``native/obj36.cpp``. Output equality with the Python
loader is pinned by tests/test_vision_native.py; throughput is measured by
scripts/bench_obj36.py.

Row payloads are decoded into C++-owned buffers and copied into numpy
arrays here — the copy is a small fraction of decode time and keeps array
lifetimes independent of the native handle.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from lako_tpu.retrieval.native import build_native

_lib = None

# payload field order of lako_obj36_field (native/obj36.cpp kPayloadFields)
_FIELDS = [
    ("objects_id", np.int64, None),
    ("objects_conf", np.float32, None),
    ("attrs_id", np.int64, None),
    ("attrs_conf", np.float32, None),
    ("boxes", np.float32, 4),
    ("features", np.float32, -1),
]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build_native()))
    lib.lako_obj36_open.restype = ctypes.c_void_p
    lib.lako_obj36_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_longlong]
    lib.lako_obj36_num_rows.restype = ctypes.c_longlong
    lib.lako_obj36_num_rows.argtypes = [ctypes.c_void_p]
    lib.lako_obj36_error.restype = ctypes.c_char_p
    lib.lako_obj36_error.argtypes = [ctypes.c_void_p]
    lib.lako_obj36_img_id.restype = ctypes.c_char_p
    lib.lako_obj36_img_id.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    lib.lako_obj36_meta.restype = ctypes.c_int
    lib.lako_obj36_meta.argtypes = [ctypes.c_void_p, ctypes.c_longlong] + \
        [ctypes.POINTER(ctypes.c_longlong)] * 4
    lib.lako_obj36_field.restype = ctypes.c_void_p
    lib.lako_obj36_field.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                     ctypes.c_int]
    lib.lako_obj36_field_size.restype = ctypes.c_longlong
    lib.lako_obj36_field_size.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                          ctypes.c_int]
    lib.lako_obj36_close.restype = None
    lib.lako_obj36_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:  # noqa: BLE001 — no toolchain / build failure
        return False


def load_obj_tsv_native(
    fname: str,
    topk: Optional[int] = None,
    img_list: Optional[set] = None,
    n_threads: Optional[int] = None,
) -> List[dict]:
    """Threaded native decode; same output as vision.load_obj_tsv.

    ``topk`` bounds the number of *kept* rows. Without an ``img_list``
    filter it also bounds the decode work (passed down as max_rows);
    with a filter every row must be decoded before filtering, matching
    the Python loader's semantics.
    """
    lib = _load()
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    max_rows = -1 if (img_list is not None or topk is None) else topk
    handle = lib.lako_obj36_open(str(fname).encode(), int(n_threads),
                                 int(max_rows))
    if not handle:
        raise OSError(f"cannot read {fname}")
    try:
        n_rows = lib.lako_obj36_num_rows(handle)
        if n_rows == 0:
            err = lib.lako_obj36_error(handle).decode()
            if err:
                raise ValueError(f"{fname}: {err}")
        data: List[dict] = []
        meta = [ctypes.c_longlong() for _ in range(4)]
        for i in range(n_rows):
            img_id = lib.lako_obj36_img_id(handle, i).decode()
            if img_list is not None and img_id not in img_list:
                continue
            lib.lako_obj36_meta(handle, i, *(ctypes.byref(m) for m in meta))
            img_h, img_w, n_boxes, feat_dim = (m.value for m in meta)
            item = {"img_id": img_id, "img_h": img_h, "img_w": img_w,
                    "num_boxes": n_boxes}
            for f, (key, dtype, cols) in enumerate(_FIELDS):
                nbytes = lib.lako_obj36_field_size(handle, i, f)
                ptr = lib.lako_obj36_field(handle, i, f)
                arr = np.frombuffer(
                    (ctypes.c_char * nbytes).from_address(ptr), dtype=dtype
                ).copy()
                if cols is not None:
                    arr = arr.reshape(n_boxes, -1 if cols == -1 else cols)
                arr.setflags(write=False)
                item[key] = arr
            data.append(item)
            if topk is not None and len(data) == topk:
                break
        return data
    finally:
        lib.lako_obj36_close(handle)
