"""Throughput of obj36 TSV ingestion: Python csv+base64 vs native C++.

Builds a synthetic shard at the real obj36 geometry (36 boxes, 2048-dim
f32 features — the reference's Faster-RCNN format, data_process/data/
utils.py:20-89; real shards are tens of GB) and times both loaders.

Run: python scripts/bench_obj36.py [n_rows]
Writes artifacts/obj36_bench.json.
"""

import base64
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lako_tpu.data.vision import load_obj_tsv
from lako_tpu.data.vision_native import load_obj_tsv_native


def write_shard(path, n_rows, n_boxes=36, feat_dim=2048):
    rs = np.random.default_rng(0)
    b64 = lambda a: base64.b64encode(a.tobytes()).decode()
    with open(path, "w") as f:
        for i in range(n_rows):
            boxes = rs.uniform(0, 100, size=(n_boxes, 4)).astype(np.float32)
            f.write("\t".join([
                f"img_{i}", "480", "640",
                b64(rs.integers(0, 1600, n_boxes).astype(np.int64)),
                b64(rs.random(n_boxes).astype(np.float32)),
                b64(rs.integers(0, 400, n_boxes).astype(np.int64)),
                b64(rs.random(n_boxes).astype(np.float32)),
                str(n_boxes),
                b64(boxes),
                b64(rs.standard_normal((n_boxes, feat_dim))
                    .astype(np.float32)),
            ]) + "\n")
    return Path(path).stat().st_size


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    with tempfile.TemporaryDirectory() as td:
        tsv = f"{td}/shard.tsv"
        print(f"writing {n_rows} rows ...", flush=True)
        nbytes = write_shard(tsv, n_rows)
        mb = nbytes / 1e6

        t0 = time.perf_counter()
        nat = load_obj_tsv_native(tsv)
        t_native = time.perf_counter() - t0

        t0 = time.perf_counter()
        py = load_obj_tsv(tsv, backend="python")
        t_python = time.perf_counter() - t0

        assert len(py) == len(nat) == n_rows
        np.testing.assert_array_equal(py[-1]["features"],
                                      nat[-1]["features"])

    out = {
        "rows": n_rows, "file_mb": round(mb, 1),
        "python_s": round(t_python, 2),
        "python_mb_per_s": round(mb / t_python, 1),
        "native_s": round(t_native, 2),
        "native_mb_per_s": round(mb / t_native, 1),
        "speedup": round(t_python / t_native, 2),
    }
    print(json.dumps(out))
    Path("artifacts").mkdir(exist_ok=True)
    Path("artifacts/obj36_bench.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
