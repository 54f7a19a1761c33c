"""PQ index at reference scale (VERDICT r4 #5): 300,600 × 256 corpus
(generate_fact_embeddings.py:34,100), PQ-32x8 vs the exact DenseIndex.

Reports: train+encode wall, index bytes vs the f32 corpus, search qps for the
full OK-VQA query load (9,009+5,046), and recall@{1,5,20,100,500} against the
exact index — the reference's IndexPQ tradeoff (src/index.py:22-25) with
numbers attached. Corpus is synthetic but CLUSTERED (Gaussian mixture), since
PQ recall on i.i.d. noise is meaninglessly pessimistic and real fact
embeddings are strongly clustered.

Usage (TPU): python scripts/bench_pq.py
Output: artifacts/pq_300k.json
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=300_600)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--queries", type=int, default=9_009 + 5_046)
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--clusters", type=int, default=512)
    ap.add_argument("--m", type=int, default=32,
                    help="subquantizers (8 bits each)")
    ap.add_argument("--out", default="artifacts/pq_300k.json")
    args = ap.parse_args()

    from lako_tpu.retrieval.index import DenseIndex
    from lako_tpu.retrieval.pq import PQIndex

    rng = np.random.default_rng(0)
    print(f"[bench_pq] building clustered {args.corpus}x{args.dim} corpus...",
          flush=True)
    centers = rng.normal(size=(args.clusters, args.dim)).astype(np.float32)
    assign = rng.integers(0, args.clusters, args.corpus)
    emb = (centers[assign]
           + 0.35 * rng.normal(size=(args.corpus, args.dim))).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    qa = rng.integers(0, args.clusters, args.queries)
    q = (centers[qa]
         + 0.35 * rng.normal(size=(args.queries, args.dim))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    exact = DenseIndex(emb)
    ids_x, _ = exact.search(q[:2048], k=args.k)
    t0 = time.perf_counter()
    ids_exact, _ = exact.search(q, k=args.k)
    dt_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    pq = PQIndex.train(emb, n_subquantizers=args.m, n_bits=8)
    dt_train = time.perf_counter() - t0
    print(f"[bench_pq] train+encode: {dt_train:.1f}s, "
          f"{pq.nbytes()/1e6:.1f} MB vs {emb.nbytes/1e6:.1f} MB", flush=True)

    ids_w, _ = pq.search(q[:2048], k=args.k)  # warm/compile
    _ = int(ids_w.sum())
    t0 = time.perf_counter()
    ids_pq, _ = pq.search(q, k=args.k)
    dt_pq = time.perf_counter() - t0

    recalls = {}
    for kk in (1, 5, 20, 100, 500):
        if kk > args.k:
            continue
        hits = [len(set(map(int, ids_pq[i][:kk]))
                    & set(map(int, ids_exact[i][:kk]))) / kk
                for i in range(0, args.queries, max(1, args.queries // 2000))]
        recalls[f"recall@{kk}"] = round(float(np.mean(hits)), 4)

    out = {
        "metric": "pq_search_queries_per_sec",
        "corpus": args.corpus, "dim": args.dim, "k": args.k,
        "queries": args.queries, "pq": f"{args.m}x8",
        "value": round(args.queries / dt_pq, 1),
        "exact_qps": round(args.queries / dt_exact, 1),
        "train_encode_seconds": round(dt_train, 1),
        "index_bytes": pq.nbytes(),
        "corpus_bytes_f32": int(emb.nbytes),
        "compression_x": round(emb.nbytes / pq.nbytes(), 1),
        **recalls,
    }
    print(json.dumps(out, indent=1))
    pathlib.Path("artifacts").mkdir(exist_ok=True)
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
