"""Reference-scale dense retrieval: 300,600 x 256 corpus (the exact LaKo KG
scale, generate_fact_embeddings.py:34,100), top-500 search for a full
OK-VQA-sized query set (9,009 train + 5,046 test, deal_data.py comments),
through DenseIndex (single chip) — prints queries/sec and memory headroom.

Correctness at scale is asserted against a numpy oracle on a query subsample.

Usage: python scripts/bench_retrieval.py [--corpus 300600] [--dim 256]
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
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--approx", action="store_true",
                    help="also run the approx_max_k index and report its "
                         "measured recall vs the exact ids + its qps")
    ap.add_argument("--recall-target", type=float, default=0.95)
    args = ap.parse_args()

    import jax

    from lako_tpu.retrieval.index import DenseIndex

    rng = np.random.default_rng(0)
    print(f"[bench_retrieval] building {args.corpus}x{args.dim} corpus...",
          flush=True)
    emb = rng.normal(size=(args.corpus, args.dim)).astype(np.float32)
    q = rng.normal(size=(args.queries, args.dim)).astype(np.float32)

    index = DenseIndex(emb)
    # warm (compile + first-search autotune)
    ids_w, _ = index.search(q[:args.batch], k=args.k)
    _ = int(ids_w.sum())

    t0 = time.perf_counter()
    ids, scores = index.search(q, k=args.k, batch_size=args.batch)
    _ = int(ids[-1].sum())  # host-side result already; fence is the array itself
    dt = time.perf_counter() - t0
    qps = args.queries / dt

    # exactness vs numpy oracle on a subsample
    sample = rng.integers(0, args.queries, size=8)
    ref_scores = q[sample] @ emb.T
    ref_top = np.argsort(-ref_scores, axis=1)[:, :args.k]
    for row, s in enumerate(sample):
        ours = set(int(i) for i in ids[s])
        theirs = set(int(i) for i in ref_top[row])
        overlap = len(ours & theirs) / args.k
        assert overlap >= 0.999, (s, overlap)  # ties at the boundary only
    print(f"[bench_retrieval] exactness vs numpy oracle: OK", flush=True)

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    headroom = None
    if stats:
        headroom = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    out = {
        "metric": "dense_retrieval_queries_per_sec",
        "corpus": args.corpus, "dim": args.dim, "k": args.k,
        "queries": args.queries,
        "seconds": round(dt, 3),
        "value": round(qps, 1),
        "unit": "queries/sec",
        "memory": headroom,
    }

    # "fast" (bf16 scores + exact top_k): measured recall vs the f32-exact
    # run over every query — the evidence behind the ~0.996 claim
    fidx = DenseIndex(emb, method="fast")
    f_w, _ = fidx.search(q[:args.batch], k=args.k)
    _ = int(f_w.sum())
    t0 = time.perf_counter()
    f_ids, _ = fidx.search(q, k=args.k, batch_size=args.batch)
    _ = int(f_ids[-1].sum())
    f_dt = time.perf_counter() - t0
    f_hits = sum(len(set(map(int, a)) & set(map(int, e)))
                 for a, e in zip(f_ids, ids))
    out["fast"] = {
        "qps": round(args.queries / f_dt, 1),
        "seconds": round(f_dt, 3),
        "measured_recall_vs_exact": round(
            f_hits / (args.queries * args.k), 4),
        "speedup_vs_exact": round(dt / f_dt, 2),
    }
    del fidx

    if args.approx:
        aidx = DenseIndex(emb, method="approx",
                          recall_target=args.recall_target)
        a_w, _ = aidx.search(q[:args.batch], k=args.k)
        _ = int(a_w.sum())
        t0 = time.perf_counter()
        a_ids, _ = aidx.search(q, k=args.k, batch_size=args.batch)
        _ = int(a_ids[-1].sum())
        a_dt = time.perf_counter() - t0
        # measured recall vs the exact run, over every query
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(a_ids, ids))
        recall = hits / (args.queries * args.k)
        out["approx"] = {
            "qps": round(args.queries / a_dt, 1),
            "seconds": round(a_dt, 3),
            "recall_target": args.recall_target,
            "measured_recall_vs_exact": round(recall, 4),
            "speedup_vs_exact": round(dt / a_dt, 2),
        }

    print(json.dumps(out), flush=True)
    art = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    art.mkdir(exist_ok=True)
    (art / "retrieval_qps.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
