"""Serving-layer latency/throughput under concurrent load (VERDICT r3 #5).

Drives LakoService + MicroBatcher (lako_tpu/serve.py) on chip with
open-loop Poisson arrivals at several rates: per-request p50/p99 latency,
achieved throughput, and the batch-occupancy histogram — for the greedy
engine with micro-batching on vs off, plus the chunked early-exit and
beam-4 engines at one rate. The reference has no serving layer, so the bar
is the repo's own claim: micro-batching amortizes the per-device-call cost
across concurrent clients.

Model: t5-large at the serving-relevant eval shapes (N=2 passages, L=130,
max_length 50 — run_okvqa_test.sh). Weights are random-init (latency does
not depend on values). The driver thread pool issues requests on a Poisson
schedule; each request blocks on its MicroBatcher slot like an HTTP handler
thread would.

Run (TPU): python scripts/bench_serve.py [--duration 20] [--model small]
Output: artifacts/serve_latency.json
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

QUESTIONS = [
    "what sound does the cat make?",
    "what is the man holding in his hand?",
    "which sport is being played in the picture?",
    "what color is the bus on the street?",
    "what kind of food is on the table?",
    "where was this picture most likely taken?",
    "what brand is the laptop on the desk?",
    "how many animals are in the field?",
]
CAPTION = ("a man riding a skateboard down a street. a group of people "
           "standing around a food truck. a close up of a laptop on a desk.")


def _percentile(xs, p):
    xs = sorted(xs)
    if not xs:
        return None
    i = min(len(xs) - 1, max(0, int(round(p / 100 * (len(xs) - 1)))))
    return xs[i]


def run_load(batcher_submit, rate_hz, duration_s, seed=0):
    """Open-loop Poisson arrivals: a dispatcher thread fires request threads
    on an exponential schedule regardless of completions (so queueing delay
    is measured, not hidden by closed-loop backpressure)."""
    import random

    rng = random.Random(seed)
    latencies, errors = [], [0]
    threads = []
    lock = threading.Lock()

    def fire(i):
        req = {"question": QUESTIONS[i % len(QUESTIONS)], "caption": CAPTION}
        t0 = time.monotonic()
        try:
            batcher_submit(req)
            dt = time.monotonic() - t0
            with lock:
                latencies.append(dt)
        except Exception:   # noqa: BLE001
            with lock:
                errors[0] += 1

    t_end = time.monotonic() + duration_s
    i = 0
    sent = 0
    start = time.monotonic()
    while time.monotonic() < t_end:
        th = threading.Thread(target=fire, args=(i,))
        th.start()
        threads.append(th)
        i += 1
        sent += 1
        time.sleep(rng.expovariate(rate_hz))
    for th in threads:
        th.join(timeout=240)
    wall = time.monotonic() - start
    return {
        "offered_rate_hz": rate_hz,
        "sent": sent,
        "completed": len(latencies),
        "errors": errors[0],
        "throughput_hz": round(len(latencies) / wall, 2),
        "p50_ms": round(1e3 * _percentile(latencies, 50), 1),
        "p99_ms": round(1e3 * _percentile(latencies, 99), 1),
        "mean_ms": round(1e3 * sum(latencies) / max(1, len(latencies)), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--model", default="large")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--window-ms", type=float, default=25.0)
    ap.add_argument("--rates", type=float, nargs="*",
                    default=[2.0, 5.0, 10.0, 20.0])
    ap.add_argument("--out", default="artifacts/serve_latency.json")
    ap.add_argument("--knee", action="store_true",
                    help="escalate offered rate (x1.5 steps) until p99 blows "
                         "up: the single-chip saturation point, measured "
                         "with engine_policy=auto")
    ap.add_argument("--knee-max-rate", type=float, default=200.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from lako_tpu.core.config import ReaderDataConfig, t5_config_for_size
    from lako_tpu.serve import LakoService, MicroBatcher, ServiceConfig
    from tests.fixtures import make_tokenizer

    tok = make_tokenizer()
    t5_cfg = t5_config_for_size(args.model, vocab_size=tok.vocab_size,
                                dropout_rate=0.0)
    data_cfg = ReaderDataConfig(n_context=1, text_maxlength=130, stream=2,
                                answer_maxlength=8)

    def build_service(**kw):
        cfg = ServiceConfig(batch_size=args.batch, max_length=50,
                            n_context=1, data=data_cfg, dtype="bfloat16",
                            batch_window_ms=args.window_ms, **kw)
        model_shell = None
        import numpy as np

        from lako_tpu.models.t5 import FiDT5

        model_shell = FiDT5(t5_cfg, dtype=jnp.bfloat16)
        params = jax.jit(lambda r: model_shell.init(
            r, jnp.zeros((1, 2, 130), jnp.int32), jnp.ones((1, 2, 130), bool),
            jnp.zeros((1, 8), jnp.int32))["params"])(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                        params)
        return LakoService(cfg, t5_cfg, params, tok)

    results = {"config": {"model": args.model, "batch": args.batch,
                          "window_ms": args.window_ms,
                          "duration_s": args.duration,
                          "max_length": 50, "n_passages": 2, "L": 130}}

    # requests carry one fact so use_fact packing stays on (N=2)
    FACT = [{"sentence": "the skateboard is a board with wheels.", "id": 0,
             "score": 1.0}]

    def warm(service):
        service.answer(QUESTIONS[0], CAPTION, facts=FACT)

    # ---- greedy engine: micro-batching ON, rate sweep ---------------------
    svc = build_service()
    warm(svc)
    batcher = MicroBatcher(svc, args.batch, args.window_ms / 1e3)
    sweep = []
    for rate in args.rates:
        batcher.batch_occupancy.clear()
        r = run_load(lambda q: batcher.submit(dict(q, fact=FACT)),
                     rate, args.duration, seed=int(rate * 10))
        r["batcher"] = batcher.stats()
        sweep.append(r)
        print(json.dumps(r), flush=True)
    results["greedy_microbatch"] = sweep

    # ---- greedy engine: micro-batching OFF (every request its own batch) --
    lock = threading.Lock()

    def solo_submit(q):
        with lock:   # serialize device access like a single-worker server
            return svc.answer_batch([dict(q, fact=FACT)])[0]

    off = []
    for rate in args.rates[:2]:
        r = run_load(solo_submit, rate, args.duration, seed=int(rate * 10))
        off.append(r)
        print(json.dumps(r), flush=True)
    results["greedy_no_batching"] = off

    # ---- chunked early-exit engine at one rate ------------------------------
    svc_c = build_service(decode_chunk_size=8)
    warm(svc_c)
    batcher_c = MicroBatcher(svc_c, args.batch, args.window_ms / 1e3)
    r = run_load(lambda q: batcher_c.submit(dict(q, fact=FACT)),
                 args.rates[1], args.duration, seed=7)
    r["batcher"] = batcher_c.stats()
    results["chunked_microbatch"] = r
    print(json.dumps(r), flush=True)

    # ---- beam-4 engine at one rate ------------------------------------------
    svc_b = build_service(num_beams=4)
    warm(svc_b)
    batcher_b = MicroBatcher(svc_b, args.batch, args.window_ms / 1e3)
    r = run_load(lambda q: batcher_b.submit(dict(q, fact=FACT)),
                 args.rates[0], args.duration, seed=9)
    r["batcher"] = batcher_b.stats()
    results["beam4_microbatch"] = r
    print(json.dumps(r), flush=True)

    # ---- saturation knee (VERDICT r4 #8): escalate the offered rate until
    # p99 blows past the knee criterion (5x the lowest-rate p99, or >20% of
    # sent requests unanswered within the run) — with engine_policy="auto"
    # so the occupancy-based greedy/chunked choice is exercised under load
    if args.knee:
        svc_a = build_service(engine_policy="auto",
                              policy_chunked_min_occupancy=max(
                                  1, args.batch // 2),
                              decode_chunk_size=8)
        warm(svc_a)
        batcher_a = MicroBatcher(svc_a, args.batch, args.window_ms / 1e3)
        knee_rows, base_p99 = [], None
        rate = args.rates[-1]
        while rate <= args.knee_max_rate:
            batcher_a.batch_occupancy.clear()
            svc_a.policy_decisions.clear()
            r = run_load(lambda q: batcher_a.submit(dict(q, fact=FACT)),
                         rate, args.duration, seed=int(rate))
            r["batcher"] = batcher_a.stats()
            from collections import Counter

            r["engine_decisions"] = dict(Counter(
                d[0] for d in svc_a.policy_decisions))
            knee_rows.append(r)
            print(json.dumps(r), flush=True)
            if base_p99 is None:
                base_p99 = r["p99_ms"]
            blown = (r["p99_ms"] > 5 * base_p99
                     or r["completed"] < 0.8 * r["sent"])
            if blown:
                results["knee_rate_hz"] = rate
                break
            rate = round(rate * 1.5, 1)
        results["knee_sweep_auto_policy"] = knee_rows
        if "knee_rate_hz" not in results:
            results["knee_rate_hz"] = None  # not reached within knee_max_rate

    print(json.dumps(results, indent=1))
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
