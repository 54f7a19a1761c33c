"""Serving: an end-to-end knowledge-based QA service.

The reference has no serving layer (SURVEY.md §1); this provides one for
production use of the trained pipeline: load reader + retriever + fact index
once, then ``answer()`` runs retrieve → pack → FiD decode in fixed-shape jitted
calls. Requests are padded into the compiled batch size, so any request rate
hits the same two executables. A stdlib HTTP endpoint (`lako serve`) wraps it.
"""

from __future__ import annotations

import json
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lako_tpu.core.config import (
    ReaderDataConfig,
    RetrieverConfig,
    T5Config,
)
from lako_tpu.core.logging import get_logger
from lako_tpu.data import ReaderCollator, ReaderDataset
from lako_tpu.models.retriever import Retriever
from lako_tpu.models.t5 import FiDT5
from lako_tpu.models.t5.decode import make_generate_fn


@dataclass
class ServiceConfig:
    batch_size: int = 8
    max_length: int = 50
    n_context: int = 10
    data: ReaderDataConfig = field(default_factory=ReaderDataConfig)
    dtype: str = "bfloat16"
    num_beams: int = 1
    # token elimination (arXiv 2310.13682): keep only this many encoder states
    # for decode; None = all. Greedy path only.
    keep_tokens: Optional[int] = None
    decode_backend: str = "auto"     # "auto" | "engine" | "flax"
    decode_kv_dtype: str = "native"  # "native" | "int8"
    decode_weights_dtype: str = "native"  # "native" | "int8" (weight-only)
    decode_chunk_size: Optional[int] = None
    # Beam-engine self-KV formulation (allslots | gather | flat); greedy
    # ignores it. See ReaderTrainConfig.decode_self_attn_impl.
    decode_self_attn_impl: str = "allslots"
    # Engine selection per device batch ("fixed" = always decode_chunk_size
    # as configured; "auto" = pick chunked early-exit decode only when the
    # batch's REAL occupancy reaches policy_chunked_min_occupancy, full-run
    # greedy below it). Measured basis (artifacts/serve_latency.json +
    # docs/PERFORMANCE.md serving section): chunked decode wins offline at
    # B=128 (~252 vs ~165 ans/s) but LOSES at serving occupancy ~4, where
    # its extra host-loop dispatches outweigh the early exit. Greedy only:
    # the beam engine has no chunked variant, so num_beams > 1 ignores
    # "auto" (logged at init, not silent).
    engine_policy: str = "fixed"
    # None = max(batch_size // 2, 5): above the measured-loss occupancy ~4
    # and scaled to the configured batch, so "auto" is never inert by
    # default (an explicit value > batch_size is rejected at init).
    policy_chunked_min_occupancy: Optional[int] = None
    # Dynamic micro-batching for the HTTP server: concurrent requests that
    # arrive within batch_window_ms of each other are merged into ONE device
    # batch (up to batch_size). Amortizes the per-device-call dispatch cost
    # across independent clients; single-request latency gains at most the
    # window. 0 disables (each request is its own batch).
    batch_window_ms: float = 0.0
    # Tensor-parallel width for big-model serving (t5-3b+: the cross-KV
    # alone outgrows one chip at serving batch sizes). Params are committed
    # with the Megatron specs and the batch rides the data axis; GSPMD
    # partitions the whole decode (tests/test_engine_tp.py pins
    # token-for-token equality with single-device). devices must be
    # divisible by mesh_model, and batch_size by devices/mesh_model.
    mesh_model: int = 1


class LakoService:
    def __init__(
        self,
        cfg: ServiceConfig,
        t5_config: T5Config,
        reader_params,
        tokenizer,
        retriever: Optional[Retriever] = None,
        retriever_params=None,
        bert_tokenizer=None,
        index=None,                      # DenseIndex / PQIndex / NativeIndex
        id_to_sentence: Optional[Dict[int, str]] = None,
    ):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.model = FiDT5(t5_config, dtype=dtype)
        self.params = reader_params
        self._batch_sharding = None
        if cfg.mesh_model > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from lako_tpu.parallel.sharding import make_param_shardings

            n_dev = len(jax.devices())
            if n_dev % cfg.mesh_model:
                raise ValueError(
                    f"mesh_model={cfg.mesh_model} does not divide "
                    f"{n_dev} devices")
            data_par = n_dev // cfg.mesh_model
            if cfg.batch_size % data_par:
                raise ValueError(
                    f"batch_size={cfg.batch_size} not divisible by the "
                    f"data axis ({data_par})")
            mesh = Mesh(np.asarray(jax.devices()).reshape(
                data_par, cfg.mesh_model), ("data", "model"))
            self.params = jax.device_put(
                reader_params, make_param_shardings(mesh, reader_params))
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self.tokenizer = tokenizer
        self.collator = ReaderCollator(cfg.data, tokenizer)
        from lako_tpu.models.t5.decode import make_best_generate_fn

        def _make_gen(chunk_size):
            # num_beams > 1 routes to the ancestry-gather beam engine when
            # the model supports it (models/t5/beam_engine.py), flax beam
            # otherwise
            return make_best_generate_fn(
                self.model, max_length=cfg.max_length,
                keep_tokens=cfg.keep_tokens if cfg.num_beams == 1 else None,
                backend=cfg.decode_backend,
                kv_dtype=cfg.decode_kv_dtype,
                weights_dtype=cfg.decode_weights_dtype,
                chunk_size=chunk_size,
                num_beams=cfg.num_beams,
                self_attn_impl=(cfg.decode_self_attn_impl
                                if cfg.num_beams > 1 else "allslots"))

        if cfg.engine_policy not in ("fixed", "auto"):
            raise ValueError(
                f"engine_policy must be fixed|auto, got {cfg.engine_policy!r}")
        self._policy_threshold = (
            max(cfg.batch_size // 2, 5)
            if cfg.policy_chunked_min_occupancy is None
            else cfg.policy_chunked_min_occupancy)
        if cfg.engine_policy == "auto" and self._policy_threshold < 1:
            # the mirror failure of an unreachable threshold: <= 0 makes
            # every batch (occupancy 1 included) run chunked — the
            # measured-loss regime the policy exists to avoid
            raise ValueError(
                f"policy_chunked_min_occupancy={self._policy_threshold} "
                "must be >= 1; engine_policy='auto' would silently run "
                "chunked decode on every batch")
        if cfg.engine_policy == "auto" and self._policy_threshold > cfg.batch_size:
            if cfg.policy_chunked_min_occupancy is not None:
                raise ValueError(
                    f"policy_chunked_min_occupancy="
                    f"{self._policy_threshold} can never be reached with "
                    f"batch_size={cfg.batch_size}; engine_policy='auto' "
                    "would silently always run full-length")
            # default threshold (measured: chunked loses below occupancy
            # ~5) is out of reach at this batch size — auto degenerates to
            # full-length, which IS the measured-correct choice; say so.
            get_logger().warning(
                "engine_policy='auto' with batch_size=%d: chunked decode "
                "loses below occupancy ~5 (artifacts/serve_latency.json), "
                "so every batch will run the full-length engine",
                cfg.batch_size)
        full_chunk_size = cfg.decode_chunk_size
        self._generate_chunked = None
        if cfg.engine_policy == "auto":
            if cfg.num_beams == 1:
                # the auto policy needs BOTH programs: full-run greedy for
                # low-occupancy batches, chunked early-exit for full ones
                self._generate_chunked = _make_gen(cfg.decode_chunk_size or 16)
                full_chunk_size = None
            else:
                get_logger().warning(
                    "engine_policy='auto' applies to greedy decode only; "
                    "num_beams=%d runs the beam engine unconditionally",
                    cfg.num_beams)
        self._generate = _make_gen(full_chunk_size)
        # telemetry: ("chunked"|"full", occupancy) per device batch — the
        # policy's decisions are observable, not assumed. Bounded: a
        # long-running server must not grow host memory per batch forever.
        self.policy_decisions: Deque[tuple] = deque(maxlen=4096)

        self.retriever = retriever
        self.retriever_params = retriever_params
        self.bert_tokenizer = bert_tokenizer
        self.index = index
        self.id_to_sentence = id_to_sentence or {}
        if retriever is not None:
            from lako_tpu.retrieval.embed import make_embed_fn

            self._embed_q = make_embed_fn(retriever, "q")

    # -- retrieval -----------------------------------------------------------

    def retrieve_facts(self, questions: Sequence[dict]) -> List[List[dict]]:
        """questions: [{question, caption}] → per-question fact lists."""
        if self.index is None or self.retriever is None:
            return [[] for _ in questions]
        texts = [q["question"] + " " + q.get("caption", "") for q in questions]
        ids, mask = self.bert_tokenizer.batch_encode(
            texts, self.retriever.config.question_maxlength)
        emb = np.asarray(self._embed_q(self.retriever_params, jnp.asarray(ids),
                                       jnp.asarray(mask)), np.float32)
        k = min(self.cfg.n_context, getattr(self.index, "n", self.cfg.n_context))
        top_ids, scores = self.index.search(emb, k=k)
        out = []
        for row_ids, row_scores in zip(top_ids, scores):
            out.append([
                {"sentence": self.id_to_sentence.get(int(i), ""), "id": int(i),
                 "score": float(s)}
                for i, s in zip(row_ids, row_scores)
            ])
        return out

    # -- reading -------------------------------------------------------------

    def answer_batch(self, requests: Sequence[dict]) -> List[dict]:
        """requests: [{question, caption, fact?: [{sentence, id, score?}]}].
        Facts are retrieved for requests that don't carry their own."""
        requests = list(requests)
        need = [i for i, r in enumerate(requests) if not r.get("fact")]
        if need:
            retrieved = self.retrieve_facts([requests[i] for i in need])
            for i, facts in zip(need, retrieved):
                requests[i] = dict(requests[i], fact=facts)

        examples = [{
            "question": r["question"],
            "caption": r.get("caption", ""),
            "answer": {},
            "img_id": r.get("img_id", ""),
            "fact": r.get("fact", []),
            "target": None,
        } for r in requests]
        # empty fact lists break use_fact packing; degrade gracefully
        data_cfg = self.cfg.data
        if any(not e["fact"] for e in examples):
            data_cfg = data_cfg.replace(use_fact=False)
        ds = ReaderDataset(examples, data_cfg)
        collator = ReaderCollator(data_cfg, self.tokenizer)

        results: List[dict] = []
        B = self.cfg.batch_size
        for s in range(0, len(examples), B):
            chunk = [ds[i] for i in range(s, min(s + B, len(examples)))]
            batch = collator(chunk, pad_to=B)
            ids = jnp.asarray(batch.passage_ids)
            pmask = jnp.asarray(batch.passage_mask)
            if self._batch_sharding is not None:
                ids = jax.device_put(ids, self._batch_sharding)
                pmask = jax.device_put(pmask, self._batch_sharding)
            gen = self._generate
            if self._generate_chunked is not None:
                use_chunked = (len(chunk)
                               >= self._policy_threshold)
                if use_chunked:
                    gen = self._generate_chunked
                self.policy_decisions.append(
                    ("chunked" if use_chunked else "full", len(chunk)))
            tokens, _ = gen(self.params, ids, pmask)
            decoded = self.tokenizer.batch_decode(np.asarray(tokens))
            for k, item in enumerate(chunk):
                results.append({
                    "answer": decoded[k],
                    "facts": examples[s + k]["fact"][: self.cfg.n_context],
                })
        return results

    def answer(self, question: str, caption: str = "",
               facts: Optional[List[dict]] = None) -> dict:
        req = {"question": question, "caption": caption}
        if facts:
            req["fact"] = facts
        return self.answer_batch([req])[0]


class MicroBatcher:
    """Dynamic micro-batching: merge concurrent requests into one device
    batch.

    A single worker thread drains a queue; after the first request of a
    batch arrives it keeps collecting until ``max_batch`` requests are in
    hand or ``window_s`` has elapsed, then runs ONE ``answer_batch`` for all
    of them. Clients block on a per-request event. Per-request failures are
    isolated: a bad request poisons only its own slot (the batch is retried
    per-request on error)."""

    def __init__(self, service: LakoService, max_batch: int,
                 window_s: float):
        import queue
        import threading

        self._service = service
        self._max_batch = max_batch
        self._window = window_s
        self._q: "queue.Queue" = queue.Queue()
        # batch-occupancy telemetry: how many requests each device batch
        # actually carried (the micro-batcher's whole value proposition is
        # occupancy > 1 under concurrent load — measured, not assumed).
        # Bounded like LakoService.policy_decisions: telemetry must not be
        # an unbounded per-batch memory leak in a long-running server.
        self.batch_occupancy: Deque[int] = deque(maxlen=65536)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stats(self) -> dict:
        occ = self.batch_occupancy
        return {
            "batches": len(occ),
            "requests": int(sum(occ)),
            "mean_occupancy": (sum(occ) / len(occ)) if occ else 0.0,
            "max_occupancy": max(occ) if occ else 0,
        }

    def submit(self, request: dict, timeout: float = 120.0) -> dict:
        out = self.submit_many([request], timeout=timeout)[0]
        if "error" in out:
            raise ValueError(out["error"])
        return out

    def submit_many(self, requests: Sequence[dict],
                    timeout: float = 120.0) -> List[dict]:
        """Enqueue all requests at once (so a multi-item payload shares one
        batch instead of paying one window per item), then wait for all.
        All slots are drained before reporting, so a timeout on one slot
        does not discard results already computed for the others.

        Per-request isolation carries through to the return value (advisor
        r2): a failed slot yields ``{"error": ..., "index": i}`` in place,
        the successful slots keep their results — a bad item never discards
        its batch-mates' answers."""
        import threading
        import time

        slots = [{"req": r, "ev": threading.Event()} for r in requests]
        for slot in slots:
            self._q.put(slot)
        deadline = time.monotonic() + timeout
        timed_out = False
        for slot in slots:
            if not slot["ev"].wait(timeout=max(0.0, deadline
                                               - time.monotonic())):
                timed_out = True
        if timed_out:
            raise TimeoutError("micro-batch worker did not respond in time")
        return [s["result"] if "error" not in s
                else {"error": s["error"], "index": i}
                for i, s in enumerate(slots)]

    def _loop(self):
        import queue
        import time

        while True:
            slots = [self._q.get()]
            deadline = time.monotonic() + self._window
            while len(slots) < self._max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    slots.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            self.batch_occupancy.append(len(slots))
            try:
                results = self._service.answer_batch(
                    [s["req"] for s in slots])
                for s, r in zip(slots, results):
                    s["result"] = r
            except Exception:  # noqa: BLE001 — isolate the bad request(s)
                for s in slots:
                    try:
                        s["result"] = self._service.answer_batch(
                            [s["req"]])[0]
                    except Exception as e:  # noqa: BLE001
                        s["error"] = str(e)
            for s in slots:
                s["ev"].set()


def run_http_server(service: LakoService, host: str = "127.0.0.1",
                    port: int = 8080) -> None:
    """Stdlib HTTP endpoint: POST /answer {question, caption, fact?}.

    With cfg.batch_window_ms > 0 the server is threaded and concurrent
    requests are merged into shared device batches via MicroBatcher."""
    from http.server import (BaseHTTPRequestHandler, HTTPServer,
                             ThreadingHTTPServer)

    window = service.cfg.batch_window_ms / 1e3
    batcher = (MicroBatcher(service, service.cfg.batch_size, window)
               if window > 0 else None)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/answer":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                payload = json.loads(self.rfile.read(length))
                if isinstance(payload, dict):
                    payload = [payload]
                if batcher is not None:
                    out = batcher.submit_many(payload)
                else:
                    out = service.answer_batch(payload)
            except TimeoutError as e:   # server-side stall, not client error
                self.send_response(503)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return
            except Exception as e:  # noqa: BLE001 — report to client
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server_cls = ThreadingHTTPServer if batcher is not None else HTTPServer
    server_cls((host, port), Handler).serve_forever()
