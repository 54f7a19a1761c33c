"""Typed configuration for the whole framework.

One dataclass per subsystem, replacing the reference's two parallel argparse systems
(reference: src/options.py:15-150 and data_process/config.py:10-149) and its
string-valued booleans (``use_fact="yes"``). Knob names follow the reference where
the knob has the same meaning (``n_context``, ``text_maxlength``, ``stream``,
``attention_score_style``, ...) so configs translate mechanically.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _ConfigBase:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
                v = f.type.from_dict(v)
            elif isinstance(f.type, str) and isinstance(v, dict):
                # postponed annotations: resolve from this module's globals
                t = globals().get(f.type)
                if t is not None and dataclasses.is_dataclass(t):
                    v = t.from_dict(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Model architecture configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class T5Config(_ConfigBase):
    """T5 architecture hyperparameters (HF-compatible naming for weight import).

    Defaults are t5-base. Size presets via :func:`t5_config_for_size`.
    """

    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_decoder_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # t5 v1.0 uses relu; v1.1 uses gated-gelu
    tie_word_embeddings: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    # Fuse encoder self-attention into a Pallas kernel (TPU only; used when
    # attention-prob dropout is inactive). Sequences >= flash_min_length use
    # the K-streamed online-softmax kernel (ops/flash_streamed.py, the
    # measured-crossover default); shorter ones use the whole-block kernel
    # (ops/flash_attention.py) — which loses to XLA at reference shapes, so
    # the whole feature is off by default. Measure before enabling.
    use_flash_attention: bool = False
    flash_min_length: int = 512
    # streamed-kernel block sizes ((512,1024) = the measured-best sweep point
    # at L=2048; see ops/flash_streamed.py's table) — tune per shape
    flash_block_q: int = 512
    flash_block_k: int = 1024
    # FiDO-style decoder optimizations (arXiv 2212.08153; see PAPERS.md) for
    # from-scratch training/serving — both change the architecture, so they are
    # OFF for HF-checkpoint parity:
    # cross-attend only in every k-th decoder layer (None/1 = every layer)
    cross_attention_stride: Optional[int] = None
    # share one K/V head across all query heads in decoder cross-attention
    multiquery_cross_attention: bool = False

    def has_cross_attention(self, layer_idx: int) -> bool:
        stride = self.cross_attention_stride or 1
        # keep the LAST layer's cross-attention (FiDO keeps the topmost)
        return (self.num_decoder_layers - 1 - layer_idx) % stride == 0

    @property
    def d_inner(self) -> int:
        return self.num_heads * self.d_kv

    @property
    def is_gated_act(self) -> bool:
        return self.feed_forward_proj.startswith("gated-")


_T5_SIZES = {
    # name: (d_model, d_kv, d_ff, layers, heads)
    "tiny": (64, 16, 128, 2, 4),  # test-only size
    "small": (512, 64, 2048, 6, 8),
    "base": (768, 64, 3072, 12, 12),
    "large": (1024, 64, 4096, 24, 16),
    "3b": (1024, 128, 16384, 24, 32),
    "11b": (1024, 128, 65536, 24, 128),
}


def t5_config_for_size(size: str, **overrides) -> T5Config:
    """Preset matching HF ``t5-{size}`` configs (reference loads ``t5-``+model_size,
    train_reader.py:226-231)."""
    d_model, d_kv, d_ff, layers, heads = _T5_SIZES[size]
    cfg = T5Config(
        d_model=d_model,
        d_kv=d_kv,
        d_ff=d_ff,
        num_layers=layers,
        num_decoder_layers=layers,
        num_heads=heads,
    )
    return cfg.replace(**overrides) if overrides else cfg


@dataclass(frozen=True)
class BertConfig(_ConfigBase):
    """BERT architecture hyperparameters (bert-base-uncased defaults)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


@dataclass(frozen=True)
class LxmertConfig(_ConfigBase):
    """LXMERT architecture hyperparameters (unc-nlp/lxmert-base defaults;
    reference wrapper: data_process/model/lxmert.py:6-26)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    l_layers: int = 9       # language self-attention stack
    x_layers: int = 5       # cross-modality layers
    r_layers: int = 5       # visual self-attention stack
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2


def lxmert_config_tiny() -> LxmertConfig:
    return LxmertConfig(
        vocab_size=100,
        hidden_size=32,
        num_attention_heads=4,
        intermediate_size=64,
        l_layers=2,
        x_layers=1,
        r_layers=1,
        visual_feat_dim=16,
    )


def bert_config_tiny() -> BertConfig:
    return BertConfig(
        vocab_size=1000,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=128,
    )


@dataclass(frozen=True)
class RetrieverConfig(_ConfigBase):
    """Bi-encoder retriever head config (reference: src/model.py:352-372)."""

    bert: BertConfig = field(default_factory=BertConfig)
    indexing_dimension: int = 256
    apply_question_mask: bool = True
    apply_passage_mask: bool = True
    extract_cls: bool = False
    # PERF: 130 matches the reference (train_retriever.py) but is
    # lane-misaligned on TPU — the BERT attention chain pads 130 -> 256.
    # Measured on v5e (scripts/bench_retriever_train.py): maxlength 128 is
    # 36% faster at B=8 and 58% faster at B=32 for 2 fewer fact-tail tokens.
    passage_maxlength: int = 130
    question_maxlength: int = 130
    projection: bool = True
    asymmetric: bool = False  # reference `asymmetric_retri == "yes"` (src/model.py:395)


# ---------------------------------------------------------------------------
# Data / batching configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ReaderDataConfig(_ConfigBase):
    """Reader example construction + batching (reference: src/data.py:14-148).

    stream=1 packs [question + caption + fact] into one passage; stream=2 builds two
    passages [question+caption, fact] (reference src/data.py:130-141).
    """

    n_context: int = 10
    # PERF: 130 matches the reference, but is lane-misaligned on TPU (pads to
    # 256 inside attention). Measured on v5e: t5-large train steps are ~27%
    # faster at 128 (75.5 vs 95.5 ms/step, controlled A/B/A). Prefer 128 unless
    # matching reference runs exactly.
    text_maxlength: int = 130
    answer_maxlength: int = 20
    stream: int = 2
    use_fact: bool = True
    fact_use_way: str = "concate"  # "concate" | "separate"
    question_prefix: str = "question:"
    caption_prefix: str = "context:"
    fact_prefix: str = "fact:"

    @property
    def n_passages(self) -> int:
        if not self.use_fact:
            return 1
        if self.fact_use_way == "concate":
            return self.stream
        return 1 + self.n_context


# ---------------------------------------------------------------------------
# Optimizer / training configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class OptimConfig(_ConfigBase):
    """Optimizer + schedule (reference: src/util.py:149-245, src/options.py:20-48)."""

    optim: str = "adamw"  # "adam" | "adamw" | "adafactor" (O(rows+cols)
    # second-moment state for t5-3b+ on 16 GB chips; train/optim.py) |
    # "adamw8bit" (full Adam semantics, int8 blockwise moments +
    # stochastic rounding, 2 bytes/param of state; train/optim8.py)
    lr: float = 1e-4
    weight_decay: float = 0.1
    clip: float = 1.0
    scheduler: str = "linear"  # "fixed" | "linear"
    warmup_steps: int = 1000
    total_steps: int = 1000
    scheduler_steps: Optional[int] = None
    min_ratio: float = 0.0
    fixed_lr: bool = False
    accumulation_steps: int = 1
    # Layerwise LR decay over BERT encoder layers (reference util.py:185-227).
    layerwise_decay: Optional[float] = None
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-6
    # None → match the reference per optimizer: torch Adam bias-corrects,
    # HF AdamW(correct_bias=False) does not (src/util.py:224,232).
    adam_correct_bias: Optional[bool] = None


@dataclass(frozen=True)
class MeshConfig(_ConfigBase):
    """Device mesh layout. data=DP axis, model=TP axis (replaces the reference's
    NCCL process-group setup, src/slurm.py:44-160)."""

    data: int = -1  # -1: all devices on the data axis
    model: int = 1
    # pipeline-parallel stages (parallel/pp_train.py): >1 adds a 'pipe' mesh
    # axis and routes training through the full-model GPipe step — beyond
    # the reference (SURVEY §2.7: DDP only), needed for t5-3b/11b stacks
    pipe: int = 1
    batch_axis: str = "data"
    model_axis: str = "model"
    pipe_axis: str = "pipe"


@dataclass(frozen=True)
class ReaderTrainConfig(_ConfigBase):
    """Reader training loop (reference: train_reader.py:37-120, run_okvqa_train.sh)."""

    model_size: str = "base"
    per_device_batch_size: int = 8
    eval_batch_size: int = 8
    epochs: int = 20
    early_stop: int = 3
    # Run the dev-set decode (and the best-dev/patience/`last`-checkpoint
    # bookkeeping) every k-th epoch; the final epoch always evaluates. 1 is
    # the reference's evaluate-every-epoch semantics (train_reader.py:87);
    # larger values are for short-epoch regimes where the dev decode is the
    # epoch wall-clock bound.
    eval_every: int = 1
    seed: int = 0
    eval_max_length: int = 50
    warmup_fraction: float = 0.06  # reference train_reader.py:261
    use_remat: bool = True  # = --use_checkpoint activation checkpointing
    # Remat policy for the ENCODER blocks (the decoder is never remat'd —
    # its teacher-forced pass is short): None/'full' | 'dots'. Measured
    # equal-or-worse than 'full' at t5-large (models/t5/model.py docstring);
    # the knob exists for deeper models / longer sequences.
    remat_policy: Optional[str] = None
    dtype: str = "bfloat16"
    # Master-parameter (and therefore Adam-moment) dtype. "float32" keeps f32
    # masters with bf16 compute — the conservative default. "bfloat16" trains
    # with pure-bf16 state: measured 28.7 → 13.4 ms optimizer segment at the
    # B=8 t5-large reference config (79.5 → 64.0 ms step, 30.4 → 37.8% MFU —
    # artifacts/headline_levers.json); both segments are at their state-dtype
    # bandwidth floors. bf16 masters risk stalled updates once |Δw/w| falls
    # below bf16's ~2^-8 relative resolution — use for throughput studies or
    # short fine-tunes, not long convergence-critical runs.
    param_dtype: str = "float32"
    # Capture an XLA/TPU trace of a few steady-state train steps (after the
    # compile step) into this directory — viewable in TensorBoard/xprof
    # (core/profiling.py). None = off.
    profile_dir: Optional[str] = None
    # Decode backend for eval: "auto" uses the stacked scan-over-layers engine
    # (models/t5/engine.py) whenever the model supports it, "flax" forces the
    # layer-unrolled path, "engine" requires the engine (errors if unsupported).
    decode_backend: str = "auto"
    # Train-step backend: "flax" (unrolled) or "scan" (lax.scan over stacked
    # layers + per-layer remat — O(1) compile scaling for t5-3b+ readers).
    train_backend: str = "flax"
    # "native" (model dtype) or "int8" cross-KV quantization for decode.
    decode_kv_dtype: str = "native"
    # "native" or "int8" weight-only quantization for the decode engine's
    # per-step matmul weights (halves the memory-bound step's HBM traffic;
    # v5e MXU also doubles int8 throughput).
    decode_weights_dtype: str = "native"
    # Steps per device call for chunked early-exit decode (None = one call for
    # the whole max_length; small values exit early on short answers).
    decode_chunk_size: Optional[int] = None
    # Beam-engine self-KV formulation: "allslots" (default, measured fastest)
    # | "gather" (+1.5% on chip, token flips at bf16 near-ties) | "flat".
    # Greedy decode ignores it (models/t5/beam_engine.py A/B).
    decode_self_attn_impl: str = "allslots"
    # Microbatches per step under pipeline parallelism (mesh.pipe > 1);
    # GPipe bubble fraction is (pipe-1)/(microbatches+pipe-1), so use
    # several x pipe for real runs.
    pp_microbatches: int = 1
    # "gpipe" (fwd-all-then-bwd-all, O(M) activation memory) or "1f1b"
    # (interleaved wavefront, O(pipe) activation memory — use when M must
    # grow to amortize the bubble but activations would not fit).
    pp_schedule: str = "gpipe"
    data: ReaderDataConfig = field(default_factory=ReaderDataConfig)
    optim: OptimConfig = field(default_factory=lambda: OptimConfig(lr=4e-5))
    mesh: MeshConfig = field(default_factory=MeshConfig)
    checkpoint_dir: str = "./checkpoint"
    name: str = "experiment"


@dataclass(frozen=True)
class RetrieverTrainConfig(_ConfigBase):
    """Retriever distillation loop (reference: train_retriever.py:37-154)."""

    per_device_batch_size: int = 8
    eval_batch_size: int = 8
    epochs: int = 10
    early_stop: int = 3
    seed: int = 0
    n_context: int = 10
    dtype: str = "bfloat16"
    retriever: RetrieverConfig = field(default_factory=RetrieverConfig)
    optim: OptimConfig = field(default_factory=lambda: OptimConfig(lr=1e-4))
    mesh: MeshConfig = field(default_factory=MeshConfig)
    checkpoint_dir: str = "./checkpoint"
    name: str = "retriever"


@dataclass(frozen=True)
class AttentionSignalConfig(_ConfigBase):
    """Cross-attention score aggregation (reference: src/model.py:100-204,
    test_reader.py:107-122)."""

    attention_score_style: str = "mean"  # "mean" | "max" | "21mean"
    use_last_half_layer_attention: bool = False
    ans_attention: bool = False
    stream: int = 2
    n_context: int = 10
    pad_score: float = -5.0  # filler for missing facts (src/model.py:194)
