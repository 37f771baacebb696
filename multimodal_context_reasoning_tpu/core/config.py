"""Configuration dataclasses for the TPU-native ModCR framework.

These replace the reference's practice of pushing ad-hoc attributes onto a
HuggingFace ``BertConfig`` (reference: run_PMR_ModCR.py:717-748) with typed,
hashable dataclasses that can be closed over by jitted functions.

All sequence lengths are *static*: the data pipeline pads every batch to the
same shapes so the jitted step never recompiles (reference instead trims to
batch-max at collate time, Data/VCRChunkAlign.py:708-722, which would force
one XLA compilation per unique shape).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """BERT-family encoder hyperparameters.

    Matches the knobs the reference reads off its BertConfig for both the
    Oscar-base global encoder (modeling/modeling_transfomres.py:564-694) and
    the ChunkAlign sequence encoder (modeling/modeling_vcr_chunkalign_v10.py:235-360).
    """

    vocab_size: int = 30567  # bert-base-uncased 30522 + 45 <|det#|> tokens (run_PMR_ModCR.py:715-716)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.3  # --drop_out default (run_PMR_ModCR.py:585)
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # Image-region stream (reference: img_embedding Linear(2054, 768),
    # modeling_transfomres.py:592).
    img_feature_dim: int = 2054
    use_img_layernorm: bool = False
    img_layer_norm_eps: float = 1e-5
    # Computation dtype ("float32" | "bfloat16"); params always fp32.
    # bf16 activations feed the MXU at full rate; softmax stays fp32
    # (ops/attention.py probs_dtype).
    dtype: str = "float32"
    # Fused Pallas attention on TPU for the no-probs/no-dropout path
    # (ops/pallas_attention.py). Default OFF: measured on v5e at ModCR
    # shapes (L=130/138), XLA's own fusion of the einsum formulation is
    # ~25% faster than the hand kernel because L is one token over the
    # 128-lane boundary and the kernel pays 2x lane padding
    # (ops/PALLAS_NOTES.md has the numbers). Flip on for longer sequences.
    use_pallas: bool = False
    # "none" | "int8": route the projection/FFN matmuls through the dynamic
    # W8A8 int8 path (ops/quant.py) — inference-only, 2× MXU peak on v5e.
    # Param tree is unchanged (weights stay fp32; quantization happens in
    # the jitted graph).
    quantize: str = "none"
    # Flash-style recompute-in-backward attention (ops/flash.py): the
    # [B, H, Lq, Lk] fp32 softmax temporaries are never saved as training
    # residuals — they are recomputed one layer at a time in the backward.
    # Forward numerics are bit-identical to the einsum path (same rng
    # draw for dropout). This is the single-chip batch-size lever: the
    # batch-48 OOM's largest allocations were exactly these temporaries
    # across the 24 reasoner layers (BENCHMARKS.md "Batch-size headroom").
    mem_efficient_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def jnp_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class ChunkAlignConfig:
    """Staged-attention schedule of the ChunkAlign sequence encoder.

    Layer grouping reproduces CaptionBertEncoder
    (modeling_vcr_chunkalign_v10.py:166-168): layers [0,3) see chunk-internal
    text + image, layers [3,9) see everything, layers [9,12) are the
    cross-modal phase with chunk-mean queries and image-diagonal masking.
    """

    chunk_layers_end: int = 3       # chunk_attention_layers = [0, 1, 2]
    full_layers_end: int = 9        # cross_chunk_attention_layers = [3..8]
    # add_residual / add_local_residual are argparse store_true flags that
    # default to False (run_PMR_ModCR.py:574-575).
    add_residual: bool = False
    add_local_residual: bool = False
    # Number of CALeC reasoning layers over the fused CLS
    # (ChunkAlign_CLS_enc4_align_ensemble.cls_layer_num = 2, v10.py:881).
    cls_layer_num: int = 2
    cls_num_heads: int = 8          # cross_attention_lyx(hidden, 8) (v10.py:848)
    # Whether the CLS-fusion cross-attention masks out padded memory
    # positions.  The reference builds word_mask (v10.py:943-945) and hands
    # it to cls_layer_lyx (:976-977), but ClsLayer_lyx.forward never
    # forwards it into the attention (:857-858) — padded positions leak in
    # and results depend on batch padding.  True (default) masks properly
    # for static-shape invariance; False replicates the reference bug.
    mask_fusion_memory: bool = True


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    """RoBERTa-large reasoner with KV-prefix injection.

    The reference loads a vendored "adapter_transformers" RobertaModel whose
    forward accepts ``prompt_embeddings=`` and ``input_mask=`` kwargs
    (call site modeling_ensemble.py:501-502; the vendored blob itself is
    missing from the repo). We reconstruct the contract: a (B, P, H) tensor of
    prefix vectors that each attention layer prepends to its key/value stream
    (the same mechanism as the vendored BERT's ``history_state`` KV-prepend,
    a_transformers/modeling_bert.py BertSelfAttention), with ``input_mask``
    extending the attention mask over the P prefix slots. Queries come only
    from real tokens, so sequence length and pooling are unchanged.
    """

    vocab_size: int = 50310  # roberta-large 50265 + 45 <|det#|> tokens (run_PMR_ModCR.py:776-777)
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 514
    type_vocab_size: int = 2  # re-initialised to 2 types (run_PMR_ModCR.py:779-781)
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1  # roberta convention; position ids offset from it
    dtype: str = "float32"
    use_pallas: bool = False  # see EncoderConfig.use_pallas
    quantize: str = "none"    # see EncoderConfig.quantize
    mem_efficient_attention: bool = False  # see EncoderConfig; this is the
    # trainable tower, so it is where the flash backward buys batch size.
    # lax.scan over the 24 layers (one stacked param tree, XLA while loop).
    # The backward of a scan is structurally sequential, so at most ONE
    # layer's rematerialized temporaries are live at a time — with a
    # Python loop XLA hoists every layer's recompute (each depends only on
    # forward-saved inputs) and batch 48 kept 24 x 216 MB of attention
    # temporaries alive at once (measured: flash+loop still OOMed at
    # 20.09/15.75 GB; see BENCHMARKS.md "Batch-size headroom, round 5").
    # Also collapses trace/compile cost to O(1) in depth.  Param layout
    # changes to layers/layer/<leaf> with a leading [num_layers] axis;
    # models/roberta.py stack_layer_params/unstack_layer_params convert.
    scan_layers: bool = False
    # jax.checkpoint each layer in the backward pass (trades ~30% more
    # FLOPs for O(1) activation memory across the 24-layer tower).
    remat: bool = False
    # Rematerialization policy when remat=True:
    #   "full" — recompute everything (max memory saving);
    #   "dots" — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    #            keep the projection/FFN matmul OUTPUTS (the expensive
    #            FLOPs) and recompute only the cheap elementwise/softmax
    #            work — most of full-remat's memory saving at a fraction
    #            of its recompute cost (measured in BENCHMARKS.md).
    remat_policy: str = "full"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def jnp_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    """GPT-2 decoder with cross-attention for rationale generation.

    Mirrors the vendored GPT-2 (modeling/modeling_transfomres.py:266-968):
    pre-LN blocks, fused qkv as Conv1D (we store plain dense kernels; the
    checkpoint bridge transposes), optional cross-attention per block.
    """

    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: Optional[int] = None  # defaults to 4*n_embd
    activation_function: str = "gelu_new"
    resid_pdrop: float = 0.1
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02
    add_cross_attention: bool = True
    pad_token_id: int = 50256  # GPT-2 has no pad; reference uses tokenizer pad
    # True = HF GPT-2 semantics (LM head shares wte). The reference's
    # rationale family instead trains a separate untied
    # ``lm_head: Linear(n_embd, vocab, bias=False)`` (v10.py:1335) —
    # models/rationale.py forces False for that family.
    tie_word_embeddings: bool = True
    dtype: str = "float32"

    @property
    def inner_dim(self) -> int:
        return self.n_inner if self.n_inner is not None else 4 * self.n_embd

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Frozen CLIP tower hyperparameters (ViT-B/16 defaults).

    The reference loads OpenAI CLIP ViT-B/16 at import time
    (run_PMR_ModCR.py:450) and its ``clip_model`` / ``clip_model_r``
    ablations call ``encode_image`` / ``encode_text`` inside forward
    (modeling_ensemble.py:804-806,833-835).  models/clip.py rebuilds both
    towers in Flax; this config pins their geometry.
    """

    # Vision tower (ViT-B/16): 224² pixels, 16² patches -> 14×14 grid.
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12  # OpenAI convention: vision_width // 64
    # Text tower: 77-token causal transformer.
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # Joint embedding space (both towers project here).
    embed_dim: int = 512
    # Compute dtype; params stay fp32.  The reference runs CLIP in fp16 on
    # CUDA (clip.load default) and casts features to fp32 at the ensemble
    # fusion point (modeling_ensemble.py:810,846) — the clip_ensemble
    # modules reproduce that cast point.
    dtype: str = "float32"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def jnp_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @classmethod
    def tiny(cls) -> "CLIPConfig":
        """Small geometry for tests (same topology: cls token, pre-LN,
        causal text tower, joint projection)."""
        return cls(
            image_size=32, patch_size=8, vision_width=32, vision_layers=2,
            vision_heads=4, vocab_size=512, context_length=16, text_width=32,
            text_layers=2, text_heads=4, embed_dim=24,
        )


@dataclasses.dataclass(frozen=True)
class ModCRConfig:
    """Full ModCR composite (Abstract_Specific, modeling_ensemble.py:424-539)."""

    global_encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    seq_encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    chunkalign: ChunkAlignConfig = dataclasses.field(default_factory=ChunkAlignConfig)
    roberta: RobertaConfig = dataclasses.field(default_factory=RobertaConfig)
    num_labels: int = 4
    prefix_len: int = 5  # per view; total prefix = 2*prefix_len (modeling_ensemble.py:474,493)
    mapping_dropout: float = 0.1  # nn.Dropout(p=0.1) in both mapping networks (:440,443)
    # "mapped" = vision+alignment mapping networks (production);
    # "promptfuse" = learnable 2-vector prefix ablation (ensemble:458,477-481).
    prefix_mode: str = "mapped"
    # False = the "_wo_chual" ablation (v10.py:1252-1316): drop the ChunkAlign
    # sequence encoder; the fusion consumes the global encoder's views and
    # the alignment loss vanishes.
    use_seq_encoder: bool = True
    # Deduplicate the vision-prefix pass across an example's num_labels
    # candidate rows.  The pass (ensemble:466-475) sees only [CLS]+image,
    # and collate emits the K candidate rows of an example consecutively
    # with identical img_feat/img_mask (Data/VCRChunkAlign.py:690-741 keeps
    # one img_feat per example too) — so computing it once per example and
    # repeating the prefix is bit-identical on the deterministic path and
    # saves (K-1)/K of the vision-pass FLOPs (~4% of the forward).  Applied
    # only when deterministic=True: under training dropout the reference
    # draws per-row dropout masks inside the frozen encoder.
    dedup_vision_prefix: bool = True
    # Compute the CALeC attention-alignment loss. It requires materializing
    # three full [B, H, L, L] attention maps — the single largest HBM
    # tensor in the forward — and the production trainer does not optimize
    # it (loss = cls_loss alone, run_PMR_ModCR.py:204-208). False skips it
    # (inference / production training); True keeps it for diagnostics and
    # exact aux-output parity.
    compute_alignment: bool = True

    # Static batch geometry. text_len covers [CLS] premise [SEP] answer [SEP]
    # at the reference's --max_seq_length default (run_PMR_ModCR.py:565);
    # img_len covers region features (dataset caps at 50,
    # Data/VCRChunkAlign.py:536; collate trims to batch max :710-712 — we pad
    # to a fixed cap instead).
    text_len: int = 140
    img_len: int = 50
    roberta_len: int = 128
    max_chunks: int = 40

    @property
    def seq_len(self) -> int:
        return self.text_len + self.img_len

    @property
    def total_prefix_len(self) -> int:
        return 2 * self.prefix_len

    def with_dtype(self, dtype: str) -> "ModCRConfig":
        """Copy of this config with every submodel's compute dtype set."""
        return dataclasses.replace(
            self,
            global_encoder=dataclasses.replace(self.global_encoder, dtype=dtype),
            seq_encoder=dataclasses.replace(self.seq_encoder, dtype=dtype),
            roberta=dataclasses.replace(self.roberta, dtype=dtype),
        )

    def with_quantize(self, mode: str) -> "ModCRConfig":
        """Copy with every tower's matmul quantization mode set
        ("none" | "int8", see EncoderConfig.quantize). Inference-only."""
        return dataclasses.replace(
            self,
            global_encoder=dataclasses.replace(self.global_encoder, quantize=mode),
            seq_encoder=dataclasses.replace(self.seq_encoder, quantize=mode),
            roberta=dataclasses.replace(self.roberta, quantize=mode),
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "ModCRConfig":
        raw = json.loads(text)
        raw["global_encoder"] = EncoderConfig(**raw.get("global_encoder", {}))
        raw["seq_encoder"] = EncoderConfig(**raw.get("seq_encoder", {}))
        raw["chunkalign"] = ChunkAlignConfig(**raw.get("chunkalign", {}))
        raw["roberta"] = RobertaConfig(**raw.get("roberta", {}))
        return cls(**raw)

    @classmethod
    def tiny(cls) -> "ModCRConfig":
        """A tiny config for tests and dry-runs (same topology, small dims).

        The encoder keeps all three schedule stages but with 4 layers
        (1 chunk + 1 full + 2 cross-modal) to keep CPU compile times sane.
        """
        enc = EncoderConfig(
            vocab_size=256, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=128, img_feature_dim=20,
        )
        rob = RobertaConfig(
            vocab_size=256, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=128,
        )
        sched = ChunkAlignConfig(chunk_layers_end=1, full_layers_end=2)
        return cls(
            global_encoder=enc, seq_encoder=enc, roberta=rob, chunkalign=sched,
            text_len=16, img_len=8, roberta_len=20, max_chunks=8,
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: run_PMR_ModCR.py argparse defaults)."""

    learning_rate: float = 1e-5       # :612
    seq_enc_lr_scale: float = 0.1     # seq_enc param group lr*0.1 (:127-135)
    weight_decay: float = 0.0         # the reference parses --weight_decay
                                      # 0.05 (:613) but never passes it to
                                      # AdamW (:137) -> effective 0.0
    adam_epsilon: float = 1e-5        # :614
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_grad_norm: float = 1.0        # :615
    warmup_steps: int = 0             # :616
    scheduler: str = "linear"         # :617 ("constant" or "linear")
    num_train_epochs: int = 30        # :619
    max_steps: int = -1               # :621
    per_device_batch_size: int = 16   # :602 (examples; x4 candidates inside)
    gradient_accumulation_steps: int = 1  # :610 (VCR uses 4, run_vcr_ModCR.py:605)
    seed: int = 88                    # :629
    valid_steps: int = 400            # :672
    epoch_begin: int = 2              # :671
    # TPU-specific
    compute_dtype: str = "bfloat16"   # matmul/activation dtype; params stay fp32
    mesh_shape: Tuple[int, ...] = (1, 1)  # (data, model)
    freeze_encoders: bool = True      # global+seq encoders run under stop_gradient
                                      # (torch.no_grad in v10.py:895-911, ensemble:466-471)
