"""Shared CLI plumbing for the PMR / VCR trainers.

Replaces the reference's ~70-flag argparse blocks (run_PMR_ModCR.py:452-681)
with the subset that is actually read on the production path, keeping the
original flag names where they exist.  Everything else lives in the typed
configs (core/config.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
from typing import Dict, Optional

import numpy as np

from multimodal_context_reasoning_tpu.core.config import ModCRConfig, TrainConfig
from multimodal_context_reasoning_tpu.data.collate import BatchSpec
from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
from multimodal_context_reasoning_tpu.data.tokenization import (
    HashTokenizer,
    HFTokenizer,
    RobertaHashTokenizer,
)


def build_arg_parser(task: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"ModCR-TPU {task} trainer")
    # reference flag names (run_PMR_ModCR.py:452-681) where applicable
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--output_dir", type=str, default=f"output/{task}")
    p.add_argument("--eval_model_dir", type=str, default="")
    p.add_argument("--per_gpu_train_batch_size", type=int, default=16)
    p.add_argument("--per_gpu_eval_batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--adam_epsilon", type=float, default=1e-5)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--scheduler", type=str, default="linear",
                   choices=("linear", "constant"))
    p.add_argument("--num_train_epochs", type=int, default=30)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--seed", type=int, default=88)
    p.add_argument("--valid_steps", type=int, default=400)
    p.add_argument("--epoch_begin", type=int, default=2)
    p.add_argument("--max_seq_length", type=int, default=140)
    p.add_argument("--max_img_seq_length", type=int, default=50)
    # data locations (the reference hardcodes relative paths; we take flags)
    p.add_argument("--train_file", type=str, default="")
    p.add_argument("--val_file", type=str, default="")
    p.add_argument("--test_file", type=str, default="")
    p.add_argument("--img_feat_file", type=str, default="",
                   help="pickle: {img-id: {'features': [N,2054], ...}}")
    p.add_argument("--bert_tokenizer_dir", type=str, default="")
    p.add_argument("--roberta_tokenizer_dir", type=str, default="")
    # in-tree subword loaders (data/subword.py) — preferred over the HF
    # dirs when given; the reference's exact file formats
    p.add_argument("--bert_vocab_file", type=str, default="",
                   help="WordPiece vocab.txt → in-tree WordPieceTokenizer")
    p.add_argument("--roberta_vocab_file", type=str, default="",
                   help="byte-BPE vocab.json → in-tree ByteBPETokenizer "
                        "(with --roberta_merges_file), or a corpus-trained "
                        "roberta-style WordPiece vocab.txt (without)")
    p.add_argument("--roberta_merges_file", type=str, default="")
    # reference-checkpoint import (interop/assemble.py; any may be omitted)
    p.add_argument("--oscar_ckpt", type=str, default="",
                   help="Oscar-base BertImgModel torch weights (.bin/.pth)")
    p.add_argument("--chunkalign_ckpt", type=str, default="",
                   help="ChunkAlign pretrain dict (seq_enc.-prefixed)")
    p.add_argument("--roberta_ckpt", type=str, default="",
                   help="roberta-large torch weights")
    p.add_argument("--modcr_ckpt", "--reference_ckpt", type=str, default="",
                   help="reference ModCR checkpoint ({'net': ...} form, the "
                        "published best.pth layout, run_PMR_ModCR.py:802-806;"
                        " --reference_ckpt is an alias). One command gets "
                        "from a reference checkpoint to --do_test numbers.")
    p.add_argument("--cold_start", action="store_true",
                   help="stage-1 surgery: drop mapping-network/classifier "
                        "keys of --modcr_ckpt (run_PMR_ModCR.py:819-832)")
    # TPU-native
    p.add_argument("--num_labels", type=int, default=0,
                   help="candidate count override (run_PMR_ModCR.py:608; "
                        "0 = task default: PMR/VCR use 4)")
    p.add_argument("--img_feature_dim", type=int, default=0,
                   help="region-feature width override "
                        "(run_PMR_ModCR.py:588; 0 = default 2054)")
    p.add_argument("--drop_out", type=float, default=-1.0,
                   help="encoder-tower dropout override "
                        "(run_PMR_ModCR.py:585,719,738; <0 = config "
                        "default 0.3)")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-parallel axis size (0 = all devices)")
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--limit", type=int, default=0,
                   help="cap the number of examples (debug)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config for smoke tests / CI")
    p.add_argument("--skip_alignment_loss", action="store_true",
                   help="drop the (never-optimized) CALeC alignment loss "
                        "from the train graph: ~2x train memory headroom "
                        "(see BENCHMARKS.md)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the RoBERTa tower (memory for FLOPs)")
    p.add_argument("--remat_policy", type=str, default="dots",
                   choices=["full", "dots"],
                   help="with --remat: 'dots' keeps matmul outputs and "
                        "recomputes only elementwise work (faster); 'full' "
                        "recomputes everything (max memory saving)")
    p.add_argument("--flash_attention", action="store_true",
                   help="recompute-in-backward attention in the RoBERTa "
                        "tower (ops/flash.py): the fp32 [rows,H,L,L] "
                        "softmax temporaries are never saved as training "
                        "residuals; forward numerics are bit-identical")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over the 24 RoBERTa layers (stacked "
                        "params, structurally sequential backward — the "
                        "batch>=48 memory lever; see BENCHMARKS.md "
                        "'Batch-size headroom'). Param layout changes to "
                        "layers/layer/<leaf>; checkpoints convert via "
                        "models/roberta.py stack_layer_params")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8"],
                   help="inference-only dynamic W8A8 int8 matmuls in all "
                        "three towers (ops/quant.py; 2x MXU peak on v5e). "
                        "Ignored on the training path.")
    p.add_argument("--tensorboard_dir", type=str, default="",
                   help="stream train meters + val accuracy as TensorBoard "
                        "scalars (JSONL fallback without torch); the "
                        "reference's TensorboardLogger analogue "
                        "(utils/metric_logger.py:115-185)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of a few warm train "
                        "micro-steps into this dir (TensorBoard/xprof); "
                        "the reference has no profiling story at all "
                        "(SURVEY.md §5)")
    p.add_argument("--device_features", action="store_true",
                   help="keep the whole image-feature set resident in "
                        "device HBM once and gather per batch from int32 "
                        "ids (data/device_table.py) instead of shipping "
                        "[N, I, F] floats every step — the loop's largest "
                        "host->device transfer (~52 MB/step at batch 32)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "(DCN) runs; single-host/TPU-pod-slice jobs where "
                        "JAX auto-detects do not need it")
    return p


def maybe_init_distributed(args) -> None:
    """Multi-host bootstrap — the TPU-native replacement for the
    reference's NCCL env-init dance (run_PMR_ModCR.py:423-448): one call,
    after which the same pjit program spans all hosts over DCN."""
    if getattr(args, "multihost", False):
        import jax

        jax.distributed.initialize()


def configs_from_args(args) -> tuple[ModCRConfig, TrainConfig]:
    import dataclasses

    if getattr(args, "tiny", False):
        cfg = ModCRConfig.tiny()
    else:
        cfg = ModCRConfig(
            text_len=min(args.max_seq_length, 140),
            img_len=args.max_img_seq_length,
        ).with_dtype(args.compute_dtype)
    if getattr(args, "num_labels", 0):
        cfg = dataclasses.replace(cfg, num_labels=args.num_labels)
    if getattr(args, "img_feature_dim", 0):
        cfg = dataclasses.replace(
            cfg,
            global_encoder=dataclasses.replace(
                cfg.global_encoder, img_feature_dim=args.img_feature_dim),
            seq_encoder=dataclasses.replace(
                cfg.seq_encoder, img_feature_dim=args.img_feature_dim),
        )
    if getattr(args, "drop_out", -1.0) >= 0:
        # the reference applies --drop_out to BOTH Oscar towers' configs
        # (run_PMR_ModCR.py:719,738); RoBERTa keeps its own 0.1
        cfg = dataclasses.replace(
            cfg,
            global_encoder=dataclasses.replace(
                cfg.global_encoder, hidden_dropout_prob=args.drop_out),
            seq_encoder=dataclasses.replace(
                cfg.seq_encoder, hidden_dropout_prob=args.drop_out),
        )
    if getattr(args, "skip_alignment_loss", False):
        cfg = dataclasses.replace(cfg, compute_alignment=False)
    if getattr(args, "quantize", "none") != "none":
        if getattr(args, "do_train", False):
            raise SystemExit(
                "--quantize is inference-only (round() has zero gradient); "
                "drop it for --do_train"
            )
        cfg = cfg.with_quantize(args.quantize)
    if getattr(args, "remat", False):
        cfg = dataclasses.replace(
            cfg, roberta=dataclasses.replace(
                cfg.roberta, remat=True,
                remat_policy=getattr(args, "remat_policy", "dots"),
            )
        )
    if getattr(args, "flash_attention", False):
        cfg = dataclasses.replace(
            cfg, roberta=dataclasses.replace(
                cfg.roberta, mem_efficient_attention=True))
    if getattr(args, "scan_layers", False):
        cfg = dataclasses.replace(
            cfg, roberta=dataclasses.replace(cfg.roberta, scan_layers=True))
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        warmup_steps=args.warmup_steps,
        scheduler=args.scheduler,
        num_train_epochs=args.num_train_epochs,
        max_steps=args.max_steps,
        per_device_batch_size=args.per_gpu_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        seed=args.seed,
        valid_steps=args.valid_steps,
        epoch_begin=args.epoch_begin,
        compute_dtype=args.compute_dtype,
    )
    return cfg, tcfg


def load_tokenizers(args, cfg: ModCRConfig):
    """Tokenizer priority per tower: in-tree subword loaders from vocab
    files (data/subword.py, the reference's exact file formats) > HF
    tokenizer dirs > hermetic hash fallback (no hub access is ever
    attempted)."""
    if getattr(args, "bert_vocab_file", ""):
        from multimodal_context_reasoning_tpu.data.subword import (
            WordPieceTokenizer,
        )

        bert = WordPieceTokenizer.from_vocab_file(args.bert_vocab_file)
    elif args.bert_tokenizer_dir:
        from transformers import AutoTokenizer

        bert = HFTokenizer(AutoTokenizer.from_pretrained(args.bert_tokenizer_dir))
    else:
        bert = HashTokenizer(vocab_size=cfg.global_encoder.vocab_size)
    if getattr(args, "roberta_vocab_file", ""):
        from multimodal_context_reasoning_tpu.data.subword import (
            ByteBPETokenizer,
            WordPieceTokenizer,
        )

        if args.roberta_merges_file:
            rob = ByteBPETokenizer.from_files(
                args.roberta_vocab_file, args.roberta_merges_file)
        else:
            # merges-less = a corpus-trained roberta-style WordPiece vocab
            # (train_real_pmr.py/train_two_stage.py save these next to
            # their checkpoints) — the reload half of the train→serve loop
            rob = WordPieceTokenizer.from_roberta_style_vocab_file(
                args.roberta_vocab_file)
    elif args.roberta_tokenizer_dir:
        from transformers import AutoTokenizer

        rob = HFTokenizer(AutoTokenizer.from_pretrained(args.roberta_tokenizer_dir))
    else:
        rob = RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size)
    for tok, limit, tower in (
        (bert, cfg.global_encoder.vocab_size, "bert"),
        (rob, cfg.roberta.vocab_size, "roberta"),
    ):
        n = len(tok)
        if n > limit:
            # ids ≥ vocab_size are the silent-NaN trap (nn.Embed fill mode)
            raise ValueError(
                f"{tower} tokenizer emits {n} ids but the model vocab is "
                f"{limit}; grow the config vocab or shrink the vocab file")
    return bert, rob


def load_image_features(path: str, img_feature_dim: int):
    """Image-feature source:

    - ``*.mcrpack`` — the native indexed mmap store (zero-copy C++ reader,
      data/feature_store.py); preferred for production.
    - otherwise a reference-format pickle: {img-id: {'features': [N, 2054],
      'img_mask': ...}} (Data/VCRChunkAlign.py:586-592, 806-812), loaded
      whole into RAM like the reference does.
    """
    if path.endswith(".mcrpack"):
        from multimodal_context_reasoning_tpu.data.feature_store import (
            FeatureStore,
        )

        fs = FeatureStore(path)
        if fs.dim != img_feature_dim:
            raise ValueError(
                f"{path}: feature dim {fs.dim} != expected {img_feature_dim}"
            )
        return fs

    out: Dict[str, ImageFeatures] = {}
    with open(path, "rb") as f:
        raw = pickle.load(f)
    for key, val in raw.items():
        feats = val["features"] if isinstance(val, dict) else val
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 2 or feats.shape[1] != img_feature_dim:
            raise ValueError(f"{key}: bad feature shape {feats.shape}")
        out[str(key)] = ImageFeatures(features=feats, num_regions=feats.shape[0])
    return out


def batch_spec(cfg: ModCRConfig) -> BatchSpec:
    return BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len, num_labels=cfg.num_labels,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )


def write_test_predictions(path: str, examples, logits: np.ndarray) -> None:
    """Reference test() output: one JSON line per example with
    {total_id, img_id, prediction, answer_type} (run_PMR_ModCR.py:332-351)."""
    preds = np.argmax(logits, axis=-1)
    with open(path, "w") as f:
        for ex, pred in zip(examples, preds):
            atype = None
            if ex.answer_types:
                atype = ex.answer_types[int(pred)]
            f.write(json.dumps({
                "total_id": ex.example_id,
                "img_id": ex.img_id,
                "prediction": int(pred),
                "answer_type": atype,
            }) + "\n")
