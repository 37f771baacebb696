"""Fine-tune ModCR on REAL PMR data with a self-split held-out set.

The reference's end-to-end claim is its eval loop raising real validation
accuracy (run_PMR_ModCR.py:230-239, best checkpoint 0.8492).  This script
demonstrates the same property for the TPU framework on the data that ships
with the reference: `/root/reference/pmr_data/val-ori.jsonl` (1,538 labeled
examples) is split 80/20 (seeded shuffle), the full-size composite is
trained from random init on the train split, and held-out accuracy is
validated every `--valid_steps` optimizer steps.  The steps-vs-accuracy
curve lands in `<out>/curve.json` and the summary on stdout.

The repo ships no region-feature pickles (the reference downloads them out
of band), so image features are synthesized deterministically per img_id —
the learnable signal is the textual premise/answer stream through the
frozen-encoder + prefix-RoBERTa path, which is exactly the trainable
subgraph of the production recipe.  Tokenization uses the hermetic
HashTokenizers sized to the model vocabs (no hub access in this container).

Run (TPU, ~15 min at defaults):

    python scripts/train_real_pmr.py --steps 600 --batch 32

CPU smoke (tiny model):

    python scripts/train_real_pmr.py --tiny --steps 60 --batch 8 --limit 200
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_features(img_ids, dim: int, max_regions: int = 20):
    """Deterministic per-image region features (no feature pickles in-repo).

    Seeded from the img_id so train/val featurization agrees across runs and
    processes.
    """
    from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures

    import zlib

    out = {}
    for img_id in img_ids:
        # zlib.crc32 is process-stable (str hash is PYTHONHASHSEED-random)
        seed = zlib.crc32(f"pmr-feat:{img_id}".encode()) % (2**31)
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, max_regions + 1))
        out[str(img_id)] = ImageFeatures(
            features=rng.standard_normal((n, dim)).astype(np.float32),
            num_regions=n,
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="pmr", choices=["pmr", "vcr"],
                   help="vcr: load line-delimited vcr_val.json through the "
                        "VCR featurizer (answer-truncation heuristic, "
                        "run_vcr recipe: RoBERTa-body freeze stays OFF "
                        "here — random init has no pretrained body to "
                        "protect)")
    p.add_argument("--jsonl",
                   default="/root/reference/pmr_data/val-ori.jsonl",
                   help="comma-separated labeled jsonl files (val-ori + "
                        "test-ori are both labeled: 1538 + 1742 examples)")
    p.add_argument("--train_frac", type=float, default=0.8)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--eval_batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--warmup", type=int, default=50)
    p.add_argument("--valid_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=0,
                   help="cap total examples (CPU smoke)")
    p.add_argument("--tokenizer", choices=["corpus", "hash"],
                   default="corpus",
                   help="'corpus' (default): train a real WordPiece vocab "
                        "on the train split (data/subword.py) — distinct "
                        "words get distinct ids; 'hash': the legacy md5 "
                        "bucket fallback (collisions alias words)")
    p.add_argument("--vocab_budget", type=int, default=8192,
                   help="corpus tokenizer vocab size (before det tokens)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (CPU smoke)")
    p.add_argument("--midsize", action="store_true",
                   help="CPU-trainable reduced model at text lengths that "
                        "keep the prompt/answer intact (the tiny config's "
                        "16/20-token caps truncate the signal away)")
    p.add_argument("--roberta_dropout", type=float, default=None,
                   help="override dropout for the RoBERTa reasoner only "
                        "(encoders/mapping keep --dropout); the measured "
                        "middle ground between 0 (fast overfit) and the "
                        "full stack (no learning at full size)")
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--dropout", type=float, default=0.1,
                   help="uniform dropout for ALL sites. The reference's "
                        "0.3-encoder/0.1-reasoner stack (tuned for "
                        "fine-tuning from pretrained towers) blocks "
                        "from-scratch learning entirely: at lr 1e-4 a "
                        "fixed batch will not memorize in 60 steps with "
                        "the full stack, while each site alone (or 0.1 "
                        "uniform) reaches 100%% train acc by step 30 "
                        "(measured on the v5e, see BENCHMARKS.md)")
    p.add_argument("--out", default="/tmp/pmr_real")
    p.add_argument("--no_device_features", dest="device_features",
                   action="store_false", default=True,
                   help="disable the HBM-resident feature table "
                        "(data/device_table.py). With it, each step ships "
                        "[N] int32 image ids instead of [N, I, F] fp32 "
                        "features and gathers on device — the dominant "
                        "host->device transfer of the loop removed")
    args = p.parse_args(argv)

    import jax

    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig,
        TrainConfig,
    )
    from multimodal_context_reasoning_tpu.data.collate import BatchSpec
    from multimodal_context_reasoning_tpu.data.loader import DataLoader
    from multimodal_context_reasoning_tpu.data.pmr import (
        PMRDataset,
        load_pmr_jsonl,
    )
    from multimodal_context_reasoning_tpu.data.vcr import (
        VCRDataset,
        load_vcr_json,
    )
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
        RobertaHashTokenizer,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.train.trainer import Trainer

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s",
        stream=sys.stderr,
        force=True,   # the axon PJRT plugin pre-configures the root logger
    )
    logger = logging.getLogger("pmr-real")

    if args.tiny:
        cfg = ModCRConfig.tiny()
        cfg = dataclasses.replace(cfg, compute_alignment=False)
    elif args.midsize:
        from multimodal_context_reasoning_tpu.core.config import (
            EncoderConfig,
            RobertaConfig,
        )

        d = args.dropout
        from multimodal_context_reasoning_tpu.core.config import (
            ChunkAlignConfig,
        )

        enc = EncoderConfig(
            vocab_size=4096, hidden_size=96, num_hidden_layers=6,
            num_attention_heads=8, intermediate_size=192,
            hidden_dropout_prob=d, attention_probs_dropout_prob=d,
            img_feature_dim=64)
        rob = RobertaConfig(
            vocab_size=4096, hidden_size=128, num_hidden_layers=4,
            num_attention_heads=8, intermediate_size=256,
            hidden_dropout_prob=d, attention_probs_dropout_prob=d)
        cfg = ModCRConfig(
            global_encoder=enc, seq_encoder=enc, roberta=rob,
            chunkalign=ChunkAlignConfig(chunk_layers_end=1,
                                        full_layers_end=3),
            text_len=48, img_len=10, roberta_len=72, max_chunks=22,
            mapping_dropout=d, compute_alignment=False)
    else:
        # Production training geometry (BENCHMARKS.md training table): the
        # alignment maps are never optimized by the reference trainer
        # (run_PMR_ModCR.py:204-208) and remat keeps batch 32 inside a
        # 16 GB v5e.
        cfg = ModCRConfig(compute_alignment=False).with_dtype("bfloat16")
        d = args.dropout
        enc = dataclasses.replace(
            cfg.global_encoder,
            hidden_dropout_prob=d, attention_probs_dropout_prob=d,
        )
        rd = d if args.roberta_dropout is None else args.roberta_dropout
        rob = dataclasses.replace(
            cfg.roberta, remat=True,
            hidden_dropout_prob=rd, attention_probs_dropout_prob=rd,
        )
        cfg = dataclasses.replace(
            cfg, global_encoder=enc, seq_encoder=enc, roberta=rob,
            mapping_dropout=d,
        )

    load_fn = load_vcr_json if args.task == "vcr" else load_pmr_jsonl
    dataset_cls = VCRDataset if args.task == "vcr" else PMRDataset
    examples = []
    for path in args.jsonl.split(","):
        examples.extend(load_fn(path, limit=args.limit or None))
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(examples))
    n_train = int(len(examples) * args.train_frac)
    train_ex = [examples[i] for i in order[:n_train]]
    val_ex = [examples[i] for i in order[n_train:]]
    logger.info("examples: %d train / %d held-out", len(train_ex), len(val_ex))

    feats = synthetic_features(
        {ex.img_id for ex in examples}, cfg.global_encoder.img_feature_dim,
        max_regions=min(cfg.img_len, 20),
    )
    if args.tokenizer == "corpus":
        # real subword ids trained on the train split — the hash fallback's
        # md5 collisions alias distinct words into one embedding row
        from multimodal_context_reasoning_tpu.data.subword import (
            corpus_wordpiece_tokenizer,
        )

        from multimodal_context_reasoning_tpu.data.tokenization import (
            NUM_DET_TOKENS,
        )

        corpus = [ex.premise for ex in train_ex] + [
            a for ex in train_ex for a in ex.answer_choices
        ]
        t0 = time.time()
        bert = corpus_wordpiece_tokenizer(
            corpus, vocab_size=min(
                args.vocab_budget,
                cfg.global_encoder.vocab_size - NUM_DET_TOKENS))
        rob = corpus_wordpiece_tokenizer(
            corpus, vocab_size=min(
                args.vocab_budget, cfg.roberta.vocab_size - NUM_DET_TOKENS),
            style="roberta")
        logger.info("corpus WordPiece trained: %d/%d ids (bert/roberta), "
                    "%.1f s", len(bert), len(rob), time.time() - t0)
        assert len(bert) <= cfg.global_encoder.vocab_size
        assert len(rob) <= cfg.roberta.vocab_size
        # persist the vocabs next to the run's checkpoints — the trained
        # params are servable later only with these exact ids (reload via
        # --bert_vocab_file / merges-less --roberta_vocab_file)
        os.makedirs(args.out, exist_ok=True)
        bert.save_vocab_file(os.path.join(args.out, "bert_vocab.txt"))
        rob.save_vocab_file(os.path.join(args.out, "roberta_vocab.txt"))
    else:
        bert = HashTokenizer(vocab_size=cfg.global_encoder.vocab_size)
        rob = RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size)
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len, num_labels=cfg.num_labels,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )
    table = None
    if args.device_features:
        from multimodal_context_reasoning_tpu.data.device_table import (
            DeviceFeatureTable,
        )

        # for_config keeps the table dtype == compute dtype (a bf16 table
        # under fp32 compute would silently round the features)
        table = DeviceFeatureTable.for_config(feats, cfg)
        logger.info("device feature table resident: %d images, %.1f MB",
                    len(table.row), table.nbytes / 1e6)

    def mk(exs):
        ds = dataset_cls(exs, feats, bert, rob, spec=spec,
                         max_chunks=cfg.max_chunks)
        if table is not None:
            ds.use_device_table(table)
        return ds

    train_dl = DataLoader(mk(train_ex), args.batch, shuffle=True,
                          seed=args.seed, drop_last=True)
    val_dl = DataLoader(mk(val_ex), args.eval_batch)

    tcfg = TrainConfig(
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        warmup_steps=args.warmup,
        max_steps=args.steps,
        num_train_epochs=10_000,      # bounded by max_steps
        per_device_batch_size=args.batch,
        valid_steps=args.valid_steps,
        epoch_begin=1,
        seed=args.seed,
        compute_dtype="float32" if (args.tiny or args.midsize) else "bfloat16",
    )
    model = ModCRModel(cfg)
    os.makedirs(args.out, exist_ok=True)
    trainer = Trainer(model, tcfg, train_dl, val_dl, logger=logger)

    t0 = time.time()
    state = trainer.init_state()
    logger.info("init done in %.1fs on %s", time.time() - t0,
                jax.devices()[0].platform)

    base_acc = trainer.evaluate(state.params)
    logger.info("held-out accuracy at random init: %.4f (chance=0.25)",
                base_acc)
    trainer.history.append({"epoch": 0, "step": 0, "val_acc": base_acc,
                            "train_loss": None, "train_acc": None})

    t0 = time.time()
    state = trainer.fit(state)
    wall = time.time() - t0
    final_acc = trainer.evaluate(state.params)

    curve = {
        "task": args.task,
        "data": ",".join(os.path.basename(p) for p in args.jsonl.split(",")),
        "n_train": len(train_ex), "n_val": len(val_ex),
        "steps": args.steps, "batch": args.batch, "lr": args.lr,
        "seed": args.seed, "tiny": args.tiny,
        "wall_seconds": round(wall, 1),
        "baseline_acc": base_acc,
        "final_acc": final_acc,
        "best_acc": trainer.best_acc,
        "history": trainer.history,
    }
    path = os.path.join(args.out, "curve.json")
    with open(path, "w") as f:
        json.dump(curve, f, indent=1)
    logger.info("wrote %s", path)
    print(json.dumps({
        "baseline_acc": round(base_acc, 4),
        "best_acc": round(trainer.best_acc, 4),
        "final_acc": round(final_acc, 4),
        "steps": args.steps, "wall_seconds": round(wall, 1),
    }))
    return trainer


if __name__ == "__main__":
    main()
