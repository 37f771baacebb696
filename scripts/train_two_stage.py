"""Two-stage recipe on REAL data — the reference's own training shape.

The reference never trains ModCR in one stage: its composite loads a
ChunkAlign-pretrain checkpoint (``checkpoint-6-2625-acc-0.8164``,
run_PMR_ModCR.py:555) whose towers were trained FIRST under the
``ChunkAlign_CLS_enc4_align`` regime (modeling_vcr_chunkalign_v10.py:
1016-1165), then prefix-tunes with both towers frozen.  This driver runs
that two-stage shape end-to-end on the data that ships with the reference:

Stage 1 — ChunkAlign pretrain: :class:`ChunkAlignClassifier` (BOTH towers
trainable, binary CE + attention-alignment CE) on the real PMR/VCR train
split; held-out accuracy is validated on the same schedule as the
production trainer.  The trained params export to the reference's
checkpoint layout (interop/export.py::export_chunkalign_cls_state_dict).

Stage 2 — cold-start surgery + prefix-tune: a fresh composite grafts
``seq_enc`` through the reference's literal ``seq_enc.``-strip path
(assemble_modcr_params(chunkalign_sd=...), run_PMR_ModCR.py:752-763) and
the global tower through the ``oscar_sd`` path (:819-832 loads Oscar
there; stage 1 trained ours), then trains the production recipe — frozen
towers, mapping networks + prefix-RoBERTa live.

Both stages share the featurized datasets, so the towers see the same
input distribution they will serve in the composite.  Image features are
synthesized per img_id (no region pickles in-repo; see train_real_pmr.py).

Run (TPU, ~35 min at defaults):

    python scripts/train_two_stage.py --stage1_steps 400 --stage2_steps 600

CPU smoke (tiny model):

    python scripts/train_two_stage.py --tiny --stage1_steps 20 \
        --stage2_steps 20 --batch 4 --stage1_batch 4 --limit 80

Cross-task stage 1 (the reference's literal shape — its ChunkAlign
checkpoint was pretrained on VCR, then grafted into the PMR composite):

    python scripts/train_two_stage.py --task vcr \
        --jsonl /root/reference/vcr_data/vcr_val.json \
        --stage1_task pmr --stage1_jsonl .../val-ori.jsonl

Reuse a previous run's stage-1 export without retraining:

    python scripts/train_two_stage.py --stage1_npz \
        /path/to/chunkalign_cls_state_dict.npz --stage1_steps 0
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_real_pmr import synthetic_features  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="pmr", choices=["pmr", "vcr"])
    p.add_argument("--jsonl", default="/root/reference/pmr_data/val-ori.jsonl")
    p.add_argument("--train_frac", type=float, default=0.8)
    p.add_argument("--stage1_steps", type=int, default=400)
    p.add_argument("--stage2_steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=32,
                   help="stage-2 batch (questions; x4 candidate rows)")
    p.add_argument("--stage1_batch", type=int, default=16,
                   help="stage-1 batch — towers carry gradients, so the "
                        "activation footprint is ~4x the frozen-tower "
                        "composite's at equal batch")
    p.add_argument("--eval_batch", type=int, default=32)
    p.add_argument("--lr1", type=float, default=3e-5)
    p.add_argument("--lr2", type=float, default=3e-5)
    p.add_argument("--align_weight", type=float, default=1.0,
                   help="stage-1 align-CE weight (the reference returns the "
                        "two losses separately, v10.py:1084; its absent "
                        "stage-1 trainer summed them)")
    p.add_argument("--seq_lr_scale", type=float, default=1.0,
                   help="stage-1 lr scale for the seq_enc group. The "
                        "reference's x0.1 (run_PMR_ModCR.py:127-135) "
                        "protects a PRETRAINED seq tower; from scratch "
                        "both towers need the full lr")
    p.add_argument("--warmup", type=int, default=50)
    p.add_argument("--valid_steps", type=int, default=50)
    p.add_argument("--stage1_valid_steps", type=int, default=None,
                   help="stage-1 validation cadence (default: --valid_steps);"
                        " stage-1 runs many more steps than stage 2, so a"
                        " coarser cadence keeps eval overhead bounded")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--tokenizer", choices=["corpus", "hash"],
                   default="corpus",
                   help="'corpus': train a real WordPiece vocab on the "
                        "task text (data/subword.py); 'hash': legacy md5 "
                        "buckets (collisions alias words)")
    p.add_argument("--vocab_budget", type=int, default=8192)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--dropout", type=float, default=0.1,
                   help="uniform dropout (see train_real_pmr.py for the "
                        "measured from-scratch rationale)")
    p.add_argument("--roberta_dropout", type=float, default=None)
    p.add_argument("--stage1_compute", default=None,
                   choices=["float32", "bfloat16"],
                   help="stage-1 compute dtype override (default: bf16 at "
                        "full size; fp32 under --tiny)")
    p.add_argument("--stage1_dropout", type=float, default=None,
                   help="override encoder dropout for stage 1 only "
                        "(dropout is not geometry; the graft still lands)")
    p.add_argument("--stage1_npz", default=None,
                   help="skip stage 1: graft from an existing "
                        "chunkalign_cls_state_dict.npz (a previous run's "
                        "stage-1 export).  This is the reference's literal "
                        "deployment shape — its composite loads a checkpoint "
                        "someone ELSE pretrained (run_PMR_ModCR.py:555)")
    p.add_argument("--stage1_task", default=None,
                   choices=["pmr", "vcr", "both"],
                   help="pretrain stage 1 on a DIFFERENT task's data "
                        "(default: --task).  Cross-task mirrors the "
                        "reference, whose ChunkAlign checkpoint was trained "
                        "on VCR and grafted into the PMR composite.  "
                        "'both' mixes tasks (data/mixed.py) — give "
                        "--stage1_jsonl pmr:/vcr:-prefixed entries")
    p.add_argument("--stage1_jsonl", default=None,
                   help="stage-1 data files (default: --jsonl).  Entries "
                        "may carry a pmr:/vcr: prefix to select the "
                        "loader per file.  Splits reuse the stage-2 "
                        "seed/frac, so a file shared with --jsonl "
                        "contributes the SAME train slice to both stages "
                        "(no held-out leakage into stage-1 pretraining)")
    p.add_argument("--out", default="/tmp/two_stage")
    p.add_argument("--no_device_features", dest="device_features",
                   action="store_false", default=True)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

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
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
        RobertaHashTokenizer,
    )
    from multimodal_context_reasoning_tpu.data.vcr import (
        VCRDataset,
        load_vcr_json,
    )
    from multimodal_context_reasoning_tpu.interop.assemble import (
        assemble_modcr_params,
    )
    from multimodal_context_reasoning_tpu.interop.export import (
        export_chunkalign_cls_state_dict,
    )
    from multimodal_context_reasoning_tpu.models.chunkalign_cls import (
        ChunkAlignClassifier,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.train.optim import make_optimizer
    from multimodal_context_reasoning_tpu.train.state import TrainState
    from multimodal_context_reasoning_tpu.train.step import _model_inputs
    from multimodal_context_reasoning_tpu.train.trainer import Trainer

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        stream=sys.stderr, force=True)
    logger = logging.getLogger("two-stage")

    # ---- composite config first; stage 1 reuses its encoder geometry so the
    # graft lands key-for-key
    if args.tiny:
        cfg2 = dataclasses.replace(ModCRConfig.tiny(),
                                   compute_alignment=False)
    else:
        cfg2 = ModCRConfig(compute_alignment=False).with_dtype("bfloat16")
        d = args.dropout
        enc = dataclasses.replace(
            cfg2.global_encoder,
            hidden_dropout_prob=d, attention_probs_dropout_prob=d,
        )
        rd = d if args.roberta_dropout is None else args.roberta_dropout
        rob = dataclasses.replace(
            cfg2.roberta, remat=True,
            hidden_dropout_prob=rd, attention_probs_dropout_prob=rd,
        )
        cfg2 = dataclasses.replace(
            cfg2, global_encoder=enc, seq_encoder=enc, roberta=rob,
            mapping_dropout=d,
        )
    enc_cfg = cfg2.seq_encoder

    # ---- shared data (both stages featurize identically)
    load_fn = load_vcr_json if args.task == "vcr" else load_pmr_jsonl
    dataset_cls = VCRDataset if args.task == "vcr" else PMRDataset
    examples = []
    for path in args.jsonl.split(","):
        examples.extend(load_fn(path, limit=args.limit or None))
    rng_np = np.random.default_rng(args.seed)
    order = rng_np.permutation(len(examples))
    n_train = int(len(examples) * args.train_frac)
    train_ex = [examples[i] for i in order[:n_train]]
    val_ex = [examples[i] for i in order[n_train:]]
    logger.info("examples: %d train / %d held-out", len(train_ex), len(val_ex))
    if len(train_ex) < max(args.batch, args.stage1_batch):
        # drop_last=True would otherwise yield an EMPTY loader and the
        # stage-2 `next(iter(...))` dies with a bare StopIteration
        clamped = max(1, len(train_ex))
        logger.warning("clamping batch sizes %d/%d -> %d (only %d train "
                       "examples)", args.stage1_batch, args.batch, clamped,
                       len(train_ex))
        args.stage1_batch = min(args.stage1_batch, clamped)
        args.batch = min(args.batch, clamped)

    feats = synthetic_features(
        {ex.img_id for ex in examples}, enc_cfg.img_feature_dim,
        max_regions=min(cfg2.img_len, 20),
    )
    if args.tokenizer == "corpus":
        # real subword ids (data/subword.py) instead of md5 buckets; the
        # vocab is trained on the stage-2 train split plus any cross-task
        # stage-1 text so both stages share one collision-free id space
        from multimodal_context_reasoning_tpu.data.subword import (
            corpus_wordpiece_tokenizer,
        )
        from multimodal_context_reasoning_tpu.data.tokenization import (
            NUM_DET_TOKENS,
        )

        corpus_ex = list(train_ex)
        if args.stage1_jsonl:
            for e in args.stage1_jsonl.split(","):
                head, _, rest = e.partition(":")
                t = head if head in ("pmr", "vcr") and rest else (
                    args.stage1_task or args.task)
                path = rest if head in ("pmr", "vcr") and rest else e
                load1 = load_vcr_json if t == "vcr" else load_pmr_jsonl
                corpus_ex.extend(load1(path, limit=args.limit or None))
        corpus = [ex.premise for ex in corpus_ex] + [
            a for ex in corpus_ex for a in ex.answer_choices
        ]
        bert = corpus_wordpiece_tokenizer(
            corpus, vocab_size=min(
                args.vocab_budget, enc_cfg.vocab_size - NUM_DET_TOKENS))
        rob_tok = corpus_wordpiece_tokenizer(
            corpus, vocab_size=min(
                args.vocab_budget,
                cfg2.roberta.vocab_size - NUM_DET_TOKENS),
            style="roberta")
        logger.info("corpus WordPiece trained: %d/%d ids (bert/roberta)",
                    len(bert), len(rob_tok))
        # persist the vocabs next to the run's exports (see
        # train_real_pmr.py — checkpoints are servable only with these ids)
        os.makedirs(args.out, exist_ok=True)
        bert.save_vocab_file(os.path.join(args.out, "bert_vocab.txt"))
        rob_tok.save_vocab_file(os.path.join(args.out, "roberta_vocab.txt"))
    else:
        bert = HashTokenizer(vocab_size=enc_cfg.vocab_size)
        rob_tok = RobertaHashTokenizer(vocab_size=cfg2.roberta.vocab_size)
    spec = BatchSpec(
        text_len=cfg2.text_len, img_len=cfg2.img_len,
        roberta_len=cfg2.roberta_len, num_labels=cfg2.num_labels,
        img_feature_dim=enc_cfg.img_feature_dim,
    )
    # Table rows must be fp32 if either stage computes fp32
    # (--stage1_compute float32: the trainability-probe arm) — a bf16 table
    # would quantize the "fp32" arm's image features identically to the
    # bf16 arm, confounding the comparison.  fp32 rows under bf16 compute
    # are harmless: the forward casts features to the compute dtype
    # in-graph, which rounds exactly as a bf16-resident table would.
    s1_dtype = args.stage1_compute or (
        "float32" if args.tiny else "bfloat16")
    table_dtype = (
        "float32"
        if "float32" in (s1_dtype, cfg2.global_encoder.dtype)
        else "bfloat16")

    def make_table(f):
        if not args.device_features:
            return None
        from multimodal_context_reasoning_tpu.data.device_table import (
            DeviceFeatureTable,
        )

        table = DeviceFeatureTable(f, img_len=cfg2.img_len,
                                   dtype=table_dtype)
        logger.info("device feature table resident: %d images, %.1f MB "
                    "(%s)", len(table.row), table.nbytes / 1e6, table_dtype)
        return table

    def mk_ds(ds_cls, f, table, exs):
        ds = ds_cls(exs, f, bert, rob_tok, spec=spec,
                    max_chunks=cfg2.max_chunks)
        if table is not None:
            ds.use_device_table(table)
        return ds

    table = make_table(feats)
    train_ds, val_ds = (mk_ds(dataset_cls, feats, table, train_ex),
                        mk_ds(dataset_cls, feats, table, val_ex))
    val_dl = DataLoader(val_ds, args.eval_batch)
    os.makedirs(args.out, exist_ok=True)

    # ---- stage-1 data: same split as stage 2 unless cross-task pretraining
    # was requested.  Cross-task is the reference's own shape — its grafted
    # ChunkAlign checkpoint was pretrained on VCR, not on the target task;
    # 'both' additionally mixes the tasks (data/mixed.py).  Splits reuse the
    # stage-2 seed/frac, so a file shared with --jsonl contributes the SAME
    # train slice to both stages (no held-out leakage).
    s1_task = args.stage1_task or args.task
    s1_jsonl = args.stage1_jsonl or args.jsonl
    s1_cross = (s1_task, s1_jsonl) != (args.task, args.jsonl)
    if s1_cross and not args.stage1_npz:
        def parse_entry(e):
            head, _, rest = e.partition(":")
            if head in ("pmr", "vcr") and rest:
                return head, rest
            if s1_task == "both":
                raise ValueError(
                    "--stage1_task both needs pmr:/vcr:-prefixed "
                    f"--stage1_jsonl entries; got {e!r}")
            return s1_task, e

        groups = {}
        for e in s1_jsonl.split(","):
            t, path = parse_entry(e)
            load1 = load_vcr_json if t == "vcr" else load_pmr_jsonl
            groups.setdefault(t, []).extend(
                load1(path, limit=args.limit or None))
        feats1 = synthetic_features(
            {ex.img_id for exs in groups.values() for ex in exs},
            enc_cfg.img_feature_dim, max_regions=min(cfg2.img_len, 20),
        )
        table1 = make_table(feats1)
        train_parts, val_parts = [], []
        for t in sorted(groups):
            exs = groups[t]
            order1 = np.random.default_rng(args.seed).permutation(len(exs))
            n1 = int(len(exs) * args.train_frac)
            cls1 = VCRDataset if t == "vcr" else PMRDataset
            train_parts.append(mk_ds(cls1, feats1, table1,
                                     [exs[i] for i in order1[:n1]]))
            val_parts.append(mk_ds(cls1, feats1, table1,
                                   [exs[i] for i in order1[n1:]]))
        if len(train_parts) == 1:
            train_ds1, val_ds1 = train_parts[0], val_parts[0]
        else:
            from multimodal_context_reasoning_tpu.data.mixed import (
                MixedDataset,
            )

            train_ds1 = MixedDataset(train_parts)
            val_ds1 = MixedDataset(val_parts)
        if len(train_ds1) and len(train_ds1) < args.stage1_batch:
            args.stage1_batch = len(train_ds1)
        val_dl1 = DataLoader(val_ds1, args.eval_batch)
        logger.info("stage-1 data: %s (%s) -> %d train / %d held-out",
                    s1_task, s1_jsonl, len(train_ds1), len(val_ds1))
    else:
        train_ds1, val_dl1 = train_ds, val_dl

    # ================= stage 1: ChunkAlign pretrain =================
    if args.stage1_npz:
        # graft from an existing stage-1 export instead of pretraining —
        # the reference's own deployment shape (it loads a checkpoint it
        # did not train, run_PMR_ModCR.py:555)
        with np.load(args.stage1_npz) as z:
            sd = {k: z[k] for k in z.files}
        logger.info("stage-1 skipped: %d keys loaded from %s",
                    len(sd), args.stage1_npz)
        trainer1 = None
        s1_base = s1_final = None
        s1_wall = 0.0
    else:
        enc1_cfg = enc_cfg
        if args.stage1_dropout is not None:
            enc1_cfg = dataclasses.replace(
                enc_cfg, hidden_dropout_prob=args.stage1_dropout,
                attention_probs_dropout_prob=args.stage1_dropout,
            )
        if args.stage1_compute is not None:
            # dtype lives on the MODULE config (EncoderConfig.dtype ->
            # c.jnp_dtype inside every Dense/attention);
            # TrainConfig.compute_dtype is descriptive only. Without this
            # replace the flag is a no-op — observed as bit-identical
            # bf16/fp32 probe traces.
            enc1_cfg = dataclasses.replace(enc1_cfg,
                                           dtype=args.stage1_compute)
        model1 = ChunkAlignClassifier(
            enc1_cfg, cfg2.chunkalign, num_labels=cfg2.num_labels,
            max_chunks=cfg2.max_chunks, align_weight=args.align_weight,
        )
        tcfg1 = TrainConfig(
            learning_rate=args.lr1, warmup_steps=args.warmup,
            max_steps=args.stage1_steps, num_train_epochs=10_000,
            per_device_batch_size=args.stage1_batch,
            valid_steps=args.stage1_valid_steps or args.valid_steps,
            epoch_begin=1, seed=args.seed,
            freeze_encoders=False,  # the point of stage 1 (v10: no no_grad)
            seq_enc_lr_scale=args.seq_lr_scale,
            compute_dtype=args.stage1_compute
            or ("float32" if args.tiny else "bfloat16"),
        )
        train_dl1 = DataLoader(train_ds1, args.stage1_batch, shuffle=True,
                               seed=args.seed, drop_last=True)
        # best-acc Orbax checkpointing so the surgery grafts the BEST
        # stage-1 towers, not wherever the loop happened to stop (fit
        # returns final).  params_only: these checkpoints exist solely for
        # the export below — skipping the AdamW moments cuts each blocking
        # save ~3x (2.7 GB -> ~0.9 GB of D2H through the tunnel)
        trainer1 = Trainer(model1, tcfg1, train_dl1, val_dl1, logger=logger,
                           checkpoint_dir=os.path.join(args.out,
                                                       "stage1_ckpt"),
                           checkpoint_params_only=True)

        t0 = time.time()
        state1 = trainer1.init_state()
        logger.info("stage-1 init done in %.1fs on %s", time.time() - t0,
                    jax.devices()[0].platform)
        s1_base = trainer1.evaluate(state1.params)
        logger.info("stage-1 held-out accuracy at random init: %.4f",
                    s1_base)
        t0 = time.time()
        if args.stage1_steps > 0:
            state1 = trainer1.fit(state1)
        s1_wall = time.time() - t0
        s1_final = trainer1.evaluate(state1.params)
        logger.info("stage-1 done: best %.4f final %.4f (%.0fs)",
                    trainer1.best_acc, s1_final, s1_wall)
        params1 = jax.tree.map(np.asarray, state1.params)
        if (trainer1.ckpt is not None
                and trainer1.ckpt.latest_step() is not None):
            trainer1.ckpt.wait()
            params1 = trainer1.ckpt.restore_params(best=True)
            logger.info("stage-1: restored best checkpoint (step %s) for "
                        "export",
                        trainer1.ckpt.best_step()
                        or trainer1.ckpt.latest_step())

        # ---- export through the reference's checkpoint layout
        sd = export_chunkalign_cls_state_dict(params1, enc_cfg)
        np.savez(os.path.join(args.out, "chunkalign_cls_state_dict.npz"),
                 **sd)
        logger.info("stage-1 export: %d keys -> %s", len(sd),
                    os.path.join(args.out, "chunkalign_cls_state_dict.npz"))

        # free stage-1 HBM before stage 2: params + AdamW state are
        # ~2.6 GB on a 16 GB v5e, and the composite's batch-32 step needs
        # that headroom (measured: keeping them resident OOMs stage-2 fit)
        import gc

        state1 = None
        del params1
        gc.collect()

    # ================= stage 2: surgery + prefix-tune =================
    model2 = ModCRModel(cfg2)
    train_dl2 = DataLoader(train_ds, args.batch, shuffle=True,
                           seed=args.seed + 1, drop_last=True)
    tcfg2 = TrainConfig(
        learning_rate=args.lr2, warmup_steps=args.warmup,
        max_steps=args.stage2_steps, num_train_epochs=10_000,
        per_device_batch_size=args.batch,
        valid_steps=args.valid_steps, epoch_begin=1, seed=args.seed,
        compute_dtype="float32" if args.tiny else "bfloat16",
    )
    trainer2 = Trainer(model2, tcfg2, train_dl2, val_dl, logger=logger)

    sample = next(iter(train_dl2))
    inputs = _model_inputs({k: jnp.asarray(v) for k, v in sample.items()})
    params2 = jax.tree.map(
        np.asarray,
        jax.jit(model2.init)(jax.random.PRNGKey(args.seed), inputs),
    )
    # the reference's surgery: seq_enc via the chunkalign strip
    # (run_PMR_ModCR.py:752-763), global tower via the oscar slot (:819-832)
    global_sd = {k[len("global_enc."):]: v for k, v in sd.items()
                 if k.startswith("global_enc.")}
    report = assemble_modcr_params(
        params2, cfg2, oscar_sd=global_sd, chunkalign_sd=sd,
    )
    logger.info("surgery: %d keys grafted, %d skipped-dead",
                len(report.consumed), len(report.skipped))
    # one bulk host->device transfer: numpy params as jit args would be
    # re-shipped on EVERY eval/train call (~2.6 GB each through the tunnel)
    params2 = jax.device_put(params2)
    tx = make_optimizer(tcfg2, trainer2.t_total, params2)
    state2 = TrainState.create(params2, tx)

    s2_base = trainer2.evaluate(state2.params)
    logger.info("stage-2 held-out accuracy after surgery, before tuning: "
                "%.4f", s2_base)
    trainer2.history.append({"epoch": 0, "step": 0, "val_acc": s2_base,
                             "train_loss": None, "train_acc": None})
    t0 = time.time()
    if args.stage2_steps > 0:
        state2 = trainer2.fit(state2)
    s2_wall = time.time() - t0
    s2_final = trainer2.evaluate(state2.params)

    if args.stage1_npz:
        stage1_curve = {"npz": args.stage1_npz, "keys": len(sd)}
    else:
        stage1_curve = {
            "steps": args.stage1_steps, "baseline_acc": s1_base,
            "best_acc": trainer1.best_acc, "final_acc": s1_final,
            "wall_seconds": round(s1_wall, 1),
            "history": trainer1.history,
        }
        if s1_cross:
            stage1_curve["task"] = s1_task
            stage1_curve["data"] = ",".join(
                os.path.basename(x) for x in s1_jsonl.split(","))
    curve = {
        "task": args.task,
        "data": ",".join(os.path.basename(x) for x in args.jsonl.split(",")),
        "n_train": len(train_ex), "n_val": len(val_ex),
        "batch": args.batch, "stage1_batch": args.stage1_batch,
        "lr1": args.lr1, "lr2": args.lr2,
        "align_weight": args.align_weight, "seed": args.seed,
        "tiny": args.tiny,
        "stage1": stage1_curve,
        "stage2": {
            "steps": args.stage2_steps, "post_surgery_acc": s2_base,
            "best_acc": trainer2.best_acc, "final_acc": s2_final,
            "wall_seconds": round(s2_wall, 1),
            "history": trainer2.history,
        },
    }
    path = os.path.join(args.out, "curve.json")
    with open(path, "w") as f:
        json.dump(curve, f, indent=1)
    logger.info("wrote %s", path)
    print(json.dumps({
        "stage1_best_acc": (round(trainer1.best_acc, 4)
                            if trainer1 is not None else None),
        "post_surgery_acc": round(s2_base, 4),
        "stage2_best_acc": round(trainer2.best_acc, 4),
        "stage2_final_acc": round(s2_final, 4),
        "wall_seconds": round(s1_wall + s2_wall, 1),
    }))
    return curve


if __name__ == "__main__":
    main()
