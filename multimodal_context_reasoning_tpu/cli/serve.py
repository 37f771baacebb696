"""Serving entry point.

    python -m multimodal_context_reasoning_tpu.cli.serve \
        --img_feat_file feats.mcrpack --eval_model_dir output/pmr --port 8477
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8477)
    p.add_argument("--img_feat_file", required=True)
    p.add_argument("--eval_model_dir", default="")
    p.add_argument("--bert_tokenizer_dir", default="")
    p.add_argument("--roberta_tokenizer_dir", default="")
    p.add_argument("--micro_batch", type=int, default=8)
    p.add_argument("--params_dtype", default=None,
                   help="cast resident params once at load (e.g. bfloat16 "
                        "halves the weight HBM read per call — the "
                        "dominant cost at small micro-batches)")
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="dynamic W8A8 int8 matmuls (ops/quant.py)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=("float32", "bfloat16"))
    p.add_argument("--device_features", action="store_true",
                   help="keep the image-feature set resident in HBM; "
                        "requests ship int32 ids instead of [I, F] floats "
                        "(cuts per-request h2d; data/device_table.py)")
    p.add_argument("--generate", action="store_true",
                   help="also serve the rationale-generation family at "
                        "POST /generate (classify + KV-cached decode)")
    p.add_argument("--rationale_ckpt", default="",
                   help="reference ChunkAlign_CLS_dec5_4 torch checkpoint "
                        "for /generate (interop/assemble.py::"
                        "assemble_rationale_params); random init if unset")
    p.add_argument("--gpt_tokenizer_dir", default="",
                   help="HF GPT-2 tokenizer dir for rationale decoding "
                        "(hash fallback if unset)")
    p.add_argument("--max_rationale_len", type=int, default=32)
    p.add_argument("--gen_micro_batch", type=int, default=4)
    p.add_argument("--artifact", default="",
                   help="serve from an AOT artifact directory "
                        "(serving/aot.py): no model construction or Flax "
                        "tracing — load, compile, serve.  Skips "
                        "--eval_model_dir/--params_dtype/--quantize")
    p.add_argument("--save_artifact", default="",
                   help="after warming the scorer, export it as an AOT "
                        "artifact to this directory and exit")
    p.add_argument("--gen_artifact", default="",
                   help="serve POST /generate from an AOT generator "
                        "artifact directory (greedy fused program)")
    p.add_argument("--save_gen_artifact", default="",
                   help="with --generate: export the warmed generator as "
                        "an AOT artifact to this directory and exit")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--max_queue_batches", type=int, default=8,
                   help="back-pressure: shed (HTTP 429) beyond this many "
                        "device batches of queued work")
    p.add_argument("--deadline_ms", type=float, default=None,
                   help="default per-request deadline; expired work gets "
                        "HTTP 503 instead of waiting forever")
    args = p.parse_args(argv)

    from multimodal_context_reasoning_tpu.cli.common import (
        load_image_features,
        load_tokenizers,
    )
    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer
    from multimodal_context_reasoning_tpu.serving.server import serve

    cfg = (ModCRConfig.tiny() if args.tiny
           else ModCRConfig().with_dtype(args.compute_dtype))
    if args.quantize != "none":
        cfg = cfg.with_quantize(args.quantize)

    if args.artifact:
        # AOT path: config comes from the artifact; no model code runs
        from multimodal_context_reasoning_tpu.serving.aot import AOTScorer

        import json as _json
        import os as _os

        with open(_os.path.join(args.artifact, "artifact.json")) as f:
            cfg = ModCRConfig.from_json(_json.dumps(_json.load(f)["config"]))
        feats = load_image_features(
            args.img_feat_file, cfg.global_encoder.img_feature_dim
        )
        bert, rob = load_tokenizers(args, cfg)
        scorer = AOTScorer(args.artifact, bert, rob, feats)
        generator = _load_gen_artifact(args, feats)
        print(f"serving AOT artifact {args.artifact} on "
              f"http://{args.host}:{args.port} "
              f"(micro_batch={scorer.micro_batch}"
              f"{', /generate on' if generator else ''})", flush=True)
        serve(scorer, args.host, args.port, generator=generator,
              max_queue_batches=args.max_queue_batches,
              default_deadline_ms=args.deadline_ms)
        return

    feats = load_image_features(
        args.img_feat_file, cfg.global_encoder.img_feature_dim
    )
    bert, rob = load_tokenizers(args, cfg)

    model = ModCRModel(cfg)
    import jax.numpy as jnp

    from multimodal_context_reasoning_tpu.data.collate import (
        BatchSpec,
        collate_candidates,
    )
    from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
    from multimodal_context_reasoning_tpu.data.schemas import RawExample
    from multimodal_context_reasoning_tpu.serving.scorer import iter_keys

    # init params (random), then restore a checkpoint when provided
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )
    ds = PMRDataset([], feats, bert, rob, spec=spec, max_chunks=cfg.max_chunks)
    first_key = next(iter_keys(feats))
    warm_ex = RawExample("w", first_key, "warm .", ["a ."] * cfg.num_labels, 0)
    batch = collate_candidates(
        [ds.featurize(warm_ex)], [ds.get_image(warm_ex)], spec
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    if args.eval_model_dir:
        import os

        from multimodal_context_reasoning_tpu.train.checkpoint import (
            CheckpointManager,
        )

        # params-only, best-metric checkpoint: serving must not depend on
        # the training-time optimizer config (scheduler/accum change the
        # opt_state tree and used to break this restore)
        params = CheckpointManager(
            os.path.join(args.eval_model_dir, "ckpt")
        ).restore_params(best=True)

    scorer = ModCRScorer(
        cfg, params, bert, rob, feats, micro_batch=args.micro_batch,
        params_dtype=args.params_dtype,
        use_device_table=args.device_features,
    )

    if args.save_artifact:
        from multimodal_context_reasoning_tpu.serving.aot import (
            save_scorer_artifact,
        )

        save_scorer_artifact(args.save_artifact, scorer)
        print(f"wrote AOT artifact to {args.save_artifact}", flush=True)
        return

    generator = _load_gen_artifact(args, feats)
    if generator is None and args.generate:
        generator = _build_generator(args, cfg, bert, feats)
        if args.save_gen_artifact:
            from multimodal_context_reasoning_tpu.serving.aot import (
                save_generator_artifact,
            )

            save_generator_artifact(args.save_gen_artifact, generator)
            print(f"wrote AOT generator artifact to "
                  f"{args.save_gen_artifact}", flush=True)
            return
    print(f"serving on http://{args.host}:{args.port} "
          f"(micro_batch={args.micro_batch}"
          f"{', /generate on' if generator else ''})", flush=True)
    serve(scorer, args.host, args.port, generator=generator,
          max_queue_batches=args.max_queue_batches,
          default_deadline_ms=args.deadline_ms)


def _load_gen_artifact(args, feats):
    """/generate from an AOT generator artifact when --gen_artifact is set
    (returns None otherwise).  Tokenizers are built from the ARTIFACT's
    recorded vocab sizes, not the scorer's config — the two families'
    vocabularies differ, and out-of-range ids are the silent-NaN trap
    (CLAUDE.md).  The GPT tokenizer must map the rationale markers to the
    artifact's recorded ids — AOTGenerator validates."""
    if not args.gen_artifact:
        return None
    import json as _json
    import os as _os

    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
    )
    from multimodal_context_reasoning_tpu.serving.aot import AOTGenerator

    with open(_os.path.join(args.gen_artifact, "artifact.json")) as f:
        meta = _json.load(f)
    if args.bert_tokenizer_dir:
        from transformers import AutoTokenizer

        from multimodal_context_reasoning_tpu.data.tokenization import (
            HFTokenizer,
        )

        bert_tok = HFTokenizer(
            AutoTokenizer.from_pretrained(args.bert_tokenizer_dir)
        )
    else:
        bert_tok = HashTokenizer(vocab_size=int(meta["bert_vocab_size"]))
    if args.gpt_tokenizer_dir:
        from transformers import AutoTokenizer

        from multimodal_context_reasoning_tpu.data.tokenization import (
            HFTokenizer,
        )

        gpt_tok = HFTokenizer(
            AutoTokenizer.from_pretrained(args.gpt_tokenizer_dir),
            add_det_tokens=False,
        )
    else:
        gpt_tok = HashTokenizer(vocab_size=int(meta["gpt_vocab_size"]))
    return AOTGenerator(args.gen_artifact, bert_tok, gpt_tok, feats)


def _build_generator(args, cfg, bert, feats):
    """Rationale family for POST /generate: VCR-native classify tower +
    GPT-2 cross-attention decoder; weights from a reference
    ChunkAlign_CLS_dec5_4 checkpoint when given, random init otherwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_context_reasoning_tpu.core.config import (
        ChunkAlignConfig,
        EncoderConfig,
        GPT2Config,
    )
    from multimodal_context_reasoning_tpu.data.collate import BatchSpec
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
    )
    from multimodal_context_reasoning_tpu.models.rationale import (
        RationaleModel,
        rationale_init_batch,
    )
    from multimodal_context_reasoning_tpu.serving.generator import (
        RationaleGenerator,
    )

    dt = args.compute_dtype
    if args.tiny:
        enc = EncoderConfig(
            vocab_size=cfg.global_encoder.vocab_size, hidden_size=32,
            num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, max_position_embeddings=128,
            img_feature_dim=cfg.global_encoder.img_feature_dim, dtype=dt,
        )
        sched = ChunkAlignConfig(chunk_layers_end=1, full_layers_end=2)
        gpt = GPT2Config(
            vocab_size=128, n_positions=128, n_embd=32, n_layer=2,
            n_head=4, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            pad_token_id=0, dtype=dt,
        )
        max_chunks = cfg.max_chunks
    else:
        enc = EncoderConfig(dtype=dt)            # Oscar-base geometry
        sched = ChunkAlignConfig()
        gpt = GPT2Config(dtype=dt)               # GPT-2 124M geometry
        max_chunks = 40
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len,
        img_feature_dim=enc.img_feature_dim,
    )
    sd = None
    if args.rationale_ckpt:
        from multimodal_context_reasoning_tpu.interop.torch_bridge import (
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.rationale_ckpt)
        # the reference adds rationale-marker tokens to its GPT-2 vocab, so
        # trained checkpoints carry resized embeddings — size the config to
        # the checkpoint, not the other way around
        import dataclasses as _dc

        rows = sd["dec.wte.weight"].shape[0]
        if rows != gpt.vocab_size:
            print(f"sizing GPT-2 vocab to checkpoint: {gpt.vocab_size} -> "
                  f"{rows}", flush=True)
            gpt = _dc.replace(gpt, vocab_size=rows)

    if args.gpt_tokenizer_dir:
        from transformers import AutoTokenizer

        from multimodal_context_reasoning_tpu.data.tokenization import (
            HFTokenizer,
        )

        # no det tokens on the GPT side — they are BERT-stream vocabulary;
        # the rationale markers must already be in this tokenizer (the
        # generator validates their ids against gpt.vocab_size)
        gpt_tok = HFTokenizer(
            AutoTokenizer.from_pretrained(args.gpt_tokenizer_dir),
            add_det_tokens=False,
        )
    else:
        gpt_tok = HashTokenizer(vocab_size=gpt.vocab_size)

    model = RationaleModel(enc, sched, gpt, max_chunks=max_chunks)
    # shared init recipe (models/rationale.py) — carries the expl stream so
    # the decoder branch traces (no "dec" subtree without it)
    init_batch = rationale_init_batch(enc, gpt, spec)
    if sd is not None:
        from multimodal_context_reasoning_tpu.interop.assemble import (
            assemble_rationale_params,
        )

        # the checkpoint covers the entire tree (round-trip-tested), so
        # build a host-side template from SHAPES (eval_shape: no device
        # work, no per-leaf tunnel fetches — CLAUDE.md trap) and graft
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), init_batch
        )
        params = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes
        )
        report = assemble_rationale_params(params, enc, gpt, sd)
        print(f"loaded rationale checkpoint: {report.summary()}", flush=True)
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in init_batch.items()},
        )
    return RationaleGenerator(
        enc, sched, gpt, params, bert, gpt_tok, feats,
        spec=spec, max_chunks=max_chunks,
        micro_batch=args.gen_micro_batch,
        max_rationale_len=args.max_rationale_len,
    )


if __name__ == "__main__":
    main()
