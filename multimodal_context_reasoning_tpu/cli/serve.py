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
    p.add_argument("--tiny", action="store_true")
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
    print(f"serving on http://{args.host}:{args.port} "
          f"(micro_batch={args.micro_batch})", flush=True)
    serve(scorer, args.host, args.port)


if __name__ == "__main__":
    main()
