"""VCR bench rows (BASELINE.json configs 2 and 4) on the real chip.

Measures, at the reference's VCR geometry (run_vcr_ModCR.py defaults:
max_seq_length 140, dataset region cap 50, Data/VCRChunkAlign.py:536):

- **val inference**: forward throughput over a batch built from REAL
  `/root/reference/vcr_data/vcr_val.json` examples through the production
  VCR featurizer (answer-truncation heuristic included), pipelined
  per-iteration host readback — the bench.py methodology.
- **joint fine-tuning**: full train step with the reference's VCR recipe —
  grad-accum 4 and the RoBERTa-body freeze (run_vcr_ModCR.py:605,783-787).

Usage: python scripts/bench_vcr.py --examples 32 --iters 15
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def real_vcr_batch(cfg, n_examples: int):
    """Collate n real VCR val examples through the production pipeline."""
    from multimodal_context_reasoning_tpu.data.collate import (
        BatchSpec,
        collate_candidates,
    )
    from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
        RobertaHashTokenizer,
    )
    from multimodal_context_reasoning_tpu.data.vcr import (
        VCRDataset,
        load_vcr_json,
    )

    examples = load_vcr_json(
        "/root/reference/vcr_data/vcr_val.json", limit=n_examples
    )
    rng = np.random.default_rng(0)
    feats = {
        ex.img_id: ImageFeatures(
            features=rng.normal(size=(
                20, cfg.global_encoder.img_feature_dim)).astype(np.float32),
            num_regions=20,
        ) for ex in examples
    }
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )
    ds = VCRDataset(
        examples, feats,
        HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
        RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size),
        spec=spec, max_chunks=cfg.max_chunks,
    )
    import jax.numpy as jnp

    batch = collate_candidates(
        [ds.featurize(ex) for ex in examples],
        [ds.get_image(ex) for ex in examples], spec,
    )
    return {k: jnp.asarray(v) for k, v in batch.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--examples", type=int, default=32)
    p.add_argument("--train_examples", type=int, default=24)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--remat_policy", default="dots")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/modcr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig,
        TrainConfig,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.train.optim import make_optimizer
    from multimodal_context_reasoning_tpu.train.state import TrainState
    from multimodal_context_reasoning_tpu.train.step import make_train_step

    out = {}

    # ---- config 2: VCR val inference -----------------------------------
    cfg = ModCRConfig().with_dtype("bfloat16")
    model = ModCRModel(cfg)
    batch = real_vcr_batch(cfg, args.examples)
    batch.pop("example_mask", None)
    print("[bench_vcr] inference: init + compile...", file=sys.stderr,
          flush=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True).logits)
    np.asarray(fwd(params, batch))
    rates = []
    for rep in range(args.repeats):
        np.asarray(fwd(params, batch))
        t0 = time.perf_counter()
        prev = fwd(params, batch)
        for _ in range(args.iters - 1):
            cur = fwd(params, batch)
            np.asarray(prev)
            prev = cur
        np.asarray(prev)
        dt = time.perf_counter() - t0
        rates.append(round(args.examples * args.iters / dt, 1))
        print(f"[bench_vcr] inference rep{rep}: {rates[-1]} ex/s",
              file=sys.stderr, flush=True)
    out["val_inference_ex_per_sec"] = rates
    del params, fwd

    # ---- config 4: joint fine-tuning (accum 4, body freeze) ------------
    tcfg = ModCRConfig(compute_alignment=False).with_dtype("bfloat16")
    tcfg = dataclasses.replace(
        tcfg,
        roberta=dataclasses.replace(
            tcfg.roberta, remat=True, remat_policy=args.remat_policy,
        ),
    )
    tmodel = ModCRModel(tcfg)
    tbatch = real_vcr_batch(tcfg, args.train_examples)
    tbatch.pop("example_mask", None)
    print("[bench_vcr] training: init + compile...", file=sys.stderr,
          flush=True)
    tparams = jax.jit(tmodel.init)(jax.random.PRNGKey(0), tbatch)
    tr = TrainConfig(
        per_device_batch_size=args.train_examples,
        gradient_accumulation_steps=4,     # run_vcr_ModCR.py:605
        compute_dtype="bfloat16",
    )
    tx = make_optimizer(
        tr, 1000, tparams,
        freeze_roberta_body=True,          # run_vcr_ModCR.py:783-787
    )
    state = TrainState.create(tparams, tx)
    step = make_train_step(tmodel)
    rng = jax.random.PRNGKey(1)
    state, m = step(state, tbatch, rng)
    float(m["loss"])
    trates = []
    for rep in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step(state, tbatch, rng)
            float(m["loss"])
        dt = time.perf_counter() - t0
        trates.append(round(args.train_examples * args.iters / dt, 1))
        print(f"[bench_vcr] training rep{rep}: {trates[-1]} ex/s",
              file=sys.stderr, flush=True)
    out["joint_finetune_ex_per_sec"] = trates
    out["train_config"] = {
        "batch": args.train_examples, "accum": 4,
        "freeze_roberta_body": True, "remat_policy": args.remat_policy,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
