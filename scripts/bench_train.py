"""Training-step throughput bench at reference-parity geometry.

Measures the FULL train step (fwd+bwd+clip+AdamW, frozen encoders) on the
real chip for a set of named configs, alternated back-to-back and repeated
— the only trustworthy methodology on the tunneled TPU, whose throughput
drifts ~±5% across time windows (BENCHMARKS.md).  Timing fetches the loss
to host every step (block_until_ready returns early through the tunnel).

Configs:
  full    — remat=True, policy "full"  (round-2 default: recompute all)
  dots    — remat=True, policy "dots"  (keep matmul outputs, recompute
            elementwise only — jax.checkpoint_policies.dots_with_no_batch_
            dims_saveable)
  noremat — remat=False (baseline; OOMs at batch 32 on a 16 GB v5e)

Usage:
  python scripts/bench_train.py --configs full,dots --batch 32 --task pmr
  python scripts/bench_train.py --task vcr --configs full,dots  # VCR geom

VCR geometry (BASELINE.json config 4): the reference's run_vcr_ModCR.py
defaults — grad-accum 4 and the RoBERTa-body freeze (:783-787,605); same
sequence caps as PMR (max_seq_length 140, 50 regions).
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


def build(name: str, task: str, batch: int):
    import jax

    from __graft_entry__ import _synthetic_batch
    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig,
        TrainConfig,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.train.optim import make_optimizer
    from multimodal_context_reasoning_tpu.train.state import TrainState
    from multimodal_context_reasoning_tpu.train.step import make_train_step

    cfg = ModCRConfig(compute_alignment=False).with_dtype("bfloat16")
    if name == "noremat":
        pass
    elif name in ("full", "dots"):
        cfg = dataclasses.replace(
            cfg,
            roberta=dataclasses.replace(
                cfg.roberta, remat=True, remat_policy=name
            ),
        )
    elif name in ("dedup0", "nodedup0"):
        # lever (c): TRAIN-time vision-prefix dedup — fires when the global
        # encoder is dropout-free (models/modcr.py gate), which is the
        # measured from-scratch recipe (BENCHMARKS.md dropout finding).
        # The pair differs only in dedup_vision_prefix so the delta is the
        # lever itself, not the dropout-0 speedup.
        enc = dataclasses.replace(
            cfg.global_encoder,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        cfg = dataclasses.replace(
            cfg, global_encoder=enc, seq_encoder=enc,
            dedup_vision_prefix=(name == "dedup0"),
            roberta=dataclasses.replace(
                cfg.roberta, remat=True, remat_policy="dots"
            ),
        )
    elif name == "flash":
        # memory lever: remat "dots" + recompute-in-backward attention in
        # the 24-layer trainable reasoner (ops/flash.py) — the fp32
        # [rows, H, L, L] softmax temporaries named by the batch-48 OOM
        # are never saved as residuals, so batch ≥48 fits 16 GB
        cfg = dataclasses.replace(
            cfg,
            roberta=dataclasses.replace(
                cfg.roberta, remat=True, remat_policy="dots",
                mem_efficient_attention=True,
            ),
        )
    elif name == "scanflash":
        # the batch>=48 configuration: scan-over-layers (structurally
        # sequential backward — only ONE layer's recompute live at a time,
        # vs the Python loop where XLA hoists all 24) + remat "full"
        # (save only the per-layer carry) + recompute-in-backward
        # attention.  See BENCHMARKS.md "Batch-size headroom (round 5)".
        cfg = dataclasses.replace(
            cfg,
            roberta=dataclasses.replace(
                cfg.roberta, remat=True, remat_policy="full",
                mem_efficient_attention=True, scan_layers=True,
            ),
        )
    elif name == "int8frozen":
        # lever (a): int8 matmuls in the FROZEN towers' forward only
        # (stop_gradient means round()'s zero gradient never matters);
        # the trainable RoBERTa stays bf16, remat "dots"
        enc = dataclasses.replace(cfg.global_encoder, quantize="int8")
        cfg = dataclasses.replace(
            cfg, global_encoder=enc, seq_encoder=enc,
            roberta=dataclasses.replace(
                cfg.roberta, remat=True, remat_policy="dots"
            ),
        )
    else:
        raise SystemExit(f"unknown config {name}")

    accum = 4 if task == "vcr" else 1      # run_vcr_ModCR.py:605
    tcfg = TrainConfig(
        per_device_batch_size=batch,
        gradient_accumulation_steps=accum,
        compute_dtype="bfloat16",
    )
    model = ModCRModel(cfg)
    batch_data = _synthetic_batch(cfg, n_examples=batch)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch_data)
    tx = make_optimizer(
        tcfg, 1000, params,
        freeze_roberta_body=(task == "vcr"),   # run_vcr_ModCR.py:783-787
    )
    state = TrainState.create(params, tx)
    step = make_train_step(model)
    rng = jax.random.PRNGKey(1)
    return state, step, batch_data, rng


def measure(state, step, batch, rng, iters: int, pipelined: bool = False):
    """Per-step time with host readback each iteration.

    pipelined=False fetches THIS step's loss before launching the next —
    one tunnel round-trip serialized into every step.  pipelined=True
    fetches the PREVIOUS step's loss while the current one computes (one
    step in flight, same trick as bench.py's inference headline) and
    drains the last fetch inside the timed window — this matches the
    production Trainer, which accumulates metrics device-side and drains
    them only at eval boundaries (train/trainer.py drain_sums), so no
    readback ever serializes its step loop."""
    state, m = step(state, batch, rng)          # compile + warm
    float(m["loss"])
    state, m = step(state, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    if pipelined:
        prev = None
        for _ in range(iters):
            state, m = step(state, batch, rng)
            if prev is not None:
                float(prev["loss"])              # overlaps current step
            prev = m
        float(prev["loss"])                      # drain inside the window
    else:
        for _ in range(iters):
            state, m = step(state, batch, rng)
            float(m["loss"])                     # host readback clock
    dt = time.perf_counter() - t0
    return state, dt / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="full,dots")
    p.add_argument("--task", default="pmr", choices=["pmr", "vcr"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--pipelined", action="store_true",
                   help="fetch metrics one step behind (matches the "
                        "production Trainer's device-side metric "
                        "accumulation — see measure())")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/modcr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    names = args.configs.split(",")
    results = {n: [] for n in names}
    # one config resident at a time (three full optimizer states would
    # blow the 16 GB v5e); alternation happens at rep granularity, with a
    # rebuild each rep (compile cache makes rebuilds cheap)
    for rep in range(args.repeats):
        for n in names:
            print(f"[bench_train] rep{rep} building {n} (task={args.task} "
                  f"batch={args.batch})", file=sys.stderr, flush=True)
            state, step, batch, rng = build(n, args.task, args.batch)
            state, per_step = measure(
                state, step, batch, rng, args.iters,
                pipelined=args.pipelined,
            )
            exps = args.batch / per_step
            results[n].append(exps)
            print(f"[bench_train] rep{rep} {n}: {per_step*1e3:.0f} ms/step "
                  f"= {exps:.1f} ex/s", file=sys.stderr, flush=True)
            del state, step, batch, rng
            import gc

            gc.collect()

    out = {
        "task": args.task, "batch": args.batch, "iters": args.iters,
        "examples_per_sec": {
            n: [round(v, 1) for v in vs] for n, vs in results.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
