"""Device-table vs host-features TRAINING throughput on the real chip.

The fixed-batch bench (bench_train.py) cannot see the device table's win:
its one synthetic batch transfers once and is then device-cached.  Real
training (scripts/train_real_pmr.py) ships a DIFFERENT batch every step —
at production geometry that is ~52 MB of fp32 ``img_feat``/``img_mask``
per batch-32 step through the tunnel's measured ~40 MB/s h2d
(BENCHMARKS.md "Device-table data path"), vs a ~0.2 MB int32 id vector
plus an in-program gather from the HBM-resident table
(data/device_table.py).

This bench pre-featurizes K distinct real-PMR batches per mode and times
the full train step (fwd+bwd+clip+AdamW, remat dots, bf16) cycling
through them — fresh host arrays every step in host mode, resident-table
refs + ids in table mode — alternated back-to-back and repeated, the
only trustworthy methodology on the drifting tunneled TPU.

Usage (TPU container):

    python scripts/bench_device_table.py --batch 32 --iters 10 --repeats 2
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

from train_real_pmr import synthetic_features  # noqa: E402  (scripts/)


def build(batch: int, n_batches: int):
    import jax

    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig,
        TrainConfig,
    )
    from multimodal_context_reasoning_tpu.data.collate import BatchSpec
    from multimodal_context_reasoning_tpu.data.device_table import (
        DeviceFeatureTable,
    )
    from multimodal_context_reasoning_tpu.data.loader import DataLoader
    from multimodal_context_reasoning_tpu.data.pmr import (
        PMRDataset,
        load_pmr_jsonl,
    )
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
        RobertaHashTokenizer,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.train.optim import make_optimizer
    from multimodal_context_reasoning_tpu.train.state import TrainState
    from multimodal_context_reasoning_tpu.train.step import make_train_step

    cfg = ModCRConfig(compute_alignment=False).with_dtype("bfloat16")
    cfg = dataclasses.replace(
        cfg,
        roberta=dataclasses.replace(
            cfg.roberta, remat=True, remat_policy="dots"
        ),
    )

    examples = []
    for path in (
        "/root/reference/pmr_data/val-ori.jsonl",
        "/root/reference/pmr_data/test-ori.jsonl",
    ):
        examples.extend(load_pmr_jsonl(path))
    feats = synthetic_features(
        {ex.img_id for ex in examples},
        cfg.global_encoder.img_feature_dim,
        max_regions=min(cfg.img_len, 20),
    )
    bert = HashTokenizer(vocab_size=cfg.global_encoder.vocab_size)
    rob = RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size)
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len, num_labels=cfg.num_labels,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )

    def first_batches(ds):
        dl = DataLoader(ds, batch, shuffle=True, seed=0, drop_last=True)
        out = []
        for b in dl:
            out.append(b)
            if len(out) >= n_batches:
                break
        return out

    host_ds = PMRDataset(examples, feats, bert, rob, spec=spec,
                         max_chunks=cfg.max_chunks)
    host_batches = first_batches(host_ds)

    table = DeviceFeatureTable.for_config(feats, cfg)
    table_ds = PMRDataset(examples, feats, bert, rob, spec=spec,
                          max_chunks=cfg.max_chunks)
    table_ds.use_device_table(table)
    table_batches = first_batches(table_ds)

    tcfg = TrainConfig(per_device_batch_size=batch,
                       compute_dtype="bfloat16")
    model = ModCRModel(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), host_batches[0])
    tx = make_optimizer(tcfg, 1000, params)
    state = TrainState.create(params, tx)
    step = make_train_step(model)
    rng = jax.random.PRNGKey(1)
    sys.stderr.write(
        f"[bench] table resident: {len(table.row)} images, "
        f"{table.nbytes / 1e6:.1f} MB; host img_feat per step: "
        f"{host_batches[0]['img_feat'].nbytes / 1e6:.1f} MB\n"
    )
    return state, step, host_batches, table_batches, rng


def measure(state, step, batches, rng, iters: int):
    """Pipelined readback (one step in flight — the production Trainer
    drains metrics only at eval boundaries), fresh batch each step."""
    state, m = step(state, batches[0], rng)      # compile + warm
    float(m["loss"])
    state, m = step(state, batches[1 % len(batches)], rng)
    float(m["loss"])
    t0 = time.perf_counter()
    prev = None
    for i in range(iters):
        state, m = step(state, batches[i % len(batches)], rng)
        if prev is not None:
            float(prev["loss"])
        prev = m
    float(prev["loss"])
    dt = time.perf_counter() - t0
    return state, dt / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--n_batches", type=int, default=6,
                   help="distinct pre-featurized batches cycled per mode")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/modcr_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/modcr_jax_cache")
    sys.stderr.write(f"[bench] devices: {jax.devices()}\n")

    state, step, host_b, table_b, rng = build(args.batch, args.n_batches)

    results = {"host": [], "table": []}
    for rep in range(args.repeats):
        for mode, batches in (("host", host_b), ("table", table_b)):
            state, per = measure(state, step, batches, rng, args.iters)
            exs = args.batch / per
            results[mode].append(round(exs, 1))
            sys.stderr.write(
                f"[bench] rep{rep} {mode}: {per * 1e3:.0f} ms/step "
                f"= {exs:.1f} ex/s\n"
            )
    out = {
        "metric": "pmr_real_train_examples_per_sec_per_chip",
        "batch": args.batch,
        "host_features_ex_s": results["host"],
        "device_table_ex_s": results["table"],
        "unit": "examples/sec",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
