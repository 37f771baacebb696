"""Serving standup time: live construction vs AOT artifact reload.

Measures, at FULL size on the real chip, the wall time from process-start
state to "first request served" for (a) the live path — ModCRModel
construction, jitted init, scorer warmup — and (b) the AOT artifact path —
load weights, deserialize the compiled executable (fingerprint-matching
box: NO XLA compile) or the StableHLO program (portable fallback: one
compile), warmup — plus a score-equality check.

Honest-comparison modes (round 4): a serving restart happens in a FRESH
process, and a new box has a cold persistent compile cache.  Use
``--export_only`` then ``--reload_only`` in separate processes with
``--cold_cache`` to measure exactly that:

    python scripts/bench_aot.py --export_only --keep_dir /tmp/aot --cold_cache
    python scripts/bench_aot.py --reload_only --keep_dir /tmp/aot --cold_cache

``--device_features`` exercises the HBM-resident-table scorer (the table
buffers travel as program inputs; the reload rebuilds them from the
serving box's feature source).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[bench-aot] {msg}", file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--micro_batch", type=int, default=8)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--keep_dir", default="",
                   help="write/read the artifact here instead of a tempdir")
    p.add_argument("--device_features", action="store_true",
                   help="HBM-resident feature table mode (table buffers are "
                        "program inputs; reload rebuilds from the feature "
                        "source)")
    p.add_argument("--export_only", action="store_true",
                   help="live standup + export, then exit (pair with "
                        "--reload_only in a FRESH process)")
    p.add_argument("--reload_only", action="store_true",
                   help="artifact standup only, from --keep_dir (fresh-"
                        "process serving-restart measurement)")
    p.add_argument("--cold_cache", action="store_true",
                   help="point the persistent compile cache at a fresh "
                        "tempdir — simulates a never-seen serving box")
    args = p.parse_args()
    if args.reload_only and not args.keep_dir:
        raise SystemExit("--reload_only needs --keep_dir")

    import jax

    cache_dir = ("/tmp/modcr_jax_cache" if not args.cold_cache
                 else tempfile.mkdtemp(prefix="modcr_cold_cache_"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.data.collate import (
        BatchSpec,
        collate_candidates,
    )
    from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
    from multimodal_context_reasoning_tpu.data.schemas import (
        ImageFeatures,
        RawExample,
    )
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
        RobertaHashTokenizer,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.serving.aot import (
        AOTScorer,
        save_scorer_artifact,
    )
    from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

    cfg = (ModCRConfig.tiny() if args.tiny
           else ModCRConfig(compute_alignment=False)
           .with_dtype(args.compute_dtype))
    rng = np.random.default_rng(0)
    feats = {
        f"img-{i}": ImageFeatures(
            features=rng.normal(size=(
                12, cfg.global_encoder.img_feature_dim)).astype(np.float32),
            num_regions=12,
        ) for i in range(8)
    }
    bert = HashTokenizer(vocab_size=cfg.global_encoder.vocab_size)
    rob = RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size)
    ex = RawExample("e0", "img-0", "they are friends .",
                    ["hug .", "fight .", "leave .", "sing ."], None)
    out = {"micro_batch": args.micro_batch,
           "device_features": args.device_features,
           "cold_cache": args.cold_cache}

    art_dir = args.keep_dir or tempfile.mkdtemp(prefix="modcr_aot_")

    if not args.reload_only:
        # ---- live path: model construction + jitted init + warmup
        log("live path: construct + init + warm...")
        t0 = time.perf_counter()
        spec = BatchSpec(
            text_len=cfg.text_len, img_len=cfg.img_len,
            roberta_len=cfg.roberta_len,
            img_feature_dim=cfg.global_encoder.img_feature_dim,
        )
        ds = PMRDataset([], feats, bert, rob, spec=spec,
                        max_chunks=cfg.max_chunks)
        warm_ex = RawExample("w", "img-0", "warm .", ["a ."] * 4, 0)
        batch = collate_candidates(
            [ds.featurize(warm_ex)] * args.micro_batch,
            [ds.get_image(warm_ex)] * args.micro_batch, spec)
        model = ModCRModel(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in batch.items()})
        scorer = ModCRScorer(cfg, params, bert, rob, feats,
                             micro_batch=args.micro_batch, warm=True,
                             use_device_table=args.device_features)
        live_s = time.perf_counter() - t0
        log(f"live standup: {live_s:.1f}s")
        live_scores = scorer.score([ex])
        out["live_standup_s"] = round(live_s, 1)
        # rounded copies are for the REPORT only; the bit-identity check
        # below compares the raw float values
        live_raw = [float(x) for x in live_scores[0]["logits"]]
        out["live_logits"] = [round(x, 6) for x in live_raw]

        # ---- export (one-time cost, reported separately)
        t0 = time.perf_counter()
        save_scorer_artifact(art_dir, scorer)
        export_s = time.perf_counter() - t0
        size_mb = sum(
            os.path.getsize(os.path.join(art_dir, f))
            for f in os.listdir(art_dir)
        ) / 1e6
        log(f"export: {export_s:.1f}s, artifact {size_mb:.0f} MB")
        out["export_s"] = round(export_s, 1)
        out["artifact_mb"] = round(size_mb, 1)
        with open(os.path.join(art_dir, "artifact.json")) as f:
            out["has_executable"] = json.load(f)["executable"] is not None

    if not args.export_only:
        # ---- artifact path: load (+ compile only on fallback) + warmup
        log("artifact path: load + warm...")
        t0 = time.perf_counter()
        aot = AOTScorer(art_dir, bert, rob, feats, warm=True)
        aot_s = time.perf_counter() - t0
        log(f"artifact standup: {aot_s:.1f}s "
            f"(via_executable={aot.loaded_from_executable})")
        out["artifact_standup_s"] = round(aot_s, 1)
        out["via_executable"] = bool(aot.loaded_from_executable)

        aot_scores = aot.score([ex])
        aot_raw = [float(x) for x in aot_scores[0]["logits"]]
        out["aot_logits"] = [round(x, 6) for x in aot_raw]
        if "live_logits" in out:
            out["scores_bit_identical"] = bool(np.allclose(
                live_raw, aot_raw, atol=0, rtol=0))
            out["speedup"] = round(
                out["live_standup_s"] / max(aot_s, 1e-9), 2)

    if not args.keep_dir:
        shutil.rmtree(art_dir, ignore_errors=True)
    if args.cold_cache:
        shutil.rmtree(cache_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
