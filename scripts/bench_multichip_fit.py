"""Full-size multi-chip memory-fit accounting (no chips required).

AOT-lowers the FULL-SIZE sharded train step (ModCR bf16 compute, remat,
AdamW + masked grad labels — the production trainer's program) on
abstract arguments over a virtual device mesh and records
``compiled.memory_analysis()`` per-device peaks against the v5e's 16 GB
HBM.  Nothing is materialized: params/opt-state exist only as
ShapeDtypeStructs with shardings attached (train/step.py:
lower_train_step).

The numbers are XLA's buffer-assignment accounting for the chosen
backend; on the CPU backend fusion differs from TPU so treat them as
layout/fit evidence (what shards where, how peak scales with mesh and
batch), not exact TPU HBM. Run with the TPU backend (tunnel up) for
chip-exact single-device rows.

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_multichip_fit.py --meshes 8x1,4x2 \
        --examples_per_device 8 [--flash] [--batch48]

Prints one JSON line per (mesh, config) on stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def gib(n: int) -> float:
    return round(n / (1 << 30), 3)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--meshes", default="8x1,4x2",
                   help="comma list of DATAxMODEL meshes")
    p.add_argument("--examples_per_device", type=int, default=8,
                   help="examples per data-shard (rows = 4x)")
    p.add_argument("--flash", action="store_true",
                   help="mem_efficient_attention in the reasoner")
    p.add_argument("--scan", action="store_true",
                   help="scan-over-layers reasoner (sequential backward)")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--seq_len", type=int, default=0,
                   help="override roberta_len (0 = production 128)")
    args = p.parse_args()

    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig,
        TrainConfig,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
    from multimodal_context_reasoning_tpu.parallel.partition import (
        param_shardings,
        replicated,
    )
    from multimodal_context_reasoning_tpu.train.optim import make_optimizer
    from multimodal_context_reasoning_tpu.train.state import TrainState
    from multimodal_context_reasoning_tpu.train.step import lower_train_step
    from __graft_entry__ import _synthetic_batch

    for mesh_str in args.meshes.split(","):
        d, m = (int(x) for x in mesh_str.split("x"))
        n_dev = d * m
        avail = jax.devices()
        if len(avail) < n_dev:
            print(json.dumps({"mesh": mesh_str,
                              "error": f"only {len(avail)} devices"}))
            continue
        mesh = make_mesh(model_parallelism=m, devices=avail[:n_dev])

        cfg = ModCRConfig().with_dtype("bfloat16")
        rob = dataclasses.replace(
            cfg.roberta, remat=not args.no_remat,
            mem_efficient_attention=args.flash, scan_layers=args.scan)
        if args.seq_len:
            cfg = dataclasses.replace(cfg, roberta_len=args.seq_len)
        cfg = dataclasses.replace(cfg, roberta=rob)
        model = ModCRModel(cfg)

        n_examples = args.examples_per_device * d
        batch = _synthetic_batch(cfg, n_examples=n_examples)
        batch_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)

        t0 = time.time()
        params_shapes = jax.eval_shape(
            model.init, jax.ShapeDtypeStruct((2,), jnp.uint32), batch_shapes)
        tcfg = TrainConfig(per_device_batch_size=args.examples_per_device,
                           freeze_encoders=True)
        tx = make_optimizer(tcfg, total_steps=1000, params=params_shapes)
        state_shapes = jax.eval_shape(
            lambda p: TrainState.create(p, tx), params_shapes)
        # pin shardings: TP rules for every array in the state (the AdamW
        # moment trees carry the param paths, so the same rules apply)
        sh = param_shardings(state_shapes, mesh)
        rep = replicated(mesh)

        def attach(s, s_sh):
            spec = s_sh if getattr(s, "ndim", 0) else rep
            return jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=spec)

        state_abs = jax.tree.map(attach, state_shapes, sh)

        lowered = lower_train_step(model, mesh, state_abs, batch_shapes)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        t_total = time.time() - t0

        n_params = sum(
            int(np.prod(x.shape)) for x in jax.tree.leaves(params_shapes))
        out = {
            "mesh": mesh_str,
            "backend": jax.default_backend(),
            "examples_per_device": args.examples_per_device,
            "rows_per_device": args.examples_per_device * cfg.num_labels,
            "flash_attention": args.flash,
            "scan_layers": args.scan,
            "remat": not args.no_remat,
            "params_m": round(n_params / 1e6, 1),
            "per_device_gib": {
                "arguments": gib(mem.argument_size_in_bytes),
                "outputs": gib(mem.output_size_in_bytes),
                "aliased": gib(mem.alias_size_in_bytes),
                "temps": gib(mem.temp_size_in_bytes),
                "peak_estimate": gib(
                    mem.argument_size_in_bytes + mem.output_size_in_bytes
                    + mem.temp_size_in_bytes - mem.alias_size_in_bytes),
            },
            "fits_16gib": (
                mem.argument_size_in_bytes + mem.output_size_in_bytes
                + mem.temp_size_in_bytes - mem.alias_size_in_bytes)
                < 16 * (1 << 30),
            "compile_s": round(t_total, 1),
        }
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
