"""Export a trained checkpoint back to the reference's torch format.

    python -m multimodal_context_reasoning_tpu.cli.export_reference \
        --eval_model_dir output/pmr --out modcr_exported.pth

Reads the run's best-metric Orbax checkpoint + its config.json and writes
the reference's ``{'net': Abstract_Specific state dict}`` torch.save form
(run_PMR_ModCR.py:236-239) — loadable by the reference's --do_test path
(strict=False; the dead heads keep fresh init, they are never read by the
forward) and by interop/assemble.py.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--eval_model_dir", required=True,
                   help="training output dir (ckpt/ + config.json)")
    p.add_argument("--out", required=True, help="target .pth path")
    p.add_argument("--step", type=int, default=None,
                   help="explicit checkpoint step (default: best, then latest)")
    args = p.parse_args(argv)

    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.interop.export import (
        save_reference_checkpoint,
    )
    from multimodal_context_reasoning_tpu.train.checkpoint import (
        CheckpointManager,
    )

    cfg_path = os.path.join(args.eval_model_dir, "config.json")
    with open(cfg_path) as f:
        cfg = ModCRConfig.from_json(f.read())
    params = CheckpointManager(
        os.path.join(args.eval_model_dir, "ckpt")
    ).restore_params(args.step, best=True)
    save_reference_checkpoint(args.out, params, cfg)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
