"""True multi-process (DCN-style) validation of the SPMD train step.

Spawns TWO separate Python processes, each owning 4 virtual CPU devices,
connected through ``jax.distributed.initialize`` — the same topology as a
2-host TPU pod over DCN. Each process feeds its LOCAL half of the global
batch through ``parallel.multihost.global_batch`` and runs the full
sharded ModCR train step; both ranks must report the identical psum'd
loss. This is the one claim ("multi-host comes free through the same pjit
program", SURVEY §2.6) that single-process mesh tests cannot check.
"""

import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import os, sys
    rank = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.distributed.initialize(
        coordinator_address=f"localhost:{{port}}",
        num_processes=2, process_id=rank,
    )
    import numpy as np
    from __graft_entry__ import _synthetic_batch
    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig, TrainConfig,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
    from multimodal_context_reasoning_tpu.parallel.multihost import (
        global_batch,
    )
    from multimodal_context_reasoning_tpu.parallel.partition import (
        param_shardings,
    )
    from multimodal_context_reasoning_tpu.train.optim import make_optimizer
    from multimodal_context_reasoning_tpu.train.state import TrainState
    from multimodal_context_reasoning_tpu.train.step import make_train_step

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    mesh = make_mesh((4, 2))
    cfg = ModCRConfig.tiny()
    model = ModCRModel(cfg)

    # per-process LOCAL half (2 of the 4 global examples); rank-dependent
    # content proves the psum really mixes both hosts' data
    local = _synthetic_batch(cfg, n_examples=2, seed=rank)
    glob = global_batch(local, mesh)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.tree.map(np.asarray, local)
    )
    params = jax.device_put(params, param_shardings(params, mesh))
    tx = make_optimizer(
        TrainConfig(per_device_batch_size=1, mesh_shape=(4, 2)),
        total_steps=10, params=params,
    )
    state = TrainState.create(params, tx)
    step = make_train_step(model, mesh=mesh, donate=False)
    state, metrics = step(state, glob, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)
    print(f"RANK{{rank}} loss={{loss:.6f}}", flush=True)
""").format(repo="/root/repo")


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    # a free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {
        k: v for k, v in __import__("os").environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "XLA_FLAGS",
                             "JAX_PLATFORMS", "_MODCR"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RANK")][-1]
        losses.append(float(line.split("loss=")[1]))
    # both ranks observe the SAME psum'd global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)


TRAINER_WORKER = textwrap.dedent("""
    import os, sys
    rank = int(sys.argv[1]); port = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "host"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.distributed.initialize(
        coordinator_address=f"localhost:{{port}}",
        num_processes=2, process_id=rank,
    )
    import numpy as np
    from multimodal_context_reasoning_tpu.cli.common import batch_spec
    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig, TrainConfig,
    )
    from multimodal_context_reasoning_tpu.data.loader import DataLoader
    from multimodal_context_reasoning_tpu.data.pmr import (
        PMRDataset, load_pmr_jsonl,
    )
    from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
    from multimodal_context_reasoning_tpu.train.trainer import Trainer

    cfg = ModCRConfig.tiny()
    examples = load_pmr_jsonl(
        "/root/reference/pmr_data/val-ori.jsonl", limit=8)
    rng = np.random.default_rng(0)
    feats = {{
        ex.img_id: ImageFeatures(
            features=rng.normal(
                size=(6, cfg.global_encoder.img_feature_dim)
            ).astype(np.float32),
            num_regions=6,
        )
        for ex in examples
    }}
    ds = PMRDataset(
        examples, feats,
        HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
        HashTokenizer(vocab_size=cfg.roberta.vocab_size),
        spec=batch_spec(cfg), max_chunks=cfg.max_chunks,
    )
    if mode == "table":
        # device-resident feature table: every process builds the SAME
        # table (sorted keys over the same feats dict); batches carry
        # int32 img_row and the lift replicates the table once
        # (parallel/multihost.py::_lift_replicated).  fp32 so the loss is
        # bit-identical to host mode.
        from multimodal_context_reasoning_tpu.data.device_table import (
            DeviceFeatureTable,
        )
        ds.use_device_table(
            DeviceFeatureTable(feats, img_len=cfg.img_len, dtype="float32")
        )
    # each process iterates ITS shard: 4 local examples, local batch 2
    train_dl = DataLoader(ds, 2, shuffle=True, seed=7, drop_last=True,
                          shard=(rank, 2))
    val_dl = DataLoader(ds, 2, shard=(rank, 2))
    mesh = make_mesh((4, 2))
    tcfg = TrainConfig(
        learning_rate=1e-3, scheduler="constant", weight_decay=0.0,
        num_train_epochs=1, gradient_accumulation_steps=1,
        valid_steps=2, epoch_begin=1, per_device_batch_size=2,
        mesh_shape=(4, 2),
    )
    trainer = Trainer(ModCRModel(cfg), tcfg, train_dl, val_dl, mesh=mesh)
    state = trainer.fit()
    print(f"RANK{{rank}} steps={{int(state.step)}} "
          f"best={{trainer.best_acc:.6f}}", flush=True)
""").format(repo="/root/repo")


def _run_two_process_fit(tmp_path, mode: str):
    """Run Trainer.fit across two REAL processes in ``mode`` and return
    (per-rank steps lines, per-rank best accs)."""
    try:
        open("/root/reference/pmr_data/val-ori.jsonl").close()
    except FileNotFoundError:
        pytest.skip("reference pmr_data not mounted")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / f"trainer_worker_{mode}.py"
    script.write_text(TRAINER_WORKER)
    env = {
        k: v for k, v in __import__("os").environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "XLA_FLAGS",
                             "JAX_PLATFORMS", "_MODCR"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process fit timed out")
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    lines = [
        [l for l in out.splitlines() if l.startswith("RANK")][-1]
        for out in outs
    ]
    return lines, [float(l.split("best=")[1]) for l in lines]


@pytest.mark.slow
def test_two_process_trainer_fit_host_vs_device_table(tmp_path):
    """Trainer.fit across two REAL processes: sharded DataLoaders feed
    local halves, parallel/multihost lifts them to global arrays, metric
    drains read replicated outputs, and mid-epoch eval runs sharded —
    both ranks must agree on steps and the eval accuracy, and the
    device-table mode (replicated table lift) must reproduce host mode
    bit-exactly (fp32 table, same batches)."""
    results = {}
    for mode in ("host", "table"):
        lines, accs = _run_two_process_fit(tmp_path, mode)
        # 4 local examples / local batch 2 → 2 steps; identical per rank
        assert all("steps=2" in l for l in lines), (mode, lines)
        assert accs[0] == pytest.approx(accs[1], abs=1e-6), (mode, accs)
        results[mode] = accs[0]
    assert results["table"] == pytest.approx(
        results["host"], abs=1e-6
    ), results
