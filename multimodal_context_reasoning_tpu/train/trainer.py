"""Host-side training loop.

Rebuilds the reference trainer (run_PMR_ModCR.py:115-241) around one jitted
step: epoch loop, mid-epoch validation gated by ``epoch_begin``/``valid_steps``
with best-accuracy checkpointing (:230-239), and Orbax resume (:146-156).
Gradient accumulation lives inside the optimizer (optax.MultiSteps), so the
host loop is one device call per micro-batch with no `.item()`-style syncs on
the hot path — metrics are fetched asynchronously.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_context_reasoning_tpu.core.config import TrainConfig
from multimodal_context_reasoning_tpu.train.checkpoint import CheckpointManager
from multimodal_context_reasoning_tpu.train.optim import make_optimizer
from multimodal_context_reasoning_tpu.train.state import TrainState
from multimodal_context_reasoning_tpu.train.step import make_eval_step, make_train_step
from multimodal_context_reasoning_tpu.utils.metrics import MetricLogger


class Trainer:
    def __init__(
        self,
        model,
        cfg: TrainConfig,
        train_loader,
        val_loader=None,
        *,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
        logger: Optional[logging.Logger] = None,
        freeze_roberta_body: bool = False,
        profile_dir: Optional[str] = None,
        profile_start: int = 10,
        profile_steps: int = 3,
        tensorboard_dir: Optional[str] = None,
        checkpoint_params_only: bool = False,
    ):
        self.model = model
        self.cfg = cfg
        # jax.profiler capture of micro-steps [profile_start,
        # profile_start+profile_steps) into profile_dir (TensorBoard/xprof);
        # default start skips compile + warmup steps
        self.profile_dir = profile_dir
        self.profile_start = profile_start
        self.profile_steps = profile_steps
        # scalar stream (utils/tensorboard.py: SummaryWriter or JSONL
        # fallback), fed at the same sync points the meter drains at —
        # per-step writes would force per-step device readbacks
        self.tb = None
        if tensorboard_dir is not None:
            from multimodal_context_reasoning_tpu.utils.tensorboard import (
                TensorboardLogger,
            )

            self.tb = TensorboardLogger(tensorboard_dir)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = mesh
        self.logger = logger or logging.getLogger("modcr")
        self.freeze_roberta_body = freeze_roberta_body

        steps_per_epoch = max(
            len(train_loader) // cfg.gradient_accumulation_steps, 1
        )
        # t_total semantics: run_PMR_ModCR.py:118-124.
        if cfg.max_steps > 0:
            self.t_total = cfg.max_steps
            self.num_epochs = cfg.max_steps // steps_per_epoch + 1
        else:
            self.t_total = steps_per_epoch * cfg.num_train_epochs
            self.num_epochs = cfg.num_train_epochs

        self.train_step = make_train_step(model, mesh=mesh)
        self.eval_step = make_eval_step(model, mesh=mesh)
        # multi-host: each process feeds its LOCAL loader shard; lift the
        # shards into global row-sharded arrays (parallel/multihost.py)
        self._to_device = _device_batch
        if mesh is not None and jax.process_count() > 1:
            from multimodal_context_reasoning_tpu.parallel.multihost import (
                global_batch,
            )

            self._to_device = lambda b: global_batch(b, mesh)
        # params_only: best-acc saves for export-only consumers skip the
        # AdamW moments (3x smaller D2H per save; no resume from them)
        self.ckpt = (
            CheckpointManager(checkpoint_dir,
                              params_only=checkpoint_params_only)
            if checkpoint_dir else None
        )
        self.best_acc = 0.0
        # steps-vs-accuracy curve: one dict per mid-training validation
        # (the reference records this only in checkpoint FILENAMES,
        # run_PMR_ModCR.py:236-239)
        self.history: list = []

    def init_state(self, rng: Optional[jax.Array] = None, sample_batch=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        if sample_batch is None:
            sample_batch = next(iter(self.train_loader))
        from multimodal_context_reasoning_tpu.train.step import _model_inputs

        inputs = _model_inputs(
            {k: jnp.asarray(v) for k, v in sample_batch.items()}
        )
        # jit the init: unjitted, every parameter initializer is a separate
        # device dispatch — ruinous over a high-latency device link
        params = jax.jit(self.model.init)(rng, inputs)
        tx = make_optimizer(
            self.cfg, self.t_total, params,
            freeze_roberta_body=self.freeze_roberta_body,
        )
        return TrainState.create(params, tx)

    def resume(self, state: TrainState) -> TrainState:
        if self.ckpt is None or self.ckpt.latest_step() is None:
            return state
        state = self.ckpt.restore(state)
        self.logger.info("Resumed from step %d", int(state.step))
        return state

    def evaluate(self, params) -> float:
        """Full-validation accuracy (run_PMR_ModCR.py:243-280).

        One batch is kept in flight: the host featurizes/dispatches batch
        i+1 while the device finishes batch i (BENCHMARKS.md: +21% on the
        tunneled chip; free on any backend)."""
        assert self.val_loader is not None
        correct = 0.0
        count = 0.0
        pending = None
        for batch in self.val_loader:
            out = self.eval_step(params, self._to_device(batch))
            if pending is not None:
                correct += float(pending["correct"])
                count += float(pending["count"])
            pending = out
        if pending is not None:
            correct += float(pending["correct"])
            count += float(pending["count"])
        return correct / max(count, 1.0)

    def fit(self, state: Optional[TrainState] = None) -> TrainState:
        """Train loop with NO host syncs on the micro-step path: per-step
        metrics are summed into one device-resident accumulator (three tiny
        async adds per step) and fetched only at validation points and epoch
        ends — on a high-latency device link a per-step ``float()`` readback
        costs ~95 ms/step (BENCHMARKS.md)."""
        if state is None:
            state = self.init_state()
        state = self.resume(state)
        rng = jax.random.PRNGKey(self.cfg.seed + 1)
        meter = MetricLogger()
        accum = self.cfg.gradient_accumulation_steps
        micro = 0
        sums: Optional[Dict[str, jnp.ndarray]] = None
        since_fetch = 0

        def drain_sums():
            """One synchronization point: fold the device sums into the
            meter as window averages."""
            nonlocal sums, since_fetch
            if sums is None or since_fetch == 0:
                return
            fetched = {k: float(v) for k, v in sums.items()}
            meter.update(
                loss=fetched["loss"] / since_fetch,
                acc=fetched["correct"] / max(fetched["count"], 1.0),
                # loss composition: visible when a recipe weights several
                # terms (e.g. stage-1 ChunkAlign pretrain's cls + align CE)
                align=fetched["align_loss"] / since_fetch,
            )
            sums = None
            since_fetch = 0

        tracing = False

        def maybe_profile(micro_done: int, block_on=None) -> None:
            """Start/stop the jax.profiler capture window around
            micro-steps [profile_start, profile_start+profile_steps)."""
            nonlocal tracing
            if self.profile_dir is None:
                return
            if not tracing and micro_done == self.profile_start:
                jax.profiler.start_trace(self.profile_dir)
                tracing = True
            elif tracing and micro_done >= self.profile_start + self.profile_steps:
                if block_on is not None:
                    jax.block_until_ready(block_on)  # capture real device time
                jax.profiler.stop_trace()
                tracing = False
                self.logger.info("profiler trace written to %s",
                                 self.profile_dir)

        capped = False  # max_steps reached: stop BEFORE any further update
        for epoch in range(self.num_epochs):
            if capped:
                break
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(epoch)
            for batch in self.train_loader:
                maybe_profile(micro)
                rng, step_rng = jax.random.split(rng)
                state, metrics = self.train_step(
                    state, self._to_device(batch), step_rng
                )
                micro += 1
                maybe_profile(micro, block_on=metrics["loss"])
                sums = (
                    metrics if sums is None
                    else {k: sums[k] + metrics[k] for k in sums}
                )
                since_fetch += 1
                if micro % accum != 0:
                    continue
                opt_step = micro // accum
                if (
                    self.val_loader is not None
                    and epoch >= self.cfg.epoch_begin - 1
                    and opt_step % self.cfg.valid_steps == 0
                ):
                    drain_sums()
                    acc = self.evaluate(state.params)
                    self.logger.info(
                        "epoch %d step %d: val accuracy %.4f (train %s)",
                        epoch + 1, opt_step, acc, meter,
                    )
                    last = lambda k: (
                        float(meter.meters[k].deque[-1])
                        if meter.meters[k].deque else None
                    )
                    self.history.append({
                        "epoch": epoch + 1, "step": opt_step,
                        "val_acc": acc,
                        "train_loss": last("loss"),
                        "train_acc": last("acc"),
                    })
                    if self.tb is not None:
                        self.tb.log_meters(meter, opt_step)
                        self.tb.log_scalar("val_acc", acc, opt_step)
                    if acc > self.best_acc:
                        self.best_acc = acc
                        if self.ckpt is not None:
                            self.ckpt.save(state, {"accuracy": acc})
                if self.cfg.max_steps > 0 and opt_step >= self.cfg.max_steps:
                    capped = True  # also exits the epoch loop — otherwise
                    break          # the next epoch trains one extra group
            drain_sums()
            self.logger.info("epoch %d done: %s", epoch + 1, meter)
            if self.tb is not None:
                self.tb.log_meters(meter, micro // accum)
        if tracing:  # training ended inside the capture window
            jax.profiler.stop_trace()
        if self.tb is not None:
            self.tb.close()
        if self.ckpt is not None:
            self.ckpt.wait()
        return state


def _device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()}
