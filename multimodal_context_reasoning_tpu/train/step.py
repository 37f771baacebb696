"""Jitted SPMD train / eval steps.

One compiled XLA program per step — forward, backward, clip, update, and the
gradient psum over the ``data`` mesh axis all fuse into it (the reference
splits this across eager torch calls, run_PMR_ModCR.py:201-227, with no
multi-device path at all).

Loss semantics follow the production trainer exactly: the optimized loss is
the 4-way soft CE alone (``loss = cls_loss``, run_PMR_ModCR.py:204-208; the
alignment-loss term is computed but commented out of the total).  Metrics
additionally report the alignment loss and candidate accuracy.

Accuracy semantics (eval, run_PMR_ModCR.py:266-274): argmax over the 4
candidate logits must equal argmax of the multi-hot label row — for a
multi-label PMR row the reference credits only the FIRST gold candidate,
and so do we (reference-exact accuracy numbers).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_context_reasoning_tpu.parallel.partition import (
    batch_shardings,
    param_shardings,
    replicated,
)
from multimodal_context_reasoning_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]


def _model_inputs(batch: Batch) -> Batch:
    batch = {k: v for k, v in batch.items() if k != "example_mask"}
    if "img_row" in batch:
        # device-table mode (data/device_table.py): gather the batch's
        # image features from the HBM-resident table inside the compiled
        # program — the host ships [N] int32 ids, not [N, I, F] floats
        table = batch.pop("feat_table")
        tmask = batch.pop("feat_mask_table")
        rows = batch.pop("img_row")
        batch["img_feat"] = table[rows]
        batch["img_mask"] = tmask[rows]
    return batch


def _metrics(out, batch: Batch) -> Dict[str, jnp.ndarray]:
    logits = out.logits                              # [B, K]
    labels = batch["label"].reshape(logits.shape)    # [B, K] multi-hot
    pred = jnp.argmax(logits, axis=-1)
    # exact reference semantics (run_PMR_ModCR.py:266-274): prediction must
    # equal argmax of the label row — for a multi-label PMR row that is the
    # FIRST gold candidate, not any gold.
    hit = pred == jnp.argmax(labels, axis=-1)
    w = batch.get("example_mask")
    if w is None:
        w = jnp.ones(logits.shape[:1], jnp.float32)
    return {
        "loss": out.loss,
        "align_loss": out.align_loss,
        "correct": jnp.sum(hit.astype(jnp.float32) * w),
        "count": jnp.sum(w),
    }


def _build_step(model):
    """The raw (unjitted) train-step body shared by the jit and AOT paths."""

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        inputs = _model_inputs(batch)

        def loss_fn(params):
            out = model.apply(
                params, inputs, deterministic=False, rngs={"dropout": rng}
            )
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = _metrics(out, batch)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return step


def make_train_step(
    model,
    *,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Dict]]:
    """Build the jitted train step; with a mesh, in/out shardings pin the
    batch to ``data`` and params to the TP rules so XLA compiles the psum."""
    step = _build_step(model)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def jitted(state, batch, rng):
        b_sh = batch_shardings(batch, mesh)
        return jax.jit(
            step,
            in_shardings=(None, b_sh, replicated(mesh)),
            donate_argnums=(0,) if donate else (),
        )(state, batch, rng)

    return jitted


def lower_train_step(
    model,
    mesh: Mesh,
    state_shapes,
    batch_shapes: Batch,
    *,
    donate: bool = True,
):
    """AOT-lower the sharded train step on abstract (ShapeDtypeStruct)
    arguments whose ``sharding`` attributes pin the mesh layout.

    Nothing is materialized — this is how full-size memory-fit evidence is
    produced on a virtual mesh (``compiled.memory_analysis()`` per-device
    peaks; scripts/bench_multichip_fit.py) without allocating the ~7 GB
    parameter + optimizer trees on the host.
    """
    step = _build_step(model)
    b_sh = batch_shardings(batch_shapes, mesh)
    # legacy uint32[2] key — what the Trainer/dryrun actually pass
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=replicated(mesh))
    return jax.jit(
        step,
        in_shardings=(None, b_sh, replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    ).lower(state_shapes, batch_shapes, rng)


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model, *, mesh: Optional[Mesh] = None):
    """Jitted eval step → per-batch (logits, correct, count)."""

    def step(params, batch: Batch):
        out = model.apply(params, _model_inputs(batch), deterministic=True)
        m = _metrics(out, batch)
        return {"logits": out.logits, "correct": m["correct"], "count": m["count"],
                "loss": m["loss"]}

    if mesh is None:
        return jax.jit(step)

    def jitted(params, batch):
        b_sh = batch_shardings(batch, mesh)
        return jax.jit(step, in_shardings=(None, b_sh))(params, batch)

    return jitted
