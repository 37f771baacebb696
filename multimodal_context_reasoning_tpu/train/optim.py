"""Optimizer and LR-schedule factory.

Reproduces the reference's optimization recipe (run_PMR_ModCR.py:127-145):

- AdamW over two parameter groups — everything at ``lr``, any parameter whose
  path contains ``seq_enc`` at ``lr * 0.1``;
- linear-with-warmup or constant-with-warmup schedule (:138-145);
- gradient clipping by global norm 1.0 (:216), applied before the update;
- gradient accumulation (:211-227) via ``optax.MultiSteps``;
- encoder freezing (torch.no_grad in the reference, modeling_ensemble.py:466,
  v10.py:895-911) via ``optax.set_to_zero`` on the frozen label — combined
  with the model's ``stop_gradient`` this keeps frozen params bit-identical
  *and* lets XLA prune their optimizer state updates;
- the VCR ablation freeze of RoBERTa's non-embedding/non-pooler params
  (run_vcr_ModCR.py:783-787) via ``freeze_roberta_body=True``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from multimodal_context_reasoning_tpu.core.config import TrainConfig


class MaskedMultiStepsState(NamedTuple):
    mini_step: jnp.ndarray      # [] int32: micro-step within the window
    inner_state: Any
    acc_grads: Any              # running-mean grads; MaskedNode off-mask


def masked_multisteps(
    inner: optax.GradientTransformation,
    every_k: int,
    mask: Any,                  # pytree of bool matching params
) -> optax.GradientTransformation:
    """``optax.MultiSteps`` that accumulates ONLY where ``mask`` is True.

    The frozen towers' gradients are structurally zero (stop_gradient), yet
    stock MultiSteps still materializes a full fp32 accumulator for them —
    ~880 MB for ModCR's two frozen encoders on a 16 GB v5e. Off-mask leaves
    store an ``optax.MaskedNode`` instead and are reconstructed as zeros at
    the update boundary, so the emitted updates are bit-identical to
    MultiSteps with ``use_grad_mean=True`` (running-mean accumulation).
    """

    def init(params):
        acc = jax.tree.map(
            lambda p, m: jnp.zeros_like(p) if m else optax.MaskedNode(),
            params, mask,
        )
        return MaskedMultiStepsState(
            mini_step=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
            acc_grads=acc,
        )

    def update(grads, state, params=None, **extra):
        k = state.mini_step
        # running mean: acc += (g - acc) / (k + 1)   (MultiSteps semantics)
        acc = jax.tree.map(
            lambda a, g: (
                a + (g - a) / (k + 1).astype(g.dtype)
                if not isinstance(a, optax.MaskedNode) else a
            ),
            state.acc_grads, grads,
            is_leaf=lambda x: isinstance(x, optax.MaskedNode),
        )
        emit = (k + 1) % every_k == 0

        def full(a, g):
            return jnp.zeros_like(g) if isinstance(a, optax.MaskedNode) else a

        mean_grads = jax.tree.map(
            full, acc, grads,
            is_leaf=lambda x: isinstance(x, optax.MaskedNode),
        )

        def do_update(_):
            updates, new_inner = inner.update(mean_grads, state.inner_state,
                                              params, **extra)
            return updates, new_inner

        def skip_update(_):
            return jax.tree.map(jnp.zeros_like, grads), state.inner_state

        updates, new_inner = jax.lax.cond(emit, do_update, skip_update, None)
        # reset the accumulator at the boundary
        acc = jax.tree.map(
            lambda a: (
                a if isinstance(a, optax.MaskedNode)
                else jnp.where(emit, jnp.zeros_like(a), a)
            ),
            acc,
            is_leaf=lambda x: isinstance(x, optax.MaskedNode),
        )
        return updates, MaskedMultiStepsState(
            mini_step=(k + 1) % every_k,
            inner_state=new_inner,
            acc_grads=acc,
        )

    return optax.GradientTransformation(init, update)


def make_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    """Linear warmup, then linear-decay-to-zero or constant."""
    if cfg.scheduler == "constant":
        if cfg.warmup_steps > 0:
            return optax.linear_schedule(0.0, 1.0, cfg.warmup_steps)
        return optax.constant_schedule(1.0)
    if cfg.scheduler == "linear":
        warm = optax.linear_schedule(0.0, 1.0, max(cfg.warmup_steps, 1))
        decay = optax.linear_schedule(
            1.0, 0.0, max(total_steps - cfg.warmup_steps, 1)
        )
        return optax.join_schedules([warm, decay], [cfg.warmup_steps])
    raise ValueError(f"Unknown scheduler type: {cfg.scheduler}")


def _path_name(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def label_params(
    params: Any,
    *,
    freeze_encoders: bool = True,
    freeze_roberta_body: bool = False,
) -> Any:
    """Label pytree: 'main' | 'seq' (lr×0.1) | 'frozen'.

    Matches the name-substring grouping of run_PMR_ModCR.py:127-135 ('seq_enc'
    in name → lr×0.1 group) layered under the freezing rules.
    """

    def label(path, _leaf):
        name = _path_name(path)
        if freeze_encoders and ("global_enc" in name or "seq_enc" in name):
            return "frozen"
        if freeze_roberta_body and "roberta" in name:
            # run_vcr_ModCR.py:783-787: only embeddings + pooler stay live.
            if "embeddings" not in name and "pooler" not in name:
                return "frozen"
        if "seq_enc" in name:
            return "seq"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    cfg: TrainConfig,
    total_steps: int,
    params: Any,
    *,
    freeze_roberta_body: bool = False,
) -> optax.GradientTransformation:
    schedule = make_schedule(cfg, total_steps)

    def adamw(lr_scale: float) -> optax.GradientTransformation:
        # weight_decay defaults to 0.0: the reference parses --weight_decay
        # (0.05) but never passes it to AdamW (run_PMR_ModCR.py:137), so it
        # trains with transformers.AdamW's default 0.0 — the flag is dead.
        # When decay IS requested here, LayerNorm scales/biases and biases
        # are masked out (torch AdamW convention no framework decays them).
        decay = cfg.weight_decay
        if decay == 0.0:
            return optax.adamw(
                learning_rate=lambda step: cfg.learning_rate * lr_scale * schedule(step),
                b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_epsilon,
                weight_decay=0.0,
            )

        def decay_mask(params):
            def is_decayed(path, leaf):
                name = _path_name(path)
                return not (
                    name.endswith("/bias")
                    or name.endswith("/scale")           # LayerNorm scale
                    or "layer_norm" in name
                    or "LayerNorm" in name
                    or leaf.ndim <= 1                    # biases, LN params
                )

            return jax.tree_util.tree_map_with_path(is_decayed, params)

        return optax.adamw(
            learning_rate=lambda step: cfg.learning_rate * lr_scale * schedule(step),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_epsilon,
            weight_decay=decay, mask=decay_mask,
        )

    labels = label_params(
        params,
        freeze_encoders=cfg.freeze_encoders,
        freeze_roberta_body=freeze_roberta_body,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {
                "main": adamw(1.0),
                "seq": adamw(cfg.seq_enc_lr_scale),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        # accumulate only trainable partitions: the frozen towers' grads
        # are structurally zero, and a full-tree fp32 accumulator would
        # waste ~880 MB of the v5e's 16 GB (see masked_multisteps)
        acc_mask = jax.tree.map(lambda lbl: lbl != "frozen", labels)
        tx = masked_multisteps(tx, cfg.gradient_accumulation_steps, acc_mask)
    return tx
