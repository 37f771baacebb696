"""Compiled online scorer.

Wraps a ModCR model + params + featurizer into a fixed-shape scoring
function: requests are padded to a static micro-batch so the jitted program
compiles exactly once (AOT-warmed at construction), then every request is
one device call.  The reference has no serving story — its only inference
path is the offline ``test()`` loop (run_PMR_ModCR.py:283-353).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.data.collate import BatchSpec, collate_candidates
from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures, RawExample
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel


def build_host_batch(feats: Sequence, spec, num_labels: int,
                     *, table_mode: bool) -> Dict[str, np.ndarray]:
    """Collated numpy batch (label dropped) for a padded micro-batch of
    ``featurize`` outputs.  Table mode replaces the inline ``img_feat``/
    ``img_mask`` arrays with the int32 ``img_row`` id per candidate row
    (data/device_table.py).  ONE shared implementation for
    :meth:`ModCRScorer.score_featurized`, ``AOTScorer.score_featurized``
    and ``save_scorer_artifact`` so the export trace and the serve paths
    cannot drift in batch layout (ADVICE r3)."""
    if table_mode:
        batch = collate_candidates([f[0] for f in feats], None, spec)
        batch["img_row"] = np.repeat(
            np.asarray([f[1] for f in feats], np.int32), num_labels)
    else:
        batch = collate_candidates(
            [f[0] for f in feats], [f[1] for f in feats], spec)
    batch.pop("label", None)
    return batch


def pad_by_repetition(feats: Sequence, micro_batch: int):
    """Validate + right-pad a featurized chunk to the static micro-batch by
    repeating the last entry.  Single source of the pad contract shared by
    :class:`ModCRScorer` and :class:`RationaleGenerator` (the compiled
    program's leading dim is static; repeated rows are trimmed by the
    caller's ``[:real]``)."""
    real = len(feats)
    if real > micro_batch:
        raise ValueError(f"{real} examples > micro_batch={micro_batch}")
    feats = list(feats)
    while len(feats) < micro_batch:
        feats.append(feats[-1])
    return real, feats


def format_score_results(
    logits: np.ndarray, example_ids: Sequence[str]
) -> List[Dict]:
    """Logits [real, K] → the /score response rows (prediction, logits,
    softmax probs). Shared by ModCRScorer and the AOT artifact scorer."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    return [
        {
            "example_id": eid,
            "prediction": int(np.argmax(lg)),
            "logits": [float(x) for x in lg],
            "probs": [float(x) for x in pr],
        }
        for eid, lg, pr in zip(example_ids, logits, probs)
    ]


def run_chunked(endpoint, examples: Sequence[RawExample], *, chunk_kwargs=None):
    """Score any number of examples through an endpoint exposing the
    ``featurize`` / ``score_featurized`` / ``micro_batch`` protocol (the
    same duck type the serving MicroBatcher drives), chunking to the static
    micro-batch.  ``chunk_kwargs(chunk_index)`` may supply per-chunk extras
    (e.g. a decorrelated sampling rng)."""
    out: List[Dict] = []
    mb = endpoint.micro_batch
    for ci, start in enumerate(range(0, len(examples), mb)):
        chunk = list(examples[start:start + mb])
        kw = chunk_kwargs(ci) if chunk_kwargs is not None else {}
        out.extend(endpoint.score_featurized(
            [endpoint.featurize(ex) for ex in chunk],
            [ex.example_id for ex in chunk], **kw,
        ))
    return out


class ModCRScorer:
    def __init__(
        self,
        config: ModCRConfig,
        params,
        bert_tokenizer,
        roberta_tokenizer,
        image_features,                 # mapping img_id -> ImageFeatures
        *,
        micro_batch: int = 8,           # examples per device call
        warm: bool = True,
        params_dtype: Optional[str] = None,   # e.g. "bfloat16"
        mesh=None,                      # jax.sharding.Mesh ("data","model"):
                                        # multi-chip serving — params laid
                                        # out by the TP rules, each request
                                        # row-sharded over "data"
        use_device_table: bool = False,  # keep the whole image-feature set
                                        # resident in HBM; requests ship
                                        # int32 ids, not [I, F] floats
                                        # (data/device_table.py)
    ):
        self.config = config
        if params_dtype is not None:
            # Serving-latency lever: small micro-batches are weight-
            # bandwidth-bound, so bf16-resident params halve the HBM read
            # per call (training keeps fp32 masters; this cast is one-way,
            # at load).
            dt = jnp.bfloat16 if params_dtype == "bfloat16" else jnp.dtype(params_dtype)
            # one jitted program for the whole tree — per-leaf .astype would
            # be one device dispatch per parameter on the tunnel (CLAUDE.md)
            params = jax.jit(lambda p: jax.tree.map(
                lambda a: a.astype(dt)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, p,
            ))(params)
        self.mesh = mesh
        if mesh is not None:
            from multimodal_context_reasoning_tpu.parallel.partition import (
                param_shardings,
            )

            n_data = mesh.shape["data"]
            rows = micro_batch * config.num_labels
            if rows % n_data:
                raise ValueError(
                    f"the mesh's data axis ({n_data}) must divide "
                    f"micro_batch×{config.num_labels}={rows} rows — "
                    f"raise micro_batch or shrink the data axis"
                )
            params = jax.device_put(params, param_shardings(params, mesh))
        elif any(
            not isinstance(leaf, jax.Array)
            for leaf in jax.tree_util.tree_leaves(params)
        ):
            # restore_params/assemble hand back HOST numpy trees; jit does
            # not cache numpy arguments, so leaving them on host would
            # re-ship the full multi-hundred-MB tree on EVERY device call
            # (~1.6 s/call through the tunnel, CLAUDE.md). Commit once at
            # construction.  Gated on actually-host leaves so a caller's
            # pre-placed (e.g. self-sharded) tree is never moved.
            params = jax.device_put(params)
        self.params = params
        self.micro_batch = micro_batch
        self.features = image_features
        spec = BatchSpec(
            text_len=config.text_len, img_len=config.img_len,
            roberta_len=config.roberta_len, num_labels=config.num_labels,
            img_feature_dim=config.global_encoder.img_feature_dim,
        )
        self._ds = PMRDataset(
            [], image_features, bert_tokenizer, roberta_tokenizer,
            spec=spec, max_chunks=config.max_chunks,
        )
        self.table = None
        if use_device_table:
            from multimodal_context_reasoning_tpu.data.device_table import (
                DeviceFeatureTable,
            )

            # works with a dict OR the native FeatureStore — the table
            # builder only needs keys() + __getitem__ (one mmap read per
            # image, once)
            self.table = DeviceFeatureTable.for_config(image_features, config)
            if mesh is not None:
                self.table.place(mesh)  # replicated once, not per call
        model = ModCRModel(config)
        from multimodal_context_reasoning_tpu.train.step import _model_inputs

        # _model_inputs expands the device-table gather inside the program
        # (a no-op for plain batches)
        self._fwd = jax.jit(
            lambda p, b: model.apply(
                p, _model_inputs(b), deterministic=True
            ).logits
        )
        if warm:
            self._warmup()

    def _warmup(self) -> None:
        ex = RawExample(
            example_id="warm", img_id=next(iter_keys(self.features)),
            premise="warm up .",
            answer_choices=["a ."] * self.config.num_labels,
            answer_label=0,
        )
        self.score([ex])

    def _batch(self, examples: Sequence[RawExample]) -> Dict[str, np.ndarray]:
        cands = [self._ds.featurize(ex) for ex in examples]
        imgs = [self._ds.get_image(ex) for ex in examples]
        return collate_candidates(cands, imgs, self._ds.spec)

    def featurize(self, ex: RawExample):
        """Host-side featurization for one example — safe to run on any
        request thread (pure numpy; the device is untouched).  In
        device-table mode the image leg is an int32 row id instead of the
        [I, F] feature block."""
        if self.table is not None:
            return self._ds.featurize(ex), self.table.row_for(ex.img_id)
        return self._ds.featurize(ex), self._ds.get_image(ex)

    def score_featurized(
        self, feats: Sequence, example_ids: Sequence[str]
    ) -> List[Dict]:
        """One device call over up-to-micro_batch featurized examples
        (``feats`` = list of :meth:`featurize` outputs; last slot padded by
        repetition)."""
        real = len(feats)
        if real == 0:
            return []
        real, feats = pad_by_repetition(feats, self.micro_batch)
        batch = build_host_batch(feats, self._ds.spec,
                                 self.config.num_labels,
                                 table_mode=self.table is not None)
        if self.mesh is not None:
            from multimodal_context_reasoning_tpu.parallel.partition import (
                batch_shardings,
            )

            # device_put the NUMPY batch straight to its shards — going
            # through jnp.asarray first would commit everything to device 0
            # and pay a second redistribution transfer
            device_batch = jax.device_put(
                batch, batch_shardings(batch, self.mesh)
            )
        else:
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.table is not None:
            # the SAME resident buffers every call — nothing re-transfers
            # (mesh mode: replicated once at construction)
            device_batch["feat_table"] = self.table.table
            device_batch["feat_mask_table"] = self.table.mask
        logits = np.asarray(
            self._fwd(self.params, device_batch), np.float32,
        )[:real]
        return format_score_results(logits, example_ids)

    def score(self, examples: Sequence[RawExample]) -> List[Dict]:
        """Score any number of examples; internally chunks to the static
        micro-batch (last chunk padded by repetition) via the shared
        :func:`run_chunked` protocol."""
        return run_chunked(self, examples)


def iter_keys(mapping) -> "iter":
    """Iterate keys of either a dict or a FeatureStore."""
    if hasattr(mapping, "keys"):
        return iter(mapping.keys())
    reader = getattr(mapping, "_reader", None)
    if reader is not None and hasattr(reader, "keys"):
        return reader.keys()
    raise TypeError("cannot iterate feature keys; pass a dict for warmup")
