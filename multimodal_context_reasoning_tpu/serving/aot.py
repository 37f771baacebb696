"""AOT serving artifacts: a self-contained on-disk scorer.

``save_scorer_artifact`` exports a warmed :class:`ModCRScorer`'s
fixed-shape device program (via ``jax.export`` — versioned StableHLO with
a multi-month backward-compatibility guarantee) together with its weights
and config into one directory; :class:`AOTScorer` stands the scoring
service back up from that directory WITHOUT constructing ``ModCRModel``,
re-tracing Flax, or importing any model code — load → one XLA compile
(the persistent compile cache applies) → serve.  This is the deployment
story the reference lacks entirely (its only inference path rebuilds the
full torch stack per process, run_PMR_ModCR.py:283-353): a production
serving box needs the artifact, the tokenizers, and the feature source —
not the training framework.

The artifact is weight-separable on purpose: the exported program closes
over SHAPES only, so weights can be swapped (a newer fine-tune) without
re-exporting, and the ~MBs of StableHLO ship independently of the ~GBs of
params.  Layout::

    artifact/
      scorer_program.jaxexport   serialized jax.export blob
      scorer_exec.pjrt           (optional) serialized COMPILED PJRT
                                 executable + arg treedefs
      params.npz                 flat {path: array}; bf16 stored as fp32
                                 carriers (lossless), dtypes in meta
      artifact.json              ModCRConfig JSON + micro_batch + dtypes
                                 + executable fingerprint

Two load paths, tried in order:

1. **Compiled executable** (``scorer_exec.pjrt``, via
   ``jax.experimental.serialize_executable``): when the serving box's
   platform/device-kind/jax-version fingerprint matches the export box's,
   standup skips XLA compilation entirely — the round-3 finding was that
   a full-size artifact's first boot paid its own ~230 s compile because
   deserialized StableHLO compiles under a different persistent-cache key
   than the live jit (BENCHMARKS.md "AOT serving artifacts").
2. **StableHLO** (``scorer_program.jaxexport``): portable fallback — any
   fingerprint mismatch, load error, or backend without executable
   serialization falls through to load → one XLA compile → serve.

Scope: single-device programs (mesh=None); mesh serving re-places its
buffers at construction and stays live-only.  Device-table scorers DO
export: the resident ``feat_table``/``feat_mask_table`` travel as program
*inputs* (like the weights — swap the feature pack without re-export, up
to the row capacity baked into the program's shapes), and the reload
rebuilds the table from whatever feature source the serving box mounts.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.data.collate import BatchSpec
from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
from multimodal_context_reasoning_tpu.data.schemas import RawExample
from multimodal_context_reasoning_tpu.serving.scorer import (
    ModCRScorer,
    build_host_batch,
    format_score_results,
    iter_keys,
    pad_by_repetition,
    run_chunked,
)

PROGRAM_FILE = "scorer_program.jaxexport"
GEN_PROGRAM_FILE = "generator_program.jaxexport"
EXEC_FILE = "scorer_exec.pjrt"
GEN_EXEC_FILE = "generator_exec.pjrt"
PARAMS_FILE = "params.npz"
META_FILE = "artifact.json"
_SEP = "/"


def _device_fingerprint() -> Dict[str, object]:
    """What a serialized PJRT executable is valid for: same platform +
    chip kind + (single) device count + jax/XLA version."""
    d = jax.devices()[0]
    return {
        "platform": d.platform,
        "device_kind": d.device_kind,
        "n_devices": 1,
        "jax_version": jax.__version__,
    }


def _save_executable(path: str, jitted, args) -> Optional[Dict[str, object]]:
    """AOT-compile ``jitted`` at ``args``, serialize the PJRT executable
    (+ arg treedefs), and **self-verify**: reload the serialized blob and
    require it to reproduce the live program's outputs on ``args``.
    Returns the fingerprint to record in meta, or None when the backend
    can't serialize or the reload doesn't reproduce (the artifact then
    ships StableHLO only — e.g. XLA:CPU's executable AOT is partial; the
    TPU deployment target round-trips cleanly).

    On a warmed scorer the ``.lower().compile()`` is near-free: the live
    jit already compiled this exact program, so XLA's caches hit.
    """
    import pickle
    import sys

    from jax.experimental import serialize_executable as _se

    try:
        compiled = jitted.lower(*args).compile()
        payload, in_tree, out_tree = _se.serialize(compiled)
        with open(path, "wb") as f:
            pickle.dump({"payload": payload, "in_tree": in_tree,
                         "out_tree": out_tree}, f)
        fp = _device_fingerprint()
        loaded = _load_executable(path, fp)
        if loaded is None:
            raise RuntimeError("serialized executable failed to reload")
        want = jax.tree_util.tree_leaves(jitted(*args))
        got = jax.tree_util.tree_leaves(loaded(*args))
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=1e-5, atol=1e-5)
        return fp
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"[aot] executable fast path disabled "
              f"({type(e).__name__}: {e}); artifact carries StableHLO only",
              file=sys.stderr)
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def _load_executable(path: str, expect: Optional[Dict[str, object]]):
    """Deserialize a compiled executable when the fingerprint matches this
    box; None (→ StableHLO fallback) on mismatch or any load failure."""
    import pickle
    import sys

    from jax.experimental import serialize_executable as _se

    if not expect or not os.path.exists(path):
        return None
    here = _device_fingerprint()
    if here != expect:
        print(f"[aot] executable fingerprint mismatch (artifact {expect} "
              f"vs here {here}); falling back to StableHLO compile",
              file=sys.stderr)
        return None
    try:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        # single-device program: pin execution to device 0 (without this,
        # a multi-device process — e.g. the 8-device virtual test mesh —
        # tries to load it sharded across every local device)
        return _se.deserialize_and_load(
            blob["payload"], blob["in_tree"], blob["out_tree"],
            execution_devices=[jax.devices()[0]])
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"[aot] executable load failed ({type(e).__name__}: {e}); "
              f"falling back to StableHLO compile", file=sys.stderr)
        return None


def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_scorer_artifact(directory: str, scorer: ModCRScorer) -> None:
    """Export a warmed single-device scorer to ``directory``."""
    if scorer.mesh is not None:
        raise NotImplementedError(
            "AOT artifacts cover single-device scorers; mesh serving "
            "re-places its buffers at construction (ModCRScorer)"
        )
    os.makedirs(directory, exist_ok=True)

    # One representative device batch at the compiled shape (the same
    # featurize→collate path every real request takes).
    ex = RawExample(
        example_id="export", img_id=next(iter_keys(scorer.features)),
        premise="export trace .",
        answer_choices=["a ."] * scorer.config.num_labels,
        answer_label=0,
    )
    real, feats = pad_by_repetition([scorer.featurize(ex)], scorer.micro_batch)
    # table mode: the image leg is an int32 row id; the resident table
    # buffers are traced as INPUTS so they stay swap-able at reload
    batch = build_host_batch(feats, scorer._ds.spec, scorer.config.num_labels,
                             table_mode=scorer.table is not None)
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    if scorer.table is not None:
        device_batch["feat_table"] = scorer.table.table
        device_batch["feat_mask_table"] = scorer.table.mask

    exported = jax_export.export(scorer._fwd)(scorer.params, device_batch)
    with open(os.path.join(directory, PROGRAM_FILE), "wb") as f:
        f.write(exported.serialize())

    # compiled-executable fast path: near-free here (the warmed jit already
    # compiled this program), saves the whole XLA compile at standup on a
    # fingerprint-matching box
    exec_meta = _save_executable(
        os.path.join(directory, EXEC_FILE), scorer._fwd,
        (scorer.params, device_batch))

    # numpy's npz cannot hold ml_dtypes (bfloat16); float leaves travel as
    # fp32 carriers (bf16→fp32 is exact) and restore from recorded dtypes
    flat = _flatten_params(scorer.params)
    dtypes = {k: str(v.dtype) for k, v in flat.items()}
    carriers = {
        k: (v.astype(np.float32)
            if jnp.issubdtype(v.dtype, jnp.floating) else v)
        for k, v in flat.items()
    }
    np.savez(os.path.join(directory, PARAMS_FILE), **carriers)
    with open(os.path.join(directory, META_FILE), "w") as f:
        json.dump(
            {
                "kind": "scorer",
                "config": json.loads(scorer.config.to_json()),
                "micro_batch": scorer.micro_batch,
                "param_dtypes": dtypes,
                # the traced program's REAL input signature (ADVICE r3:
                # in table mode that includes the resident table buffers)
                "batch_keys": sorted(device_batch.keys()),
                "executable": exec_meta,
                "use_device_table": scorer.table is not None,
                # row capacity is baked into the program's input shapes —
                # the reload pads its (possibly smaller) feature set to it
                "table_capacity": (
                    int(scorer.table.table.shape[0])
                    if scorer.table is not None else 0
                ),
            },
            f, indent=2,
        )


class AOTScorer:
    """The :class:`ModCRScorer` protocol (featurize / score_featurized /
    micro_batch / score) reloaded from an artifact directory — no Flax
    model construction or tracing; drop-in for the HTTP server and the
    MicroBatcher."""

    def __init__(
        self,
        directory: str,
        bert_tokenizer,
        roberta_tokenizer,
        image_features,
        *,
        warm: bool = True,
    ):
        with open(os.path.join(directory, META_FILE)) as f:
            meta = json.load(f)
        if meta.get("kind", "scorer") != "scorer":
            raise ValueError(
                f"{directory} holds a {meta.get('kind')!r} artifact, "
                "not a scorer"
            )
        self.config = ModCRConfig.from_json(json.dumps(meta["config"]))
        self.micro_batch = int(meta["micro_batch"])
        self.features = image_features

        flat = dict(np.load(os.path.join(directory, PARAMS_FILE)))
        dtypes = meta["param_dtypes"]
        flat = {
            k: (v.astype(jnp.dtype(dtypes[k]))
                if str(v.dtype) != dtypes[k] else v)
            for k, v in flat.items()
        }
        self.params = jax.device_put(_unflatten_params(flat))

        # fast path: the serialized compiled executable (no XLA compile at
        # all) when this box's fingerprint matches the export box's;
        # portable StableHLO fallback otherwise
        self._fwd = _load_executable(
            os.path.join(directory, EXEC_FILE), meta.get("executable"))
        self.loaded_from_executable = self._fwd is not None
        if self._fwd is None:
            with open(os.path.join(directory, PROGRAM_FILE), "rb") as f:
                exported = jax_export.deserialize(f.read())
            self._fwd = jax.jit(exported.call)

        spec = BatchSpec(
            text_len=self.config.text_len, img_len=self.config.img_len,
            roberta_len=self.config.roberta_len,
            num_labels=self.config.num_labels,
            img_feature_dim=self.config.global_encoder.img_feature_dim,
        )
        self._ds = PMRDataset(
            [], image_features, bert_tokenizer, roberta_tokenizer,
            spec=spec, max_chunks=self.config.max_chunks,
        )
        self.table = None
        if meta.get("use_device_table"):
            from multimodal_context_reasoning_tpu.data.device_table import (
                DeviceFeatureTable,
            )

            # rebuilt from THIS box's feature source, padded to the row
            # capacity the exported program was traced with
            self.table = DeviceFeatureTable.for_config(
                image_features, self.config,
                capacity=int(meta["table_capacity"]),
            )
        if warm:
            ex = RawExample(
                example_id="warm", img_id=next(iter_keys(image_features)),
                premise="warm up .",
                answer_choices=["a ."] * self.config.num_labels,
                answer_label=0,
            )
            self.score([ex])

    def featurize(self, ex: RawExample):
        if self.table is not None:
            return self._ds.featurize(ex), self.table.row_for(ex.img_id)
        return self._ds.featurize(ex), self._ds.get_image(ex)

    def score_featurized(
        self, feats: Sequence, example_ids: Sequence[str]
    ) -> List[Dict]:
        real = len(feats)
        if real == 0:
            return []
        real, feats = pad_by_repetition(feats, self.micro_batch)
        batch = build_host_batch(feats, self._ds.spec,
                                 self.config.num_labels,
                                 table_mode=self.table is not None)
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.table is not None:
            # the SAME resident buffers every call — nothing re-transfers
            device_batch["feat_table"] = self.table.table
            device_batch["feat_mask_table"] = self.table.mask
        logits = np.asarray(
            self._fwd(self.params, device_batch), np.float32
        )[:real]
        return format_score_results(logits, example_ids)

    def score(self, examples: Sequence[RawExample]) -> List[Dict]:
        return run_chunked(self, examples)


# ---------------------------------------------------------------------------
# Rationale generator artifacts (the /generate endpoint)
# ---------------------------------------------------------------------------


def save_generator_artifact(directory: str, generator) -> None:
    """Export a warmed greedy :class:`RationaleGenerator` to ``directory``.

    Covers the fused classify+decode program (mode="greedy" — the sampling
    path takes a per-call rng and stays construction-time).  The rationale
    marker ids are recorded so the reload can verify its tokenizer maps
    ``<|b_rtnl|>``/``<|e_rtnl|>`` identically: the EOS id is baked into
    the traced program.
    """
    import dataclasses

    if generator.mesh is not None:
        raise NotImplementedError("AOT generator artifacts are single-device")
    if generator.mode != "greedy":
        raise NotImplementedError(
            "only the fused greedy program exports; sampling takes a "
            "per-call rng (serve it live)"
        )
    os.makedirs(directory, exist_ok=True)

    ex = RawExample(
        example_id="export", img_id=next(iter_keys(generator.features)),
        premise="export trace .",
        answer_choices=["a ."] * generator.num_labels,
        answer_label=0,
    )
    real, feats = pad_by_repetition(
        [generator.featurize(ex)], generator.micro_batch
    )
    batch = build_host_batch(feats, generator.spec, generator.num_labels,
                             table_mode=False)
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    Q = generator.micro_batch
    prompt = jnp.full((Q, 1), generator._b_rtnl, jnp.int32)
    prompt_len = jnp.ones((Q,), jnp.int32)

    exported = jax_export.export(generator._fused_greedy)(
        generator.params, device_batch, prompt, prompt_len
    )
    with open(os.path.join(directory, GEN_PROGRAM_FILE), "wb") as f:
        f.write(exported.serialize())

    exec_meta = _save_executable(
        os.path.join(directory, GEN_EXEC_FILE), generator._fused_greedy,
        (generator.params, device_batch, prompt, prompt_len))

    flat = _flatten_params(generator.params)
    dtypes = {k: str(v.dtype) for k, v in flat.items()}
    carriers = {
        k: (v.astype(np.float32)
            if jnp.issubdtype(v.dtype, jnp.floating) else v)
        for k, v in flat.items()
    }
    np.savez(os.path.join(directory, PARAMS_FILE), **carriers)
    with open(os.path.join(directory, META_FILE), "w") as f:
        json.dump(
            {
                "kind": "generator",
                "spec": dataclasses.asdict(generator.spec),
                "num_labels": generator.num_labels,
                "max_chunks": generator.max_chunks,
                "micro_batch": generator.micro_batch,
                "max_rationale_len": generator.max_rationale_len,
                "b_rtnl": generator._b_rtnl,
                "e_rtnl": generator._e_rtnl,
                "gpt_vocab_size": generator._gpt2_cfg.vocab_size,
                "bert_vocab_size": generator.encoder_config.vocab_size,
                "param_dtypes": dtypes,
                "executable": exec_meta,
            },
            f, indent=2,
        )


class AOTGenerator:
    """The greedy :class:`RationaleGenerator` protocol reloaded from an
    artifact directory — drop-in for the server's /generate MicroBatcher."""

    def __init__(
        self,
        directory: str,
        bert_tokenizer,
        gpt_tokenizer,
        image_features,
        *,
        warm: bool = True,
    ):
        from multimodal_context_reasoning_tpu.data.rationale import (
            B_RTNL,
            E_RTNL,
        )
        from multimodal_context_reasoning_tpu.data.vcr import VCRDataset
        from multimodal_context_reasoning_tpu.serving.generator import (
            format_generate_results,
        )

        self._format = format_generate_results
        with open(os.path.join(directory, META_FILE)) as f:
            meta = json.load(f)
        if meta.get("kind") != "generator":
            raise ValueError(
                f"{directory} holds a {meta.get('kind')!r} artifact, "
                "not a generator"
            )
        self.micro_batch = int(meta["micro_batch"])
        self.num_labels = int(meta["num_labels"])
        self.features = image_features
        self.gpt_tokenizer = gpt_tokenizer
        self._b_rtnl = int(meta["b_rtnl"])
        self._e_rtnl = int(meta["e_rtnl"])
        # the EOS id is baked into the traced program — the reload
        # tokenizer must map the markers to the SAME ids
        b_id, e_id = gpt_tokenizer.convert_tokens_to_ids([B_RTNL, E_RTNL])
        if (int(b_id), int(e_id)) != (self._b_rtnl, self._e_rtnl):
            raise ValueError(
                f"tokenizer maps rationale markers to ({int(b_id)}, "
                f"{int(e_id)}) but the artifact was exported with "
                f"({self._b_rtnl}, {self._e_rtnl})"
            )

        flat = dict(np.load(os.path.join(directory, PARAMS_FILE)))
        dt = meta["param_dtypes"]
        flat = {
            k: (v.astype(jnp.dtype(dt[k])) if str(v.dtype) != dt[k] else v)
            for k, v in flat.items()
        }
        self.params = jax.device_put(_unflatten_params(flat))

        self._fused = _load_executable(
            os.path.join(directory, GEN_EXEC_FILE), meta.get("executable"))
        self.loaded_from_executable = self._fused is not None
        if self._fused is None:
            with open(os.path.join(directory, GEN_PROGRAM_FILE), "rb") as f:
                exported = jax_export.deserialize(f.read())
            self._fused = jax.jit(exported.call)

        self.spec = BatchSpec(**meta["spec"])
        self._ds = VCRDataset(
            [], image_features, bert_tokenizer, gpt_tokenizer,
            spec=self.spec, max_chunks=int(meta["max_chunks"]),
        )
        if warm:
            ex = RawExample(
                example_id="warm", img_id=next(iter_keys(image_features)),
                premise="warm up .",
                answer_choices=["a ."] * self.num_labels, answer_label=0,
            )
            self.generate([ex])

    def featurize(self, ex: RawExample):
        return self._ds.featurize(ex), self._ds.get_image(ex)

    def score_featurized(
        self, feats: Sequence, example_ids: Sequence[str]
    ) -> List[Dict]:
        real = len(feats)
        if real == 0:
            return []
        real, feats = pad_by_repetition(feats, self.micro_batch)
        batch = build_host_batch(feats, self.spec, self.num_labels,
                                 table_mode=False)
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        Q = self.micro_batch
        prompt = jnp.full((Q, 1), self._b_rtnl, jnp.int32)
        prompt_len = jnp.ones((Q,), jnp.int32)
        probs, tokens, lengths = self._fused(
            self.params, device_batch, prompt, prompt_len
        )
        return self._format(
            probs, tokens, lengths, real, example_ids,
            e_rtnl=self._e_rtnl, gpt_tokenizer=self.gpt_tokenizer,
        )

    def generate(self, examples: Sequence[RawExample]) -> List[Dict]:
        return run_chunked(self, examples)
