"""Online rationale generation: classify candidates + decode an explanation.

Serves the rationale-generation family (``ChunkAlign_CLS_dec5_4``,
modeling_vcr_chunkalign_v10.py:1319-1494) the way :class:`ModCRScorer`
serves the production classifier: fixed-shape programs AOT-warmed once,
then every request is two device calls —

1. a jitted :class:`RationaleModel` forward over the question's candidate
   rows → choice probabilities + the gold-candidate decoder memory
   (``[seq_hypo ‖ global_hypo ‖ chunk_hidden]``, v10.py:1384-1398; at
   serving time "gold" is the model's own argmax, the ``label is None``
   branch of models/rationale.py);
2. one jitted KV-cached decode (generation/api.py) over that memory,
   prompted with ``<|b_rtnl|>`` and stopped at ``<|e_rtnl|>`` — the
   marker convention of the reference's explanation streams
   (Data/VCRChunkAlign.py:356-527).

The reference has no serving story; its generation path exists only as an
offline eval loop.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_context_reasoning_tpu.core.config import (
    ChunkAlignConfig,
    EncoderConfig,
    GPT2Config,
)
from multimodal_context_reasoning_tpu.data.collate import (
    BatchSpec,
    collate_candidates,
)
from multimodal_context_reasoning_tpu.data.rationale import B_RTNL, E_RTNL
from multimodal_context_reasoning_tpu.data.schemas import RawExample
from multimodal_context_reasoning_tpu.data.vcr import VCRDataset
from multimodal_context_reasoning_tpu.generation.api import generate
from multimodal_context_reasoning_tpu.generation.decode import greedy_decode
from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder
from multimodal_context_reasoning_tpu.models.rationale import RationaleModel
from multimodal_context_reasoning_tpu.ops.chunk import (
    chunk_mask_from_gather_index,
)
from multimodal_context_reasoning_tpu.serving.scorer import (
    iter_keys,
    pad_by_repetition,
    run_chunked,
)


def decode_ids(tokenizer, ids: Sequence[int]) -> Optional[str]:
    """Best-effort id→text: HFTokenizer adapters expose the underlying HF
    tokenizer's ``decode``; hash tokenizers are one-way (ids only)."""
    hf = getattr(tokenizer, "_tok", None)
    if hf is not None and hasattr(hf, "decode"):
        return hf.decode(list(ids), skip_special_tokens=False)
    return None


def format_generate_results(
    probs, tokens, lengths, real: int, example_ids: Sequence[str],
    *, e_rtnl: int, gpt_tokenizer,
) -> List[Dict]:
    """Device outputs → /generate response rows.  Shared by
    :class:`RationaleGenerator` and the AOT artifact generator."""
    probs = np.asarray(probs, np.float32)[:real]
    tokens = np.asarray(tokens)[:real]
    lengths = np.asarray(lengths)[:real]
    results = []
    for eid, pr, tok, ln in zip(example_ids, probs, tokens, lengths):
        ids = [int(t) for t in tok[: int(ln)]]
        if ids and ids[-1] == e_rtnl:
            ids = ids[:-1]  # the stop marker is an internal sentinel,
                            # not part of the user-facing rationale
        res = {
            "example_id": eid,
            "prediction": int(np.argmax(pr)),
            # per-candidate P(true) (binary_to_mp, v10.py:363-373) —
            # independent binary heads, not a 4-way softmax
            "probs": [float(x) for x in pr],
            "rationale_ids": ids,
        }
        text = decode_ids(gpt_tokenizer, ids)
        if text is not None:
            res["rationale_text"] = text
        results.append(res)
    return results


class RationaleGenerator:
    def __init__(
        self,
        encoder_config: EncoderConfig,
        schedule: ChunkAlignConfig,
        gpt2_config: GPT2Config,
        params,
        bert_tokenizer,
        gpt_tokenizer,
        image_features,                  # mapping img_id -> ImageFeatures
        *,
        spec: Optional[BatchSpec] = None,
        num_labels: int = 4,
        cls_layer_num: int = 3,
        max_chunks: int = 40,
        micro_batch: int = 1,            # questions per device call
        max_rationale_len: int = 32,
        mode: str = "greedy",            # greedy | sample
        warm: bool = True,
        mesh=None,                       # jax.sharding.Mesh ("data","model"):
                                         # multi-chip generation — params by
                                         # the TP rules, questions sharded
                                         # over "data"
    ):
        if "dec" not in params.get("params", {}):
            raise ValueError(
                "params have no 'dec' decoder subtree — initialize/train "
                "the RationaleModel with expl_ids in the batch so the "
                "GPT-2 decoder branch is traced (trained checkpoints "
                "always carry it)"
            )
        self.mesh = mesh
        if mesh is not None:
            from multimodal_context_reasoning_tpu.parallel.partition import (
                param_shardings,
            )

            n_data = mesh.shape["data"]
            # decode arrays are per-question [Q, ...], so Q itself must
            # divide the data axis (classify rows Q·K then divide too)
            if micro_batch % n_data:
                raise ValueError(
                    f"the mesh's data axis ({n_data}) must divide "
                    f"micro_batch={micro_batch} questions — raise "
                    f"micro_batch or shrink the data axis"
                )
            params = jax.device_put(params, param_shardings(params, mesh))
        elif any(
            not isinstance(leaf, jax.Array)
            for leaf in jax.tree_util.tree_leaves(params)
        ):
            # commit host-numpy trees once — jit doesn't cache numpy args,
            # so an uncommitted tree re-ships every call (see ModCRScorer)
            params = jax.device_put(params)
        self.params = params
        self.features = image_features
        self.micro_batch = micro_batch
        # construction configs, kept for twins (e.g. a mesh-sharded copy)
        self.encoder_config = encoder_config
        self.schedule = schedule
        self.max_chunks = max_chunks
        self._auto_seed = itertools.count()  # sample mode without rng
        self.max_rationale_len = max_rationale_len
        self.mode = mode
        self.num_labels = num_labels
        self.gpt_tokenizer = gpt_tokenizer
        self._gpt2_cfg = gpt2_config
        b_id, e_id = gpt_tokenizer.convert_tokens_to_ids([B_RTNL, E_RTNL])
        self._b_rtnl, self._e_rtnl = int(b_id), int(e_id)
        # guard the silent-NaN embedding trap (CLAUDE.md): a marker id at
        # or past vocab_size makes nn.Embed emit NaN under jit with no
        # error; identical ids mean the tokenizer mapped both markers to
        # unk (e.g. a stock GPT-2 vocab without the rationale tokens)
        V = gpt2_config.vocab_size
        if not (0 <= self._b_rtnl < V and 0 <= self._e_rtnl < V):
            raise ValueError(
                f"rationale marker ids ({self._b_rtnl}, {self._e_rtnl}) "
                f"fall outside GPT2Config.vocab_size={V} — size the config "
                "to the tokenizer (len(tokenizer)) or the checkpoint's "
                "dec.wte rows"
            )
        if self._b_rtnl == self._e_rtnl:
            raise ValueError(
                f"{B_RTNL}/{E_RTNL} map to the same id {self._b_rtnl} — "
                "the GPT tokenizer lacks the rationale marker tokens "
                "(both collapsed to unk); add them as special tokens"
            )

        self.spec = spec or BatchSpec(num_labels=num_labels)
        # the rationale family is VCR-native (v10.py); the VCR featurizer
        # carries its answer-truncation heuristic
        self._ds = VCRDataset(
            [], image_features, bert_tokenizer, gpt_tokenizer,
            spec=self.spec, max_chunks=max_chunks,
        )
        model = RationaleModel(
            encoder_config, schedule, gpt2_config,
            num_labels=num_labels, cls_layer_num=cls_layer_num,
            max_chunks=max_chunks,
        )
        # decoder submodule + its param subtree, for the generation engine
        self._dec = GPT2Decoder(
            dataclasses.replace(gpt2_config, tie_word_embeddings=False)
        )

        def fwd(p, b):
            b = dict(b)
            b["chunk_mask"] = chunk_mask_from_gather_index(
                b["gather_index"], b["text_mask"]
            )
            out = model.apply(p, b, deterministic=True)
            return (
                out.mp_probs,
                out.decoder_memory.astype(jnp.float32),
                out.decoder_memory_mask,
            )

        self._fwd = jax.jit(fwd)

        # greedy path: classify + decode traced into ONE program — on a
        # high-latency link this halves the per-request round-trips (the
        # two-program path pays a readback between classify and decode)
        def fused_greedy(p, b, prompt, prompt_len):
            probs, mem, mmask = fwd(p, b)
            tokens, lengths = greedy_decode(
                self._dec, {"params": p["params"]["dec"]},
                prompt, prompt_len, memory=mem, memory_mask=mmask,
                max_len=self.max_rationale_len, eos_id=self._e_rtnl,
                pad_id=gpt2_config.pad_token_id,
            )
            return probs, tokens, lengths

        self._fused_greedy = jax.jit(fused_greedy)
        if warm:
            self._warmup()

    @property
    def _dec_params(self):
        return {"params": self.params["params"]["dec"]}

    def _warmup(self) -> None:
        ex = RawExample(
            example_id="warm", img_id=next(iter_keys(self.features)),
            premise="warm up .",
            answer_choices=["a ."] * self.num_labels, answer_label=0,
        )
        self.generate([ex])

    def generate(
        self, examples: Sequence[RawExample], *, rng: Optional[jax.Array] = None
    ) -> List[Dict]:
        """Classify + decode any number of questions; internally chunks to
        the static micro-batch (last chunk padded by repetition).

        Sampling mode without an explicit ``rng`` draws a fresh key per
        call from an instance counter — repeated identical requests get
        different samples (a fixed hidden seed would make the 'sampling'
        endpoint deterministic)."""
        if self.mode != "greedy" and rng is None:
            rng = jax.random.PRNGKey(next(self._auto_seed))
        return run_chunked(
            self, examples,
            # sampling: decorrelate chunks within one request
            chunk_kwargs=lambda ci: {
                "rng": jax.random.fold_in(rng, ci) if rng is not None else None
            },
        )

    def featurize(self, ex: RawExample):
        """Host-side featurization for one question — safe on any request
        thread.  Same protocol as ModCRScorer.featurize, so the serving
        MicroBatcher drives this generator unchanged."""
        return self._ds.featurize(ex), self._ds.get_image(ex)

    def score_featurized(
        self,
        feats: Sequence,
        example_ids: Sequence[str],
        *,
        rng: Optional[jax.Array] = None,
    ) -> List[Dict]:
        """One device call over up-to-micro_batch featurized questions
        (the MicroBatcher entry point; sampling mode without ``rng``
        auto-seeds per call)."""
        real = len(feats)
        if real == 0:
            return []
        if self.mode != "greedy" and rng is None:
            rng = jax.random.PRNGKey(next(self._auto_seed))
        real, padded = pad_by_repetition(feats, self.micro_batch)
        batch = collate_candidates(
            [f[0] for f in padded], [f[1] for f in padded], self.spec,
        )
        batch.pop("label", None)  # serving: gold row = model argmax
        Q = self.micro_batch
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from multimodal_context_reasoning_tpu.parallel.partition import (
                batch_shardings,
            )

            # straight to shards — jnp.asarray first would commit to
            # device 0 and pay a redistribution transfer
            device_batch = jax.device_put(
                batch, batch_shardings(batch, self.mesh)
            )
            row = NamedSharding(self.mesh, PartitionSpec("data"))
            prompt = jax.device_put(
                np.full((Q, 1), self._b_rtnl, np.int32), row
            )
            prompt_len = jax.device_put(np.ones((Q,), np.int32), row)
        else:
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            prompt = jnp.full((Q, 1), self._b_rtnl, jnp.int32)
            prompt_len = jnp.ones((Q,), jnp.int32)
        if self.mode == "greedy":
            # one fused program: no readback between classify and decode
            probs, tokens, lengths = self._fused_greedy(
                self.params, device_batch, prompt, prompt_len
            )
        else:
            probs, memory, memory_mask = self._fwd(self.params, device_batch)
            tokens, lengths = generate(
                self._dec, self._dec_params, prompt, prompt_len,
                mode=self.mode, memory=memory, memory_mask=memory_mask,
                max_len=self.max_rationale_len, eos_id=self._e_rtnl,
                pad_id=self._gpt2_cfg.pad_token_id, rng=rng,
            )

        return format_generate_results(
            probs, tokens, lengths, real, example_ids,
            e_rtnl=self._e_rtnl, gpt_tokenizer=self.gpt_tokenizer,
        )
