"""VCR (Visual Commonsense Reasoning) dataset pipeline.

Rebuilds ``VCR_only_ChunkAlign_Dataset_align_ensemble_T``
(Data/VCRChunkAlign.py:744-952) over the raw ``vcr_data/vcr_val.json``
line-delimited schema (same token-list shape as PMR: premise / 4
answer_choices as lists of strings and ``[obj_idx, ...]`` reference lists,
plus ``objects`` names — vcr_data/vcr_val.json:1).

VCR-specific behaviors preserved:

- the answer-truncation heuristic against the roberta-side answer string
  (Data/VCRChunkAlign.py:851-854): if the roberta answer is a prefix of the
  BERT answer, the BERT answer keeps only 10 extra whitespace tokens;
- integer ``answer_label`` defaulting to 0 when missing (:806-809);
- the same prompt template and ``Answer is`` prefix as PMR (:821-823, 836).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodal_context_reasoning_tpu.data.chunker import HeuristicChunker
from multimodal_context_reasoning_tpu.data.collate import BatchSpec, collate_candidates
from multimodal_context_reasoning_tpu.data.pmr import (
    ANSWER_PREFIX,
    PMRDataset,
    PROMPT_TEXT,
    detokenize_with_dets,
)
from multimodal_context_reasoning_tpu.data.schemas import (
    CandidateFeatures,
    ImageFeatures,
    RawExample,
)
from multimodal_context_reasoning_tpu.data.tokenization import Tokenizer, det_index


def load_vcr_json(path: str, limit: Optional[int] = None) -> List[RawExample]:
    """Parse vcr_data/vcr_val.json (line-delimited) into RawExamples."""
    out: List[RawExample] = []
    with open(path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            if limit is not None and len(out) >= limit:
                break
            d = json.loads(line)
            objects = d.get("objects", [])
            out.append(RawExample(
                example_id=str(d.get("annot_id", d.get("total_id", i))),
                img_id=str(d.get("img_id", d.get("img_fn", i))),
                premise=detokenize_with_dets(d["premise"], objects),
                answer_choices=[
                    detokenize_with_dets(a, objects) for a in d["answer_choices"]
                ],
                answer_label=d.get("answer_label", 0),
                answer_types=d.get("answer_types"),
                objects=list(objects),
            ))
    return out


def truncate_answer(ans: str, r_ans: str, extra_tokens: int = 10) -> str:
    """VCR answer-truncation heuristic (Data/VCRChunkAlign.py:851-854).

    If the roberta answer string occurs inside the BERT-side answer, keep the
    roberta answer plus at most ``extra_tokens`` following whitespace tokens.
    """
    if r_ans and r_ans in ans:
        tail = ans.split(r_ans, 1)[1]
        return r_ans + " ".join(tail.split()[:extra_tokens])
    return ans


class VCRDataset(PMRDataset):
    """VCR featurizer — PMR pipeline + the answer-truncation heuristic.

    The reference keeps separate BERT-side and RoBERTa-side example pickles
    (`VCR_example_file` vs `roberta_example_file`, Data/VCRChunkAlign.py:746-749)
    whose answer strings may differ; here both sides derive from the same raw
    example, so the truncation reduces to capping the BERT answer at
    len(answer)+10 tokens — the heuristic is applied verbatim for parity.

    ``lm_style`` selects the second-view (LM) stream framing:

    - ``"prompt"`` (default) — the prefix-RoBERTa prompt template
      (ensemble_T flavor, Data/VCRChunkAlign.py:821-836);
    - ``"gpt"`` — the ``_ensemble_gpt`` flavor (:413-421): no prompt
      template, no "Answer is" prefix, tokens framed
      ``[bos] question [eos] answer [eos]`` (the Tokenizer adapter maps a
      GPT-2 tokenizer's bos/eos onto cls/sep, data/tokenization.py:54-55) —
      pass the GPT-2 tokenizer as ``roberta_tokenizer``.  Consumed by
      ``DualEnsembleModel(text_view="gpt2")``.
    """

    def __init__(self, *args, lm_style: str = "prompt", **kwargs):
        super().__init__(*args, **kwargs)
        if lm_style not in ("prompt", "gpt"):
            raise ValueError(f"unknown lm_style {lm_style!r}")
        self.lm_style = lm_style

    def featurize(self, ex: RawExample) -> List[CandidateFeatures]:
        spec = self.spec
        premise_tokens = self.bert.tokenize(ex.premise.lower())
        if self.lm_style == "gpt":
            r_que = self.roberta.tokenize(ex.premise.lower())
        else:
            r_que = self.roberta.tokenize(PROMPT_TEXT + ex.premise.lower())

        out: List[CandidateFeatures] = []
        for ans_idx, ans in enumerate(ex.answer_choices):
            r_ans_str = ans  # roberta-side answer (same source text here)
            ans = truncate_answer(ans, r_ans_str)
            ans_tokens = self.bert.tokenize(ans)
            toks = (
                [self.bert.cls_token] + premise_tokens + [self.bert.sep_token]
                + ans_tokens + [self.bert.sep_token]
            )
            toks = toks[: spec.text_len]
            input_ids = np.asarray(self.bert.convert_tokens_to_ids(toks), np.int32)
            t = len(toks)
            token_type_ids = np.zeros((t,), np.int32)
            ans_start = min(len(premise_tokens) + 2, t)
            token_type_ids[ans_start:] = 1

            total_label = np.zeros((t,), np.int32)
            for pos, tok in enumerate(toks):
                di = det_index(tok)
                if di is not None:
                    total_label[pos] = di
            align_pos = (total_label != 0).astype(np.int32)

            gather_index = self.chunker.gather_index(
                toks[1:t - 1] if t >= 2 else [],
                offset=1, total_len=t, max_chunks=self.max_chunks,
            )

            if self.lm_style == "gpt":
                r_ans = self.roberta.tokenize(r_ans_str)
            else:
                r_ans = self.roberta.tokenize(ANSWER_PREFIX + r_ans_str)
            r_toks = (
                [self.roberta.cls_token] + r_que + [self.roberta.sep_token]
                + r_ans + [self.roberta.sep_token]
            )
            r_toks = r_toks[: spec.roberta_len]
            r_input_ids = np.asarray(
                self.roberta.convert_tokens_to_ids(r_toks), np.int32
            )

            out.append(CandidateFeatures(
                input_ids=input_ids,
                token_type_ids=token_type_ids,
                gather_index=gather_index,
                total_label=total_label,
                align_pos=align_pos,
                r_input_ids=r_input_ids,
                r_token_type_ids=np.zeros((len(r_toks),), np.int32),
                target=self._target(ex.answer_label, ans_idx),
            ))
        return out
