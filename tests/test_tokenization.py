"""Tokenizer adapters: HF adapter over a handcrafted WordPiece vocab
(no hub access), det-token handling, hash fallback determinism."""

import numpy as np
import pytest

from multimodal_context_reasoning_tpu.data.tokenization import (
    DET_TOKENS,
    HashTokenizer,
    HFTokenizer,
    RobertaHashTokenizer,
    det_index,
    det_token,
)


class TestDetTokens:
    def test_roundtrip(self):
        assert det_token(7) == "<|det7|>"
        assert det_index("<|det7|>") == 7
        assert det_index("<|det44|>") == 44
        assert det_index("<|det|>") is None
        assert det_index("word") is None
        assert len(DET_TOKENS) == 45


class TestHashTokenizer:
    def test_deterministic_and_det_atomic(self):
        tok = HashTokenizer(vocab_size=1000)
        a = tok.convert_tokens_to_ids(tok.tokenize("a man <|det3|> smiles ."))
        b = tok.convert_tokens_to_ids(tok.tokenize("a man <|det3|> smiles ."))
        assert a == b
        toks = tok.tokenize("a man <|det3|> smiles .")
        assert "<|det3|>" in toks
        # det tokens live in the reserved top slots
        det_id = tok.convert_tokens_to_ids(["<|det3|>"])[0]
        assert det_id >= 1000 - 45

    def test_roberta_conventions(self):
        tok = RobertaHashTokenizer(vocab_size=500)
        assert tok.cls_token == "<s>" and tok.sep_token == "</s>"
        assert tok.pad_id == 1
        assert tok.convert_tokens_to_ids(["<s>", "</s>"]) == [0, 2]


class TestHFAdapter:
    def test_wordpiece_vocab_with_det_tokens(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "a", "man", "smiles", "dog", "##gy", "the", "."]
        vf = tmp_path / "vocab.txt"
        vf.write_text("\n".join(vocab))
        hf = transformers.BertTokenizerFast(vocab_file=str(vf),
                                            do_lower_case=True)
        tok = HFTokenizer(hf)  # appends the 45 det tokens

        toks = tok.tokenize("a doggy man <|det3|> smiles .")
        assert "<|det3|>" in toks           # special token stays atomic
        assert "##gy" in toks               # wordpiece continuation works
        ids = tok.convert_tokens_to_ids(toks)
        assert all(isinstance(i, int) for i in ids)
        # det token id is beyond the base vocab
        det_id = tok.convert_tokens_to_ids(["<|det3|>"])[0]
        assert det_id >= len(vocab)
        assert len(tok) == len(vocab) + 45
        assert tok.cls_token == "[CLS]" and tok.sep_token == "[SEP]"
