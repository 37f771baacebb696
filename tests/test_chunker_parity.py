"""Chunk-mask builder parity with the reference's offline pipeline.

The oracle below is a literal numpy transcription of the reference's
BIO→mask assembly loop (utils/GetChunk_v4_vcr.py:104-148) — the same
technique tests/test_mask_parity.py uses for the staged attention masks.
It pins down the loop's three quirks: O-singletons never flush the open
chunk, an O directly before an I is bridged into the open chunk, and a
dangling I starts a chunk.
"""

import json
import pickle

import numpy as np
import pytest

from multimodal_context_reasoning_tpu.data.chunker import (
    HeuristicChunker,
    chunks_from_bio,
    heuristic_bio_tags,
    reference_mask_and_offsets,
)


def reference_loop_oracle(tags):
    """Numpy transcription of GetChunk_v4_vcr.py:104-148 (tags cover the
    interior positions; CLS at 0 and the final SEP at L-1 are implicit)."""
    mask_len = len(tags) + 2
    classes = ["O"] + list(tags) + ["O"]          # absolute indexing
    total_mask = np.eye(mask_len, dtype=np.float32)
    total_mask[0, :mask_len] = 1
    chunk_offset = []
    tmp_chunk = []
    for i in range(1, mask_len - 1):
        token_class = classes[i]
        if token_class[0] == "B":
            if len(tmp_chunk) != 0:
                chunk_offset.append(tmp_chunk)
            tmp_chunk = [i]
        elif token_class[0] == "I":
            for index in tmp_chunk:
                total_mask[index][i] = 1
                total_mask[i][index] = 1
            tmp_chunk.append(i)
        else:
            if (i != mask_len - 2 and len(tmp_chunk) != 0
                    and classes[i + 1][0] == "I"):
                for index in tmp_chunk:
                    total_mask[index][i] = 1
                    total_mask[i][index] = 1
                tmp_chunk.append(i)
            else:
                chunk_offset.append(i)
    if len(tmp_chunk) != 0:
        chunk_offset.append(tmp_chunk)
    total_mask[mask_len - 1, :mask_len] = 1
    sort_chunk_offset = []
    his_list = []
    for i in range(1, mask_len - 1):
        chunk = np.nonzero(total_mask[i])[0].tolist()
        if chunk[0] not in his_list:
            sort_chunk_offset.append(chunk)
            his_list.extend(chunk)
    assert len(his_list) == mask_len - 2
    return total_mask, sort_chunk_offset


TAG_CASES = [
    # plain chunks
    ["B-NP", "I-NP", "I-NP", "O", "B-VP", "I-VP"],
    # O-singleton between chunks
    ["O", "B-NP", "I-NP", "O", "B-VP"],
    # O bridged into the open chunk (next tag is I)
    ["B-NP", "O", "I-NP"],
    # singleton then bridge: the O at interior pos 2 stays a singleton while
    # the O at pos 3 is bridged into the chunk opened at pos 1
    ["B-NP", "O", "O", "I-NP"],
    # dangling I starts a chunk
    ["I-NP", "I-NP", "O"],
    # trailing O at the last interior position never bridges
    ["B-VP", "I-VP", "O"],
    # all O
    ["O", "O", "O"],
    # B at the very end flushes on exit
    ["O", "B-NP"],
    # single interior token
    ["B-NP"],
    # B after O-kept-open chunk: the open chunk flushes on the next B
    ["B-NP", "I-NP", "O", "B-VP", "I-VP", "O", "I-ADJP"],
]


class TestReferenceAssemblyParity:
    @pytest.mark.parametrize("tags", TAG_CASES, ids=["-".join(t) for t in TAG_CASES])
    def test_mask_and_offsets_match_oracle(self, tags):
        want_mask, want_offsets = reference_loop_oracle(tags)
        got_mask, got_offsets = reference_mask_and_offsets(tags)
        np.testing.assert_array_equal(got_mask, want_mask)
        assert got_offsets == want_offsets

    @pytest.mark.parametrize("tags", TAG_CASES[:6], ids=["-".join(t) for t in TAG_CASES[:6]])
    def test_gather_index_mask_matches_reference_mask(self, tags):
        """The compact gather_index the framework ships must synthesize the
        SAME dense mask the reference pickles (ops/chunk.py on device)."""
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.ops.chunk import (
            chunk_mask_from_gather_index,
        )

        want_mask, _ = reference_loop_oracle(tags)
        L = len(tags) + 2
        gi = np.full((1, L), -1, np.int32)
        for cid, members in enumerate(chunks_from_bio(tags)):
            for pos in members:
                gi[0, pos + 1] = cid
        tm = np.ones((1, L), np.float32)
        got = np.asarray(
            chunk_mask_from_gather_index(jnp.asarray(gi), jnp.asarray(tm))
        )[0]
        np.testing.assert_array_equal(got, want_mask)

    def test_heuristic_tags_feed_valid_assembly(self):
        toks = ["a", "small", "red", "dog", "runs", "to", "the", "house", "."]
        tags = heuristic_bio_tags(toks)
        mask, offsets = reference_mask_and_offsets(tags)  # assert inside
        assert mask.shape == (len(toks) + 2,) * 2
        flat = sorted(p for ch in offsets for p in ch)
        assert flat == list(range(1, len(toks) + 1))


@pytest.fixture(scope="module")
def stub_chunker_dir(tmp_path_factory):
    """A real (tiny, random) HF token-classification checkpoint on disk —
    stands in for the AdapterHub CoNLL-2000 chunker the reference uses
    (GetChunk_v4_vcr.py:20-22)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    d = tmp_path_factory.mktemp("chunker")
    labels = ["O", "B-NP", "I-NP", "B-VP", "I-VP", "B-PP", "I-PP"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "the", "dog", "cat", "runs", "red", "man", "##s", "is"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(str(d / "vocab.txt"),
                                         do_lower_case=True)
    tok.save_pretrained(str(d))

    torch.manual_seed(0)
    cfg = transformers.BertConfig(
        vocab_size=len(tok), hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64,
        num_labels=len(labels),
        id2label={i: l for i, l in enumerate(labels)},
        label2id={l: i for i, l in enumerate(labels)},
    )
    mdl = transformers.BertForTokenClassification(cfg)
    mdl.save_pretrained(str(d))
    return str(d)


class TestChunkerDirWiring:
    def test_hf_tag_fn_produces_bio_labels(self, stub_chunker_dir):
        from multimodal_context_reasoning_tpu.cli.build_chunk_masks import (
            make_hf_tag_fn,
        )

        tag_fn = make_hf_tag_fn(stub_chunker_dir)
        tags = tag_fn(["the", "dog", "runs", "zzz-unk-zzz"])
        assert len(tags) == 4
        assert all(t[0] in "BIO" for t in tags)
        # deterministic
        assert tags == tag_fn(["the", "dog", "runs", "zzz-unk-zzz"])

    def test_cli_reference_format_via_chunker_dir(self, stub_chunker_dir,
                                                  tmp_path):
        """End-to-end --chunker_dir run: jsonl → tagger → reference-format
        pickle whose {mask, offsets} match the oracle for the same tags."""
        from multimodal_context_reasoning_tpu.cli.build_chunk_masks import (
            main as build_main,
            make_hf_tag_fn,
        )
        from multimodal_context_reasoning_tpu.data.tokenization import (
            HashTokenizer,
        )

        examples = tmp_path / "ex.jsonl"
        rows = [
            {
                "total_id": 0, "img_id": "img-0",
                "premise": ["the", "dog", "runs"],
                "answer_choices": [["a", "red", "cat"], ["the", "man", "is"]],
                "answer_label": 0, "answer_types": ["a"],
            }
        ]
        examples.write_text("\n".join(json.dumps(r) for r in rows))
        out = tmp_path / "chunks.pkl"
        build_main([
            "--examples", str(examples), "--out", str(out),
            "--format", "reference", "--chunker_dir", stub_chunker_dir,
        ])
        result = pickle.load(open(out, "rb"))
        assert set(result) == {0} and len(result[0]) == 2

        tok = HashTokenizer()
        tag_fn = make_hf_tag_fn(stub_chunker_dir)
        premise_toks = tok.tokenize("the dog runs")
        for cand, ans in zip(result[0], rows[0]["answer_choices"]):
            toks = ([tok.cls_token] + premise_toks + [tok.sep_token]
                    + tok.tokenize(" ".join(ans)) + [tok.sep_token])
            body = toks[1:-1]
            want_mask, want_offsets = reference_loop_oracle(tag_fn(body))
            np.testing.assert_array_equal(cand["mask"], want_mask)
            assert cand["offsets"] == want_offsets
