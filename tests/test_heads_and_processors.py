"""Oscar task heads, task processors, generate() API, rationale streams."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import EncoderConfig, GPT2Config
from multimodal_context_reasoning_tpu.data.rationale import (
    RationaleSpec,
    collate_rationales,
)
from multimodal_context_reasoning_tpu.data.task_processors import (
    NLVRProcessor,
    PROCESSORS,
    VCRProcessor,
    VQAProcessor,
)
from multimodal_context_reasoning_tpu.data.tokenization import HashTokenizer
from multimodal_context_reasoning_tpu.generation.api import generate
from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder
from multimodal_context_reasoning_tpu.models.oscar_heads import (
    CaptioningLoss,
    MultipleChoiceHead,
    PretrainingHeads,
    SequenceClassificationHead,
)

ENC = EncoderConfig(
    vocab_size=64, hidden_size=16, num_hidden_layers=1,
    num_attention_heads=2, intermediate_size=32,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)


class TestOscarHeads:
    def test_sequence_classification(self):
        head = SequenceClassificationHead(ENC, num_labels=3)
        pooled = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)),
                             jnp.float32)
        labels = jnp.asarray([0, 1, 2, 1])
        params = head.init(jax.random.PRNGKey(0), pooled, labels)
        loss, logits = head.apply(params, pooled, labels)
        assert logits.shape == (4, 3) and float(loss) > 0

    def test_regression_branch(self):
        head = SequenceClassificationHead(ENC, num_labels=1)
        pooled = jnp.ones((4, 16))
        labels = jnp.asarray([0.5, 0.5, 0.5, 0.5])
        params = head.init(jax.random.PRNGKey(0), pooled, labels)
        loss, logits = head.apply(params, pooled, labels)
        assert logits.shape == (4, 1) and np.isfinite(float(loss))

    def test_multiple_choice(self):
        head = MultipleChoiceHead(ENC, num_choices=4)
        pooled = jnp.asarray(np.random.default_rng(1).normal(size=(8, 16)),
                             jnp.float32)
        labels = jnp.asarray([0, 3])
        params = head.init(jax.random.PRNGKey(0), pooled, labels)
        loss, logits = head.apply(params, pooled, labels)
        assert logits.shape == (2, 4) and float(loss) > 0

    def test_captioning_loss_drop_worst(self):
        loss_fn = CaptioningLoss(label_smoothing=0.1, drop_worst_ratio=0.5)
        logits = jnp.asarray(np.random.default_rng(2).normal(size=(8, 64)),
                             jnp.float32)
        targets = jnp.asarray(np.random.default_rng(3).integers(0, 64, 8))
        full = CaptioningLoss(label_smoothing=0.1, drop_worst_ratio=0.0)
        assert float(loss_fn(logits, targets)) < float(full(logits, targets))

    def test_pretraining_heads(self):
        heads = PretrainingHeads(ENC)
        rng = np.random.default_rng(4)
        seq = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
        pooled = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
        wemb = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
        mlm = jnp.asarray([[-100, 3, -100, 7, -100, -100], [-100] * 6])
        itm = jnp.asarray([1, 0])
        params = heads.init(jax.random.PRNGKey(0), seq, pooled, wemb, mlm, itm)
        out = heads.apply(params, seq, pooled, wemb, mlm, itm)
        assert out.mlm_logits.shape == (2, 6, 64)
        assert out.itm_logits.shape == (2, 2)
        assert np.isfinite(float(out.loss))


class TestProcessors:
    def test_vqa(self, tmp_path):
        rows = [{"q_id": 1, "q": "what color?", "img_id": "7",
                 "label": ["red"], "score": [1.0]}]
        p = tmp_path / "train.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        ex = VQAProcessor().get_train_examples(str(tmp_path))
        assert ex[0].text_a == "what color?" and ex[0].img_key == "7"

    def test_vqa_ans2label_real_vocab(self):
        """SURVEY row 38: the 3,129-entry VQA answer vocabulary
        (utils/ans2label.json) loads and get_labels mirrors the reference's
        `list(ans2label.values())` (utils/task_utils.py:109-110)."""
        import os

        from multimodal_context_reasoning_tpu.data.task_processors import (
            load_ans2label,
        )

        path = "/root/reference/utils/ans2label.json"
        if not os.path.exists(path):
            pytest.skip("reference vocab not present")
        a2l = load_ans2label(path)
        assert len(a2l) == 3129
        assert a2l["net"] == 0 and a2l["yes"] == 3
        # ids are a contiguous 0..N-1 relabeling (classification head size)
        assert sorted(a2l.values()) == list(range(3129))
        labels = VQAProcessor().get_labels(path)
        assert labels == list(a2l.values())

    def test_ans2label_pickle_roundtrip(self, tmp_path):
        import pickle

        from multimodal_context_reasoning_tpu.data.task_processors import (
            load_ans2label,
        )

        d = {"yes": 0, "no": 1}
        p = tmp_path / "ans2label.pkl"
        p.write_bytes(pickle.dumps(d))
        assert load_ans2label(str(p)) == d

    def test_nlvr_label_map(self, tmp_path):
        rows = [{"identifier": "a", "sent": "two dogs", "label": "True"}]
        (tmp_path / "val.json").write_text(json.dumps(rows))
        ex = NLVRProcessor().get_dev_examples(str(tmp_path))
        assert ex[0].label == 1

    def test_vcr_expansion_and_qar(self, tmp_path):
        rows = [{
            "annot_id": "x", "question": ["why", "?"], "img_id": "i",
            "answer_choices": [["a"], ["b"], ["c"], ["d"]],
            "answer_label": 2,
            "rationale_choices": [["r1"], ["r2"], ["r3"], ["r4"]],
            "rationale_label": 1,
        }]
        (tmp_path / "train.json").write_text(json.dumps(rows))
        qa = VCRProcessor().get_train_examples(str(tmp_path))
        assert len(qa) == 4
        assert [e.label for e in qa] == [0, 0, 1, 0]
        qar = PROCESSORS["vcr_qa_r"]().get_train_examples(str(tmp_path))
        assert qar[0].text_a.endswith("c")          # gold answer appended
        assert [e.label for e in qar] == [0, 1, 0, 0]


class TestGenerateAPI:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = GPT2Config(
            vocab_size=64, n_positions=64, n_embd=16, n_layer=1, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0, pad_token_id=0,
            add_cross_attention=False,
        )
        model = GPT2Decoder(cfg)
        prompt = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        plen = jnp.asarray([4], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), prompt)
        return model, params, prompt, plen

    @pytest.mark.parametrize("mode", ["greedy", "sample", "beam"])
    def test_modes(self, setup, mode):
        model, params, prompt, plen = setup
        toks, lens = generate(
            model, params, prompt, plen, mode=mode, max_len=5,
            eos_id=1, pad_id=0, rng=jax.random.PRNGKey(2), num_beams=2,
            top_k=10,
        )
        assert toks.shape == (1, 5)
        assert int(lens[0]) <= 5

    def test_sample_requires_rng(self, setup):
        model, params, prompt, plen = setup
        with pytest.raises(ValueError):
            generate(model, params, prompt, plen, mode="sample", rng=None)


class TestRationaleStreams:
    def test_collate_shapes_and_markers(self):
        tok = HashTokenizer(vocab_size=500)
        out = collate_rationales(["he smiled", None], tok,
                                 RationaleSpec(max_len=8))
        assert out["expl_ids"].shape == (2, 8)
        assert out["expl_mask"][0].sum() > 0
        assert out["expl_mask"][1].sum() == 0
