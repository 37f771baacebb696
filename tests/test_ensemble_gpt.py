"""End-to-end joint loader + GPT-view ensemble (_ensemble_gpt flavor).

Exercises the ``VCR_ChunkAlign_Dataset_align_ensemble_gpt`` counterpart
(Data/VCRChunkAlign.py:356-527: second-view stream re-tokenized for GPT-2
with ``[bos] question [eos] answer [eos]`` framing and no prompt template)
feeding ``dual_ensemble_model_gpt`` (modeling_ensemble.py:249-287: CALeC
CLS ‖ GPT-2 position-0 hidden → Linear → 4-way logits) — the one dataset
flavor round 1 consolidated but never ran end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

VCR_VAL = "/root/reference/vcr_data/vcr_val.json"
N_EXAMPLES = 6
BATCH = 3


def _tiny_gpt2_config(cfg=None):
    from multimodal_context_reasoning_tpu.core.config import (
        GPT2Config,
        ModCRConfig,
    )

    if cfg is None:
        cfg = ModCRConfig.tiny()
    return GPT2Config(
        vocab_size=cfg.roberta.vocab_size,
        n_positions=cfg.roberta_len + 2,
        n_embd=cfg.global_encoder.hidden_size,
        n_layer=2,
        n_head=2,
        add_cross_attention=False,
    )


@pytest.fixture(scope="module")
def gpt_setup():
    from multimodal_context_reasoning_tpu.cli.common import batch_spec
    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
    from multimodal_context_reasoning_tpu.data.tokenization import HashTokenizer
    from multimodal_context_reasoning_tpu.data.vcr import (
        VCRDataset,
        load_vcr_json,
    )

    try:
        examples = load_vcr_json(VCR_VAL, limit=N_EXAMPLES)
    except FileNotFoundError:
        pytest.skip("reference vcr_data not mounted")

    # tiny() geometry truncates real VCR streams to the point where all 4
    # candidates become identical (premise alone exceeds 20 tokens); widen
    # the static lengths so candidate answers survive featurization
    import dataclasses

    cfg = dataclasses.replace(
        ModCRConfig.tiny(), text_len=64, roberta_len=64
    )
    rng = np.random.default_rng(0)
    feats = {
        ex.img_id: ImageFeatures(
            features=rng.normal(
                size=(5, cfg.global_encoder.img_feature_dim)
            ).astype(np.float32),
            num_regions=5,
        )
        for ex in examples
    }
    # A GPT-2-style tokenizer plugs in as the second-view tokenizer; the
    # adapter maps bos/eos onto cls/sep (data/tokenization.py:54-55).  The
    # hash tokenizer stands in with the same protocol.
    gpt_toker = HashTokenizer(
        vocab_size=cfg.roberta.vocab_size,
        cls_token="<|endoftext|>", sep_token="<|endoftext|>",
    )
    ds = VCRDataset(
        examples, feats,
        HashTokenizer(vocab_size=cfg.global_encoder.vocab_size), gpt_toker,
        spec=batch_spec(cfg), max_chunks=cfg.max_chunks,
        lm_style="gpt",
    )
    return cfg, ds


class TestGptStream:
    def test_gpt_stream_framing(self, gpt_setup):
        """lm_style='gpt' drops the prompt template and 'Answer is' prefix:
        the gpt stream is [bos] que [eos] ans [eos]
        (Data/VCRChunkAlign.py:417-421)."""
        from multimodal_context_reasoning_tpu.data.vcr import truncate_answer

        cfg, ds = gpt_setup
        ex = ds.examples[0]
        cands = ds.featurize(ex)
        assert len(cands) == 4
        tok = ds.roberta
        que = tok.tokenize(ex.premise.lower())
        for ans_idx, c in enumerate(cands):
            ans = ex.answer_choices[ans_idx]
            expected_toks = (
                [tok.cls_token] + que + [tok.sep_token]
                + tok.tokenize(ans) + [tok.sep_token]
            )[: cfg.roberta_len]
            expected = np.asarray(
                tok.convert_tokens_to_ids(expected_toks), np.int32
            )
            np.testing.assert_array_equal(np.asarray(c.r_input_ids), expected)

    def test_prompt_style_differs(self, gpt_setup):
        """Same example, lm_style='prompt' → a different (templated) stream."""
        from multimodal_context_reasoning_tpu.cli.common import batch_spec
        from multimodal_context_reasoning_tpu.data.vcr import VCRDataset

        cfg, ds = gpt_setup
        prompt_ds = VCRDataset(
            ds.examples, ds.image_features, ds.bert, ds.roberta,
            spec=ds.spec, max_chunks=ds.max_chunks, lm_style="prompt",
        )
        a = ds.featurize(ds.examples[0])[0].r_input_ids
        b = prompt_ds.featurize(ds.examples[0])[0].r_input_ids
        assert a.shape != b.shape or not np.array_equal(a, b)


class TestDualEnsembleGpt:
    @pytest.fixture(scope="class")
    def forward(self, gpt_setup):
        from multimodal_context_reasoning_tpu.models.ensemble import (
            DualEnsembleModel,
        )

        cfg, ds = gpt_setup
        batch = ds.batch(list(range(BATCH)))
        batch = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }

        outs = {}
        for pool in ("first", "last_real"):
            model = DualEnsembleModel(
                cfg, text_view="gpt2", gpt_pool=pool,
                gpt2_config=_tiny_gpt2_config(cfg),
            )
            params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
            (out, align_loss) = jax.jit(
                lambda p, b: model.apply(p, b, deterministic=True)
            )(params, batch)
            outs[pool] = (params, out, align_loss)
        return cfg, batch, outs

    def test_e2e_forward(self, forward):
        cfg, batch, outs = forward
        _, out, align_loss = outs["first"]
        assert out.logits.shape == (BATCH, 4)
        assert np.isfinite(np.asarray(out.loss))
        assert np.isfinite(np.asarray(align_loss))

    def test_no_roberta_tower(self, forward):
        """text_view='gpt2' swaps the reasoner: no roberta params exist."""
        cfg, batch, outs = forward
        params, _, _ = outs["first"]
        top = set(params["params"].keys())
        assert "gpt" in top and "roberta" not in top

    def test_first_pool_is_degenerate_by_reference_design(self, forward):
        """The reference pools gpt_output[:, 0, :] (ensemble:273).  Under
        causal attention position 0 sees only <bos>, so the text view is
        IDENTICAL across the 4 candidates — the quirk is preserved, and
        the candidate separation must come from CALeC alone."""
        cfg, batch, outs = forward
        params, out, _ = outs["first"]

        from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder

        gcfg = _tiny_gpt2_config(cfg)
        _, _, h = GPT2Decoder(gcfg).apply(
            {"params": params["params"]["gpt"]},
            batch["r_input_ids"], attn_mask=batch["r_attention_mask"],
            deterministic=True, output_hidden=True,
        )
        first = np.asarray(h[:, 0])
        assert np.allclose(first, first[0], atol=1e-5)

    def test_last_real_pool_separates_candidates(self, forward):
        """gpt_pool='last_real' reads the final non-pad hidden — candidate
        answers differ, so the pooled views must differ."""
        cfg, batch, outs = forward
        params, out, _ = outs["last_real"]
        assert out.logits.shape == (BATCH, 4)
        # logits vary across candidates within an example
        lg = np.asarray(out.logits)
        assert np.ptp(lg, axis=1).min() > 0
