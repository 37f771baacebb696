"""Generation engine tests: KV-cache consistency, greedy/beam decode,
constraint extraction, rationale model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import (
    ChunkAlignConfig,
    EncoderConfig,
    GPT2Config,
)
from multimodal_context_reasoning_tpu.generation.beam import (
    apply_repetition_penalty,
    constrained_beam_sample,
    top_k_warp,
)
from multimodal_context_reasoning_tpu.generation.constraints import (
    constraint_vocab_mask,
    extract_constraint_words,
)
from multimodal_context_reasoning_tpu.generation.decode import greedy_decode
from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder, KVCache
from multimodal_context_reasoning_tpu.models.rationale import (
    RationaleModel,
    binary_to_mp,
)

V = 128


@pytest.fixture(scope="module")
def gpt2_setup():
    cfg = GPT2Config(
        vocab_size=V, n_positions=96, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0, pad_token_id=0,
    )
    model = GPT2Decoder(cfg)
    rng = np.random.default_rng(0)
    B, Lp, M = 2, 6, 5
    prompt = jnp.asarray(rng.integers(2, V, size=(B, Lp)), jnp.int32)
    mem = jnp.asarray(rng.normal(size=(B, M, 32)), jnp.float32)
    mmask = jnp.ones((B, M))
    params = model.init(jax.random.PRNGKey(0), prompt, memory=mem,
                        memory_mask=mmask)
    return cfg, model, params, prompt, mem, mmask


class TestKVCache:
    def test_prefill_matches_full_forward(self, gpt2_setup):
        """Cached prefill logits == uncached causal forward logits."""
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        full, _ = model.apply(params, prompt, memory=mem, memory_mask=mmask)
        cache = KVCache.zeros(cfg, B, Lp + 4)
        cached, _ = model.apply(
            params, prompt, memory=mem, memory_mask=mmask,
            cache=cache, cache_index=jnp.int32(0),
        )
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(cached), rtol=1e-5, atol=1e-5
        )

    def test_incremental_matches_full(self, gpt2_setup):
        """Decoding token t with the cache == full forward over t+1 tokens."""
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        nxt = jnp.asarray([[5], [9]], jnp.int32)
        seq = jnp.concatenate([prompt, nxt], axis=1)
        full, _ = model.apply(params, seq, memory=mem, memory_mask=mmask)

        cache = KVCache.zeros(cfg, B, Lp + 4)
        _, cache = model.apply(
            params, prompt, memory=mem, memory_mask=mmask,
            cache=cache, cache_index=jnp.int32(0),
        )
        step, _ = model.apply(
            params, nxt, position_offset=jnp.full((B,), Lp, jnp.int32),
            memory=mem, memory_mask=mmask,
            cache=cache, cache_index=jnp.int32(Lp),
        )
        np.testing.assert_allclose(
            np.asarray(full[:, -1]), np.asarray(step[:, 0]), rtol=1e-5, atol=1e-5
        )


class TestGreedy:
    def test_first_token_is_argmax_of_prompt_logits(self, gpt2_setup):
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.full((B,), Lp, jnp.int32)
        toks, _ = greedy_decode(
            model, params, prompt, plen, memory=mem, memory_mask=mmask,
            max_len=4, eos_id=1, pad_id=0,
        )
        full, _ = model.apply(params, prompt, memory=mem, memory_mask=mmask)
        want = jnp.argmax(full[:, -1], axis=-1)
        np.testing.assert_array_equal(np.asarray(toks[:, 0]), np.asarray(want))

    def test_lengths_positional_with_emittable_pad(self, gpt2_setup):
        """GPT-2's pad_token_id 50256 == <|endoftext|> is an emittable REAL
        token, so lengths must count emission steps (positional), not
        non-pad tokens: a mid-sequence pad-valued emission must not shrink
        the reported length.  Greedy is deterministic, so re-running with
        pad_id set to an actually-emitted token must leave lengths and the
        within-length tokens unchanged."""
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.full((B,), Lp, jnp.int32)
        kw = dict(memory=mem, memory_mask=mmask, max_len=6, eos_id=1)
        toks, lens = greedy_decode(
            model, params, prompt, plen, pad_id=0, **kw
        )
        emitted = int(np.asarray(toks)[0, 0])
        toks2, lens2 = greedy_decode(
            model, params, prompt, plen, pad_id=emitted, **kw
        )
        np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens2))
        L0 = int(np.asarray(lens)[0])
        np.testing.assert_array_equal(
            np.asarray(toks)[0, :L0], np.asarray(toks2)[0, :L0]
        )

    def test_respects_real_prompt_length(self, gpt2_setup):
        """A right-padded prompt decodes from its real last token."""
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.asarray([Lp, Lp - 2], jnp.int32)
        toks, _ = greedy_decode(
            model, params, prompt, plen, memory=mem, memory_mask=mmask,
            max_len=3, eos_id=1, pad_id=0,
        )
        short, _ = model.apply(
            params, prompt[1:2, : Lp - 2], memory=mem[1:2],
            memory_mask=mmask[1:2],
        )
        want = int(jnp.argmax(short[0, -1]))
        assert int(toks[1, 0]) == want

    def test_padded_prompt_full_sequence_matches_unpadded(self, gpt2_setup):
        """EVERY generated token (not just the first) must be independent of
        right-padding in the prompt — the padded slots' K/V live in the
        cache and must never be attended (regression: cache_valid mask)."""
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        real = Lp - 2
        # row 1 padded to Lp, decoded with plen=real
        toks_padded, _ = greedy_decode(
            model, params, prompt, jnp.asarray([Lp, real], jnp.int32),
            memory=mem, memory_mask=mmask, max_len=5, eos_id=1, pad_id=0,
        )
        # row 1 alone, trimmed to its real length
        toks_trim, _ = greedy_decode(
            model, params, prompt[1:2, :real], jnp.asarray([real], jnp.int32),
            memory=mem[1:2], memory_mask=mmask[1:2],
            max_len=5, eos_id=1, pad_id=0,
        )
        np.testing.assert_array_equal(
            np.asarray(toks_padded[1]), np.asarray(toks_trim[0])
        )


class TestBeam:
    def test_deterministic_given_rng(self, gpt2_setup):
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.full((B,), Lp, jnp.int32)
        kw = dict(
            memory=mem, memory_mask=mmask, num_beams=3, max_steps=6,
            eos_id=1, pad_id=0, top_k=20,
        )
        a, _ = constrained_beam_sample(
            model, params, prompt, plen, rng=jax.random.PRNGKey(7), **kw
        )
        b, _ = constrained_beam_sample(
            model, params, prompt, plen, rng=jax.random.PRNGKey(7), **kw
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_constraint_boost_prefers_constraint_tokens(self, gpt2_setup):
        """With an overwhelming boost every sampled continuation should hit
        constraint tokens more often than without."""
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.full((B,), Lp, jnp.int32)
        cmask = np.zeros((B, V), bool)
        cmask[:, 40:60] = True
        kw = dict(
            memory=mem, memory_mask=mmask, num_beams=4, max_steps=8,
            eos_id=1, pad_id=0, top_k=0,
        )
        boosted, _ = constrained_beam_sample(
            model, params, prompt, plen, rng=jax.random.PRNGKey(3),
            constraint_mask=jnp.asarray(cmask), constraint_factor=0.01, **kw
        )
        plain, _ = constrained_beam_sample(
            model, params, prompt, plen, rng=jax.random.PRNGKey(3),
            constraint_mask=None, **kw
        )
        n_boost = int(np.isin(np.asarray(boosted), np.arange(40, 60)).sum())
        n_plain = int(np.isin(np.asarray(plain), np.arange(40, 60)).sum())
        assert n_boost >= n_plain

    def test_repetition_penalty_math(self):
        logp = jnp.asarray([[-1.0, -2.0, -3.0]])
        seqs = jnp.asarray([[1]])
        valid = jnp.asarray([[True]])
        out = apply_repetition_penalty(logp, seqs, valid, 2.0)
        np.testing.assert_allclose(np.asarray(out), [[-1.0, -4.0, -3.0]])

    def test_top_k_warp(self):
        s = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
        out = np.asarray(top_k_warp(s, 2))
        assert out[0, 1] == 5.0 and out[0, 2] == 3.0
        assert out[0, 0] < -1e8 and out[0, 3] < -1e8


class TestConstraints:
    def test_extraction_filters(self):
        tokens = ["[CLS]", "the", "dog", "##gy", "is", "running", "<|det3|>", "[SEP]"]
        attn = [9.0, 8.0, 7.0, 6.5, 6.0, 5.0, 4.0, 3.0]
        words = extract_constraint_words(tokens, attn, max_constraints=3)
        assert words == ["dog", "running"]

    def test_vocab_mask(self):
        mask = constraint_vocab_mask(
            ["dog"], lambda s: [3, 5] if s == " dog" else [9], 16
        )
        assert mask[3] and mask[5] and not mask[9]


class TestRationale:
    def test_forward_losses_and_shapes(self):
        enc = EncoderConfig(
            vocab_size=256, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=128, img_feature_dim=20,
        )
        sched = ChunkAlignConfig(chunk_layers_end=1, full_layers_end=2)
        gpt = GPT2Config(
            vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0, pad_token_id=0,
        )
        model = RationaleModel(enc, sched, gpt, max_chunks=8)

        rng = np.random.default_rng(0)
        Q, K, T, I = 2, 4, 12, 6
        B = Q * K
        label = np.zeros((B,), np.int32)
        label[::K] = 1
        batch = {
            "input_ids": jnp.asarray(rng.integers(4, 256, size=(B, T)), jnp.int32),
            "text_mask": jnp.ones((B, T)),
            "img_feat": jnp.asarray(rng.normal(size=(B, I, 20)), jnp.float32),
            "img_mask": jnp.ones((B, I)),
            "chunk_mask": jnp.ones((B, T, T)),
            "gather_index": jnp.full((B, T), -1, jnp.int32),
            "label": jnp.asarray(label),
            "expl_ids": jnp.asarray(rng.integers(2, 128, size=(Q, 10)), jnp.int32),
            "expl_mask": jnp.ones((Q, 10)),
        }
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out.mp_probs.shape == (Q, K)
        assert np.isfinite(float(out.gen_loss)) and float(out.gen_loss) > 0
        assert np.isfinite(float(out.cls_loss)) and float(out.cls_loss) > 0
        assert out.decoder_memory.shape == (Q, 3 * (T - 1), 32)
        # each entry is P(true) in [0, 1]
        assert np.all(np.asarray(out.mp_probs) >= 0)
        assert np.all(np.asarray(out.mp_probs) <= 1)

    def test_binary_to_mp(self):
        logits = jnp.asarray([[0.0, 10.0], [0.0, -10.0],
                              [0.0, 0.0], [5.0, 5.0]])
        mp = np.asarray(binary_to_mp(logits, 4))
        assert mp.shape == (1, 4)
        np.testing.assert_allclose(mp[0, 0], 1.0, atol=1e-3)
        np.testing.assert_allclose(mp[0, 1], 0.0, atol=1e-3)
        np.testing.assert_allclose(mp[0, 2], 0.5, atol=1e-3)
        np.testing.assert_allclose(mp[0, 3], 0.5, atol=1e-3)

    def test_trainer_fit_drives_the_family(self):
        """RationaleForTraining: Trainer.fit optimizes cls CE + XE on the
        unchanged param tree (the reference ships these modules with NO
        training entry; v10.py:1408 returns the losses separately).  Both
        loss terms must drop, and the trained params must drive the plain
        RationaleModel (serving/bridge interop) unchanged."""
        from multimodal_context_reasoning_tpu.core.config import TrainConfig
        from multimodal_context_reasoning_tpu.models.rationale import (
            RationaleForTraining,
        )
        from multimodal_context_reasoning_tpu.train.trainer import Trainer

        enc = EncoderConfig(
            vocab_size=256, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=128, img_feature_dim=20,
        )
        sched = ChunkAlignConfig(chunk_layers_end=1, full_layers_end=2)
        gpt = GPT2Config(
            vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0, pad_token_id=0,
        )
        facade = RationaleForTraining(
            RationaleModel(enc, sched, gpt, max_chunks=8))

        rng = np.random.default_rng(3)
        Q, K, T, I = 2, 4, 12, 6
        B = Q * K
        label = np.zeros((B,), np.int32)
        label[::K] = 1
        batch = {
            "input_ids": rng.integers(4, 256, size=(B, T)).astype(np.int32),
            "text_mask": np.ones((B, T), np.float32),
            "img_feat": rng.normal(size=(B, I, 20)).astype(np.float32),
            "img_mask": np.ones((B, I), np.float32),
            "chunk_mask": np.ones((B, T, T), np.float32),
            "gather_index": np.full((B, T), -1, np.int32),
            "label": label,
            "expl_ids": rng.integers(2, 128, size=(Q, 10)).astype(np.int32),
            "expl_mask": np.ones((Q, 10), np.float32),
            "example_mask": np.ones((Q,), np.float32),
        }

        class _ListLoader:
            def __init__(self, batches):
                self.batches = batches

            def __len__(self):
                return len(self.batches)

            def __iter__(self):
                return iter(self.batches)

        loader = _ListLoader([batch, batch])
        tcfg = TrainConfig(learning_rate=5e-3, scheduler="constant",
                           max_steps=12, num_train_epochs=100,
                           per_device_batch_size=Q, seed=0,
                           freeze_encoders=False)
        trainer = Trainer(facade, tcfg, loader, _ListLoader([batch]))
        state = trainer.init_state()

        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k != "example_mask"}
        first = facade.apply(state.params, dev_batch)
        state = trainer.fit(state)
        last = facade.apply(state.params, dev_batch)
        assert float(last.loss) < float(first.loss)
        assert float(last.cls_loss) < float(first.cls_loss)
        assert float(last.gen_loss) < float(first.gen_loss)

        # trained tree drives the plain module unchanged (serving interop)
        core = RationaleModel(enc, sched, gpt, max_chunks=8)
        out = core.apply(state.params, dev_batch)
        np.testing.assert_allclose(
            np.asarray(out.mp_probs),
            np.exp(np.asarray(last.logits)), atol=1e-5)


class TestDecodeOracle:
    """Multi-step cached decodes vs a full-forward re-encode oracle — the
    probe that caught the round-1 position bug (every generated token after
    the first reused position prompt_len, and a [B] offset broadcast to
    [1, B] blowing hiddens up to [B, B, D]).  The reference's incremental
    loop feeds correct positions via its growing `past`
    (modeling_vcr_chunkalign_v10.py:1463-1493)."""

    def _full_forward_last_logits(self, model, params, seqs, mem, mmask):
        """Per-example uncached forward over each (ragged) sequence; returns
        stacked last-token logits [B, V]."""
        outs = []
        for b, seq in enumerate(seqs):
            logits, _ = model.apply(
                params, jnp.asarray([seq], jnp.int32),
                memory=mem[b : b + 1], memory_mask=mmask[b : b + 1],
            )
            outs.append(np.asarray(logits[0, -1], np.float32))
        return np.stack(outs)

    def test_single_step_with_unequal_offsets_matches_full(self, gpt2_setup):
        """One cached step where each row has a DIFFERENT position offset."""
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = np.array([Lp, Lp - 2], np.int32)
        cache = KVCache.zeros(cfg, B, Lp + 4)
        pos = np.arange(Lp + 4)[None, :]
        cache_valid = jnp.asarray(
            ((pos < plen[:, None]) | (pos >= Lp)).astype(np.float32)
        )
        _, cache = model.apply(
            params, prompt, memory=mem, memory_mask=mmask,
            cache=cache, cache_index=jnp.int32(0), cache_valid=cache_valid,
        )
        nxt = jnp.asarray([[5], [9]], jnp.int32)
        step, _ = model.apply(
            params, nxt, position_offset=jnp.asarray(plen),
            memory=mem, memory_mask=mmask,
            cache=cache, cache_index=jnp.int32(Lp), cache_valid=cache_valid,
        )
        assert step.shape == (B, 1, V)
        seqs = [
            list(np.asarray(prompt[b, : plen[b]])) + [int(nxt[b, 0])]
            for b in range(B)
        ]
        want = self._full_forward_last_logits(model, params, seqs, mem, mmask)
        np.testing.assert_allclose(
            np.asarray(step[:, 0], np.float32), want, rtol=2e-4, atol=2e-4
        )

    def test_greedy_multistep_matches_full_forward_oracle(self, gpt2_setup):
        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = np.array([Lp, Lp - 2], np.int32)
        max_len, eos = 6, 1
        toks, _ = greedy_decode(
            model, params, prompt, jnp.asarray(plen),
            memory=mem, memory_mask=mmask, max_len=max_len,
            eos_id=eos, pad_id=0,
        )
        toks = np.asarray(toks)
        for b in range(B):
            seq = list(np.asarray(prompt[b, : plen[b]]))
            for t in range(max_len):
                logits, _ = model.apply(
                    params, jnp.asarray([seq], jnp.int32),
                    memory=mem[b : b + 1], memory_mask=mmask[b : b + 1],
                )
                nxt = int(jnp.argmax(logits[0, -1]))
                assert toks[b, t] == nxt, (
                    f"row {b} step {t}: cached={toks[b, :t+1].tolist()} "
                    f"oracle next={nxt}"
                )
                if nxt == eos:
                    break
                seq.append(nxt)

    def test_sample_multistep_matches_full_forward_oracle(self, gpt2_setup):
        """sample_decode with a fixed rng bit-matches an oracle that replays
        the identical rng splits over full-forward logits."""
        from multimodal_context_reasoning_tpu.generation.decode import (
            sample_decode,
            top_k_top_p_filter,
        )

        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = np.array([Lp, Lp - 2], np.int32)
        max_len, eos, top_k = 5, 1, 30
        toks, _ = sample_decode(
            model, params, prompt, jnp.asarray(plen),
            rng=jax.random.PRNGKey(11), memory=mem, memory_mask=mmask,
            max_len=max_len, eos_id=eos, pad_id=0, top_k=top_k,
        )
        toks = np.asarray(toks)

        def pick(rng, lg):
            lg = jnp.asarray(lg, jnp.float32)
            lg = top_k_top_p_filter(lg, top_k, 1.0)
            return np.asarray(jax.random.categorical(rng, lg, axis=-1))

        rng = jax.random.PRNGKey(11)
        seqs = [list(np.asarray(prompt[b, : plen[b]])) for b in range(B)]
        done = [False] * B
        rng, sub = jax.random.split(rng)
        cur = pick(sub, self._full_forward_last_logits(model, params, seqs, mem, mmask))
        for t in range(max_len):
            for b in range(B):
                if not done[b]:
                    assert toks[b, t] == cur[b], f"row {b} step {t}"
                    seqs[b].append(int(cur[b]))
                    if cur[b] == eos:
                        done[b] = True
            if t == max_len - 1:
                break
            rng, sub = jax.random.split(rng)
            cur = pick(sub, self._full_forward_last_logits(model, params, seqs, mem, mmask))


class _RefBeamHypotheses:
    """Numpy transcription of BeamHypotheses (v10.py:1794-1839)."""

    def __init__(self, num_beams, length_penalty):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.beams = []
        self.worst_score = 1e9

    def __len__(self):
        return len(self.beams)

    def add(self, hyp_len, sum_logprobs):
        score = sum_logprobs / (hyp_len ** self.length_penalty)
        if len(self) < self.num_beams or score > self.worst_score:
            self.beams.append(score)
            if len(self) > self.num_beams:
                srt = sorted((s, i) for i, s in enumerate(self.beams))
                del self.beams[srt[0][1]]
                self.worst_score = srt[1][0]
            else:
                self.worst_score = min(score, self.worst_score)

    def is_done(self, best_sum_logprobs, cur_len):
        if len(self) < self.num_beams:
            return False
        return self.worst_score >= best_sum_logprobs / (
            cur_len ** self.length_penalty
        )


class TestBeamScorerOracle:
    """Per-step selection equality against a transcription of
    BeamSearchScorer_constrained.process (v10.py:1892-1966): token ids,
    origin beams, boosted scores, hypothesis pool, and done flags."""

    def test_selection_matches_process_transcription(self):
        from multimodal_context_reasoning_tpu.generation.beam import (
            BeamContext,
            BeamState,
            beam_select_step,
        )

        B, K, V, Lp, steps = 2, 3, 12, 4, 4
        pad_id, eos_id = 0, 1
        N = B * K
        L_total = Lp + steps
        lp, factor = 1.0, 0.5
        prompt_len = np.array([4, 3], np.int64)

        cmask = np.zeros((B, V), bool)
        cmask[0, 7] = cmask[0, 8] = True          # constraints: batch 0 only

        ctx = BeamContext(
            p_ids=jnp.asarray(np.repeat(
                np.arange(2, 2 + Lp)[None].repeat(B, 0), K, axis=0)),
            prompt_valid=jnp.asarray(np.repeat(
                (np.arange(Lp)[None] < prompt_len[:, None]), K, axis=0
            ).astype(bool)),
            prompt_len=jnp.asarray(prompt_len),
            cmask=jnp.asarray(cmask),
            eos_id=eos_id, num_beams=K, constraint_factor=factor,
            repetition_penalty=1.0, top_k=0, length_penalty=lp,
        )
        cache = KVCache(
            jnp.zeros((1, N, L_total, 1, 1)), jnp.zeros((1, N, L_total, 1, 1))
        )
        state = BeamState(
            seqs=jnp.full((B, K, L_total), pad_id, jnp.int32),
            beam_scores=jnp.zeros((B, K), jnp.float32),
            cache=cache,
            cur_len=jnp.int32(0),
            fin_seqs=jnp.full((B, K, L_total), pad_id, jnp.int32),
            fin_scores=jnp.full((B, K), -1e9, jnp.float32),
            fin_count=jnp.zeros((B,), jnp.int32),
            done=jnp.zeros((B,), bool),
            rng=jax.random.PRNGKey(42),
            fin_lens=jnp.zeros((B, K), jnp.int32),
        )

        # ---- oracle state
        hyps = [_RefBeamHypotheses(K, lp) for _ in range(B)]
        o_scores = np.zeros((B, K), np.float64)
        o_done = [False] * B
        script = np.random.default_rng(9)

        for t in range(steps):
            logp = np.log(
                script.dirichlet(np.ones(V), size=(N,))
            ).astype(np.float32)                                  # [N, V]
            prev = state
            state = beam_select_step(state, jnp.asarray(logp), ctx)

            # --- oracle: replay the candidate draw with the same rng
            flat = (logp.astype(np.float64)
                    + o_scores.reshape(N)[:, None]).reshape(B, K * V)
            _, sub = jax.random.split(prev.rng)
            g = np.asarray(jax.random.gumbel(
                sub, (B, K * V), jnp.float32), np.float64)
            top = np.argsort(-(flat.astype(np.float32) + g.astype(np.float32)),
                             axis=1)[:, : 2 * K]
            cand_scores = np.take_along_axis(
                flat.astype(np.float32), top, axis=1)
            order = np.argsort(-cand_scores, axis=1)
            top = np.take_along_axis(top, order, axis=1)
            cand_scores = np.take_along_axis(cand_scores, order, axis=1)
            tokens = top % V
            origins = top // V

            # --- transcription of process() per batch
            sel_tok = np.zeros((B, K), np.int64)
            sel_origin = np.zeros((B, K), np.int64)
            sel_score = np.zeros((B, K), np.float64)
            for b in range(B):
                if o_done[b]:
                    continue
                cur_len = int(prompt_len[b]) + t
                beam_idx = 0
                for r in range(2 * K):
                    tok, sc, org = int(tokens[b, r]), float(cand_scores[b, r]), int(origins[b, r])
                    if tok == eos_id:
                        if r >= K:
                            continue
                        hyps[b].add(cur_len, sc)
                    else:
                        if cmask[b, tok]:
                            sc *= factor
                        sel_tok[b, beam_idx] = tok
                        sel_origin[b, beam_idx] = org
                        sel_score[b, beam_idx] = sc
                        beam_idx += 1
                    if beam_idx == K:
                        break
                assert beam_idx == K
                o_done[b] = o_done[b] or hyps[b].is_done(
                    float(cand_scores[b].max()), cur_len
                )

            # --- compare implementation vs oracle (live batches)
            got_tok = np.asarray(state.seqs)[:, :, t]
            got_scores = np.asarray(state.beam_scores)
            for b in range(B):
                if o_done[b] and np.asarray(prev.done)[b]:
                    # frozen: untouched
                    np.testing.assert_array_equal(
                        np.asarray(state.seqs)[b], np.asarray(prev.seqs)[b]
                    )
                    continue
                np.testing.assert_array_equal(got_tok[b], sel_tok[b])
                np.testing.assert_allclose(
                    got_scores[b], sel_score[b], rtol=1e-5, atol=1e-6
                )
                # origin reordering: the new prefix equals the origin beam's
                want_prefix = np.asarray(prev.seqs)[b][sel_origin[b], :t]
                np.testing.assert_array_equal(
                    np.asarray(state.seqs)[b, :, :t], want_prefix
                )
                o_scores[b] = sel_score[b]
            np.testing.assert_array_equal(np.asarray(state.done), o_done)
            # hypothesis pools: same kept scores (sorted)
            fin = np.asarray(state.fin_scores)
            for b in range(B):
                kept = sorted(s for s in fin[b] if s > -1e8)
                np.testing.assert_allclose(
                    kept, sorted(hyps[b].beams), rtol=1e-5, atol=1e-6
                )
                assert int(np.asarray(state.fin_count)[b]) >= min(
                    len(hyps[b].beams), 1
                ) or len(hyps[b].beams) == 0


class TestTopKTopPOracle:
    """Direct oracle: top_k_top_p_filter vs a literal torch transcription of
    the reference's top_k_top_p_filtering (modeling/modeling_utils.py:1046-1079)."""

    @staticmethod
    def _reference_filter(logits_np, top_k, top_p):
        import torch
        import torch.nn.functional as F

        logits = torch.tensor(logits_np.copy())
        filter_value = -float("inf")
        min_tokens_to_keep = 1
        if top_k > 0:
            top_k = min(max(top_k, min_tokens_to_keep), logits.size(-1))
            indices_to_remove = (
                logits < torch.topk(logits, top_k)[0][..., -1, None]
            )
            logits[indices_to_remove] = filter_value
        if top_p < 1.0:
            sorted_logits, sorted_indices = torch.sort(logits, descending=True)
            cumulative_probs = torch.cumsum(
                F.softmax(sorted_logits, dim=-1), dim=-1
            )
            sorted_indices_to_remove = cumulative_probs > top_p
            sorted_indices_to_remove[..., 1:] = \
                sorted_indices_to_remove[..., :-1].clone()
            sorted_indices_to_remove[..., 0] = 0
            indices_to_remove = sorted_indices_to_remove.scatter(
                1, sorted_indices, sorted_indices_to_remove
            )
            logits[indices_to_remove] = filter_value
        return logits.numpy()

    @pytest.mark.parametrize("top_k,top_p", [
        (0, 0.9), (5, 1.0), (5, 0.7), (0, 0.3), (50, 0.95), (3, 0.05),
    ])
    def test_kept_sets_and_values_match(self, top_k, top_p):
        pytest.importorskip("torch")
        from multimodal_context_reasoning_tpu.generation.decode import (
            top_k_top_p_filter,
        )

        rng = np.random.default_rng(17)
        logits = rng.normal(size=(6, 40)).astype(np.float32) * 2.0
        ref = self._reference_filter(logits, top_k, top_p)
        got = np.asarray(top_k_top_p_filter(jnp.asarray(logits), top_k, top_p))

        ref_kept = np.isfinite(ref)
        got_kept = got > -1e8          # ours masks with -1e9, not -inf
        np.testing.assert_array_equal(got_kept, ref_kept)
        np.testing.assert_allclose(
            got[got_kept], ref[ref_kept], rtol=1e-6, atol=1e-6
        )
        # at least one token survives every row (min_tokens_to_keep=1)
        assert got_kept.any(axis=-1).all()


class TestTracedSamplingKnobs:
    def test_temperature_top_p_do_not_recompile(self, gpt2_setup):
        """generate(mode='sample') traces temperature/top_p — distinct
        float values reuse ONE compiled program (only top_k is static:
        it changes the kth-logit gather's shape)."""
        from multimodal_context_reasoning_tpu.generation import api

        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.asarray([Lp, Lp - 2], jnp.int32)
        kw = dict(memory=mem, memory_mask=mmask, max_len=4, eos_id=1,
                  pad_id=0, mode="sample", top_k=20)
        t1, _ = api.generate(model, params, prompt, plen,
                             rng=jax.random.PRNGKey(0),
                             temperature=0.7, top_p=0.9, **kw)
        before = api._sample._cache_size()
        t2, _ = api.generate(model, params, prompt, plen,
                             rng=jax.random.PRNGKey(0),
                             temperature=1.3, top_p=0.6, **kw)
        assert api._sample._cache_size() == before
        assert t1.shape == t2.shape

    def test_traced_top_p_matches_static_top_p(self, gpt2_setup):
        """The filter's identity-at-1.0 formulation: a traced top_p value
        produces the same kept set as the static python-float path."""
        from multimodal_context_reasoning_tpu.generation.decode import (
            top_k_top_p_filter,
        )

        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=(4, V)), jnp.float32)
        for p in (0.3, 0.8, 1.0):
            static = top_k_top_p_filter(logits, 0, p)
            traced = jax.jit(
                lambda lg, tp: top_k_top_p_filter(lg, 0, tp)
            )(logits, jnp.float32(p))
            np.testing.assert_allclose(
                np.asarray(static), np.asarray(traced), rtol=1e-6
            )

    def test_top_p_one_compiles_without_vocab_sort(self, gpt2_setup):
        """The static use_top_p gate: at top_p=1.0 (and top_k=0) the
        compiled sampling program must contain NO sort over the vocab —
        tracing top_p (so floats don't recompile) must not force the
        per-step O(V log V) top-p filter back into the default path."""
        from multimodal_context_reasoning_tpu.generation import api

        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.asarray([Lp, Lp - 2], jnp.int32)
        kw = dict(memory=mem, memory_mask=mmask, max_len=4, eos_id=1,
                  pad_id=0, rng=jax.random.PRNGKey(0))

        def hlo(top_p, use_top_p):
            return api._sample.lower(
                model, params, prompt, plen, temperature=1.0, top_k=0,
                top_p=jnp.float32(top_p), use_top_p=use_top_p, **kw,
            ).as_text()

        # match the op, not the word: gathers carry an "indices_are_sorted"
        # attribute in every program
        assert "stablehlo.sort" not in hlo(1.0, False)
        assert "stablehlo.sort" in hlo(0.9, True)

    def test_generate_top_p_one_matches_unfiltered(self, gpt2_setup):
        """top_p=1.0 through generate() (filter elided) samples the same
        tokens as an explicit traced top_p≈1 (filter run): the gate is a
        pure optimization, not a behavior change."""
        from multimodal_context_reasoning_tpu.generation import api

        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.asarray([Lp, Lp - 2], jnp.int32)
        kw = dict(memory=mem, memory_mask=mmask, max_len=6, eos_id=1,
                  pad_id=0, mode="sample", top_k=0, temperature=0.9)
        t_off, _ = api.generate(model, params, prompt, plen,
                                rng=jax.random.PRNGKey(5), top_p=1.0, **kw)
        t_on, _ = api._sample(model, params, prompt, plen,
                              rng=jax.random.PRNGKey(5), temperature=0.9,
                              top_k=0, top_p=jnp.float32(1.0), use_top_p=True,
                              memory=mem, memory_mask=mmask, max_len=6,
                              eos_id=1, pad_id=0)
        np.testing.assert_array_equal(np.asarray(t_off), np.asarray(t_on))

    def test_generate_survives_outer_jit_with_traced_top_p(self, gpt2_setup):
        """The static use_top_p gate must not concretize a traced top_p:
        wrapping generate(mode='sample') in an outer jit with top_p as a
        jit argument worked before the gate (filter simply ran) and must
        keep working (the gate falls back to running the filter)."""
        from multimodal_context_reasoning_tpu.generation import api

        cfg, model, params, prompt, mem, mmask = gpt2_setup
        B, Lp = prompt.shape
        plen = jnp.asarray([Lp, Lp - 2], jnp.int32)

        @jax.jit
        def outer(p, tp, rng):
            return api.generate(
                model, p, prompt, plen, mode="sample", rng=rng,
                memory=mem, memory_mask=mmask, max_len=4, eos_id=1,
                pad_id=0, top_k=0, temperature=0.9, top_p=tp,
            )[0]

        toks = outer(params, jnp.float32(0.8), jax.random.PRNGKey(2))
        assert toks.shape == (B, 4)
