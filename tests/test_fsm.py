"""FSM-constrained beam search vs a numpy transcription of the reference
search loop (utils/cbs.py:54-364, use_hypo=False), plus builder wiring
checks (:631-857) and the best-beam selection rule (:366-431)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.generation.fsm import (
    FiniteStateMachineBuilder,
    fsm_beam_search,
    fsm_decode_gpt2,
    select_best_beam_with_constraints,
)

V = 16
EOS = 1


class TestBuilder:
    def test_single_word_constraint_wiring(self):
        b = FiniteStateMachineBuilder(V, max_given_constraints=3,
                                      max_words_per_constraint=3)
        fsm = b.build([[[5, 6]]])          # one constraint, wordforms {5,6}
        a = fsm.adjacency
        # bit-0-unset main states connect to their +1 partner on the word
        for s in (0, 2, 4, 6):
            assert a[s, s + 1, 5] == 1 and a[s, s + 1, 6] == 1
            assert a[s, s, 5] == 0 and a[s, s, 6] == 0
            assert a[s, s, 3] == 1                  # other words self-loop
        # satisfied states keep plain self-loops
        assert a[1, 1, 5] == 1 and a[1, 2, 5] == 0
        assert fsm.substate_end == fsm.num_main_states  # no sub-states used

    def test_multi_word_constraint_uses_substates_and_resets(self):
        b = FiniteStateMachineBuilder(V, max_given_constraints=2,
                                      max_words_per_constraint=3)
        fsm = b.build([[[3], [4]]])        # "fire hydrant"-style, ids 3 → 4
        a = fsm.adjacency
        sub = fsm.num_main_states          # first sub-state (from state 0)
        assert a[0, sub, 3] == 1 and a[0, 0, 3] == 0
        # sub-state: advance on 4, reset to 0 on anything else
        assert a[sub, 1, 4] == 1
        assert a[sub, 0, 4] == 0
        assert a[sub, 0, 7] == 1 and a[sub, sub, 7] == 0

    def test_reference_self_loop_rewrite_quirk(self):
        """cbs.py:847-851 runs unconditionally: adding constraint 2 at a
        state RESTORES the self-loops constraint 1 removed there — leaving
        a nondeterministic edge (both self-loop and constraint-1 transition
        live for constraint-1's wordforms)."""
        b = FiniteStateMachineBuilder(V, max_given_constraints=2,
                                      max_words_per_constraint=2)
        fsm = b.build([[[5]], [[7]]])
        a = fsm.adjacency
        assert a[0, 1, 5] == 1          # constraint-1 edge survives
        assert a[0, 0, 5] == 1          # ...but its self-loop is restored
        assert a[0, 2, 7] == 1 and a[0, 0, 7] == 0


def reference_search_oracle(init_logp, table, adjacency, K, max_steps,
                            eos_ids):
    """Numpy transcription of ConstrainedBeamSearch.search
    (utils/cbs.py:134-364, use_hypo=False, per_node_beam_size == K —
    selection-equivalent to a flat global top-K).  ``table[t, tok]`` is the
    scripted [V] log-prob row of the step function at timestep t."""
    B, S, _, Vv = adjacency.shape
    n_steps = max_steps - 1
    preds = np.full((B, S, K, n_steps), eos_ids[0], np.int64)
    last_lp = np.full((B, S, K), -np.inf)

    for bb in range(B):
        start = np.where(adjacency[bb, 0].astype(bool),
                         init_logp[bb][None, :], -np.inf)      # [S, V]
        for i in range(S):
            order = np.argsort(-start[i], kind="stable")[:K]
            preds[bb, i, :, 0] = order
            last_lp[bb, i] = start[i][order]

    after_end = np.full((Vv,), -np.inf)
    after_end[list(eos_ids)] = 0.0

    for t in range(1, n_steps):
        for bb in range(B):
            cleaned = np.empty((S, K, Vv))
            for s in range(S):
                for k in range(K):
                    tok = preds[bb, s, k, t - 1]
                    cleaned[s, k] = (after_end if tok in eos_ids
                                     else table[t, tok])
            new_preds = np.empty((S, K, n_steps), np.int64)
            new_lp = np.empty((S, K))
            for i in range(S):
                masked = np.where(
                    adjacency[bb, :, i, :].astype(bool)[:, None, :],
                    cleaned, -1e20)
                scores = masked + last_lp[bb][..., None]       # [S, K, V]
                flat = scores.reshape(-1)
                order = np.argsort(-flat, kind="stable")[:K]
                for slot, idx in enumerate(order):
                    src = idx // Vv
                    tok = idx % Vv
                    new_preds[i, slot] = preds[bb].reshape(S * K, n_steps)[src]
                    new_preds[i, slot, t] = tok
                    new_lp[i, slot] = flat[idx]
            preds[bb] = new_preds
            last_lp[bb] = new_lp

    out = np.concatenate(
        [preds, np.full((B, S, K, max_steps - n_steps), eos_ids[0],
                        np.int64)], axis=-1)
    return out, last_lp


class TestSearchOracle:
    def test_lattice_search_matches_reference_transcription(self):
        B, K, max_steps = 2, 3, 6
        rng = np.random.default_rng(0)
        b = FiniteStateMachineBuilder(V, max_given_constraints=2,
                                      max_words_per_constraint=2)
        fsms = [
            b.build([[[5, 6]], [[7]]]),          # two constraints
            b.build([[[3], [4]]]),               # one multi-word constraint
        ]
        adjacency = np.stack([f.adjacency for f in fsms])      # [B, S, S, V]

        # scripted step distribution: depends only on (t, last token)
        table = np.log(rng.dirichlet(np.ones(V), size=(max_steps, V)))
        init_logp = np.log(rng.dirichlet(np.ones(V), size=(B,)))

        def step_fn(tok, carry, t):
            # t may be traced (scan implementation): index a device table
            return jnp.asarray(table, jnp.float32)[t][tok], carry

        got_beams, got_lp = fsm_beam_search(
            jnp.asarray(init_logp, jnp.float32), step_fn, carry=None,
            reorder_fn=lambda c, rows: c,
            adjacency=jnp.asarray(adjacency),
            num_beams=K, max_steps=max_steps, eos_ids=(EOS,),
        )
        want_beams, want_lp = reference_search_oracle(
            init_logp, table, adjacency, K, max_steps, (EOS,))

        finite = np.isfinite(want_lp)
        np.testing.assert_allclose(
            np.asarray(got_lp)[finite], want_lp[finite], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(got_beams)[finite], want_beams[finite]
        )

    def test_beams_obey_fsm_transitions(self):
        """Every returned beam must be a valid path of its FSM ending in
        its state (nondeterminism tracked as a state set)."""
        B, K, max_steps = 1, 2, 5
        rng = np.random.default_rng(1)
        b = FiniteStateMachineBuilder(V, max_given_constraints=2,
                                      max_words_per_constraint=2)
        fsm = b.build([[[5]], [[7]]])
        adjacency = fsm.adjacency[None]
        table = np.log(rng.dirichlet(np.ones(V), size=(max_steps, V)))
        init_logp = np.log(rng.dirichlet(np.ones(V), size=(B,)))

        def step_fn(tok, carry, t):
            # t may be traced (scan implementation): index a device table
            return jnp.asarray(table, jnp.float32)[t][tok], carry

        beams, lp = fsm_beam_search(
            jnp.asarray(init_logp, jnp.float32), step_fn, None,
            lambda c, r: c, jnp.asarray(adjacency),
            num_beams=K, max_steps=max_steps, eos_ids=(EOS,),
        )
        beams, lp = np.asarray(beams), np.asarray(lp)
        S = adjacency.shape[1]
        for s in range(S):
            for k in range(K):
                # the reference returns ~-1e20 "beams" for unreachable
                # states (its docstring says to discard them) — skip those
                if lp[0, s, k] < -1e18:
                    continue
                states = {0}
                for tok in beams[0, s, k, : max_steps - 1]:
                    states = {
                        t2 for st in states for t2 in range(S)
                        if adjacency[0, st, t2, tok]
                    }
                assert s in states, f"beam of state {s} not a valid path"


class TestSelectBest:
    def test_popcount_and_length_normalization(self):
        B, S, K, T = 1, 4, 1, 4                  # 2 constraints -> 4 states
        beams = np.full((B, S, K, T), EOS, np.int32)
        beams[0, 3, 0] = [5, 7, EOS, EOS]        # satisfies both, len 3
        beams[0, 1, 0] = [5, EOS, EOS, EOS]      # satisfies one
        lp = np.full((B, S, K), -np.inf, np.float32)
        lp[0, 3, 0] = -6.0
        lp[0, 1, 0] = -1.0
        best, best_lp = select_best_beam_with_constraints(
            jnp.asarray(beams), jnp.asarray(lp),
            jnp.asarray([2]), min_constraints_to_satisfy=2, eos_ids=(EOS,),
        )
        # only state 3 (popcount 2) is eligible despite state 1's better lp
        np.testing.assert_array_equal(np.asarray(best)[0], beams[0, 3, 0])
        np.testing.assert_allclose(float(best_lp[0]), -6.0 / 3.0, rtol=1e-6)

    def test_min_constraints_capped_by_given(self):
        B, S, K, T = 1, 4, 1, 3
        beams = np.full((B, S, K, T), EOS, np.int32)
        beams[0, 1, 0] = [5, EOS, EOS]
        lp = np.full((B, S, K), -np.inf, np.float32)
        lp[0, 1, 0] = -2.0
        best, best_lp = select_best_beam_with_constraints(
            jnp.asarray(beams), jnp.asarray(lp),
            jnp.asarray([1]), min_constraints_to_satisfy=2, eos_ids=(EOS,),
        )
        np.testing.assert_array_equal(np.asarray(best)[0], beams[0, 1, 0])


class TestGPT2Wrapper:
    def test_decode_shapes_and_path_validity(self):
        from multimodal_context_reasoning_tpu.core.config import GPT2Config
        from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder

        cfg = GPT2Config(
            vocab_size=V, n_positions=64, n_embd=16, n_layer=1, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            add_cross_attention=False, pad_token_id=0,
        )
        model = GPT2Decoder(cfg)
        rng = np.random.default_rng(0)
        B, Lp, K, max_steps = 1, 3, 2, 5
        prompt = jnp.asarray(rng.integers(2, V, size=(B, Lp)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), prompt)

        b = FiniteStateMachineBuilder(V, max_given_constraints=2,
                                      max_words_per_constraint=2)
        fsm = b.build([[[5]], [[7]]])
        adjacency = jnp.asarray(fsm.adjacency[None])

        beams, lp = fsm_decode_gpt2(
            model, params, prompt, jnp.asarray([Lp]), adjacency,
            num_beams=K, max_steps=max_steps, eos_ids=(EOS,),
        )
        S = fsm.adjacency.shape[0]
        assert beams.shape == (B, S, K, max_steps)
        assert lp.shape == (B, S, K)
        beams, lp = np.asarray(beams), np.asarray(lp)
        # each real beam is a valid FSM path ending in its state
        # (unreachable states carry ~-1e20 junk scores, as in the reference)
        for s in range(S):
            if lp[0, s, 0] < -1e18:
                continue
            states = {0}
            for tok in beams[0, s, 0, : max_steps - 1]:
                states = {
                    t2 for st in states for t2 in range(S)
                    if fsm.adjacency[st, t2, tok]
                }
            assert s in states


class TestGenerateCbsDispatch:
    def test_generate_mode_cbs_matches_manual_pipeline(self):
        """generate(mode='cbs') == fsm_decode_gpt2 + select_best (the
        reference's use_cbs branch, modeling_bert.py:1018-1034), returned
        in the generate() (tokens [B, max_len], lengths [B]) contract."""
        from multimodal_context_reasoning_tpu.core.config import GPT2Config
        from multimodal_context_reasoning_tpu.generation.api import generate
        from multimodal_context_reasoning_tpu.generation.fsm import (
            select_best_beam_with_constraints,
        )
        from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder

        cfg = GPT2Config(
            vocab_size=V, n_positions=64, n_embd=16, n_layer=1, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            add_cross_attention=False, pad_token_id=0,
        )
        model = GPT2Decoder(cfg)
        rng = np.random.default_rng(1)
        B, Lp, K, max_steps = 1, 3, 2, 5
        prompt = jnp.asarray(rng.integers(2, V, size=(B, Lp)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), prompt)

        b = FiniteStateMachineBuilder(V, max_given_constraints=2,
                                      max_words_per_constraint=2)
        fsm = b.build([[[5]], [[7]]])
        adjacency = jnp.asarray(fsm.adjacency[None])
        n_constraints = jnp.asarray([2], jnp.int32)

        tokens, lengths = generate(
            model, params, prompt, jnp.asarray([Lp]),
            mode="cbs", fsm_adjacency=adjacency,
            num_constraints=n_constraints, min_constraints_to_satisfy=1,
            num_beams=K, max_len=max_steps, eos_id=EOS,
        )
        assert tokens.shape == (B, max_steps)
        assert lengths.shape == (B,)

        beams, lp = fsm_decode_gpt2(
            model, params, prompt, jnp.asarray([Lp]), adjacency,
            num_beams=K, max_steps=max_steps, eos_ids=(EOS,),
        )
        best, _ = select_best_beam_with_constraints(
            beams, lp, n_constraints, 1, (EOS,)
        )
        np.testing.assert_array_equal(np.asarray(tokens), np.asarray(best))

    def test_generate_mode_cbs_requires_lattice_and_counts(self):
        import pytest as _pytest

        from multimodal_context_reasoning_tpu.core.config import GPT2Config
        from multimodal_context_reasoning_tpu.generation.api import generate
        from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder

        cfg = GPT2Config(
            vocab_size=V, n_positions=64, n_embd=16, n_layer=1, n_head=2,
            add_cross_attention=False,
        )
        model = GPT2Decoder(cfg)
        prompt = jnp.ones((1, 3), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), prompt)
        with _pytest.raises(ValueError, match="fsm_adjacency"):
            generate(model, params, prompt, jnp.asarray([3]), mode="cbs")


class TestScanUnrolledIdentity:
    """The lax.scan implementation must be token-identical to the
    straight-line unrolled loop (same body, same tie-breaking)."""

    def _run(self, implementation):
        B, K, max_steps = 2, 5, 12
        rng = np.random.default_rng(7)
        b = FiniteStateMachineBuilder(V, max_given_constraints=3,
                                      max_words_per_constraint=2)
        fsms = [
            b.build([[[5, 6]], [[7]], [[3], [4]]]),   # S = 8 main states
            b.build([[[9]], [[2], [8]]]),
        ]
        adjacency = np.stack([f.adjacency for f in fsms])
        table = np.log(rng.dirichlet(np.ones(V), size=(max_steps, V)))
        init_logp = np.log(rng.dirichlet(np.ones(V), size=(B,)))
        S = adjacency.shape[1]
        N = B * S * K

        def step_fn(tok, carry, t):
            # carry: a per-row tag that reorder_fn must track correctly
            return jnp.asarray(table, jnp.float32)[t][tok], carry + 1

        def reorder_fn(carry, rows):
            return carry[rows]

        carry0 = jnp.arange(N, dtype=jnp.int32) * 100
        beams, lp = fsm_beam_search(
            jnp.asarray(init_logp, jnp.float32), step_fn, carry0,
            reorder_fn, jnp.asarray(adjacency),
            num_beams=K, max_steps=max_steps, eos_ids=(EOS,),
            implementation=implementation,
        )
        return np.asarray(beams), np.asarray(lp)

    def test_token_identical(self):
        b_scan, lp_scan = self._run("scan")
        b_unroll, lp_unroll = self._run("unrolled")
        np.testing.assert_array_equal(b_scan, b_unroll)
        np.testing.assert_allclose(lp_scan, lp_unroll, rtol=0, atol=0)

    def test_unknown_implementation_raises(self):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            self._run("nope")
