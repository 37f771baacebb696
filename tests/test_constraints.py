"""Box-driven constraint front-end for FSM-CBS.

Covers generation/box_constraints.py against hand-computed fixtures and
transcribed reference semantics (utils/cbs.py:435-630):

- wordforms / detection-TSV readers (round-trip through temp files);
- ClassHierarchy heights + the first-pre-order-substring-match lookup;
- ConstraintFilter: blacklist, zero-score padding, hierarchy NMS (the
  reference's keep-condition is an identity reordering — asserted as the
  observable contract), top-k by confidence, REPLACEMENTS, dedup;
- the full pipeline in one test: detections → ConstraintFilter →
  tokenize_constraints → FiniteStateMachineBuilder → fsm_beam_search →
  select_best_beam_with_constraints.
"""

import json

import numpy as np
import pytest

from multimodal_context_reasoning_tpu.generation.box_constraints import (
    ClassHierarchy,
    ConstraintBoxesReader,
    ConstraintFilter,
    boxes_to_constraint_ids,
    load_wordforms,
    tokenize_constraints,
)

# A miniature Open-Images-style hierarchy:
#   entity (h=3)
#   ├── animal (h=2) ── carnivore (h=1) ── dog (h=0)
#   │                 └── cat (h=0)
#   └── food (h=1) ── sandwich (h=0)
HIERARCHY = {
    "LabelName": "entity",
    "Subcategory": [
        {"LabelName": "animal", "Subcategory": [
            {"LabelName": "carnivore", "Subcategory": [
                {"LabelName": "dog"},
            ]},
            {"LabelName": "cat"},
        ]},
        {"LabelName": "food", "Subcategory": [
            {"LabelName": "sandwich"},
        ]},
    ],
}


@pytest.fixture(scope="module")
def hierarchy():
    return ClassHierarchy(HIERARCHY)


class TestHierarchy:
    def test_heights(self, hierarchy):
        assert hierarchy.height("dog") == 0
        assert hierarchy.height("cat") == 0
        assert hierarchy.height("carnivore") == 1
        assert hierarchy.height("animal") == 2
        assert hierarchy.height("sandwich") == 0
        assert hierarchy.height("food") == 1

    def test_first_preorder_substring_match(self, hierarchy):
        # "cat food" matches 'animal'? no — the predicate is
        # node-label ⊂ class-name, first match in PRE-ORDER: 'cat' (under
        # animal/carnivore? no: cat is animal's child, pre-order visits
        # entity, animal, carnivore, dog, cat, food, sandwich) — 'cat' at
        # height 0 precedes 'food'.
        assert hierarchy.height("cat food") == 0
        # 'dogsled' contains 'dog' → dog's height, matched before 'food'
        assert hierarchy.height("dogsled") == 0
        # unknown class with no node-label substring → IndexError like the
        # reference's findall(...)[0]
        with pytest.raises(IndexError):
            hierarchy.height("spaceship")

    def test_root_matches_via_substring(self, hierarchy):
        assert hierarchy.height("entity x") == 3


class TestConstraintFilter:
    def test_blacklist_padding_topk_replacements(self, hierarchy):
        f = ConstraintFilter(hierarchy, 0.85, 3)
        boxes = np.array([
            [0, 0, 10, 10],     # dog
            [100, 100, 110, 110],   # cat
            [200, 200, 210, 210],   # sandwich
            [300, 300, 310, 310],   # salt and pepper shakers → REPLACEMENT
            [0, 0, 10, 10],     # person → BLACKLIST
            [0, 0, 0, 0],       # zero-score padding
        ], float)
        names = ["dog", "cat", "sandwich", "cat food", "person", "dog"]
        scores = np.array([0.9, 0.8, 0.7, 0.95, 0.99, 0.0])
        out = f(boxes, names, scores)
        # person blacklisted, padding dropped; top-3 of remaining by score:
        # cat food (0.95), dog (0.9), cat (0.8)
        assert out == ["cat food", "dog", "cat"]

    def test_replacements_and_dedup(self, hierarchy):
        f = ConstraintFilter(hierarchy, 0.85, 3)
        boxes = np.array([[0, 0, 10, 10]] * 3, float)
        # two names that REPLACE to the same string → dedup to one
        names = ["dog", "dog", "cat"]
        scores = np.array([0.9, 0.8, 0.7])
        out = f(boxes, names, scores)
        assert out == ["dog", "cat"]

    def test_hierarchy_nms_is_identity_reordering(self, hierarchy):
        """The reference's keep-condition (cbs.py:616-619) can never fire:
        score_order is height-ascending so every later box satisfies
        heights[other] >= heights[current].  Perfectly-overlapping boxes
        with coarser classes are therefore KEPT — the transcribed contract."""
        f = ConstraintFilter(hierarchy, 0.85, 3)
        boxes = np.array([[0, 0, 10, 10]] * 3, float)   # identical → IoU=1
        names = ["dog", "carnivore", "animal"]
        scores = np.array([0.5, 0.6, 0.7])
        keep = f._nms(boxes, names)
        assert sorted(keep) == [0, 1, 2]         # nothing suppressed
        assert keep == [0, 1, 2]                 # height-ascending order
        out = f(boxes, names, scores)
        assert out == ["animal", "carnivore", "dog"]   # top-k by score

    def test_empty_input(self, hierarchy):
        f = ConstraintFilter(hierarchy, 0.85, 3)
        assert f(np.zeros((0, 4)), [], np.zeros((0,))) == []


class TestReaders:
    def test_load_wordforms(self, tmp_path):
        p = tmp_path / "wf.tsv"
        p.write_text("dog\tdog,dogs\nbus\tbus,buses,busses\n")
        wf = load_wordforms(str(p))
        assert wf == {"dog": ["dog", "dogs"],
                      "bus": ["bus", "buses", "busses"]}

    def test_boxes_reader(self, tmp_path):
        p = tmp_path / "boxes.tsv"
        rows = [
            ("img1", [{"rect": [0, 0, 5, 5], "class": "Dog", "conf": 0.9},
                      {"rect": [1, 1, 6, 6], "class": "Cat", "conf": 0.8}]),
        ]
        p.write_text("\n".join(
            f"{k}\t{json.dumps(v)}" for k, v in rows) + "\n")
        r = ConstraintBoxesReader(str(p))
        assert len(r) == 1
        got = r["img1"]
        assert got["class_names"] == ["dog", "cat"]     # lowercased
        np.testing.assert_array_equal(got["boxes"][0], [0, 0, 5, 5])
        # missing key → empty annotation, not KeyError (cbs.py:462-468)
        empty = r["nope"]
        assert empty["class_names"] == [] and empty["boxes"].size == 0


class TestTokenize:
    def test_expansion_and_caps(self):
        vocab = {"dog": 7, "dogs": 8, "fire": 3, "hydrant": 4, "fi": 5,
                 "re": 6, "a": 1, "b": 2}
        conv = lambda toks: [vocab[t] for t in toks]
        ids = tokenize_constraints(
            ["dog", "fire hydrant"], conv,
            constraint2tokens={"fire": ["fi", "re"]},
            wordforms={"dog": ["dog", "dogs"]},
            max_words_per_constraint=2,
        )
        # "dog" → [[7, 8]] ; "fire hydrant" → words [fi, re, hydrant]
        # capped at 2 → [[5], [6]]
        assert ids == [[[7, 8]], [[5], [6]]]


class TestBoxesToDecode:
    def test_full_pipeline_boxes_to_constrained_decode(self, hierarchy):
        """detections → filter → tokenize → FSM → lattice search →
        constraint-aware best-beam selection, in one pass (the reference's
        cbs.py pipeline end to end)."""
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.generation.fsm import (
            FiniteStateMachineBuilder,
            fsm_beam_search,
            select_best_beam_with_constraints,
        )

        V, EOS = 12, 0
        vocab = {"dog": 3, "dogs": 4, "cat": 5}
        conv = lambda toks: [vocab[t] for t in toks]

        boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30],
                          [5, 5, 15, 15]], float)
        names = ["dog", "cat", "person"]          # person → blacklist
        scores = np.array([0.9, 0.8, 0.99])
        f = ConstraintFilter(hierarchy, 0.85, 3)
        sel, ids = boxes_to_constraint_ids(
            boxes, names, scores, f, conv,
            wordforms={"dog": ["dog", "dogs"]},
        )
        assert sel == ["dog", "cat"]
        assert ids == [[[3, 4]], [[5]]]

        builder = FiniteStateMachineBuilder(V, 3, 3)
        fsm = builder.build(ids)
        adjacency = jnp.asarray(fsm.adjacency[None])    # [1, S, S, V]

        # toy LM: uniform except EOS slightly likelier late
        logp = np.full((V,), np.log(1.0 / V), np.float32)
        init_logp = jnp.asarray(logp[None])

        def step_fn(tok, carry, t):
            return jnp.broadcast_to(
                jnp.asarray(logp), (tok.shape[0], V)), carry

        beams, lps = fsm_beam_search(
            init_logp, step_fn, None, lambda c, r: c, adjacency,
            num_beams=2, max_steps=6, eos_ids=(EOS,),
        )
        assert beams.shape == (1, builder.num_total_states, 2, 6)

        best, best_lp = select_best_beam_with_constraints(
            beams, lps, jnp.asarray([len(sel)]), 2, (EOS,),
        )
        toks = set(np.asarray(best[0]).tolist())
        # satisfying both constraints ⇒ the beam used a dog wordform AND cat
        assert 5 in toks and (3 in toks or 4 in toks)
        assert np.isfinite(float(best_lp[0]))
