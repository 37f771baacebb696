"""Rationale-generation engine.

Capability parity with the reference's generation surface (SURVEY.md §2.3
#18-19, #22): greedy KV-cached decode (chunkalign_v10.py:1463-1493),
constrained beam sampling (beam_sample loop :2194-2320 +
BeamSearchScorer_constrained score boost :1943-1944), attention-derived
lexical-constraint extraction (:2107-2133), and FSM-constrained beam search
over a state lattice (utils/cbs.py:30-365 + FiniteStateMachineBuilder
:631-857) — all reformulated as fixed-shape jitted loops (lax.scan /
lax.while_loop / traced lattice steps) instead of per-example Python.
"""

from multimodal_context_reasoning_tpu.generation.decode import (  # noqa: F401
    greedy_decode,
)
from multimodal_context_reasoning_tpu.generation.beam import (  # noqa: F401
    constrained_beam_sample,
)
from multimodal_context_reasoning_tpu.generation.box_constraints import (  # noqa: F401
    ClassHierarchy,
    ConstraintBoxesReader,
    ConstraintFilter,
    boxes_to_constraint_ids,
    load_wordforms,
    tokenize_constraints,
)
from multimodal_context_reasoning_tpu.generation.constraints import (  # noqa: F401
    extract_constraints,
)
from multimodal_context_reasoning_tpu.generation.fsm import (  # noqa: F401
    FiniteStateMachineBuilder,
    fsm_beam_search,
    fsm_decode_gpt2,
    select_best_beam_with_constraints,
)
