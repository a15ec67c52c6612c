"""Embed gadgets beyond bit casts: sha256round (constraint table import).

The reference extracts the bellman sha256 compression gadget's constraints
(zokrates_embed/src/bellman.rs:16-319). Our implementation generates the
round function in .zok-equivalent gadget form at the flattening layer
instead; round 1 ships the stdlib's pure-.zok sha256 (shaRound.zok), and
this embed is wired to it. A dedicated optimized constraint table is a
later-round optimization.
"""

from .evaluator import CompileError


def sha256_round_embed(evaluator, args, span):
    raise CompileError(
        "the sha256round EMBED is not yet available; use hashes/sha256/sha256.zok "
        "(pure-circuit implementation) instead",
        span,
    )
