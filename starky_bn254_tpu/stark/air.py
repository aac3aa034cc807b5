"""AIR interface: the contract between a constraint system and the prover.

Replaces the reference's `starky::stark::Stark` trait surface
(`eval_packed_generic`, `eval_ext_circuit`, `constraint_degree`,
`permutation_pairs` — e.g. reference src/fields/fq/exp.rs:288-554) with an
array-first equivalent: one polymorphic `eval` runs for both prover and
verifier, and the trace is produced as a whole [rows, cols] array.
"""

from __future__ import annotations

from .consumer import ConstraintConsumer
from .field_expr import PublicInputsView, RowView


class Air:
    """Subclass and provide: num_columns, num_public_inputs, eval()."""

    num_columns: int
    num_public_inputs: int
    constraint_degree: int = 3

    def permutation_pairs(self) -> list[tuple[int, int]]:
        """Pairs (a, b) of columns whose values must be equal as multisets
        (the reference's `PermutationPair::singletons`, used by the
        lookup-based range checks — src/utils/range_check.rs:96-113)."""
        return []

    def eval(
        self,
        lv: RowView,
        nv: RowView,
        pi: PublicInputsView,
        cc: ConstraintConsumer,
    ) -> None:
        raise NotImplementedError
