"""Workaround for a Ray Data 2.49 hash-shuffle schema-broadcast race.

``HashShufflingOperatorBase._do_add_input_inner`` marks a sequence's
schemas as broadcast after submitting the FIRST block's shuffle task
(hash_shuffle.py:548,589) — but ``_shuffle_block`` returns early for a
zero-row block (hash_shuffle.py:224-225) WITHOUT fanning the
schema-carrying empty shards out to the aggregators.  If the first block
a join sequence contributes is empty (aggregate outputs and parallel
parquet reads of small inputs routinely contain empty blocks), every
partition that then receives no non-empty shard finalizes as a
ZERO-COLUMN table, and Acero raises ``No match or multiple matches for
key field reference FieldRef.Name(...) on right side of the join``.

The fix un-marks the broadcast flag when the bundle that consumed it was
headed by an empty block, so the next bundle headed by a non-empty block
performs the (idempotent) broadcast.  Applied idempotently at package
import; guarded so a future Ray that restructures the operator is left
untouched.
"""

from __future__ import annotations


def apply() -> None:
    try:
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )
    except Exception:  # pragma: no cover - future Ray restructure
        return
    if getattr(HashShufflingOperatorBase, "_msray_broadcast_fix", False):
        return
    if not hasattr(HashShufflingOperatorBase, "_do_add_input_inner"):
        return  # pragma: no cover - future Ray restructure

    orig = HashShufflingOperatorBase._do_add_input_inner

    def _reordered(bundle):
        """A bundle with a known-non-empty block first (hash
        partitioning is block-order independent, so this is safe),
        or None if no reorder is needed/possible."""
        try:
            blocks = list(bundle.blocks)
            if not blocks or blocks[0][1].num_rows != 0:
                return None
            lead = [b for b in blocks if b[1].num_rows != 0]
            if not lead:
                return None
            rest = [b for b in blocks if b[1].num_rows == 0]
            from ray.data._internal.execution.interfaces.ref_bundle import (
                RefBundle,
            )

            return RefBundle(
                tuple(lead + rest),
                schema=bundle.schema,
                owns_blocks=bundle.owns_blocks,
                output_split_idx=bundle.output_split_idx,
            )
        except Exception:  # pragma: no cover - future Ray restructure
            return None

    def _do_add_input_inner(self, input_bundle, input_index):
        try:
            pre = bool(self._has_schemas_broadcasted[input_index])
        except Exception:  # pragma: no cover - unexpected shape
            pre = True
        import os as _os

        if _os.environ.get("MSRAY_RAYFIX_DEBUG"):
            print(
                f"[rayfix] op={type(self).__name__} seq={input_index} "
                f"pre={pre} rows={[m.num_rows for m in input_bundle.metadata]}",
                flush=True,
            )
        if not pre:
            # the broadcast rides the FIRST submitted block; make sure
            # that block is non-empty whenever the bundle has one
            fixed = _reordered(input_bundle)
            if fixed is not None:
                input_bundle = fixed
        orig(self, input_bundle, input_index)
        if pre:
            return
        try:
            md = list(input_bundle.metadata or [])
            # an all-empty bundle wasted the broadcast (its shuffle task
            # returns before fanning out schema shards) — un-mark so the
            # next bundle with rows performs it
            if md and md[0].num_rows == 0:
                self._has_schemas_broadcasted[input_index] = False
        except Exception:  # pragma: no cover - unexpected shape
            pass

    HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner
    HashShufflingOperatorBase._msray_broadcast_fix = True
