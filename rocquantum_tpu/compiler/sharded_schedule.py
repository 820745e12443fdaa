"""Qubit-locality scheduling for sharded execution.

XLA's SPMD partitioner handles gates on device-selecting (global) qubits by
ALL-GATHERING the state (measured: 3-6 all-gathers per such gate) —
correct, but catastrophic at scale (P x memory). The scalable strategy is
the reference's (MULTI_GPU_GUIDE.md:58-59, there mandatory and manual):
relabel index bits so the gate's qubits are local, apply locally, and track
the logical->physical permutation. An index-bit swap is one constrained
transpose, which XLA lowers to the minimal ICI all-to-all (verified).

:func:`schedule_for_sharding` rewrites an op list, inserting SWAP_BITS
pseudo-ops (executed as sv.swap_index_bits) so every gate touches only
local physical bits. The permutation is threaded through the Circuit so
measurements/expectations address physical bits transparently.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .ir import GateOp

SWAP_BITS = "SWAP_BITS"  # pseudo-op: exchange two physical index bits


def _is_plain_swap(op: GateOp) -> bool:
    return (op.name == "SWAP" and not op.controls and op.matrix is None)


def elide_swaps(ops: Sequence[GateOp], layout: Sequence[int]
                ) -> Tuple[List[GateOp], List[int]]:
    """Turn SWAP gates into layout relabels (zero data movement — SWAP is
    self-adjoint so the is_adjoint flag is irrelevant) and map all other
    ops' qubits through the evolving logical->physical layout. Used by
    single-device circuits; the sharded scheduler does the same inline,
    where it also makes cross-device SWAPs free."""
    layout = list(layout)
    out: List[GateOp] = []
    for op in ops:
        if _is_plain_swap(op):
            a, b = op.targets
            layout[a], layout[b] = layout[b], layout[a]
            continue
        out.append(GateOp(op.name,
                          tuple(layout[t] for t in op.targets),
                          tuple(layout[c] for c in op.controls),
                          op.params, op.matrix, op.is_adjoint))
    return out, layout


def schedule_for_sharding(ops: Sequence[GateOp], n: int, n_global: int,
                          initial_layout: Sequence[int] = None
                          ) -> Tuple[List[GateOp], List[int]]:
    """Return (physical ops incl. SWAP_BITS, final layout).

    ``layout[logical] = physical index bit``. Gates whose logical qubits sit
    on global physical bits get those qubits swapped into the local region
    first, evicting the local occupant whose next use is farthest away
    (Belady-style) to minimize future swaps.
    """
    n_local = n - n_global
    if n_local <= 0:
        raise ValueError("mesh has no local qubits")
    layout = list(initial_layout) if initial_layout is not None \
        else list(range(n))
    if sorted(layout) != list(range(n)):
        raise ValueError("initial_layout must be a permutation")

    from .passes import is_diagonal

    # next-use table for the eviction heuristic (diagonal ops apply at any
    # layout, so they neither demand locality nor protect a bit from
    # eviction)
    next_use = {q: [] for q in range(n)}
    for step, op in enumerate(ops):
        if is_diagonal(op):
            continue
        for q in list(op.targets) + list(op.controls):
            next_use[q].append(step)

    out: List[GateOp] = []
    use_ptr = {q: 0 for q in range(n)}

    def next_use_of(q, step):
        uses = next_use[q]
        i = use_ptr[q]
        while i < len(uses) and uses[i] < step:
            i += 1
        return uses[i] if i < len(uses) else float("inf")

    for step, op in enumerate(ops):
        if _is_plain_swap(op):
            # SWAP = relabel: free, even across the device boundary (the
            # alternative is a full all-to-all)
            a, b = op.targets
            layout[a], layout[b] = layout[b], layout[a]
            for q in (a, b):
                use_ptr[q] += 1
            continue
        support = set(op.targets) | set(op.controls)
        if is_diagonal(op):
            # diagonal gates are elementwise in the computational basis:
            # a global qubit's bit value is constant per device, so the
            # phase multiply needs NO relabeling and NO communication —
            # emit on current physical bits (the reference relabeled every
            # non-local gate, MULTI_GPU_GUIDE.md:58-59; QAOA cost layers
            # and QFT phase cascades are comm-free here)
            out.append(GateOp(op.name,
                              tuple(layout[t] for t in op.targets),
                              tuple(layout[c] for c in op.controls),
                              op.params, op.matrix, op.is_adjoint))
            continue
        if len(support) > n_local:
            raise ValueError(
                f"gate support {sorted(support)} exceeds the local region "
                f"({n_local} qubits)")
        for q in sorted(support):
            if layout[q] < n_local:
                continue
            # find eviction victim: local-bit owner not in this op's
            # support with the farthest next use
            phys_owner = {layout[l]: l for l in range(n)}
            candidates = [(next_use_of(phys_owner[p], step), p)
                          for p in range(n_local)
                          if phys_owner[p] not in support]
            _, victim_phys = max(candidates)
            victim_logical = phys_owner[victim_phys]
            out.append(GateOp(SWAP_BITS, (layout[q], victim_phys)))
            layout[q], layout[victim_logical] = victim_phys, layout[q]
        # emit the gate on physical bits
        out.append(GateOp(op.name,
                          tuple(layout[t] for t in op.targets),
                          tuple(layout[c] for c in op.controls),
                          op.params, op.matrix, op.is_adjoint))
        for q in support:
            use_ptr[q] += 1

    return out, layout


def unpermute_ops(layout: Sequence[int]) -> List[GateOp]:
    """SWAP_BITS sequence restoring the identity layout (for full
    statevector readback in logical order)."""
    layout = list(layout)
    out = []
    for logical in range(len(layout)):
        phys = layout[logical]
        if phys == logical:
            continue
        # swap bits so that logical sits at position logical
        other = layout.index(logical)
        out.append(GateOp(SWAP_BITS, (phys, logical)))
        layout[logical], layout[other] = logical, phys
    return out
