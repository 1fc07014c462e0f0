"""Merkle path gadget over the Sinsemilla layer hash.

Reference: halo2_gadgets/src/sinsemilla/merkle.rs (MerkleInstructions /
MerklePath: 32-deep Orchard tree, per-layer cond-swap + MerkleCRH) and
merkle/chip.rs.

Layer hash here is MerkleCRH(l, left, right) =
  extract_x(SinsemillaHashToPoint(Q(domain), [l(1 word), left(26 words),
  right(26 words)])) — the piece packing is simplified versus Orchard's
  (a=250/b=20/c=250 bit split, merkle/chip.rs:160-320); tracked in
  PARITY.md (the packing changes the hash value, not soundness).
"""
from __future__ import annotations

from dataclasses import dataclass

from ...fields.host import FP
from ...circuit.value import Value
from ..utilities import i2lebsp
from ..utilities.cond_swap import CondSwapChip
from .chip import SinsemillaChip
from .primitive import HashDomain, K

WORDS_PER_ELEM = 26  # ceil(255 / 10)


@dataclass
class MerkleChip:
    sinsemilla: SinsemillaChip
    cond_swap: CondSwapChip
    domain: HashDomain

    def hash_layer(self, layouter, l: int, left_cell, right_cell):
        """MerkleCRH of one layer; returns the parent AssignedCell (the
        x-coordinate of the hash point). Both children are constrained
        equal to the witnessed message pieces."""
        chip = self.sinsemilla
        pl = chip.witness_message_piece(layouter, Value.known(l), 1)
        pleft = chip.witness_message_piece(layouter, left_cell.value,
                                           WORDS_PER_ELEM)
        self._constrain_piece(layouter, pleft, left_cell)
        pright = chip.witness_message_piece(layouter, right_cell.value,
                                            WORDS_PER_ELEM)
        self._constrain_piece(layouter, pright, right_cell)
        point, _ = chip.hash_to_point(layouter, self.domain.Q,
                                      [pl, pleft, pright])
        return point.x

    def _constrain_piece(self, layouter, piece, cell):
        def region_fn(region):
            region.constrain_equal(piece.cell.cell, cell.cell)
        layouter.assign_region("constrain piece copy", region_fn)

    def compute_root(self, layouter, leaf_cell, path: list[Value],
                     pos_bits: list[Value]):
        """Walk the path from the leaf: at layer i, swap (node, sibling)
        by pos bit, then hash (merkle.rs MerklePath::calculate_root)."""
        node = leaf_cell
        for i, (sibling, bit) in enumerate(zip(path, pos_bits)):
            a_sw, b_sw = self.cond_swap.swap(layouter,
                                             (node, sibling), bit)
            node = self.hash_layer(layouter, i, a_sw, b_sw)
        return node


def merkle_crh_host(domain: HashDomain, l: int, left: int, right: int) -> int:
    """Host reference of the simplified layer hash."""
    bits = (i2lebsp(l, K) + i2lebsp(left, K * WORDS_PER_ELEM)
            + i2lebsp(right, K * WORDS_PER_ELEM))
    return domain.hash(bits)
