"""GOP / coding-structure computation: I, P and hierarchical B frames.

Reproduces the reference's frame graph (reference: coolchic/enc/utils/
codingstructure.py:237-567): intra_period inter frames per GOP, p_period
sets the furthest P prediction (1 = low-delay P, = intra_period = random
access), hierarchical B frames in between.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional

FRAME_TYPES = ("I", "P", "B")


@dataclass
class Frame:
    """One frame in the coding structure
    (reference: codingstructure.py:70-127)."""

    coding_order: int
    display_order: int
    depth: int = 0
    index_references: List[int] = field(default_factory=list)
    seq_name: str = ""
    frame_type: str = field(init=False)

    def __post_init__(self):
        assert len(self.index_references) <= 2
        self.frame_type = ("I", "P", "B")[len(self.index_references)]


@dataclass
class CodingStructure:
    """Frame graph of one GOP (reference: codingstructure.py:237-379)."""

    intra_period: int
    p_period: int = 0
    seq_name: str = ""
    frames: List[Frame] = field(init=False)

    def __post_init__(self):
        self.frames = self.compute_gop(self.intra_period, self.p_period)

    def get_frame_depth_in_gop(self, idx_frame: int) -> int:
        """Depth of display index ``idx_frame`` within one chained GOP
        (reference: codingstructure.py:534-567): 0 = intra, 1 = P, >= 2 = B
        by bisection level."""
        assert idx_frame <= self.p_period
        assert math.log2(self.p_period) % 1 == 0, (
            f"p_period should be a power of 2, found {self.p_period}"
        )
        if idx_frame == 0:
            return 0
        depth = int(math.log2(self.p_period) + 1)
        for i in range(int(math.log2(self.p_period)), 0, -1):
            if idx_frame % 2**i == 0:
                depth = int(math.log2(self.p_period) - i + 1)
                break
        return depth

    def compute_gop(self, intra_period: int, p_period: int) -> List[Frame]:
        frames = [
            Frame(coding_order=0, display_order=0, index_references=[],
                  seq_name=self.seq_name)
        ]
        if intra_period == 0 and p_period == 0:
            return frames

        assert intra_period % p_period == 0, (
            f"Intra period must be divisible by P period. Found "
            f"intra_period = {intra_period}; p_period = {p_period}."
        )
        n_chained_gop = intra_period // p_period

        for index_chained_gop in range(n_chained_gop):
            for index_frame_in_gop in range(1, p_period + 1):
                display_order = index_frame_in_gop + index_chained_gop * p_period
                depth = self.get_frame_depth_in_gop(index_frame_in_gop)
                delta_time_ref = p_period // 2 ** (depth - 1)

                if index_frame_in_gop == p_period:  # P-frame
                    refs = [display_order - delta_time_ref]
                else:  # B-frame
                    refs = [
                        display_order - delta_time_ref,
                        display_order + delta_time_ref,
                    ]

                if depth != 0:
                    coding_order_in_gop = depth + sum(
                        2 ** (x - 2) - 1 for x in range(3, depth)
                    )
                    coding_order_in_gop += (index_frame_in_gop - delta_time_ref) // (
                        2 * delta_time_ref
                    )
                else:
                    coding_order_in_gop = 0
                coding_order = index_chained_gop * p_period + coding_order_in_gop

                frames.append(
                    Frame(
                        coding_order=coding_order,
                        display_order=display_order,
                        index_references=refs,
                        depth=depth,
                        seq_name=self.seq_name,
                    )
                )
        return frames

    # ----- Queries (reference: codingstructure.py:416-530)
    def get_number_of_frames(self) -> int:
        return len(self.frames)

    def get_max_depth(self) -> int:
        return max(f.depth for f in self.frames)

    def get_frame_from_coding_order(self, coding_order: int) -> Optional[Frame]:
        for f in self.frames:
            if f.coding_order == coding_order:
                return f
        return None

    def get_frame_from_display_order(self, display_order: int) -> Optional[Frame]:
        for f in self.frames:
            if f.display_order == display_order:
                return f
        return None


def lmbda_from_depth(depth: int, initial_lmbda: float) -> float:
    """QP-offset style rate weight per GOP depth: lambda * 1.5^depth
    (reference: enc/component/video.py:509-524)."""
    return initial_lmbda * (1.5**depth)
