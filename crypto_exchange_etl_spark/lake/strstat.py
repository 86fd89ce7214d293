"""Shared string-bound successor for manifest statistics.

ONE implementation of the ordering-critical "smallest string greater
than every extension of this prefix" kernel, used by BOTH sides of the
stats contract: the write side's truncated upper bounds
(:meth:`LakeTable._stat_upper`) and the read side's prefix-range pruning
(`batch_source._prefix_upper`). The two must stay bit-identical or
pruning desynchronizes from the manifest encoding — keep the logic here
only.
"""

from __future__ import annotations


def prefix_successor(prefix: str) -> str | None:
    """Smallest string s with s > every string starting with ``prefix``
    (codepoint-order successor: bump the last bumpable codepoint, drop
    the tail). None when no successor exists (all U+10FFFF) — then
    nothing can prune."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return None
