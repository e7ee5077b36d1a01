"""Epoch-id allocation shared by the persistent indexes.

The streaming indexers (streaming/indexing.py) commit micro-batch ids
offset by ``STREAM_EPOCH_BASE = 1_000_000_000`` into the same per-index
epoch ledgers that batch callers use. A batch-side auto-assigned epoch
(``epoch=None``) must therefore NEVER be derived from the global max of
committed epochs: once a stream has fed the index, ``max()+1`` lands
INSIDE the stream's id space, and the stream's next micro-batch is then
silently skipped as "already committed" — data loss the exactly-once
ledger itself causes. Auto epochs allocate strictly below the stream
space; explicit epochs are the caller's responsibility.
"""

from __future__ import annotations

from collections.abc import Iterable

#: must equal streaming/indexing.py::STREAM_EPOCH_BASE (pinned by test).
AUTO_EPOCH_CEILING = 1_000_000_000


def next_auto_epoch(committed: Iterable[int]) -> int:
    """Next batch-side epoch id: max of committed ids BELOW the streaming
    space, plus one."""
    return max((e for e in committed if e < AUTO_EPOCH_CEILING), default=-1) + 1
