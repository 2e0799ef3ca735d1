"""One-slot release registries for session-lifetime resources.

Several operators materialize a resource whose lifetime outlives the call
that created it — a cached bucket DataFrame (``operators.simsearch``), a
cached contaminated-key table (``curation``), a Bloom-filter broadcast
(``operators.dedup``). Spark releases none of these automatically, and a
long-lived session calling the operator repeatedly would accumulate them
until executor storage evicts (or the driver OOMs, for broadcasts).

The policy, shared by every site via this class: hold at most the LATEST
resource — registering a new one releases the previous — so accumulation
is bounded at one slot per operator while the most recent lazy plan can
still be consumed. Callers wanting eager cleanup after consuming a result
call the operator module's ``release_*`` function.
"""

from __future__ import annotations

from typing import Any, Callable


class OneSlotCache:
    """At most one live resource; ``put`` releases the previous occupant."""

    def __init__(self, release: Callable[[Any], None]) -> None:
        self._release_fn = release
        self._slot: list = []

    def put(self, item: Any) -> Any:
        """Release the previous occupant, hold ``item``, return it."""
        self.release()
        self._slot.append(item)
        return item

    def release(self) -> None:
        """Release the held resource (if any); never raises."""
        while self._slot:
            try:
                self._release_fn(self._slot.pop())
            except Exception:
                pass

    def peek(self) -> Any:
        """The held resource, or None (introspection/tests)."""
        return self._slot[0] if self._slot else None

    def __len__(self) -> int:
        return len(self._slot)
