"""Shared crash-safe sync driver for the persisted index family.

Every index (DedupIndex, VectorIndex, SemDedupIndex) follows a
CDC-maintained source with the same loop: read the cursor, apply
``changes(last, cur)``, write the cursor. The applies are idempotent
keyed merges, so replaying the SAME feed always converges — but the
feed is an ENDPOINT diff: if a sync crashes after (part of) its state
commit and the source row then REVERTS before the retry, the row nets
out of ``changes(last, cur')`` entirely and no feed replay can ever
heal the half-applied state. The committed-but-uncursored window has
the same shape even for single-commit indexes, and the full-rebuild
path too (a rebuild at ``cur`` that crashes before the cursor write
replays old changes onto newer state).

The fix is one durable marker around the WHOLE mutation window:
``<cursor>.pending`` is created before any state mutation and removed
only after the cursor write. A sync that finds the marker cannot trust
endpoint feeds at all — it takes the full rebuild, which is
self-contained, always convergent, and clears the marker on the way
out. Crashes are rare; one corpus pass per crash is the honest price.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable


def run_guarded_sync(
    cursor_path: str,
    current_version: int,
    build_fn: Callable[[], None],
    apply_fn: Callable[[int, int], None],
    force_rebuild: bool = False,
) -> int:
    """One sync round. ``build_fn`` fully rebuilds from the source;
    ``apply_fn(last, cur)`` applies the change feed (raising
    FileNotFoundError to request a rebuild, e.g. retention lapse)."""
    pending = cursor_path + ".pending"
    was_pending = os.path.exists(pending)
    last = None
    if os.path.exists(cursor_path):
        with open(cursor_path) as f:
            last = json.load(f)["version"]
    if last == current_version and not was_pending and not force_rebuild:
        return current_version
    # mark the mutation window OPEN before touching any state —
    # including the rebuild path (a rebuild that crashes before the
    # cursor write must not let the next sync feed-apply on top of it)
    with open(pending, "w") as f:
        f.write("")
    if last is None or was_pending or force_rebuild:
        build_fn()
    else:
        try:
            apply_fn(last, current_version)
        except FileNotFoundError:
            build_fn()
    tmp = f"{cursor_path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"version": current_version}, f)
    os.replace(tmp, cursor_path)
    os.remove(pending)
    return current_version
