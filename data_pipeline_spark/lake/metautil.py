"""Pure-JSON lake-table metadata helpers, isolated in a tiny module.

Why a separate module: the streaming change-feed source (lake/cdf_stream.py)
must serialize BY VALUE for Spark's data-source plan worker (which inherits
no --py-files path), and ``cloudpickle.register_pickle_by_value`` works at
module granularity. Keeping these helpers — the only table code the reader
needs — in their own dependency-free module means by-value registration
covers exactly (cdf_stream, metautil), while lake/table.py keeps normal
by-reference pickling for everything else in the session (a by-value
LakeTable would inflate unrelated task payloads and break
``isinstance``/``except`` checks against by-reference imports).

No SparkSession, no package imports: everything here runs in a Spark-less
Python worker.
"""

from __future__ import annotations

import json
import os

# System columns persisted in data files but outside the logical schema
# (see lake/table.py for the full contract; defined here so the Spark-less
# reader shares the one definition).
LSN_COL = "__lsn"
DELETED_COL = "__deleted"


def load_table_meta(path: str) -> dict:
    """Current table metadata document, from version-hint."""
    hint = os.path.join(path, "metadata", "version-hint.text")
    with open(hint, encoding="utf-8") as f:
        version = int(f.read().strip())
    with open(
        os.path.join(path, "metadata", f"v{version}.metadata.json"),
        encoding="utf-8",
    ) as f:
        return json.load(f)


def main_lineage(meta: dict) -> list[dict]:
    """Main's snapshot chain, oldest first. The snapshot log interleaves
    branch-staged (write-audit-publish) commits; anything that means "the
    table's history" — time travel, the streaming change feed, rollback
    targets — must walk parent ids from the current snapshot, never scan
    the log. The chain ends where history was expired."""
    by_id = {s["snapshot_id"]: s for s in meta["snapshots"]}
    chain = []
    sid = meta.get("current_snapshot_id")
    while sid is not None and sid in by_id:
        chain.append(by_id[sid])
        sid = by_id[sid].get("parent_id")
    chain.reverse()
    return chain


def manifest_files(path: str, snap: dict | None, load_segment=None) -> list[dict]:
    """A snapshot's data-file list — the single home of the manifest format
    dispatch (inline ``files`` / flat list / format-2 segment list).
    ``load_segment`` lets LakeTable plug its cross-snapshot segment cache;
    the default reads segments from disk."""
    if snap is None:
        return []
    if "files" in snap:
        return snap["files"]
    with open(os.path.join(path, snap["manifest"]), encoding="utf-8") as f:
        doc = json.load(f)
    if not isinstance(doc, dict):
        return doc
    if load_segment is None:
        def load_segment(rel):
            with open(os.path.join(path, rel), encoding="utf-8") as f:
                return json.load(f)
    files: list[dict] = []
    for seg in doc["segments"]:
        files.extend(load_segment(seg["path"]))
    return files
