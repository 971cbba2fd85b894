"""Shared commit protocol for the persistent indexes (text, IVF, IVF-PQ).

docs/INDEXES.md documents the three indexes as ONE design; this module is
that design as code, so the implementations cannot drift (they did exist
as per-module copies through round 7 — a rebuild-ordering bug fixed in
text_index had no force propagating to ann_index, and vice versa):

- **Atomic meta commit** (write_meta): `_index_meta.json` is each index's
  single commit pointer — written tmp + os.replace so a crash can never
  leave a torn file, and every multi-directory state change (rebuild,
  compaction) becomes visible in exactly one rename.
- **Active-directory indirection** (active_dir): the meta carries the
  ACTIVE data-directory name (``postings_dir`` / ``codes_dir`` /
  ``cents_dir``); compaction and rebuild write into a fresh VERSIONED
  staging directory (staging_dir) and flip the pointer with one meta
  replace — before the swap the old layout is live, after it the new one;
  stale dirs are garbage reclaimed post-commit (reclaiming BEFORE the
  commit is the bug class this module exists to prevent).
- **Batch ledger + folded set** (resolve_batch / append_precheck /
  drop_replaced_batch / compact_commit): appends land under their own
  ``batch=<name>`` partitions with dynamic partition overwrite and a
  batch-keyed row-count ledger, which makes a foreachBatch replay
  idempotent (same name → same directories rewritten, same ledger entry
  overwritten); compaction folds batches into ``base`` and moves their
  names to the ``folded`` set, and a replay of a folded batch is skipped
  outright — exactly-once across compactions.
"""

from __future__ import annotations

import json
import os
import re
import shutil

META_FILE = "_index_meta.json"
_BATCH_RE = re.compile(r"[A-Za-z0-9_.\-]+")


def write_meta(index_dir: str, meta: dict) -> None:
    """Atomic (tmp + os.replace): the meta is the index's commit pointer —
    rebuild/compaction swap whole directory layouts by swapping this file."""
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, META_FILE))


def read_meta(index_dir: str, kind: str) -> dict:
    """Load + kind-check the meta. ``kind`` mismatches fail loudly —
    probing an LSH dir as IVF would otherwise read garbage layouts."""
    path = os.path.join(index_dir, META_FILE)
    if not os.path.exists(path):
        raise ValueError(f"{index_dir} is not a built index ({META_FILE} missing)")
    with open(path) as f:
        meta = json.load(f)
    if meta.get("kind") != kind:
        raise ValueError(
            f"index at {index_dir} is kind={meta.get('kind')!r}, expected {kind!r}"
        )
    return meta


def active_dir(index_dir: str, meta: dict, key: str, default: str) -> str:
    """The ACTIVE data directory for ``key`` (e.g. 'postings_dir') — always
    resolved through the meta pointer so a compacted/rebuilt index reads
    its new layout the moment the meta commit lands."""
    return os.path.join(index_dir, meta.get(key, default))


def resolve_batch(mode: str, batch: str | None) -> str:
    """Default + validate the batch name: 'base' on build, a unique name on
    append (callers like the streaming writers pass their own
    '{stream_id}-{batch_id}' to get replay idempotence). The name becomes a
    partition DIRECTORY name, hence the charset check."""
    if batch is None:
        batch = "base" if mode != "append" else f"append-{os.urandom(6).hex()}"
    if _BATCH_RE.fullmatch(batch) is None:
        raise ValueError(
            f"batch name {batch!r} must be [A-Za-z0-9_.-]+ (it becomes a "
            "partition directory name)"
        )
    return batch


def append_precheck(meta: dict, batch: str) -> bool:
    """Gate an append batch against the ledger: 'base' is never a legal
    append target (it is the built/compacted corpus), and a batch already
    FOLDED by compaction is a replay of data the index holds — return
    False, the caller must skip it (that is what keeps foreachBatch
    exactly-once ACROSS compactions)."""
    if batch == "base":
        raise ValueError(
            "append may not target the 'base' batch (the built/compacted "
            "corpus) — pick another batch name"
        )
    return batch not in meta.get("folded", [])


def drop_replaced_batch(data_dir: str, batch: str) -> None:
    """Full-replacement semantics for a same-name re-append: remove the
    batch's old partition directories first, so partitions absent from the
    new data don't keep stale rows (dynamic partition overwrite alone only
    rewrites partitions the new data touches)."""
    shutil.rmtree(os.path.join(data_dir, f"batch={batch}"), ignore_errors=True)


def staging_dir(index_dir: str, base: str, version: int) -> tuple[str, str]:
    """(name, path) of the fresh versioned staging directory for a
    compaction/rebuild — any half-written remains of a CRASHED earlier
    attempt at this version are removed first (they were never committed;
    the meta still points at the old layout)."""
    name = f"{base}_v{version}"
    path = os.path.join(index_dir, name)
    shutil.rmtree(path, ignore_errors=True)
    return name, path


def compact_commit(
    index_dir: str, meta: dict, dir_key: str, default_dir: str, new_name: str,
    version: int,
) -> str:
    """THE compaction commit: fold every append batch into 'base' in the
    ledger, move their names to the folded set, flip the active-dir
    pointer to ``new_name``, bump the version — all in ONE atomic meta
    replace. Returns the OLD active dir for post-commit reclaim (callers
    rmtree it AFTER this returns; before the commit it is still live)."""
    old = active_dir(index_dir, meta, dir_key, default_dir)
    total = sum(int(v) for v in meta["batches"].values())
    meta["folded"] = sorted(
        set(meta.get("folded", [])) | {b for b in meta["batches"] if b != "base"}
    )
    meta[dir_key] = new_name
    meta["version"] = version
    meta["batches"] = {"base": total}
    write_meta(index_dir, meta)
    return old


def describe_index(index_dir: str) -> dict:
    """Operational summary of any persistent index — kind-agnostic (the
    one meta reader that does NOT kind-check): commit pointer state,
    active data directories with file/byte counts, the batch ledger, and
    the model parameters the meta carries. Pure driver-side filesystem
    walk (no Spark jobs) so it is safe to call against a live index."""
    path = os.path.join(index_dir, META_FILE)
    if not os.path.exists(path):
        raise ValueError(f"{index_dir} is not a built index ({META_FILE} missing)")
    with open(path) as f:
        meta = json.load(f)

    def _dir_stats(name: str) -> dict:
        p = os.path.join(index_dir, name)
        n_files = n_bytes = 0
        for root, _dirs, files in os.walk(p):
            for fn in files:
                n_files += 1
                try:
                    n_bytes += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
        return {"dir": name, "files": n_files, "bytes": n_bytes}

    dir_keys = [k for k in meta if k.endswith("_dir")]
    data_dirs = {k: _dir_stats(meta[k]) for k in dir_keys}
    # fixed-name layouts (no meta pointer): LSH buckets, IVF cells, the
    # text index's derived lexicon/stats — count whatever exists and
    # isn't already covered by a pointer above
    pointed = {meta[k] for k in dir_keys}
    for fixed in ("buckets", "cells", "centroids", "lexicon", "stats", "postings"):
        if fixed not in pointed and os.path.isdir(os.path.join(index_dir, fixed)):
            data_dirs[fixed] = _dir_stats(fixed)
    batches = meta.get("batches", {})
    out = {
        "kind": meta.get("kind"),
        "version": meta.get("version", 0),
        "data_dirs": data_dirs,
        "n_batches": len(batches),
        # the ledger counts whatever the index ingests: documents for a
        # text index, vectors for lsh/ivf/ivfpq — hence the kind-neutral
        # name (the CLI labels it per kind)
        "n_rows": sum(int(v) for v in batches.values()) if batches else None,
        "folded": len(meta.get("folded", [])),
    }
    # model parameters: everything scalar the meta carries, minus the
    # bookkeeping keys above (codebooks/centroid blobs summarized by size)
    skip = {"kind", "version", "batches", "folded"} | set(dir_keys)
    params = {}
    for k, v in meta.items():
        if k in skip:
            continue
        params[k] = f"<{len(v)} entries>" if isinstance(v, (list, dict)) else v
    out["params"] = params
    return out
