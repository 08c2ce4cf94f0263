"""Index replication: master -> replica incremental file sync + snapshots.

Reference semantics (solr/core/src/java/org/apache/solr/handler/):
- ReplicationHandler exposes CMD_INDEX_VERSION (latest commit generation)
  and CMD_GET_FILE_LIST (name/size/checksum per file of that commit).
- IndexFetcher.fetchLatestIndex (IndexFetcher.java:277-535) pulls the
  master's file list, downloads ONLY files that are missing or differ
  (compareFile, IndexFetcher.java:890: length first, checksum optional),
  stages them, installs, and finally removes files the master no longer
  has. The commit file is the LAST thing made visible, so a crashed pull
  leaves the replica at its previous consistent generation.
- SnapShooter.createSnapshot (SnapShooter.java:165) hard-links the
  current commit's files into a snapshot dir — cheap because index
  files are write-once.

This analog replicates an index DIRECTORY (docs/postings/term_stats/
corpus_stats/deletes parquet + _manifest JSON) across any filesystem the
driver can reach. All data files in this engine are write-once (builder
stages and compaction replace files by rename, never in place), so:
- size-only comparison is a safe fast path (same name+size => same
  content, like Lucene segment files); `checksum=True` upgrades to
  sha256 for paranoid verification;
- snapshot hard links can never observe in-place mutation.

Crash safety mirrors the reference: data files are copied through a
temp name + atomic os.replace, `_manifest/*.json` is synced LAST (the
segments_N analog — a reader of the replica flips generations only once
manifests land), and stale files are deleted only after the manifests
are installed. Re-running after a crash at any point converges
(idempotent by comparison).

At scale: replication is driver/ops-side metadata work — the file list
is O(files) and the copies are raw byte streams; nothing here touches a
Spark job or the corpus row count.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

MANIFEST_DIR = "_manifest"


def _sha256(path: str, bufsize: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(bufsize)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def index_version(index_dir: str) -> tuple[int, str]:
    """CMD_INDEX_VERSION analog: (latest generation, fingerprint) from the
    stage manifests. Generation 0 / empty fingerprint if no manifests."""
    mdir = os.path.join(index_dir, MANIFEST_DIR)
    gen, fp = 0, ""
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(mdir, name)) as f:
                    m = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            g = int(m.get("generation", 0))
            if g > gen:
                gen, fp = g, str(m.get("fingerprint", ""))
    return gen, fp


def file_list(index_dir: str, checksum: bool = False) -> list[dict]:
    """CMD_GET_FILE_LIST analog: every file under the index dir with
    relative path + size (+ sha256 when checksum=True). Manifests are
    listed last so callers that iterate in order install them last."""
    data, manifests = [], []
    for root, _dirs, files in os.walk(index_dir):
        for name in sorted(files):
            full = os.path.join(root, name)
            rel = os.path.relpath(full, index_dir)
            entry = {"name": rel, "size": os.path.getsize(full)}
            if checksum:
                entry["sha256"] = _sha256(full)
            (manifests if rel.startswith(MANIFEST_DIR + os.sep) else data).append(entry)
    return data + manifests


def _differs(src: str, dst: str, entry: dict, checksum: bool) -> bool:
    """compareFile (IndexFetcher.java:890): missing or length-mismatch
    always re-fetches; equal length passes unless checksum mode."""
    if not os.path.exists(dst):
        return True
    if os.path.getsize(dst) != entry["size"]:
        return True
    if checksum:
        return _sha256(dst) != entry.get("sha256", _sha256(src))
    return False


def replicate_index(master_dir: str, replica_dir: str, checksum: bool = False) -> dict:
    """fetchLatestIndex analog: bring replica_dir up to master_dir's
    current generation, copying only missing/changed files. Returns
    {'generation', 'files_copied', 'bytes_copied', 'files_skipped',
    'files_deleted'}. Safe to re-run after a crash at any point."""
    if not os.path.isdir(master_dir):
        raise FileNotFoundError(f"master index dir missing: {master_dir}")
    files = file_list(master_dir, checksum=checksum)
    os.makedirs(replica_dir, exist_ok=True)
    copied = skipped = bytes_copied = 0
    # file_list orders manifests last => the generation flip is the final
    # visible write, exactly like segments_N in the reference
    for entry in files:
        src = os.path.join(master_dir, entry["name"])
        dst = os.path.join(replica_dir, entry["name"])
        if _differs(src, dst, entry, checksum):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            tmp = dst + ".__fetch"
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)  # atomic install per file
            copied += 1
            bytes_copied += entry["size"]
        else:
            skipped += 1
    # delete replica files the master no longer has (old generations) —
    # only AFTER the new manifests are in place (IndexFetcher deletes
    # stale files post-install)
    keep = {e["name"] for e in files}
    deleted = 0
    for root, _dirs, names in os.walk(replica_dir, topdown=False):
        for name in names:
            full = os.path.join(root, name)
            rel = os.path.relpath(full, replica_dir)
            if rel not in keep or name.endswith(".__fetch"):
                os.remove(full)
                deleted += 1
        if not os.listdir(root) and os.path.abspath(root) != os.path.abspath(replica_dir):
            os.rmdir(root)
    gen, _fp = index_version(replica_dir)
    return {
        "generation": gen,
        "files_copied": copied,
        "bytes_copied": bytes_copied,
        "files_skipped": skipped,
        "files_deleted": deleted,
    }


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """SnapShooter.createSnapshot analog: hard-link (fall back to copy)
    every file of the current generation into snap_dir. Index files are
    write-once (replaced by rename, never mutated), so shared inodes can
    never observe later master changes — the snapshot is point-in-time."""
    if os.path.exists(snap_dir) and os.listdir(snap_dir):
        raise FileExistsError(f"snapshot dir not empty: {snap_dir}")
    files = file_list(index_dir)
    linked = copied = 0
    for entry in files:
        src = os.path.join(index_dir, entry["name"])
        dst = os.path.join(snap_dir, entry["name"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
            linked += 1
        except OSError:
            shutil.copyfile(src, dst)
            copied += 1
    gen, fp = index_version(snap_dir)
    return {"generation": gen, "fingerprint": fp, "linked": linked, "copied": copied}
