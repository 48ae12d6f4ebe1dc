"""Archive sink: export every pot's latest snapshot into a tar.gz bundle
(reference Zip, server.go:550-614 — used for OPA bundle serving,
docs/howto_opa.md:137-143).

Like the reference, the bundle covers the WHOLE store (not one path),
skips the archive destination itself and all lock/manifest internals,
and lays each pot out as `<path>/data.json` holding the key->doc map —
i.e. the bundle is byte-compatible with what the reference would have
stored natively. Unlike the reference (which re-archives inline on every
mutation when -zip is set), export here is an explicit driver-side
utility; at scale an inline full-store tar per write is the wrong plan.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import time

from pot_spark.kv.store import PotStore


def zip_store(store: PotStore, dest_dir: str = "archive") -> str:
    """Write `<root>/<dest_dir>/bundle.tar.gz` containing
    `<path>/data.json` for every pot (including a root-level pot, which
    the reference also archives — Zip has no /data.json suffix filter,
    only the dest-dir and .potlock skips, server.go:569-576)."""
    paths = store.list_paths()
    # list_paths can't see a root pot (reference parity); Zip must include it
    if store.get(""):
        paths = [""] + paths
    out_dir = os.path.join(store.root, dest_dir)
    os.makedirs(out_dir, exist_ok=True)
    bundle = os.path.join(out_dir, "bundle.tar.gz")
    # write-temp-then-rename: a bundle consumer (OPA polls this path)
    # must never see a truncated archive from a crashed or in-flight zip.
    # The staging name is unique PER CALL (not just per process): the
    # HTTP shim's ThreadingHTTPServer can run two post-write zip
    # triggers concurrently in one pid, and a shared staging path would
    # interleave their tar bytes before the rename
    import uuid

    staging = bundle + f".staging-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    mtime = time.time()
    # per-call-unique staging names mean a CRASHED zip leaves its file
    # behind forever; reclaim stale leftovers (well past any plausible
    # in-flight write) before starting this one
    for leftover in os.listdir(out_dir):
        if ".staging-" not in leftover:
            continue
        full = os.path.join(out_dir, leftover)
        try:
            if mtime - os.path.getmtime(full) > 3600:
                os.unlink(full)
        except OSError:
            pass  # concurrent zip finished/cleaned it — not ours to fight
    try:
        with tarfile.open(staging, "w:gz") as tar:
            for p in paths:
                if p == dest_dir or p.startswith(dest_dir + "/"):
                    continue  # never archive the archive (server.go:569-572)
                content = store.get(p)
                payload = json.dumps(content, sort_keys=True).encode()
                name = f"{p}/data.json" if p else "data.json"
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                info.mtime = int(mtime)
                tar.addfile(info, io.BytesIO(payload))
        os.replace(staging, bundle)  # atomic publish
    except BaseException:
        try:
            os.unlink(staging)
        except OSError:
            pass
        raise
    return bundle
