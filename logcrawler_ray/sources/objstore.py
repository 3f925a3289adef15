"""ObjectStore — the ImageStore table layout on an OBJECT STORE.

Same duck-type interface as :class:`..sources.store.ImageStore` (the
pipelines only ever call the shared surface: ``is_done / partitions /
rows / append_* / external_tmp / commit_external / commit_delete_view* /
read_* / merge_insert / rewrite_partition / scratch_dir /
drop_partition``), but written
against fsspec so ``root`` can be ``s3://bucket/prefix``,
``gs://…``, ``memory://…`` (protocol tests), or ``file://…`` — the
multi-node story the local backend's ``shared_fs`` contract only
documents (SCALE.md §6a; reference pushes artifacts to MinIO,
patch_exporter/main.py:117-145).

Object stores have NO atomic rename, so the commit protocol differs from
the local backend's tmp-dir ``os.replace``:

- Data objects are IMMUTABLE, written once under
  ``data/<pid>/stage-<uuid>/*.parquet`` and never moved.
- A manifest PUT is the ONLY commit point (single-object PUT is atomic /
  last-writer-wins on S3/GCS/ABS): ``_manifests/<pid>.json`` lists the
  exact root-relative keys of the partition's fragments. Readers resolve
  files through the manifest ONLY — a crashed writer leaves unreferenced
  garbage objects that are invisible to every reader and reclaimable by
  :meth:`gc`.
- Upsert (:meth:`merge_insert`) is METADATA-ONLY for untouched
  fragments: the new manifest re-references their existing keys (the
  local backend must hard-link; here zero bytes move).

Nothing in this module calls rename/move — guarded by a raising-FS test
(tests/test_objstore.py).
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from .store import ImageStore, SnapshotStoreMixin, write_fragment


def _merge_one_fragment(fs_or_url, frag_key: str, dst_key: str, key: str,
                        upd_keys, compression: str,
                        storage_options: dict | None = None):
    """One fragment of :meth:`ObjectStore.merge_insert` — runs serially on
    the driver or fanned out as a ``ray.remote`` task (per-fragment GET
    latency is highest exactly on remote stores, so the wide upsert must
    not be O(fragments) serial round trips).

    ``storage_options`` rebuilds the driver's exact filesystem (endpoint,
    credentials) when only the URL ships to the task (ADVICE r4).
    Key-column scan first; an untouched fragment is re-referenced AS-IS
    (metadata-only). Returns ``(live_key | None, rows)``."""
    import pyarrow.compute as pc

    if isinstance(fs_or_url, str):
        import fsspec

        fs, _ = fsspec.core.url_to_fs(fs_or_url, **(storage_options or {}))
    else:
        fs = fs_or_url
    with fs.open(frag_key, "rb") as fh:
        keys_only = pq.read_table(fh, columns=[key])
    hit = pc.sum(pc.is_in(keys_only[key], value_set=upd_keys)).as_py() or 0
    if hit == 0:
        return frag_key, keys_only.num_rows
    with fs.open(frag_key, "rb") as fh:
        frag = pq.read_table(fh)
    kept = frag.filter(pc.invert(pc.is_in(frag[key], value_set=upd_keys)))
    if not kept.num_rows:
        return None, 0
    proto = fs.protocol if isinstance(fs.protocol, str) else fs.protocol[0]
    url = dst_key if proto in ("file", "local") else f"{proto}://{dst_key}"
    write_fragment(kept, url, compression=compression,
                   storage_options=storage_options)
    return dst_key, kept.num_rows


def open_store(root: str, compression: str = "none", **kw):
    """Factory: fsspec URL -> :class:`ObjectStore`; plain path (or
    ``file://``) -> the local :class:`ImageStore` fast path."""
    if "://" in root and not root.startswith("file://"):
        return ObjectStore(root, compression=compression, **kw)
    if root.startswith("file://"):
        root = root[len("file://"):]
    return ImageStore(root, compression=compression, **kw)


class ObjectStore(SnapshotStoreMixin):
    """Partitioned table store on an fsspec filesystem with manifest-last
    atomic commits (no renames — see module docstring)."""

    def __init__(self, root_url: str, compression: str = "none", fs=None,
                 shared_fs: bool = True, retries: int = 4,
                 storage_options: dict | None = None):
        import fsspec

        if not shared_fs:
            raise ValueError("an object store is shared by definition; "
                             "shared_fs=False is contradictory here")
        self.retries = retries
        # fsspec connection kwargs (endpoint_url, key/secret, ...) — kept on
        # the store and SHIPPED TO EVERY TASK-SIDE url_to_fs so workers
        # rebuild the driver's exact filesystem, not a default one (ADVICE
        # r4: a MinIO-style custom endpoint must not misroute task writes).
        self.storage_options = dict(storage_options or {})
        if fs is None:
            fs, root = fsspec.core.url_to_fs(root_url, **self.storage_options)
        else:
            root = fs._strip_protocol(root_url)
        self.fs = fs
        self.root = root_url.rstrip("/")
        self._rootp = root.rstrip("/")
        self.compression = compression
        self.shared_fs = True  # an object store is shared by definition
        proto = fs.protocol if isinstance(fs.protocol, str) else fs.protocol[0]
        self._proto = proto
        try:
            fs.makedirs(self._key("_manifests"), exist_ok=True)
        except Exception:
            pass  # pure object stores have no directories

    def _retry(self, fn, *a, **kw):
        """Transient-fault retry for METADATA round trips (S3 503s,
        connection resets) with bounded exponential backoff — the commit
        point must not die on one flaky request. ``FileNotFoundError`` is
        SEMANTIC (missing manifest = not committed) and never retried.
        Data-plane reads/writes go through pyarrow/fsspec, whose real
        backends (s3fs/gcsfs) carry their own retry policies."""
        for attempt in range(self.retries):
            try:
                return fn(*a, **kw)
            except (FileNotFoundError, PermissionError, IsADirectoryError,
                    NotADirectoryError):
                raise  # semantic / permanent — retrying only multiplies it
            except OSError:
                time.sleep(min(0.05 * (2 ** attempt), 2.0))
        return fn(*a, **kw)

    # -- key/url helpers -----------------------------------------------------
    def _key(self, *parts: str) -> str:
        return posixpath.join(self._rootp, *parts)

    def _url(self, key: str) -> str:
        """fsspec URL for a root-relative or absolute key (what remote
        TASKS use to re-open the same filesystem)."""
        if self._proto in ("file", "local"):
            return key  # plain path: task-side writes stay on the os fast path
        return f"{self._proto}://{key}"

    def _manifest_key(self, pid: str) -> str:
        return self._key("_manifests", f"{pid}.json")

    def _stage_key(self, pid: str) -> str:
        return self._key("data", pid, f"stage-{uuid.uuid4().hex}")

    def _new_stage(self, pid: str) -> str:
        """Fresh immutable staging prefix; directory pre-created only on
        directory-ful filesystems (pure object stores need none)."""
        stage = self._stage_key(pid)
        if self._proto in ("file", "local"):
            self.fs.makedirs(stage, exist_ok=True)
        return stage

    def _pafs(self):
        """pyarrow FileSystem view of self.fs (for ray.data / pq readers)."""
        from pyarrow.fs import FSSpecHandler, PyFileSystem

        if self._proto in ("file", "local"):
            from pyarrow.fs import LocalFileSystem

            return LocalFileSystem()
        return PyFileSystem(FSSpecHandler(self.fs))

    # -- commit protocol -----------------------------------------------------
    def is_done(self, pid: str) -> bool:
        return self._retry(self.fs.exists, self._manifest_key(pid))

    def partitions(self) -> list[str]:
        try:
            names = self._retry(self.fs.ls, self._key("_manifests"), detail=False)
        except FileNotFoundError:
            return []
        return sorted(
            posixpath.basename(k)[: -len(".json")]
            for k in names if k.endswith(".json"))

    def manifest(self, pid: str) -> dict:
        if (m := self._cached_manifest(pid)) is not None:
            return m
        return json.loads(self._retry(self.fs.cat_file, self._manifest_key(pid)))

    def rows(self, pid: str | None = None) -> int:
        if pid is not None:
            return self.manifest(pid)["rows"]
        return sum(m["rows"] for m in self._live_manifests().values())

    def _put_manifest(self, pid: str, manifest: dict) -> None:
        """THE commit point: one atomic object PUT, nothing else.

        Single-object PUT is atomic on real object stores (S3/GCS/ABS);
        a plain filesystem mounted via ``fs`` has NO atomic in-place
        write, so there we fall back to the local protocol's
        tmp+fsync+os.replace (rename is fine on a filesystem — the
        rename-free contract is for stores that lack one)."""
        # overwriting a partition that shadows others must keep shadowing
        # them (single inheritance chokepoint — every commit path PUTs
        # here): the pid's shadow set (view base + supersedes) only grows
        # until the pid is dropped
        if "supersedes" not in manifest and self.is_done(pid):
            base = (manifest.get("view") or {}).get("base")
            old = [p for p in self._shadow_from(self.manifest(pid))
                   if p != base]
            if old:
                manifest = {**manifest, "supersedes": old}
        payload = json.dumps(manifest).encode()
        if self._proto in ("file", "local"):
            import os

            dst = self._manifest_key(pid)
            tmp = dst + f".tmp.{uuid.uuid4().hex}"
            with open(tmp, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, dst)
            return
        self._retry(self.fs.pipe_file, self._manifest_key(pid), payload)

    def _footer_rows(self, keys: list[str]) -> int:
        pafs = self._pafs()
        total = 0
        for k in keys:
            with pafs.open_input_file(k) as f:
                total += pq.read_metadata(f).num_rows
        return total

    # -- writers --------------------------------------------------------------
    def append_table(self, pid: str, table: pa.Table, meta: dict | None = None,
                     supersedes: list[str] | None = None) -> None:
        stage = self._new_stage(pid)
        key = posixpath.join(stage, "part-0.parquet")
        write_fragment(table, self._url(key), compression=self.compression,
                       storage_options=self.storage_options)
        manifest = {"rows": table.num_rows, "files": [key], "meta": meta or {}}
        if supersedes is not None:  # explicit [] = clear (skip inheritance)
            manifest["supersedes"] = supersedes
        self._put_manifest(pid, manifest)

    def append_dataset(self, pid: str, ds, meta: dict | None = None) -> int:
        stage = self._new_stage(pid)
        if self._proto in ("file", "local"):
            ds.write_parquet(stage, compression=self.compression)
        else:
            ds.write_parquet(stage, filesystem=self._pafs(),
                             compression=self.compression)
        keys = self._stage_files(stage)
        rows = self._footer_rows(keys)
        self._put_manifest(pid, {"rows": rows, "files": sorted(keys),
                                 "meta": meta or {}})
        return rows

    def _stage_files(self, stage: str) -> list[str]:
        """Parquet keys under a staging prefix. An empty stage is a VALID
        zero-row commit (pure object stores have no directory object to
        even list), not an error."""
        try:
            return sorted(k for k in self._retry(self.fs.ls, stage, detail=False)
                          if k.endswith(".parquet"))
        except FileNotFoundError:
            return []

    def compact_partition(self, pid: str, target_rows: int = 100_000) -> int:
        """Merge small fragments into ~``target_rows``-row objects (same
        contract as ImageStore.compact_partition: content-identical, safe
        under live views, driver memory bounded by one output file).
        Commits manifest-last; old objects become gc-able garbage."""
        m = self.manifest(pid)
        if m.get("view"):
            raise ValueError("compact the BASE partition; views have no "
                             "fragments of their own")
        pafs = self._pafs()
        stage = self._new_stage(pid)
        new_files: list[str] = []
        buf: list[pa.Table] = []
        buffered = total = 0

        def flush():
            nonlocal buf, buffered, total
            if not buf:
                return
            nk = posixpath.join(stage, f"compact-{len(new_files):05d}.parquet")
            write_fragment(pa.concat_tables(buf), self._url(nk),
                           storage_options=self.storage_options,
                           compression=self.compression)
            new_files.append(nk)
            total += buffered
            buf, buffered = [], 0

        for f in m["files"]:
            with pafs.open_input_file(f) as fh:
                t = pq.read_table(fh)
            buf.append(t)
            buffered += t.num_rows
            if buffered >= target_rows:
                flush()
        flush()
        manifest = {"rows": total, "files": sorted(new_files),
                    "meta": m.get("meta", {})}
        if m.get("supersedes"):
            manifest["supersedes"] = m["supersedes"]
        self._put_manifest(pid, manifest)
        self.gc(pid)
        return len(new_files)

    def append_meta(self, pid: str, meta: dict) -> None:
        """Commit a fileless zero-row metadata-only partition (shared
        surface with ImageStore.append_meta)."""
        self._put_manifest(pid, {"rows": 0, "files": [], "meta": meta})

    def external_tmp(self, pid: str) -> str:
        """Staging prefix (URL) that fused-sink TASKS write parquet objects
        into directly — on an object store the 'tmp dir' IS the final,
        immutable location: commit just references the keys (no move)."""
        return self._url(self._new_stage(pid))

    def _assert_sink_visible(self) -> None:
        # memory:// is PER-PROCESS: Ray workers would write into their own
        # private store, commit_external would list an empty stage and
        # silently commit 0 rows (ADVICE r4). Unconditional (review r5):
        # every caller is a pipeline whose sink tasks execute via Ray Data,
        # which AUTO-INITS Ray lazily — gating on ray.is_initialized() left
        # the exact silent 0-row commit open for drivers that had not
        # called ray.init() yet. Real object stores pass.
        if self._proto == "memory":
            raise RuntimeError(
                "memory:// ObjectStore is process-local — Ray task sinks "
                "would write to a different store; use local:// or a "
                "shared filesystem URL for Ray-executed pipelines")

    def commit_external(self, pid: str, tmp_dir: str, meta: dict | None = None) -> int:
        stage = self.fs._strip_protocol(tmp_dir)
        keys = self._stage_files(stage)
        rows = self._footer_rows(keys)
        self._put_manifest(pid, {"rows": rows, "files": keys, "meta": meta or {}})
        self.gc(pid)
        return rows

    def drop_partition(self, pid: str, *, force: bool = False) -> None:
        """Uncommit + reclaim a partition (shared surface — CrawlEngine
        resets stale wave partitions through this). Manifest delete first
        so readers never see a half-deleted partition. Refuses while a
        live view still reads through this partition (``force=True``
        skips the scan for pre-ordered dependents-first sweeps)."""
        if not force:
            self._assert_not_view_base(pid, "drop_partition")
        try:
            self._retry(self.fs.rm_file, self._manifest_key(pid))
        except FileNotFoundError:
            pass
        try:
            self._retry(self.fs.rm, self._key("data", pid), recursive=True)
        except FileNotFoundError:
            pass

    def gc(self, pid: str, grace_s: float = 0.0) -> int:
        """Delete data objects of ``pid`` not referenced by its manifest
        (crashed stages, superseded upsert fragments). Returns objects
        removed.

        SINGLE-WRITER contract at ``grace_s=0``: safe any time after commit
        *for the writer itself* (readers only follow manifest keys; the
        internal post-commit calls are this case). An EXTERNAL sweep (the
        CLI ``gc`` subcommand) running concurrently with another writer's
        in-flight ``merge_insert``/``compact_partition`` would delete its
        staged-but-not-yet-referenced objects and corrupt the commit
        (ADVICE r4) — pass ``grace_s`` > the longest plausible write (the
        CLI defaults to 3600) so only objects older than the grace window
        are reclaimed; objects without an mtime are kept."""
        import datetime

        def _young(key: str) -> bool:
            if grace_s <= 0:
                return False
            try:
                info = self._retry(self.fs.info, key)
            except FileNotFoundError:
                return True  # gone already — nothing to reclaim
            mt = info.get("mtime") or info.get("LastModified") \
                or info.get("last_modified")
            if mt is None:
                return True  # unknown age: never reclaim under a grace sweep
            if isinstance(mt, (int, float)):
                age = time.time() - mt
            elif isinstance(mt, datetime.datetime):
                now = datetime.datetime.now(mt.tzinfo) if mt.tzinfo \
                    else datetime.datetime.now()
                age = (now - mt).total_seconds()
            else:
                return True
            return age < grace_s

        live: set[str] = set()
        if self.is_done(pid):
            m = self.manifest(pid)
            live = set(m.get("files", []))
            v = m.get("view")
            if v:
                live |= set(v.get("delete_files") or [])
        pdir = self._key("data", pid)
        try:
            have = [k for k in self._retry(self.fs.find, pdir)
                    if k.endswith(".parquet")]
        except FileNotFoundError:
            return 0
        dead = [k for k in have if k not in live and not _young(k)]
        for k in dead:
            try:
                self._retry(self.fs.rm_file, k)
            except FileNotFoundError:
                pass  # a retried DELETE whose first attempt won = success
        return len(dead)

    # -- scratch space (distributed loser passes) ------------------------------
    def scratch_dir(self, prefix: str) -> str:
        d = self._key("_scratch", f"{prefix}{uuid.uuid4().hex}")
        if self._proto in ("file", "local"):
            self.fs.makedirs(d, exist_ok=True)
        return self._url(d)

    def rm_scratch(self, path: str) -> None:
        try:
            self.fs.rm(self.fs._strip_protocol(path), recursive=True)
        except FileNotFoundError:
            pass

    # -- delete-vector views ----------------------------------------------------
    def commit_delete_view(self, pid: str, base_pid: str, delete_keys,
                           key_col: str, meta: dict | None = None) -> int:
        keys = sorted(set(delete_keys))
        stage = self._new_stage(pid)
        dkey = posixpath.join(stage, "deletes.parquet")
        write_fragment(pa.table({key_col: keys}), self._url(dkey),
                       storage_options=self.storage_options,
                       compression=self.compression)
        return self._commit_view(pid, base_pid, [dkey], key_col, len(keys), meta)

    def commit_delete_view_file(self, pid: str, base_pid: str, delete_file: str,
                                key_col: str, meta: dict | None = None) -> int:
        return self.commit_delete_view_files(pid, base_pid, [delete_file],
                                             key_col, meta)

    def commit_delete_view_files(self, pid: str, base_pid: str,
                                 delete_files: list[str], key_col: str,
                                 meta: dict | None = None) -> int:
        """Loser files written by distributed tasks (under a scratch
        prefix on THIS filesystem): server-side copy into the view's stage
        (an object COPY, no byte download), then manifest-last commit."""
        if not delete_files:
            return self.commit_delete_view(pid, base_pid, [], key_col, meta)
        stage = self._new_stage(pid)
        names, keys = [], []
        for i, f in enumerate(delete_files):
            src = self.fs._strip_protocol(f)
            dst = posixpath.join(stage, f"deletes-{i:05d}.parquet")
            self._retry(self.fs.copy, src, dst)
            names.append(dst)
            keys.append(dst)
        n = self._footer_rows(keys)
        return self._commit_view(pid, base_pid, names, key_col, n, meta)

    def _commit_view(self, pid: str, base_pid: str, delete_keys_files: list[str],
                     key_col: str, n_deleted: int, meta: dict | None) -> int:
        rows = self.rows(base_pid) - n_deleted
        self._put_manifest(pid, {
            "rows": rows, "files": [],
            "view": {"base": base_pid, "key_col": key_col,
                     "delete_files": delete_keys_files},
            "meta": meta or {}})
        return rows

    def _view_of(self, pid: str) -> dict | None:
        return self.manifest(pid).get("view")

    def _delete_keys(self, pid: str) -> tuple[str, pa.Array]:
        import pyarrow.compute as pc

        v = self._view_of(pid)
        pafs = self._pafs()
        tabs = []
        for k in v["delete_files"]:
            with pafs.open_input_file(k) as f:
                tabs.append(pq.read_table(f))
        tab = pa.concat_tables(tabs)
        return v["key_col"], pc.unique(tab[v["key_col"]].combine_chunks())

    # -- readers ------------------------------------------------------------
    def files(self, pid: str | None = None) -> list[str]:
        if pid is None and getattr(self, "_mcache", None) is None:
            with self._manifest_cache(self._all_manifests()):
                return self.files(None)
        out: list[str] = []
        for p in [pid] if pid else self._live_pids():
            m = self.manifest(p)
            if m.get("view"):
                out.extend(self.files(m["view"]["base"]))
            else:
                out.extend(m["files"])
        return out

    def read_dataset(self, pid: str | None = None, columns: list[str] | None = None):
        import ray.data as rd

        if pid is None:
            if getattr(self, "_mcache", None) is None:
                # ONE manifest prefetch covers the snapshot probe AND the
                # flat files(None) fallthrough
                with self._manifest_cache(self._all_manifests()):
                    return self.read_dataset(None, columns=columns)
            snap = self._snapshot_read_dataset(columns)
            if snap is not None:
                return snap
        if pid is not None and self._view_of(pid):
            base = self._view_of(pid)["base"]
            if not self.files(base):  # fileless base: nothing to anti-join
                return self.read_dataset(base)
            key_col, dropped = self._delete_keys(pid)
            cols = columns
            if cols is not None and key_col not in cols:
                cols = [*cols, key_col]
            ds = self.read_dataset(base, columns=cols)
            import ray

            ref = ray.put(dropped)
            anti = ImageStore._anti_view

            def anti_fn(t: pa.Table) -> pa.Table:
                return anti(t, key_col, ray.get(ref), columns)

            return ds.map_batches(anti_fn, batch_format="pyarrow")
        files = self.files(pid)
        if not files:
            return rd.from_arrow(pa.table({}))
        return rd.read_parquet(files, columns=columns, filesystem=self._pafs())

    def read_table(self, pid: str | None = None, columns: list[str] | None = None) -> pa.Table:
        if pid is None:
            if getattr(self, "_mcache", None) is None:
                with self._manifest_cache(self._all_manifests()):
                    return self.read_table(None, columns=columns)
            snap = self._snapshot_read_table(columns)
            if snap is not None:
                return snap
        if pid is not None and self._view_of(pid):
            key_col, dropped = self._delete_keys(pid)
            base = self._view_of(pid)["base"]
            cols = columns
            if cols is not None and key_col not in cols:
                cols = [*cols, key_col]
            tab = self.read_table(base, columns=cols)
            if not tab.num_columns:  # fileless base: nothing to anti-join
                return tab
            return ImageStore._anti_view(tab, key_col, dropped, columns)
        files = self.files(pid)
        if not files:
            return pa.table({})
        pafs = self._pafs()
        tabs = []
        for k in files:
            with pafs.open_input_file(k) as f:
                tabs.append(pq.read_table(f, columns=columns))
        return pa.concat_tables(tabs)

    # -- upsert ----------------------------------------------------------------
    def merge_insert(self, pid: str, updates: pa.Table, key: str, *,
                     allow_view_base: bool = False) -> None:
        """Upsert by key. Untouched fragments are re-referenced in the new
        manifest AS-IS (zero copies, zero moves — strictly better than the
        local backend's hard links); only fragments containing an updated
        key are rewritten into a fresh stage."""
        if not self.is_done(pid):
            self.append_table(pid, updates)
            return
        if not allow_view_base:  # True = key-and-count-preserving upsert
            self._assert_not_view_base(pid, "merge_insert")
        if self._view_of(pid):
            self._materialize_upsert(pid, updates, key)
            self.gc(pid)  # the view's now-unreferenced delete objects
            return
        m = self.manifest(pid)
        files = m["files"]
        upd_keys = pa.array(sorted(set(updates[key].to_pylist())))
        if files:
            with self._pafs().open_input_file(files[0]) as fh:
                schema_names = pq.read_schema(fh).names
        else:
            schema_names = updates.column_names
        stage = self._new_stage(pid)
        # index-prefixed destination keys: two source fragments from
        # DIFFERENT stages may share a basename; a bare-basename dst would
        # overwrite one and double-reference the other (ADVICE r4)
        jobs = [(f, posixpath.join(stage, f"{i:05d}-{posixpath.basename(f)}"))
                for i, f in enumerate(files)]
        import ray

        # Fan out one task per fragment (mirrors ImageStore.merge_insert's
        # task merge). memory:// is process-local — tasks on other workers
        # would see a different store, so it stays serial.
        if (ray.is_initialized() and len(jobs) > 1
                and self._proto not in ("memory",)):
            task = ray.remote(num_cpus=1)(_merge_one_fragment)
            kref = ray.put(upd_keys)
            results = ray.get([
                task.remote(self.root, src, dst, key, kref, self.compression,
                            self.storage_options)
                for src, dst in jobs])
        else:
            results = [_merge_one_fragment(self.fs, src, dst, key, upd_keys,
                                           self.compression)
                       for src, dst in jobs]
        new_files = [k for k, _ in results if k is not None]
        rows = sum(r for _, r in results)
        up = updates.select(schema_names)
        uk = posixpath.join(stage, f"upsert-{uuid.uuid4().hex}.parquet")
        write_fragment(up, self._url(uk), compression=self.compression,
                       storage_options=self.storage_options)
        new_files.append(uk)
        manifest = {"rows": rows + up.num_rows, "files": sorted(new_files),
                    "meta": m.get("meta", {})}
        if m.get("supersedes"):
            manifest["supersedes"] = m["supersedes"]
        self._put_manifest(pid, manifest)
        self.gc(pid)

    def rewrite_partition(self, pid: str, fragment_fn, meta: dict | None = None,
                          *, allow_view_base: bool = False) -> int:
        if not allow_view_base:  # True = fn is row-count/key-preserving
            self._assert_not_view_base(pid, "rewrite_partition")
        m = self.manifest(pid)
        supersedes = m.get("supersedes")
        src_files = m["files"]
        if m.get("view"):
            fragment_fn, base, supersedes = self._materialize_view_plan(
                pid, m, fragment_fn)
            src_files = self.files(base)
        pafs = self._pafs()
        stage = self._new_stage(pid)
        new_files, rows = [], 0
        for i, f in enumerate(src_files):
            with pafs.open_input_file(f) as fh:
                out = fragment_fn(pq.read_table(fh))
            if out.num_rows:
                # index prefix: source fragments from different stages may
                # share a basename (ADVICE r4)
                nk = posixpath.join(stage, f"{i:05d}-{posixpath.basename(f)}")
                write_fragment(out, self._url(nk), compression=self.compression,
                               storage_options=self.storage_options)
                new_files.append(nk)
                rows += out.num_rows
        manifest = {"rows": rows, "files": sorted(new_files),
                    "meta": meta if meta is not None else m.get("meta", {})}
        if supersedes:
            manifest["supersedes"] = supersedes
        self._put_manifest(pid, manifest)
        self.gc(pid)
        return rows
