"""End-to-end flagship ingest pipeline tests (Ray)."""

import numpy as np
import pytest

from logcrawler_ray.codecs import registry
from logcrawler_ray.functions.hashing import to_uint64
from logcrawler_ray.functions.image_stats import blurredness_batch, brightness_batch
from logcrawler_ray.functions.phash import grayscale, phash_batch
from logcrawler_ray.pipelines.ingest import ingest, decode_pipeline
from logcrawler_ray.sources import corpus
from logcrawler_ray.sources.store import ImageStore

N = 96


@pytest.fixture(scope="module")
def corpus_tab():
    return corpus.corpus_table(N, seed=42)


@pytest.fixture()
def source_ds(ray_session, corpus_tab):
    import ray.data as rd

    return rd.from_arrow(corpus_tab)


def test_decode_stage_matches_stored_phash(source_ds, corpus_tab):
    out = decode_pipeline(source_ds, concurrency=2, batch_size=32).to_pandas()
    assert len(out) == N
    assert out["decode_ok"].all()
    stored = dict(zip(corpus_tab["image_id"].to_pylist(), corpus_tab["phash"].to_pylist()))
    for _, row in out.iterrows():
        assert row["phash"] == stored[row["image_id"]], row["image_id"]


def test_decode_stage_stats_match_oracle(source_ds, corpus_tab):
    """Per-row brightness/blur equal a direct driver-side computation."""
    out = decode_pipeline(source_ds, concurrency=2, batch_size=32).to_pandas()
    rows = {r["image_id"]: r for r in corpus_tab.to_pylist()}
    for _, got in out.head(20).iterrows():
        r = rows[got["image_id"]]
        g = registry.decode_gray(r["fmt"], r["bytes"], r["w"], r["h"])[None]
        assert got["brightness"] == pytest.approx(brightness_batch(g)[0])
        assert got["blurredness"] == pytest.approx(blurredness_batch(g)[0])
        assert got["resolution"] == f"{r['w']}x{r['h']}"


def test_decode_error_channel(ray_session):
    import pyarrow as pa
    import ray.data as rd

    bad = pa.table(
        {
            "image_id": ["x", "y"],
            "bytes": [b"not an image", corpus.corpus_table(1)["bytes"][0].as_py()],
            "w": pa.array([10, 64], type=pa.int32()),
            "h": pa.array([10, 48], type=pa.int32()),
            "fmt": ["png", corpus.corpus_table(1)["fmt"][0].as_py()],
        }
    )
    ds = rd.from_arrow(bad)
    from logcrawler_ray.stages.decode import DecodeStats

    out = ds.map_batches(DecodeStats, batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out.sort_values("image_id")["decode_ok"]) in ([False, True], [True, False])
    assert not out[out["image_id"] == "x"]["decode_ok"].iloc[0]


def test_ingest_dedup_and_store(ray_session, source_ds, corpus_tab, tmp_path):
    store = ImageStore(str(tmp_path / "store"))
    result = ingest(source_ds, store, pid="t0", concurrency=2, batch_size=32)
    got = result.to_pandas()
    uniq = len(set(corpus_tab["phash"].to_pylist()))
    assert len(got) == uniq
    # first-wins: kept image_id is the min per phash group
    import collections

    groups = collections.defaultdict(list)
    for r in corpus_tab.to_pylist():
        groups[r["phash"]].append(r["image_id"])
    kept = set(got["image_id"])
    for ph, ids in groups.items():
        assert min(ids) in kept
        for other in ids:
            if other != min(ids):
                assert other not in kept
    assert store.rows("t0") == uniq


def test_ingest_resume_skips_done(ray_session, source_ds, tmp_path):
    store = ImageStore(str(tmp_path / "store"))
    ingest(source_ds, store, pid="t0", concurrency=2, batch_size=32)
    n1 = store.rows("t0")
    # second run: same pid -> manifest hit, no recompute, same rows
    out = ingest(source_ds, store, pid="t0", concurrency=2, batch_size=32)
    assert store.rows("t0") == n1
    assert out.count() == n1


def test_dedup_within_batch():
    import pyarrow as pa

    from logcrawler_ray.stages.dedup import dedup_within_batch

    t = pa.table({"phash": [5, 1, 5, 1, 2], "image_id": ["e", "b", "a", "d", "c"]})
    out = dedup_within_batch(t, "phash", "image_id")
    assert out["phash"].to_pylist() == [1, 2, 5]
    assert out["image_id"].to_pylist() == ["b", "c", "a"]


def test_loser_partials_matches_pandas_and_keeps_null_keys():
    """The numpy loser_partials must (a) reproduce the pandas-groupby
    semantics on non-null keys and (b) never mark a null-key row as a
    loser (the old pandas path leaked every null-key row into the local
    loser channel via ``x != NaN``)."""
    import numpy as np
    import pyarrow as pa

    from logcrawler_ray.stages.dedup import loser_partials, merge_loser_partials

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 40, 300).astype(object)
    keys[rng.random(300) < 0.1] = None
    ids = [f"id{i:04d}" for i in rng.permutation(300)]
    t = pa.table({"k": pa.array(list(keys), type=pa.int64()), "o": ids})
    p = loser_partials(t, "k", "o").to_pandas()
    losers = merge_loser_partials(p, "k")
    # oracle: first-wins per non-null key
    df = t.to_pandas()
    nn = df[df["k"].notna()]
    expect = set(nn["o"]) - set(nn.sort_values("o").groupby("k")["o"].first())
    assert losers == frozenset(expect)
    # null-key rows never appear in any partial channel
    assert not p["k"].isna().any()
    # key dtype survives (the pandas path degraded int64 -> float64)
    assert p["k"].dtype == np.int64


def test_loser_pass_driver_collects_only_duplicates(ray_session):
    """Unique-heavy corpus: the driver-side collect in the loser pass must
    be O(duplicate keys), never O(distinct keys) — the round-2 verdict's
    top scale finding (stages/dedup.py `dup_winners`)."""
    import pyarrow as pa
    import ray.data as rd

    from logcrawler_ray.stages import dedup

    n, n_dup = 5000, 7  # 4993 unique keys, 7 duplicated ones
    keys = list(range(n))
    ids = [f"id-{i:05d}" for i in range(n)]
    # duplicate the first 7 keys once each
    keys += list(range(n_dup))
    ids += [f"zz-{i:05d}" for i in range(n_dup)]
    skinny = rd.from_arrow(pa.table(
        {"phash": keys, "image_id": ids,
         "__shard": ["s0" if i % 2 == 0 else "s1" for i in range(len(keys))]}
    )).map_batches(lambda t: t, batch_size=500, batch_format="pyarrow")

    routed = dedup.exact_losers_by(skinny, "phash", "image_id", "__shard")
    losers = sorted(x for v in routed.values() for x in v)
    assert losers == [f"zz-{i:05d}" for i in range(n_dup)]
    assert dedup._last_driver_rows == n_dup  # NOT 5000


def test_exact_losers_files_matches_broadcast(ray_session, tmp_path):
    """The bucketed 10^10 loser path (distributed join + per-part file
    routing) produces byte-identical loser sets to the broadcast path."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from logcrawler_ray.stages import dedup

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 400, size=1000).tolist()  # heavy duplication
    ids = [f"i-{i:04d}" for i in range(1000)]
    parts = [f"p{i % 3}" for i in range(1000)]
    tab = pa.table({"phash": keys, "image_id": ids, "__shard": parts})
    skinny = rd.from_arrow(tab).map_batches(
        lambda t: t, batch_size=100, batch_format="pyarrow")

    want = dedup.exact_losers_by(skinny, "phash", "image_id", "__shard")

    out_dir = str(tmp_path / "losers")
    import os

    os.makedirs(out_dir)
    routed = dedup.exact_losers_files(skinny, "phash", "image_id", "__shard",
                                      out_dir, num_buckets=4)
    assert dedup._last_driver_rows == 0  # nothing collected on the driver
    got = {}
    for part, (path, n) in routed.items():
        vals = pq.read_table(path)["image_id"].to_pylist()
        assert vals == sorted(set(vals)) and len(vals) == n
        got[part] = vals
    assert got == {p: v for p, v in want.items() if v}


def test_ingest_sharded_file_routed_losers(ray_session, corpus_tab, tmp_path):
    """ingest_sharded with losers_max_broadcast=0 forces the bucketed
    delete-view-file path; result must equal the broadcast path's."""
    import pyarrow.parquet as pq

    from logcrawler_ray.pipelines.ingest import ingest_sharded, read_sharded

    files = []
    for i in range(4):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(corpus_tab.slice(i * 24, 24), p)
        files.append(p)

    sa = ImageStore(str(tmp_path / "store-a"))
    sb = ImageStore(str(tmp_path / "store-b"))
    pa_ = ingest_sharded(files, sa, pid="sh", files_per_shard=2, concurrency=None)
    pb = ingest_sharded(files, sb, pid="sh", files_per_shard=2, concurrency=None,
                        losers_max_broadcast=0)
    a = read_sharded(sa, pa_).to_pandas().sort_values("image_id")
    b = read_sharded(sb, pb).to_pandas().sort_values("image_id")
    assert list(a["image_id"]) == list(b["image_id"])
    uniq = len(set(corpus_tab["phash"].to_pylist()))
    assert len(b) == uniq
    # no loser scratch dirs left behind
    import os

    assert not [d for d in os.listdir(sb.root) if d.startswith("losers-")]


def test_ingest_sharded_survives_fileless_shard(ray_session, corpus_tab,
                                                tmp_path):
    """A shard whose rows ALL fail decode commits a fileless partition;
    the cross-shard dedup union and read_sharded must skip it instead of
    letting its zero-column read_dataset poison the union (review r5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logcrawler_ray.pipelines.ingest import ingest_sharded, read_sharded

    good = corpus_tab.slice(0, 24)
    bad = corpus_tab.slice(24, 24)
    idx = bad.schema.get_field_index("bytes")
    bad = bad.set_column(idx, "bytes",
                         pa.array([b"\x00corrupt"] * bad.num_rows))
    files = []
    for i, tab in enumerate([good, bad]):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(tab, p)
        files.append(p)

    st = ImageStore(str(tmp_path / "store"))
    pid = ingest_sharded(files, st, pid="sh", files_per_shard=1,
                         concurrency=None)
    out = read_sharded(st, pid).to_pandas()
    uniq = len(set(good["phash"].to_pylist()))
    assert len(out) == uniq  # only the good shard's unique rows survive

    # degenerate: EVERY shard fileless — still completes with 0 rows
    st2 = ImageStore(str(tmp_path / "store2"))
    pid2 = ingest_sharded([files[1]], st2, pid="sh", files_per_shard=1,
                          concurrency=None)
    assert st2.manifest(pid2)["meta"]["rows_total"] == 0


def test_ingest_sharded_resume(ray_session, corpus_tab, tmp_path):
    """Shard-granular resumable ingest: commit per input-file-group
    partitions, global dedup as per-shard delete views, rerun skips all."""
    import os

    import pyarrow.parquet as pq

    from logcrawler_ray.pipelines.ingest import ingest_sharded, read_sharded
    from logcrawler_ray.sources.store import ImageStore

    # write the corpus as 4 input files
    files = []
    for i in range(4):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(corpus_tab.slice(i * 24, 24), p)
        files.append(p)

    store = ImageStore(str(tmp_path / "store"))
    pid = ingest_sharded(files, store, pid="sh", files_per_shard=2, concurrency=None,
                         batch_size=32)
    out = read_sharded(store, pid).to_pandas()
    uniq = len(set(corpus_tab["phash"].to_pylist()))
    assert len(out) == uniq
    assert len(set(out["phash"])) == uniq
    # whole-store SNAPSHOT: per-shard views shadow their bases, the
    # metadata-only listing partition contributes 0 rows — rows() and
    # read_table() see exactly the deduped survivor set
    assert store.rows() == uniq
    snap = store.read_table(columns=["image_id"])
    assert snap.num_rows == uniq

    # shard manifests exist; rerun = all skipped, identical result
    assert store.is_done("sh-shard-00000") and store.is_done("sh-shard-00001")
    mtimes = {p: os.path.getmtime(store._manifest_path(p)) for p in store.partitions()}
    pid2 = ingest_sharded(files, store, pid="sh", files_per_shard=2, concurrency=None)
    assert pid2 == pid
    for p, t in mtimes.items():
        assert os.path.getmtime(store._manifest_path(p)) == t  # untouched


def test_dup_winners_matches_pandas(ray_session):
    """dup_winners (two-phase coarse-bucket combine) == the pandas
    duplicates-only (key, min, count) over seeded random inputs, for both
    int and STRING keys (string keys take the hash64 bucket path)."""
    import pandas as pd
    import ray.data as rd

    from logcrawler_ray.stages import dedup

    for seed, as_str in ((0, False), (1, False), (2, True)):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 5000))
        keys = rng.integers(0, max(1, n // 2), n).astype(np.int64)
        order = rng.permutation(n).astype(np.int64)
        df = pd.DataFrame({"phash": keys, "image_id": order})
        if as_str:
            df["phash"] = df["phash"].map("k{:06d}".format)
        got = (dedup.dup_winners(rd.from_pandas(df).repartition(9),
                                 "phash", "image_id")
               .to_pandas().sort_values("phash").reset_index(drop=True))
        want = (df.groupby("phash", as_index=False)
                .agg(__min=("image_id", "min"), __n=("image_id", "size")))
        want = (want[want["__n"] > 1].astype({"__n": np.int64})
                .sort_values("phash").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["phash", "__min", "__n"]], want[["phash", "__min", "__n"]])


def test_dedup_exact_fallback_matches_broadcast_path(ray_session):
    """Forcing max_broadcast=0 exercises the coarse-bucket full-shuffle
    fallback; its kept rows must equal the broadcast anti-filter path's."""
    import pandas as pd
    import ray.data as rd

    from logcrawler_ray.stages.dedup import dedup_exact

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({"phash": rng.integers(0, n // 3, n).astype(np.int64),
                       "image_id": rng.permutation(n).astype(np.int64),
                       "payload": [f"p{i}" for i in range(n)]})
    ds = rd.from_pandas(df).repartition(8).materialize()
    want = (dedup_exact(ds, "phash", "image_id").to_pandas()
            .sort_values("image_id").reset_index(drop=True))
    got = (dedup_exact(ds, "phash", "image_id", max_broadcast=0).to_pandas()
           .sort_values("image_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["phash", "image_id", "payload"]],
                                  want[["phash", "image_id", "payload"]])
    # first-wins: every kept row is its key's min image_id
    mins = df.groupby("phash")["image_id"].min()
    assert (got["image_id"].to_numpy()
            == mins.loc[got["phash"]].to_numpy()).all()


def test_dup_winners_string_schema_survives_empty_buckets(ray_session):
    """Mostly-unique STRING keys: most coarse buckets emit empty tables,
    which must stay string-typed (a filtered-to-empty pandas object
    column round-trips as a null-typed Arrow column otherwise and breaks
    cross-block schema unification)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from logcrawler_ray.stages.dedup import dup_winners

    df = pd.DataFrame({"phash": [f"k{i:05d}" for i in range(2000)] + ["k00001"],
                       "image_id": np.arange(2001, dtype=np.int64)})
    out = dup_winners(rd.from_pandas(df).repartition(8), "phash", "image_id")
    assert out.schema().base_schema.field("phash").type == pa.string()
    rows = out.to_pandas()
    assert rows.to_dict("records") == [
        {"phash": "k00001", "__min": 1, "__n": 2}]


def test_read_sharded_backcompat_rows_listing(tmp_path):
    """Stores written before the meta-only listing change kept the shard
    list as data rows; read_sharded must still resolve them."""
    import pyarrow as pa

    from logcrawler_ray.pipelines.ingest import read_sharded
    from logcrawler_ray.sources.store import ImageStore

    store = ImageStore(str(tmp_path / "s"))
    store.append_table("sh-shard-00000",
                       pa.table({"image_id": ["a", "b"], "phash": [1, 2]}))
    store.commit_delete_view("sh-view-00000", "sh-shard-00000", ["b"],
                             key_col="image_id")
    store.append_table("sh", pa.table({"shards": ["sh-view-00000"]}),
                       meta={"pipeline": "ingest", "rows_total": 1})
    out = read_sharded(store, "sh").to_pandas()
    assert list(out["image_id"]) == ["a"]
