"""Bit-equality of the q21 SQL oracle's sketch stages vs the Python
kernels (functions/sqloracle.py) — signatures, LSH buckets, simhash codes.
Pure DuckDB + numpy; no Ray."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logcrawler_ray.functions.hashing import md5_hash64, md5_hash64_array
from logcrawler_ray.functions.sqloracle import (lsh_bucket_ctes,
                                                minhash_sig_ctes,
                                                simhash_ctes)
from logcrawler_ray.stages.dedup_text import (lsh_band_rows, minhash_batch,
                                              simhash_batch)

DOCS = pd.DataFrame({
    "doc_id": np.arange(8, dtype=np.int64),
    "text": [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "pack my box with five dozen liquor jugs",
        "pack my box with five dozen liquor jugs",  # exact dup
        "sphinx of black quartz judge my vow",
        "a a a repeated token stream a a a",
        "don't stop believing, hold on to that feeling",
        "completely unrelated words entirely different content here now",
    ],
})


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("documents", pa.Table.from_pandas(DOCS, preserve_index=False))
    return c


def test_md5_hash64_matches_duckdb(con):
    vals = ["abc", "", "don't", "the quick brown", "ü-nicode"]
    got = [con.execute("select md5_number_upper(?)", [v]).fetchone()[0]
           for v in vals]
    assert got == [md5_hash64(v) for v in vals]
    assert md5_hash64_array(vals).tolist() == got


def test_minhash_signatures_match_sql(con):
    sql = ("WITH " + minhash_sig_ctes() +
           " SELECT doc_id, j, s FROM sig ORDER BY doc_id, j")
    got = con.execute(sql).fetchnumpy()
    sigs = minhash_batch(DOCS["text"].tolist(), k=64, ngram=3,
                         hasher="md5sql")
    assert np.array_equal(got["s"].astype(np.uint64), sigs.reshape(-1))


def test_lsh_buckets_match_sql(con):
    sql = ("WITH " + minhash_sig_ctes() + "," + lsh_bucket_ctes() +
           " SELECT doc_id, band, bucket FROM bkt ORDER BY doc_id, band")
    got = con.execute(sql).fetchnumpy()
    sigs = minhash_batch(DOCS["text"].tolist(), k=64, ngram=3,
                         hasher="md5sql")
    rows = (lsh_band_rows(DOCS["doc_id"].to_numpy(), sigs, 16).to_pandas()
            .sort_values(["doc_id", "band"]).reset_index(drop=True))
    assert np.array_equal(got["bucket"].astype(np.uint64),
                          rows["bucket"].to_numpy().view(np.uint64))


def test_simhash_codes_match_sql(con):
    sql = ("WITH " + simhash_ctes().lstrip() +
           " SELECT doc_id, code FROM scode ORDER BY doc_id")
    got = con.execute(sql).fetchnumpy()
    codes = simhash_batch(DOCS["text"].tolist(), hasher="md5sql")
    assert np.array_equal(got["code"].astype(np.uint64), codes)


def test_md5sql_changes_hashes_but_not_default():
    from logcrawler_ray.functions.text import shingle_hashes

    t = "the quick brown fox jumps again"
    a = shingle_hashes(t, 3)
    b = shingle_hashes(t, 3, hasher="md5sql")
    assert set(a.tolist()) != set(b.tolist())
    assert np.array_equal(a, shingle_hashes(t, 3))  # default unchanged


# ---- q23 doc-quality oracle (doc_quality_sql) -------------------------

# Edge-heavy corpus: empty text, whitespace/punct-only, <1-token docs,
# a stop-ratio that lands on an exact binary fraction (1/32 — the case
# where ROUND() diverges between Python and DuckDB and q23 therefore
# ships stop_ratio unrounded), long text past the 20000-char len_score
# knee, and every language's stopwords.
QDOCS = pd.DataFrame({
    "doc_id": np.arange(10, dtype=np.int64),
    "text": [
        "",
        "   \t\n  ",
        "!!! ??? ;;; ...",
        "word",
        "the of and to in is it that for a " * 2,
        "der die das und ist ein eine zu mit von",
        "le la les et est un une de du pour",
        "el la los las es un una de y para",
        ("x" * 19999) + " the",
        " ".join(["tok"] * 31 + ["the"]),  # stop_ratio = 1/32 exactly
    ],
})


def test_doc_quality_sql_matches_python():
    from logcrawler_ray.functions.hashing import to_int64
    from logcrawler_ray.functions.sqloracle import doc_quality_sql
    from logcrawler_ray.functions.text import (fingerprint, lang_id,
                                               quality_score)

    c = duckdb.connect()
    c.register("documents", pa.Table.from_pandas(QDOCS, preserve_index=False))
    got = (c.execute(doc_quality_sql()).df()
           .set_index("doc_id").sort_index())
    assert len(got) == len(QDOCS)
    for doc_id, text in zip(QDOCS["doc_id"], QDOCS["text"]):
        q = quality_score(text)
        row = got.loc[doc_id]
        assert row["lang_pred"] == lang_id(text), doc_id
        assert row["n_words"] == q["n_words"], doc_id
        assert row["stop_ratio"] == q["stop_ratio"], doc_id  # bit-exact
        assert row["quality"] == q["quality"], doc_id
        assert row["fingerprint"] == to_int64(fingerprint(text)), doc_id


def test_doc_quality_sql_fingerprint_is_splitmix_of_karp_rabin():
    # the fingerprint column IS splitmix64(karp_rabin(text)) — pin the
    # HUGEINT mod-2^64 SQL against the numpy kernels on adversarial
    # inputs (high bytes, long strings, empty)
    from logcrawler_ray.functions.hashing import to_int64
    from logcrawler_ray.functions.sqloracle import doc_quality_sql
    from logcrawler_ray.functions.text import fingerprint

    texts = ["", "\x7f" * 100, "a" * 5000, "don't", "0" * 63 + "1"]
    c = duckdb.connect()
    c.register("documents", pa.Table.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts}), preserve_index=False))
    got = (c.execute(doc_quality_sql()).df()
           .set_index("doc_id").sort_index())
    for i, t in enumerate(texts):
        assert got.loc[i, "fingerprint"] == to_int64(fingerprint(t)), i
