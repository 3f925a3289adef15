"""SQL-text builders that replay the sketch hashes inside DuckDB.

The q21 minhash+LSH+simhash gate is only hash-checkable if the oracle can
recompute the EXACT sketches: the Python side hashes shingles/tokens with
:func:`..functions.hashing.md5_hash64` (bit-identical to DuckDB 1.0's
``md5_number_upper``), and these builders emit SQL that replays

- the 64-slot minhash signature: ``min(((hv * a + b) mod 2^64) & (2^61-1))``
  with the affine params from ``_perm_params(64, 1234)`` inlined as VALUES
  (exact mod-2^64 products via HUGEINT hi/lo splitting);
- the per-band LSH bucket: the chained ``splitmix64(acc ^ sig_j)`` mixer,
  expanded to staged CTEs (each multiply mod 2^64 via the same splitting);
- the 64-bit simhash code: per-token md5 hashes, counted sign-aggregate,
  rebuilt bit-by-bit with a ``range(64)`` cross join.

Stage-by-stage bit-equality (signatures, buckets, codes) against the
Python kernels is pinned by tests/test_sql_oracle_parity.py.
"""

from __future__ import annotations

_U64 = 1 << 64

# DuckDB string literal for functions/text.py::words' regex ([\w']+ over
# lowercased ASCII; parity note: see q53's oracle) — '' is an escaped quote.
WORD_RE_SQL = "[a-z0-9_'']+"

# splitmix64 constants (public domain mixer; functions/hashing.py)
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB


def mulmod_var(a: str, h: str) -> str:
    """SQL for ``(a * h) mod 2^64``, ``a`` < 2^61 and ``h`` < 2^64 UBIGINT
    column exprs. HUGEINT is signed 128-bit, so a naive product overflows;
    split ``h`` into 32-bit halves (each partial product <= 2^93)."""
    return (f"((({a})::HUGEINT * (({h}) >> 32)::HUGEINT % 4294967296)"
            f" * 4294967296"
            f" + ({a})::HUGEINT * (({h}) & 4294967295::UBIGINT)::HUGEINT)"
            f" % {_U64}")


def mulmod_const(z: str, c: int) -> str:
    """SQL for ``(z * c) mod 2^64``, ``z`` < 2^64 column expr, ``c`` a
    64-bit constant (split into compile-time hi/lo halves)."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (f"((({z})::HUGEINT * {hi} % 4294967296) * 4294967296"
            f" + ({z})::HUGEINT * {lo}) % {_U64}")


def _sm_stages(src_cte: str, in_expr: str, out_col: str, k: int,
               carry: str) -> tuple[str, str]:
    """CTE chain applying one splitmix64 to ``in_expr`` (UBIGINT). Staged
    so no sub-expression is textually duplicated more than twice."""
    n0, n1, n2, fin = (f"__sm{k}a", f"__sm{k}b", f"__sm{k}c", f"__sm{k}d")
    a1 = f"((({in_expr})::HUGEINT + {_C1}) % {_U64})::UBIGINT"
    frag = f"""
{n0} AS (SELECT {carry}, {a1} AS x1 FROM {src_cte}),
{n1} AS (SELECT {carry}, ({mulmod_const('xor(x1, x1 >> 30)', _C2)})::UBIGINT AS x2 FROM {n0}),
{n2} AS (SELECT {carry}, ({mulmod_const('xor(x2, x2 >> 27)', _C3)})::UBIGINT AS x3 FROM {n1}),
{fin} AS (SELECT {carry}, xor(x3, x3 >> 31) AS {out_col} FROM {n2})"""
    return frag, fin


def _perms_values(k: int = 64, seed: int = 1234) -> str:
    from ..stages.dedup_text import _perm_params

    a, b = _perm_params(k, seed)
    return ", ".join(f"({j}, {int(a[j])}::UBIGINT, {int(b[j])}::UBIGINT)"
                     for j in range(k))


def minhash_sig_ctes(table: str = "documents", ngram: int = 3) -> str:
    """CTEs ``toks/grams/gh/gsizes/perms/sig``: documents -> distinct md5
    shingle hashes (gh), per-doc set sizes (gsizes), and the (doc_id, j,
    band, s) minhash signature slots."""
    joins = " ".join(
        f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.i = t0.i + {i}"
        for i in range(1, ngram))
    gram_expr = " || ' ' || ".join(f"t{i}.tok" for i in range(ngram))
    return f"""
toks AS (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '{WORD_RE_SQL}')) AS tok,
                generate_subscripts(regexp_extract_all(lower(text), '{WORD_RE_SQL}'), 1) AS i
         FROM {table}),
grams AS (SELECT DISTINCT t0.doc_id, {gram_expr} AS gram FROM toks t0 {joins}),
gh AS (SELECT DISTINCT doc_id, md5_number_upper(gram) AS hv FROM grams),
gsizes AS (SELECT doc_id, COUNT(*) AS n FROM gh GROUP BY doc_id),
perms(j, pa, pb) AS (VALUES {_perms_values()}),
sig AS (SELECT doc_id, j, j // 4 AS band,
               (MIN((({mulmod_var('pa', 'hv')} + pb::HUGEINT) % {_U64}) % {1 << 61}))::UBIGINT AS s
        FROM gh CROSS JOIN perms GROUP BY doc_id, j)"""


def lsh_bucket_ctes() -> str:
    """CTEs from ``sig`` to ``bkt(doc_id, band, bucket)``: pivot the 4
    rows-per-band slots, then chain splitmix64(acc ^ s_j) like
    dedup_text.lsh_band_rows."""
    frags = ["""
bsig AS (SELECT doc_id, band,
                MIN(CASE WHEN j % 4 = 0 THEN s END) AS s0,
                MIN(CASE WHEN j % 4 = 1 THEN s END) AS s1,
                MIN(CASE WHEN j % 4 = 2 THEN s END) AS s2,
                MIN(CASE WHEN j % 4 = 3 THEN s END) AS s3
         FROM sig GROUP BY doc_id, band)"""]
    src = "bsig"
    carry = ["doc_id, band, s1, s2, s3", "doc_id, band, s2, s3",
             "doc_id, band, s3", "doc_id, band"]
    in_exprs = ["s0", "xor(acc0, s1)", "xor(acc1, s2)", "xor(acc2, s3)"]
    for k in range(4):
        frag, src = _sm_stages(src, in_exprs[k], f"acc{k}", k, carry[k])
        frags.append(frag)
    frags.append(f"bkt AS (SELECT doc_id, band, acc3 AS bucket FROM {src})")
    return ",".join(frags)


def simhash_ctes(table: str = "documents") -> str:
    """CTEs ``stoks/tc/sbits/scode``: per-doc 64-bit simhash code from
    counted md5 token hashes (dedup_text.simhash_batch, hasher='md5sql')."""
    return f"""
stoks AS (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '{WORD_RE_SQL}')) AS tok
          FROM {table}),
tc AS (SELECT doc_id, tok, COUNT(*) AS c, md5_number_upper(tok) AS hv
       FROM stoks GROUP BY doc_id, tok),
sbits AS (SELECT doc_id, r.i AS i,
                 SUM(CASE WHEN ((hv >> r.i::UBIGINT) & 1::UBIGINT) = 1
                          THEN c ELSE -c END) AS acc
          FROM tc CROSS JOIN range(64) r(i) GROUP BY doc_id, r.i),
scode AS (SELECT doc_id,
                 (SUM(CASE WHEN acc > 0 THEN (1::HUGEINT << i) ELSE 0 END)
                  % {_U64})::UBIGINT AS code
          FROM sbits GROUP BY doc_id)"""


def sketch_neardup_sql(jaccard_threshold: float = 0.2,
                       max_hamming: int = 3) -> str:
    """The full q21 oracle: minhash+LSH candidates verified by exact
    md5-shingle Jaccard >= threshold, UNION ALL simhash pairs at Hamming
    <= max_hamming — (method, a, b, score) like the Ray pipeline."""
    return f"""
WITH {minhash_sig_ctes()},{lsh_bucket_ctes()},
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM bkt x JOIN bkt y ON x.band = y.band AND x.bucket = y.bucket
                               AND x.doc_id < y.doc_id),
common AS (SELECT c.a, c.b, COUNT(*) AS nc
           FROM cand c JOIN gh ga ON ga.doc_id = c.a
                       JOIN gh gb ON gb.doc_id = c.b AND gb.hv = ga.hv
           GROUP BY c.a, c.b),
mh AS (SELECT 'minhash_lsh' AS method, common.a, common.b,
              ROUND(CAST(nc AS DOUBLE) / (sa.n + sb.n - nc), 4) AS score
       FROM common JOIN gsizes sa ON sa.doc_id = common.a
                   JOIN gsizes sb ON sb.doc_id = common.b
       WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= {jaccard_threshold}),
{simhash_ctes()},
sh AS (SELECT 'simhash' AS method, x.doc_id AS a, y.doc_id AS b,
              CAST(bit_count(xor(x.code, y.code)) AS DOUBLE) AS score
       FROM scode x JOIN scode y ON x.doc_id < y.doc_id
       WHERE bit_count(xor(x.code, y.code)) <= {max_hamming})
SELECT method, a, b, score FROM mh
UNION ALL
SELECT method, a, b, score FROM sh
"""
