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


def doc_quality_sql(table: str = "documents") -> str:
    """The full q23 oracle: language-ID, token/stopword stats, the quality
    score, and the Karp-Rabin+splitmix64 document fingerprint — all replayed
    in SQL so the whole text-analysis family is hash-gated.

    Parity notes (all pinned by tests/test_sql_oracle_parity.py):

    - the rolling hash runs over CODEPOINTS via ``regexp_split_to_array``
      (= utf-8 bytes only for ASCII text; the testdata is verified
      all-ASCII, same contract as q53's tokenizer parity note);
    - each ``* mod 2^64`` step goes through the HUGEINT hi/lo split
      (:func:`mulmod_const`) and the splitmix64 finisher reuses the staged
      CTE chain (:func:`_sm_stages`);
    - ``stop_ratio`` is emitted UNROUNDED on both sides: int/int division
      is bit-identical IEEE, while ROUND-ing it tripped Python's banker's
      rounding vs DuckDB's half-away (1/32 -> 0.0312 vs 0.0313, measured);
    - ``lang_pred`` ties break to the first language in (en, de, fr, es) —
      text.lang_id updates only on a strictly greater score;
    - the ``quality`` expression tree mirrors text.quality_score term by
      term (same literals, same left-assoc sums) so the doubles match
      bit-for-bit before the final ROUND(.., 6).
    """
    from .text import STOPWORDS

    def lit(ws) -> str:
        return ", ".join(f"'{w}'" for w in sorted(ws))

    all_stop = lit(set().union(*STOPWORDS.values()))
    # NB: splitting '' yields [''] and unicode('') = -1 — filter empties
    # (non-empty docs never produce them) so the empty doc hashes to
    # splitmix64(0) exactly like the Python kernel
    kr = (f"list_reduce(list_prepend(0::HUGEINT, "
          f"list_transform(list_filter(regexp_split_to_array(text, ''), "
          f"c -> c != ''), c -> unicode(c)::HUGEINT)), "
          f"(h, c) -> (h * 1000003 + c) % {_U64})")
    lang_scores = ", ".join(
        f"len(list_filter(list_distinct(toks), t -> t IN ({lit(STOPWORDS[lang])}))) AS s_{lang}"
        for lang in ("en", "de", "fr", "es"))
    sm_frag, sm_fin = _sm_stages("qk", "kr", "fp", 9, "doc_id")
    return f"""
WITH q0 AS (SELECT doc_id, text,
                   regexp_extract_all(lower(text), '{WORD_RE_SQL}') AS toks,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[[:alnum:][:space:]]', '', 'g')) AS n_punct,
                   ({kr})::UBIGINT AS kr
            FROM {table}),
qk AS (SELECT doc_id, kr FROM q0),{sm_frag},
qs AS (SELECT doc_id, text, n_chars, n_punct, len(toks) AS n_words,
              len(list_filter(toks, t -> t IN ({all_stop}))) AS n_stop,
              COALESCE(list_aggregate(list_transform(toks, t -> length(t)), 'sum'), 0) AS sum_wl,
              {lang_scores}
       FROM q0),
qr AS (SELECT *,
              CASE WHEN n_words > 0 THEN n_stop / CAST(n_words AS DOUBLE) ELSE 0.0 END AS stop_raw,
              CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 1.0 END AS punct_ratio,
              CASE WHEN n_words > 0 THEN sum_wl / CAST(n_words AS DOUBLE) ELSE 0.0 END AS mean_wl,
              LEAST(1.0, n_chars / 200.0)
                * (CASE WHEN n_chars < 20000 THEN 1.0 ELSE 0.5 END) AS len_score
       FROM qs)
SELECT qr.doc_id,
       CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred,
       n_words,
       stop_raw AS stop_ratio,
       ROUND(0.35 * len_score + 0.25 * LEAST(1.0, stop_raw * 4)
             + 0.25 * (1.0 - LEAST(1.0, punct_ratio * 5))
             + 0.15 * (CASE WHEN mean_wl >= 3.0 AND mean_wl <= 10.0
                            THEN 1.0 ELSE 0.3 END), 6) AS quality,
       CAST(CASE WHEN fp >= {1 << 63}::UBIGINT
                 THEN fp::HUGEINT - {_U64} ELSE fp::HUGEINT END
            AS BIGINT) AS fingerprint
FROM qr JOIN {sm_fin} ON {sm_fin}.doc_id = qr.doc_id
"""


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
