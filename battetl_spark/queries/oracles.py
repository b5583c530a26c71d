"""DuckDB oracle SQL for every queries() entry (driver correctness gate).

Moved verbatim from __spark_entry__.py (round 5 split). Column aliases and
rounding match the Spark side exactly — the driver hashes values after
sorting columns by name.
"""

from __future__ import annotations

from battetl_spark.queries import sampling as _Q  # module import, no pkg cycle
from battetl_spark.queries import text as _QT
from battetl_spark.queries import relational as _QR


def _jaccard_pairs_sql(threshold: float) -> str:
    """Exhaustive all-pairs exact word-3-shingle Jaccard (ground truth for
    both the prefix-filter and the minhash-verified near-dup queries).
    DuckDB computes Jaccard over shingle STRINGS; Spark over shingle HASHES —
    isomorphic set representations (xxhash64 is injective on this corpus)."""
    return rf"""
        WITH norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                     range(1, greatest(len(w) - 2, 1) + 1),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
          FROM norm
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.s, b.s)) * 1.0
                     / len(list_distinct(a.s || b.s)), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s)) * 1.0
              / len(list_distinct(a.s || b.s)) >= {threshold}
    """


def _dup_clusters_sql(threshold: float) -> str:
    """Ground-truth transitive closure of the exhaustive near-dup pair graph:
    a recursive CTE propagates every label along edges (pruned to labels
    smaller than the target node — the component minimum is smaller than
    every other member, so its propagation is never pruned), then each node
    takes the MIN reachable label. Documents with no near-dups cluster as
    themselves."""
    return rf"""
        WITH RECURSIVE norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                     range(1, greatest(len(w) - 2, 1) + 1),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
          FROM norm
        ),
        pairs AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s)) * 1.0
                / len(list_distinct(a.s || b.s)) >= {threshold}
        ),
        edges AS (
          SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
        ),
        reach AS (
          SELECT u AS node, u AS label FROM edges
          UNION
          SELECT e.v AS node, r.label
          FROM reach r JOIN edges e ON e.u = r.node
          WHERE r.label < e.v
        )
        SELECT d.doc_id AS doc_id,
               coalesce(m.cluster_id, d.doc_id) AS cluster_id
        FROM documents d
        LEFT JOIN (
          SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
        ) m ON m.node = d.doc_id
    """


def _decontaminate_sql(k: int, mod: int) -> str:
    """Ground-truth decontamination over shingle STRINGS (the engine uses
    xxhash64 word tuples — isomorphic set representation, as with the
    Jaccard oracles): training docs (doc_id % mod != 0) sharing >= 1
    k-word shingle with the eval slice, with distinct shared counts."""
    terms = ", ".join(f"w[i+{j}]" for j in range(k))
    return rf"""
        WITH norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
              range(1, greatest(len(w) - {k - 1}, 1) + 1),
              i -> concat_ws(' ', {terms}))) AS s
          FROM norm
        ),
        ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {mod} = 0),
        tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % {mod} <> 0)
        SELECT doc_id, count(*) AS n_shared
        FROM tr JOIN ev USING (g) GROUP BY doc_id
    """


_REPETITION_SQL = r"""
    WITH norm AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id, unnest(list_transform(
          range(1, greatest(len(w) - 1, 1) + 1),
          i -> concat_ws(' ', w[i], w[i+1]))) AS g
      FROM norm
    ),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    top AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6)
               AS top_bigram_frac
      FROM cnt GROUP BY doc_id
    ),
    tg AS (
      SELECT doc_id, list_transform(
          range(1, greatest(len(w) - 2, 1) + 1),
          i -> concat_ws(' ', w[i], w[i+1], w[i+2])) AS s
      FROM norm
    ),
    dup AS (
      SELECT doc_id,
             round(1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / len(s), 6)
               AS dup_trigram_frac
      FROM tg
    )
    SELECT doc_id, top_bigram_frac, dup_trigram_frac
    FROM top JOIN dup USING (doc_id)
"""


def _span_norm_spans_sql(k: int) -> str:
    """Shared CTE prefix for the exact-substring (k-token span) oracles:
    normalized word arrays + every rolling span occurrence keyed by the
    md5 of its text (concat_ws skips the NULLs a clamped slice leaves, so
    sub-k docs yield one partial span — matching Spark's arrays_zip pad)."""
    terms = ", ".join(f"w[i+{j}]" for j in range(k))
    return rf"""
        WITH norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        spans AS (
          SELECT doc_id, len(w) AS n_toks, i AS pos,
                 md5(concat_ws(' ', {terms})) AS h
          FROM norm,
               LATERAL unnest(range(1, greatest(len(w) - {k} + 1, 1) + 1)) r(i)
        ),
        dup AS (
          SELECT h FROM spans GROUP BY h HAVING min(doc_id) <> max(doc_id)
        )"""


def _span_dup_occurrences_sql(k: int) -> str:
    """Ground truth for the incremental span index: every (doc, pos)
    occurrence whose span appears in >= 2 distinct documents."""
    return _span_norm_spans_sql(k) + """
        SELECT s.doc_id, CAST(s.pos AS INT) AS pos
        FROM spans s JOIN dup d USING (h)
    """


def _span_stats_sql(k: int) -> str:
    """Per-doc span-duplication profile; coverage = union of the duplicate
    [pos, pos+k-1] windows via the classic running-max-end window."""
    return _span_norm_spans_sql(k) + rf""",
        marked AS (
          SELECT s.*, (d.h IS NOT NULL) AS is_dup
          FROM spans s LEFT JOIN dup d USING (h)
        ),
        cov AS (
          SELECT doc_id, pos,
                 greatest(0, least(pos + {k} - 1, n_toks)
                   - greatest(coalesce(max(least(pos + {k} - 1, n_toks))
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0),
                     pos - 1)) AS add
          FROM marked WHERE is_dup
        )
        SELECT m.doc_id,
               CAST(any_value(m.n_toks) AS INT) AS n_toks,
               CAST(count(*) AS INT) AS n_spans,
               CAST(sum(CASE WHEN m.is_dup THEN 1 ELSE 0 END) AS INT)
                 AS n_dup_spans,
               CAST(coalesce(any_value(c.cv), 0) AS INT) AS dup_tokens,
               round(CAST(coalesce(any_value(c.cv), 0) AS DOUBLE)
                     / any_value(m.n_toks), 6) AS dup_frac
        FROM marked m
        LEFT JOIN (SELECT doc_id, sum(add) AS cv FROM cov GROUP BY doc_id) c
          USING (doc_id)
        GROUP BY m.doc_id
    """


def _span_strip_sql(k: int) -> str:
    """Span-dedup ground truth: drop every token inside a duplicate span
    window, reassemble the remainder in position order."""
    return _span_norm_spans_sql(k) + rf""",
        dupstarts AS (
          SELECT s.doc_id, s.pos, least(s.pos + {k} - 1, s.n_toks) AS pend
          FROM spans s JOIN dup d USING (h)
        ),
        toks AS (
          SELECT doc_id, i, w[i] AS tok
          FROM norm, LATERAL unnest(range(1, len(w) + 1)) r(i)
        ),
        kept AS (
          SELECT t.doc_id, t.i, t.tok FROM toks t
          WHERE NOT EXISTS (SELECT 1 FROM dupstarts d
                            WHERE d.doc_id = t.doc_id
                              AND t.i BETWEEN d.pos AND d.pend)
        )
        SELECT n.doc_id,
               coalesce(kk.clean_text, '') AS clean_text,
               CAST(coalesce(kk.n_kept, 0) AS INT) AS n_kept
        FROM norm n
        LEFT JOIN (SELECT doc_id,
                          string_agg(tok, ' ' ORDER BY i) AS clean_text,
                          count(*) AS n_kept
                   FROM kept GROUP BY doc_id) kk USING (doc_id)
    """


def _redact_pii_sql() -> str:
    """Identical RE2 pattern chain over the identically augmented text."""
    from battetl_spark.analytics.textops import PII_PATTERNS

    expr = ("text || ' contact user' || doc_id::VARCHAR"
            " || '@example.com or 10.1.' || (doc_id % 256)::VARCHAR"
            " || '.7 ssn 123-45-6789 call +1 (555) 010-'"
            " || (1000 + doc_id % 9000)::VARCHAR")
    for pat, rep in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS redacted FROM documents"


def _mixture_sample_sql(weights: dict, budget: float, seed: int = 0) -> str:
    """Bit-identical replay of calibrated_mixture_sample: exact integer
    char sums -> one IEEE multiply/divide per stratum rate, membership by
    the same md5-derived 52-bit uniform (dyadic, so both engines agree)."""
    case = ("CASE lang " + " ".join(
        f"WHEN '{k}' THEN {float(v)!r}" for k, v in weights.items()
    ) + " ELSE 0.0 END")
    return f"""
        WITH totals AS (
          SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS total
          FROM documents GROUP BY lang
        ),
        rates AS (
          SELECT lang,
                 least(1.0, ({case}) * {float(budget)!r} / total) AS rate
          FROM totals WHERE ({case}) > 0
        )
        SELECT d.doc_id AS doc_id, d.lang AS lang
        FROM documents d JOIN rates r USING (lang)
        WHERE CAST(('0x' || substring(md5(concat_ws('|', '{int(seed)}',
                  d.doc_id::VARCHAR)), 1, 13)) AS BIGINT)
              / 4503599627370496.0 < r.rate
    """


def _split_assign_sql(fractions: dict, seed: int) -> str:
    """Bit-identical replay of assign_split: same 52-bit dyadic uniform,
    same forward CASE threshold order (last split absorbs the remainder)."""
    u = (f"CAST(('0x' || substring(md5(concat_ws('|', '{int(seed)}', "
         f"doc_id::VARCHAR)), 1, 13)) AS BIGINT) / 4503599627370496.0")
    names = list(fractions)
    cum, whens = 0.0, []
    for name in names[:-1]:
        cum += float(fractions[name])
        whens.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
    return f"SELECT doc_id, lang, {case} AS split FROM documents"


def _tfidf_sql(top_n: int) -> str:
    """Bit-identical TF-IDF replay: integer tf/df/N, one exact product and
    one correctly-rounded divide per score, rank ties broken by term."""
    return rf"""
        WITH norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest(w) AS term FROM norm),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
               GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS dfq FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT doc_id, term, tf,
                 CAST(tf AS DOUBLE) * (n + 1.0) / (dfq + 1.0) AS score
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ),
        rk AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term ASC) AS rk
          FROM scored
        )
        SELECT doc_id, term, CAST(tf AS INT) AS tf, CAST(rk AS INT) AS rk,
               round(score, 6) AS score
        FROM rk WHERE rk <= {top_n}
    """


def _funnel_sql(steps: list, horizon_s: int) -> str:
    """Anchored-window ordered funnel: chained min-after-previous aggregates
    (greedy-earliest == earliest completion), identical shape to the Spark
    operator."""
    s1, s2, s3 = steps
    return f"""
        WITH e AS (
          SELECT user_id, event_type,
                 floor(epoch(ts))::BIGINT AS ts_unix
          FROM events WHERE event_type IN ('{s1}', '{s2}', '{s3}')
        ),
        f1 AS (SELECT user_id, min(ts_unix) AS t_1 FROM e
               WHERE event_type = '{s1}' GROUP BY user_id),
        f2 AS (SELECT e.user_id, min(ts_unix) AS t_2
               FROM e JOIN f1 USING (user_id)
               WHERE event_type = '{s2}' AND ts_unix > t_1
                 AND ts_unix <= t_1 + {int(horizon_s)}
               GROUP BY e.user_id),
        f3 AS (SELECT e.user_id, min(ts_unix) AS t_3
               FROM e JOIN f1 USING (user_id) JOIN f2 USING (user_id)
               WHERE event_type = '{s3}' AND ts_unix > t_2
                 AND ts_unix <= t_1 + {int(horizon_s)}
               GROUP BY e.user_id)
        SELECT f1.user_id,
               CAST(1 + (t_2 IS NOT NULL)::INT + (t_3 IS NOT NULL)::INT
                    AS INT) AS depth,
               t_1, t_2, t_3
        FROM f1 LEFT JOIN f2 USING (user_id) LEFT JOIN f3 USING (user_id)
    """


_CORPUS_PROFILE_SQL = """
    SELECT lang, source,
           CAST(grouping(lang, source) AS BIGINT) AS gid,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY CUBE (lang, source)
"""


def _pack_sequences_sql(seq_len: int, seed: int = 0) -> str:
    """Bit-identical replay of pack_documents: same 52-bit md5 order key
    (exact BIGINT — ordering and chunk arithmetic never touch a double),
    one global running-sum window for the offsets, spans via lateral
    range unnest."""
    return rf"""
        WITH t AS (
          SELECT doc_id,
                 len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS toks,
                 CAST(('0x' || substring(md5(concat_ws('|', '{int(seed)}',
                      doc_id::VARCHAR)), 1, 13)) AS BIGINT) AS k
          FROM documents
        ),
        o AS (
          SELECT doc_id, toks,
                 coalesce(sum(toks) OVER (ORDER BY k, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS off
          FROM t WHERE toks > 0
        )
        SELECT c.chunk_id,
               o.doc_id,
               greatest(0, c.chunk_id * {seq_len} - o.off) AS start_in_doc,
               greatest(0, o.off - c.chunk_id * {seq_len}) AS start_in_chunk,
               least((c.chunk_id + 1) * {seq_len}, o.off + o.toks)
                 - greatest(c.chunk_id * {seq_len}, o.off) AS n_toks
        FROM o, LATERAL (
          SELECT unnest(range(o.off // {seq_len},
                              (o.off + o.toks - 1) // {seq_len} + 1))
                 AS chunk_id
        ) c
    """


def _pack_chunks_sql(seq_len: int, seed: int = 0) -> str:
    """Materialized chunks: the span plan (same CTEs) joined to the corpus,
    token slices reassembled with an ORDERED string_agg."""
    plan = _pack_sequences_sql(seq_len, seed)
    return rf"""
        WITH plan AS ({plan})
        SELECT p.chunk_id,
               sum(p.n_toks)::BIGINT AS n_toks,
               string_agg(
                 array_to_string(
                   list_slice(regexp_split_to_array(trim(d.text), '\s+'),
                              p.start_in_doc + 1,
                              p.start_in_doc + p.n_toks),
                   ' '),
                 ' ' ORDER BY p.start_in_chunk) AS chunk_text
        FROM plan p JOIN documents d USING (doc_id)
        GROUP BY p.chunk_id
    """


def _source_cap_sql(n: int) -> str:
    return f"""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents)
        WHERE rk <= {int(n)}
    """


def _cluster_reps_sql(threshold: float) -> str:
    """Transitive-closure clusters (same CTE chain as _dup_clusters_sql)
    reduced to one row per cluster: the max-n_chars member (min-id
    tiebreak) and the member count."""
    return rf"""
        WITH RECURSIVE norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                     range(1, greatest(len(w) - 2, 1) + 1),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
          FROM norm
        ),
        pairs AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.s, b.s)) * 1.0
                / len(list_distinct(a.s || b.s)) >= {threshold}
        ),
        edges AS (
          SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
        ),
        reach AS (
          SELECT u AS node, u AS label FROM edges
          UNION
          SELECT e.v AS node, r.label
          FROM reach r JOIN edges e ON e.u = r.node
          WHERE r.label < e.v
        ),
        clusters AS (
          SELECT d.doc_id AS doc_id,
                 coalesce(m.cluster_id, d.doc_id) AS cluster_id,
                 d.n_chars AS n_chars
          FROM documents d
          LEFT JOIN (
            SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
          ) m ON m.node = d.doc_id
        ),
        ranked AS (
          SELECT cluster_id, doc_id,
                 row_number() OVER (PARTITION BY cluster_id
                                    ORDER BY n_chars DESC, doc_id) AS rk,
                 count(*) OVER (PARTITION BY cluster_id) AS n_members
          FROM clusters
        )
        SELECT cluster_id, doc_id AS rep_id, n_members
        FROM ranked WHERE rk = 1
    """


def _simhash_pairs_sql(max_hamming: int) -> str:
    """Exhaustive all-pairs SimHash hamming oracle. Reproduces the engine's
    signature exactly: token hash bit b = bit (b%4) of md5 hex digit b//4;
    vote = sum(±1); signature bit set iff vote > 0; stored as two 32-bit
    halves so xor/bit_count stay sign-free."""
    votes = ", ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {b // 4 + 1}, 1)) - 1)"
        f" >> {b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    hi = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64)
    )
    lo = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(0, 32)
    )
    return rf"""
        WITH toks AS (
          SELECT doc_id, md5(t) AS h FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
            FROM documents)
        ),
        bits AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id),
        sigs AS (
          SELECT doc_id, ({hi})::BIGINT AS hi, ({lo})::BIGINT AS lo FROM bits
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               (bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)))::INT
                 AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
              <= {max_hamming}
    """


def _ann_lsh_sql(dim: int, num_planes: int, k: int) -> str:
    """Full-fidelity oracle of the approximate LSH pipeline: identical
    md5-derived ±1 planes, identical integer-quantized (order-independent)
    bucket bits, identical in-bucket exact-cosine re-rank."""
    from battetl_spark.analytics.similarity import QUANT, plane_signs

    signs = plane_signs(num_planes, dim)
    bucket_terms = " + ".join(
        "(CASE WHEN list_dot_product("
        f"list_transform(embedding::DOUBLE[], x -> floor(x * {QUANT})), "
        f"CAST([{', '.join(f'{s}.0' for s in signs[p])}] AS DOUBLE[])) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(num_planes)
    ) or "0"
    return f"""
        WITH withb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v, ({bucket_terms}) AS bucket
          FROM embeddings
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv, bucket FROM withb
          WHERE vec_id < 5
        ),
        sims AS (
          SELECT q.query_id, e.vec_id,
                 round(list_dot_product(e.v, q.qv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
          FROM withb e JOIN q ON e.bucket = q.bucket
          WHERE e.vec_id <> q.query_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS rank
          FROM sims
        )
        SELECT query_id, vec_id, cos_sim, rank::INT AS rank
        FROM ranked WHERE rank <= {k}
    """


def _frequent_ngrams_sql(min_df: int) -> str:
    """Exact bigram document-frequency heavy hitters: same normalization as
    the tfidf oracle, adjacent-position pairs via 1-indexed list slots
    (range is end-exclusive so i runs 1..len-1); sum over BIGINT is HUGEINT
    in DuckDB — cast back."""
    return rf"""
        WITH norm AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
          FROM documents
        ),
        grams AS (
          SELECT doc_id, w[i] || ' ' || w[i + 1] AS ngram
          FROM norm, LATERAL unnest(range(1, len(w))) AS t(i)
        ),
        per_doc AS (
          SELECT doc_id, ngram, count(*) AS occ FROM grams GROUP BY 1, 2
        )
        SELECT ngram, count(*)::BIGINT AS df,
               CAST(sum(occ) AS BIGINT) AS occurrences
        FROM per_doc GROUP BY ngram HAVING count(*) >= {min_df}
    """


_RETENTION_SQL = """
    WITH act AS (
      SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS p FROM events
    ),
    coh AS (SELECT u, min(p) AS c FROM act GROUP BY u),
    grid AS (
      SELECT c, date_diff('day', c, p) AS off, count(*) AS n_users
      FROM act JOIN coh USING (u) GROUP BY 1, 2
    )
    SELECT strftime(c, '%Y-%m-%d') AS cohort_day, CAST(off AS INT) AS offset_days,
           n_users::BIGINT AS n_users,
           CAST(max(CASE WHEN off = 0 THEN n_users END)
                OVER (PARTITION BY c) AS BIGINT) AS cohort_size
    FROM grid
"""


# discrete (higher-tie) quantiles: the smallest value whose cume_dist >= q —
# an ACTUAL data value, so no interpolation-formula last-ulp divergence
# between engines; cume_dist is an exact rational in both
_QUANTILES_SQL = """
    WITH b AS (
      SELECT event_type, value AS v,
             cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
      FROM events
    )
    SELECT event_type, count(*)::BIGINT AS n,
           round(min(CASE WHEN cd >= 0.5 THEN v END), 6) AS p50,
           round(min(CASE WHEN cd >= 0.95 THEN v END), 6) AS p95,
           round(min(CASE WHEN cd >= 0.99 THEN v END), 6) AS p99
    FROM b GROUP BY event_type
"""


# trailing-7-day distinct actives: same two-distinct shape as the Spark
# operator (range is end-exclusive: i in 0..6; DATE + INT adds days)
_ACTIVE_USERS_SQL = """
    WITH act AS (
      SELECT DISTINCT user_id AS u, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    bounds AS (SELECT max(d) AS hi FROM act),
    contrib AS (
      SELECT DISTINCT u, d + CAST(i AS INT) AS od
      FROM act, LATERAL unnest(range(0, 7)) AS t(i)
    )
    SELECT strftime(od, '%Y-%m-%d') AS day, count(*)::BIGINT AS active_users
    FROM contrib, bounds WHERE od <= hi GROUP BY od
"""


# explicit-values pivot == one pass of conditional counts
_PIVOT_SQL = """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'error')    AS n_error,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup')   AS n_signup,
           count(*) FILTER (event_type = 'view')     AS n_view
    FROM events GROUP BY user_id
"""


def oracle_sql() -> dict[str, str]:
    stop = r"\b(the|a|and|of|to|in|is|it|for|on)\b"
    lang_scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '\\b({'|'.join(m)})\\b')) AS s_{lg}"
        for lg, m in {
            "en": ["the", "and", "is", "of", "to"],
            "es": ["el", "la", "de", "que", "y"],
            "de": ["der", "die", "und", "das", "ist"],
            "fr": ["le", "la", "les", "et", "est"],
        }.items()
    )
    _HISTORY_SQL = """
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
               event_type, round(value, 6) AS value, ts,
               event_id AS valid_from_lsn,
               lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
                 AS valid_to_lsn
        FROM events
    """
    out = {
        "lww_latest_per_key": """
            SELECT user_id,
                   max(event_id) AS last_event_id,
                   arg_max(event_type, event_id) AS last_event_type,
                   round(arg_max(value, event_id), 6) AS last_value,
                   arg_max(ts, event_id) AS last_ts
            FROM events GROUP BY user_id
        """,
        "cdc_replay": """
            WITH ranked AS (
              SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id DESC) AS rn
              FROM events
            )
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_event_type,
                   round(value, 6) AS last_value
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_history": _HISTORY_SQL,
        "cdc_history_incremental": _HISTORY_SQL,
        "cdc_asof_state": """
            WITH wm AS (SELECT max(event_id) // 2 AS w FROM events),
            last AS (
              SELECT user_id, max(event_id) AS state_event_id
              FROM events, wm WHERE event_id <= w GROUP BY user_id
            )
            SELECT e.user_id, e.event_type, round(e.value, 6) AS value, e.ts,
                   l.state_event_id
            FROM events e JOIN last l
              ON e.user_id = l.user_id AND e.event_id = l.state_event_id
            WHERE e.event_type <> 'error'
        """,
        "watermark_filter": """
            SELECT user_id, count(*)::BIGINT AS n_new,
                   min(event_id) AS first_new_id
            FROM events
            WHERE event_id > (SELECT max(event_id) / 2.0 FROM events)
            GROUP BY user_id
        """,
        "dim_upsert_keys": """
            SELECT DISTINCT user_id, event_type,
                   md5(user_id::VARCHAR || '|' || event_type) AS surrogate_id
            FROM events
        """,
        "minmax_meta_refresh": """
            SELECT user_id, min(ts) AS first_recorded, max(ts) AS last_recorded,
                   count(*)::BIGINT AS n_rows
            FROM events GROUP BY user_id
        """,
        "anti_join_new_keys": """
            WITH wm AS (SELECT max(event_id) * 0.99 AS w FROM events),
            existing AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS bucket_hour
                         FROM events, wm WHERE event_id <= w),
            incoming AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS bucket_hour
                         FROM events, wm WHERE event_id > w)
            SELECT i.user_id, i.bucket_hour
            FROM incoming i LEFT JOIN existing e
              ON i.user_id = e.user_id AND i.bucket_hour = e.bucket_hour
            WHERE e.user_id IS NULL
        """,
        "running_cumsum": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS cum_value
            FROM events WHERE user_id < 40
        """,
        "lag_delta": """
            WITH d AS (
              SELECT user_id,
                     value - lag(value) OVER (PARTITION BY user_id
                                              ORDER BY event_id) AS delta
              FROM events
            )
            SELECT user_id,
                   round(sum(CASE WHEN delta > 0 THEN delta END), 6) AS sum_pos_delta,
                   count(CASE WHEN delta < 0 THEN 1 END)::BIGINT AS n_neg_delta
            FROM d GROUP BY user_id
        """,
        "fractional_crossing": """
            WITH d AS (
              SELECT user_id, event_id,
                     sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     sum(value) OVER (PARTITION BY user_id) AS total
              FROM events WHERE user_id < 40
            )
            SELECT user_id,
                   min(CASE WHEN cum >= 0.5 * total THEN event_id END)
                   AS half_crossing_event_id
            FROM d GROUP BY user_id
        """,
        "first_last": """
            SELECT user_id,
                   arg_min(value, event_id) AS first_value,
                   arg_max(value, event_id) AS last_value
            FROM events GROUP BY user_id
        """,
        "user_rollup": """
            SELECT user_id, count(*)::BIGINT AS n_events,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
                   round(sum(value), 4) AS total_value,
                   max(ts) AS last_ts
            FROM events GROUP BY user_id
        """,
        "groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*)::BIGINT AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_enrich": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "sorted_topk": """
            SELECT event_id, user_id, round(value, 6) AS value
            FROM events ORDER BY value DESC, event_id LIMIT 100
        """,
        "union_distinct": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT user_id FROM events WHERE event_type = 'purchase'
            )
        """,
        "unit_milli_scale": """
            SELECT event_id,
                   round((floor(value) * 1000 + event_id % 1000 + 0.25) * 1000,
                         2) AS value_milli
            FROM events
        """,
        "interval_parse": """
            SELECT event_id,
                   round((user_id % 3) * 86400 + 12 * 3600 + 34 * 60
                         + (event_id % 60), 3)::DOUBLE AS interval_s
            FROM events
        """,
        "datetime_parse_roundtrip": """
            SELECT event_id,
                   floor(epoch(ts))::BIGINT AS unixtime_s
            FROM events
        """,
        "tz_to_utc": """
            SELECT event_id,
                   floor(epoch(ts AT TIME ZONE 'America/Los_Angeles'))::BIGINT
                   AS utc_unixtime_s
            FROM events
        """,
        "json_extract": """
            SELECT event_type,
                   sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                   count(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 END)::BIGINT AS n_null_k
            FROM events GROUP BY event_type
        """,
        "json_pack": """
            SELECT event_id,
                   to_json(struct_pack(event_type := event_type,
                                       user_id := user_id)) AS other_details
            FROM events WHERE event_id < 1000
        """,
        "asof_join": """
            WITH p AS (SELECT user_id, event_id, round(value, 6) AS purchase_value
                       FROM events WHERE event_type = 'purchase'),
                 v AS (SELECT user_id, event_id, round(value, 6) AS value
                       FROM events WHERE event_type = 'view')
            SELECT p.user_id, p.event_id, p.purchase_value,
                   round(v.value, 6) AS value_asof
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.event_id >= v.event_id
        """,
        "range_join_count": """
            WITH p AS (SELECT user_id, event_id FROM events
                       WHERE event_type = 'purchase'),
                 v AS (SELECT user_id, event_id FROM events
                       WHERE event_type = 'view')
            SELECT p.user_id, p.event_id,
                   count(v.event_id)::BIGINT AS n_in_range
            FROM p LEFT JOIN v
              ON p.user_id = v.user_id
             AND v.event_id >= p.event_id - 1000
             AND v.event_id < p.event_id
            GROUP BY p.user_id, p.event_id
        """,
        "time_bucket_rollup": """
            SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
                   count(*)::BIGINT AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts)) > 3600
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             IS NULL
                     THEN 1 ELSE 0 END AS new_sess
              FROM events
            )
            SELECT user_id, sum(new_sess)::BIGINT AS n_sessions,
                   count(*)::BIGINT AS n_events
            FROM g GROUP BY user_id
        """,
        "doc_exact_dedup": """
            SELECT md5(text) AS digest, min(doc_id) AS keep_id,
                   count(*)::BIGINT AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "doc_token_count": r"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\s+'))::INT AS n_tokens
            FROM documents
        """,
        "doc_quality": rf"""
            WITH f AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct,
                     len(regexp_extract_all(lower(text), '{stop}')) AS n_stop,
                     length(regexp_replace(text, '\s+', '', 'g')) AS n_nospace
              FROM documents
            )
            SELECT doc_id, n_tokens::INT AS q_n_tokens,
                   round(n_punct / greatest(n_chars, 1), 6) AS q_punct_ratio,
                   round(n_stop / greatest(n_tokens, 1), 6) AS q_stop_ratio,
                   round(
                     least(n_tokens / 64.0, 1.0) * 0.4
                     + least((n_stop / greatest(n_tokens, 1)) * 4.0, 1.0) * 0.3
                     + (1.0 - least((n_punct / greatest(n_chars, 1)) * 10.0, 1.0)) * 0.2
                     + (CASE WHEN n_nospace / greatest(n_tokens, 1) BETWEEN 3 AND 8
                        THEN 0.1 ELSE 0.0 END), 6) AS q_score
            FROM f
        """,
        "doc_langid": rf"""
            WITH s AS (SELECT doc_id, {lang_scores} FROM documents),
            p AS (
              SELECT doc_id,
                     greatest(s_de, s_en, s_es, s_fr) AS best,
                     CASE
                       WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                       ELSE 'fr'
                     END AS pred_lang
              FROM s
            )
            SELECT pred_lang, count(*)::BIGINT AS n_docs FROM p GROUP BY pred_lang
        """,
        "doc_bpe_tokens": r"""
            SELECT doc_id,
                   list_sum(list_transform(
                       regexp_split_to_array(trim(text), '\s+'),
                       w -> ceil(length(w) / 4.0)))::INT AS n_pieces
            FROM documents
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS content_md5
            FROM documents
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 5
            ),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                           / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                    e.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
              FROM embeddings e, q WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM sims
            )
            SELECT query_id, vec_id, cos_sim, rank::INT AS rank
            FROM ranked WHERE rank <= 10
        """,
        "corpus_clean": rf"""
            WITH f AS (
              SELECT doc_id, lang, text,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct,
                     len(regexp_extract_all(lower(text), '{stop}')) AS n_stop,
                     length(regexp_replace(text, '\s+', '', 'g')) AS n_nospace
              FROM documents WHERE lang IN ('en', 'de')
            ),
            scored AS (
              SELECT doc_id, lang, text,
                     round(
                       least(n_tokens / 64.0, 1.0) * 0.4
                       + least((n_stop / greatest(n_tokens, 1)) * 4.0, 1.0) * 0.3
                       + (1.0 - least((n_punct / greatest(n_chars, 1)) * 10.0,
                                      1.0)) * 0.2
                       + (CASE WHEN n_nospace / greatest(n_tokens, 1)
                          BETWEEN 3 AND 8 THEN 0.1 ELSE 0.0 END), 6) AS q_score
              FROM f
            ),
            filtered AS (SELECT * FROM scored WHERE q_score >= 0.5),
            winners AS (
              SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
            ),
            kept AS (SELECT s.* FROM filtered s JOIN winners USING (doc_id)),
            norm AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text),
                         '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM kept
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, greatest(len(w) - 2, 1) + 1),
                         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
              FROM norm
            ),
            losers AS (
              SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(a.s || b.s)) >= 0.8
            )
            SELECT k.doc_id, k.lang, k.q_score
            FROM kept k LEFT JOIN losers l ON k.doc_id = l.doc_id
            WHERE l.doc_id IS NULL
        """,
        "corpus_clean_incremental": rf"""
            WITH f AS (
              SELECT doc_id, lang, text,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct,
                     len(regexp_extract_all(lower(text), '{stop}')) AS n_stop,
                     length(regexp_replace(text, '\s+', '', 'g')) AS n_nospace
              FROM documents WHERE lang IN ('en', 'de')
            ),
            scored AS (
              SELECT doc_id, lang, text,
                     round(
                       least(n_tokens / 64.0, 1.0) * 0.4
                       + least((n_stop / greatest(n_tokens, 1)) * 4.0, 1.0) * 0.3
                       + (1.0 - least((n_punct / greatest(n_chars, 1)) * 10.0,
                                      1.0)) * 0.2
                       + (CASE WHEN n_nospace / greatest(n_tokens, 1)
                          BETWEEN 3 AND 8 THEN 0.1 ELSE 0.0 END), 6) AS q_score
              FROM f
            ),
            filtered AS (SELECT * FROM scored WHERE q_score >= 0.5),
            winners AS (
              SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
            ),
            kept AS (SELECT s.* FROM filtered s JOIN winners USING (doc_id)),
            norm AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(lower(text),
                         '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM kept
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, greatest(len(w) - 2, 1) + 1),
                         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS s
              FROM norm
            ),
            losers AS (
              SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(a.s || b.s)) >= 0.8
            )
            SELECT k.doc_id, k.lang, k.q_score
            FROM kept k LEFT JOIN losers l ON k.doc_id = l.doc_id
            WHERE l.doc_id IS NULL
        """,
        "ann_ivf_topk": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            flat AS (SELECT label, unnest(v) AS val,
                            generate_subscripts(v, 1) AS dim FROM e),
            cent AS (
              SELECT label, list(round(a, 6) ORDER BY dim) AS c
              FROM (SELECT label, dim, avg(val) AS a FROM flat
                    GROUP BY label, dim)
              GROUP BY label
            ),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            probes AS (
              SELECT query_id, label, qv FROM (
                SELECT q.query_id, cent.label, q.qv,
                       row_number() OVER (
                         PARTITION BY q.query_id
                         ORDER BY round(list_dot_product(q.qv, cent.c)
                               / (sqrt(list_dot_product(q.qv, q.qv))
                                  * sqrt(list_dot_product(cent.c, cent.c))), 9)
                               DESC, cent.label) AS cr
                FROM q, cent)
              WHERE cr <= 2
            ),
            sims AS (
              SELECT p.query_id, e.vec_id,
                     round(list_dot_product(e.v, p.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(p.qv, p.qv))), 6)
                       AS cos_sim
              FROM e JOIN probes p ON e.label = p.label
              WHERE e.vec_id <> p.query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id) AS rank
              FROM sims
            )
            SELECT query_id, vec_id, cos_sim, rank::INT AS rank
            FROM ranked WHERE rank <= 10
        """,
        "emb_near_dup": """
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            aug AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 100000, list_transform(v, x -> x * 0.999 + 0.0003)
              FROM base WHERE vec_id < 25
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS c
              FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(c, 6) AS cos_sim
            FROM pairs WHERE c >= 0.9
        """,
        "emb_near_dup_incremental": """
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            aug AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 100000, list_transform(v, x -> x * 0.999 + 0.0003)
              FROM base WHERE vec_id < 25
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS c
              FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(c, 6) AS cos_sim
            FROM pairs WHERE c >= 0.9
        """,
        "doc_ngram_jaccard": _jaccard_pairs_sql(0.4),
        "doc_ngram_incremental": _jaccard_pairs_sql(0.4),
        "doc_minhash_dedup": _jaccard_pairs_sql(0.8),
        "doc_minhash_incremental": _jaccard_pairs_sql(0.8),
        "doc_dup_clusters": _dup_clusters_sql(0.8),
        "doc_dup_clusters_incremental": _dup_clusters_sql(0.8),
        "doc_cluster_reps": _cluster_reps_sql(0.8),
        "doc_mixture_sample": _mixture_sample_sql(
            _Q.MIX_WEIGHTS, _Q.MIX_BUDGET, seed=0
        ),
        "doc_source_cap": _source_cap_sql(_Q.SOURCE_CAP),
        "doc_split_assign": _split_assign_sql(_Q.SPLIT_FRACTIONS, _Q.SPLIT_SEED),
        "doc_pack_sequences": _pack_sequences_sql(_Q.PACK_SEQ_LEN, seed=0),
        "doc_pack_chunks": _pack_chunks_sql(_Q.PACK_SEQ_LEN, seed=0),
        "doc_decontaminate": _decontaminate_sql(3, 97),
        "doc_redact_pii": _redact_pii_sql(),
        "doc_repetition": _REPETITION_SQL,
        "doc_span_stats": _span_stats_sql(_QT.SPAN_K),
        "doc_span_dedup": _span_strip_sql(_QT.SPAN_K),
        "doc_span_incremental": _span_dup_occurrences_sql(_QT.SPAN_K),
        "event_funnel": _funnel_sql(_QR.FUNNEL_STEPS, _QR.FUNNEL_HORIZON_S),
        "event_retention": _RETENTION_SQL,
        "event_quantiles": _QUANTILES_SQL,
        "event_active_users": _ACTIVE_USERS_SQL,
        "event_pivot": _PIVOT_SQL,
        "doc_frequent_ngrams": _frequent_ngrams_sql(_QT.FREQ_NGRAM_MIN_DF),
        "doc_corpus_profile": _CORPUS_PROFILE_SQL,
        "doc_tfidf_terms": _tfidf_sql(_QT.TFIDF_TOP_N),
        "doc_simhash": _simhash_pairs_sql(3),
        "ann_lsh_topk": _ann_lsh_sql(dim=64, num_planes=4, k=10),
    }
    # out-of-order and streaming incremental cleaning both converge to the
    # identical batch clean_corpus state, so their oracle is
    # corpus_clean_incremental's
    out["corpus_clean_ooo"] = out["corpus_clean_incremental"]
    out["corpus_clean_stream"] = out["corpus_clean_incremental"]
    return out
