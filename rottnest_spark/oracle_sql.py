"""DuckDB oracle SQL for every contract query in
rottnest_spark.entrypoints — the other half of the driver's correctness
gate (each `queries()` entry is compared row-for-row against the SQL here
at sf0.01; see __spark_entry__.oracle_sql).

Split out of entrypoints.py (round 8) purely for reviewability: the query
callables and their shared fixture constants stay in entrypoints; this
module holds the static ORACLES table, the SQL-builder helpers, and the
dynamic (fixture-materializing) oracle builders. The star import is
deliberate — the oracle strings interpolate the SAME constants the Spark
queries use (EXACT_KEY, COSINE_TAU, Q1_CUTOFF, ...), which is exactly the
coupling that makes the gate meaningful; hiding it behind a curated import
list would just drift.

Import order: importing this module first triggers a full load of
entrypoints (which does NOT import this module at load time — its
module-level __getattr__ defers), so the cycle is load-order safe in both
directions.
"""

from __future__ import annotations

from rottnest_spark.entrypoints import *  # noqa: F401,F403

def _bm25_oracle_sql(query: str, k: int) -> str:
    toks = ", ".join(f"'{t}'" for t in tokenize_query(query))
    return f"""
        WITH toks AS (
            SELECT doc_id, t.tok AS token
            FROM documents,
                 unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS t(tok)
        ),
        doclen AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
        corpus AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                        (SELECT count(*) FROM toks)      AS total_len),
        dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
                  WHERE token IN ({toks}) GROUP BY token),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
               WHERE token IN ({toks}) GROUP BY doc_id, token)
        SELECT tf.doc_id,
               round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                         * tf * (1.2 + 1)
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * len
                                        / (total_len * 1.0 / n_docs)))), 4)
                   AS score
        FROM tf
        JOIN doclen USING (doc_id)
        JOIN dfreq  USING (token)
        CROSS JOIN corpus
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id ASC
        LIMIT {k}
    """

def _bm25_expanded_oracle_sql(query: str, k: int, expansion_tokens: int) -> str:
    """DuckDB replica of the X7 expanded pipeline. The expansion embedder is
    the documented deterministic md5-byte stub (indices/bm25.py:196-210), so
    the WHOLE expanded query — vocab embedding, cosine top-N, similarity
    weights, weighted BM25 — is SQL-expressible. The query-side vector (mean
    of the query tokens' stub embeddings) is a constant, inlined with full
    repr precision exactly as the Spark side inlines it."""
    import numpy as np

    from rottnest_spark.indices.bm25 import EMB_DIM, embed_token

    qtoks = tokenize_query(query)
    qv = np.mean([embed_token(t) for t in qtoks], axis=0)
    qn = float(np.linalg.norm(qv)) or 1.0
    qv_lit = "[" + ", ".join(repr(float(x)) for x in qv.tolist()) + "]"
    qtok_vals = ", ".join(f"('{t}')" for t in qtoks)
    return f"""
        WITH toks AS (
            SELECT doc_id, t.tok AS token
            FROM documents,
                 unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS t(tok)
        ),
        vocab AS (SELECT DISTINCT token FROM toks),
        emb AS (
            SELECT token,
                   list_transform(range(0, {EMB_DIM}),
                       i -> ('0x' || substr(md5(token), 2 * i + 1, 2))::BIGINT
                            - 127.5) AS e
            FROM vocab
        ),
        scored AS (
            SELECT token,
                   list_sum(list_transform(range(0, {EMB_DIM}),
                       i -> e[i + 1] * ({qv_lit}::DOUBLE[])[i + 1]))
                   / (sqrt(list_sum(list_transform(range(0, {EMB_DIM}),
                          i -> e[i + 1] * e[i + 1]))) * {qn!r}) AS cos
            FROM emb
        ),
        expansion AS (
            SELECT token, greatest(0.0, least(1.0, cos)) AS w
            FROM scored ORDER BY cos DESC, token ASC LIMIT {expansion_tokens}
        ),
        weights AS (
            SELECT token, max(w) AS w FROM (
                SELECT token, w FROM expansion
                UNION ALL
                SELECT token, 1.0 AS w FROM (VALUES {qtok_vals}) AS q(token)
            ) GROUP BY token
        ),
        doclen AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
        corpus AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                          (SELECT count(*) FROM toks)      AS total_len),
        dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
                  WHERE token IN (SELECT token FROM weights) GROUP BY token),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
               WHERE token IN (SELECT token FROM weights)
               GROUP BY doc_id, token)
        SELECT tf.doc_id,
               round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * w
                         * tf * (1.2 + 1)
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * len
                                        / (total_len * 1.0 / n_docs)))), 4)
                   AS score
        FROM tf
        JOIN doclen  USING (doc_id)
        JOIN dfreq   USING (token)
        JOIN weights USING (token)
        CROSS JOIN corpus
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id ASC
        LIMIT {k}
    """

def _knn_oracle_sql(k: int) -> str:
    return f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings
                   WHERE vec_id = {KNN_QUERY_ID})
        SELECT e.vec_id,
               round(sqrt(list_sum(list_transform(
                   range(1, array_length(e.embedding) + 1),
                   i -> (CAST(e.embedding[i] AS DOUBLE)
                         - CAST(q.qv[i] AS DOUBLE)) ** 2))), 4) AS dist
        FROM embeddings e CROSS JOIN q
        ORDER BY dist ASC, e.vec_id ASC
        LIMIT {k}
    """

# DuckDB fragments shared by the dedup oracles: distinct word-3-gram
# shingles per doc (1-based end-inclusive list slice == Spark slice(t,i,3)).
_SH_DISTINCT = """
    SELECT doc_id, list_distinct(list_transform(
        range(1, greatest(len(string_split(lower(text), ' ')) - 2, 0) + 1),
        i -> array_to_string(string_split(lower(text), ' ')[i:i+2], ' '))) AS sh
    FROM documents
"""

def _banded_cte(num_hashes: int = 32, bands: int = 8) -> str:
    """Shared WITH-prefix replicating _lsh_banded bit-for-bit in DuckDB
    (md5 32-bit prefix hash, 2-universal permutations, banded keys)."""
    r = num_hashes // bands
    ca, cb = dedup._mh_coeffs(num_hashes)
    a_lit = "[" + ", ".join(str(v) for v in ca) + "]"
    b_lit = "[" + ", ".join(str(v) for v in cb) + "]"
    return f"""
        sh AS ({_SH_DISTINCT}),
        sig AS (
            SELECT doc_id, sh,
                   list_transform(range(0, {num_hashes}), s ->
                       list_min(list_transform(hs, h ->
                           ({a_lit}[s + 1] * h + {b_lit}[s + 1])
                           % {dedup._MH_MOD}))) AS mh
            FROM (
                SELECT doc_id, sh,
                       list_transform(sh, x ->
                           ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
                FROM sh WHERE len(sh) > 0
            )
        ),
        banded AS (
            SELECT DISTINCT doc_id, band_key FROM (
                SELECT doc_id, unnest(list_transform(range(0, {bands}), b ->
                    md5(b::VARCHAR || '#' ||
                        array_to_string(list_transform(
                            mh[b*{r}+1 : b*{r}+{r}], v -> v::VARCHAR), ',')))) AS band_key
                FROM sig
            )
        )"""

def _minhash_oracle(num_hashes: int = 32, bands: int = 8, tau: float = 0.5) -> str:
    r = num_hashes // bands
    ca, cb = dedup._mh_coeffs(num_hashes)
    a_lit = "[" + ", ".join(str(v) for v in ca) + "]"
    b_lit = "[" + ", ".join(str(v) for v in cb) + "]"
    return f"""
        WITH sh AS ({_SH_DISTINCT}),
        sig AS (
            SELECT doc_id, sh,
                   list_transform(range(0, {num_hashes}), s ->
                       list_min(list_transform(hs, h ->
                           ({a_lit}[s + 1] * h + {b_lit}[s + 1])
                           % {dedup._MH_MOD}))) AS mh
            FROM (
                SELECT doc_id, sh,
                       list_transform(sh, x ->
                           ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
                FROM sh WHERE len(sh) > 0
            )
        ),
        banded AS (
            SELECT DISTINCT doc_id, band_key FROM (
                SELECT doc_id, unnest(list_transform(range(0, {bands}), b ->
                    md5(b::VARCHAR || '#' ||
                        array_to_string(list_transform(
                            mh[b*{r}+1 : b*{r}+{r}], v -> v::VARCHAR), ',')))) AS band_key
                FROM sig
            )
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b USING (band_key)
            WHERE a.doc_id < b.doc_id
        )
        SELECT id_a, id_b,
               round(len(list_intersect(x.sh, y.sh)) * 1.0 /
                     (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4)
                   AS jaccard
        FROM cand
        JOIN sh x ON x.doc_id = id_a
        JOIN sh y ON y.doc_id = id_b
        WHERE round(len(list_intersect(x.sh, y.sh)) * 1.0 /
                    (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4)
              >= {tau}
    """

_SIMHASH_SIG = """
    SELECT doc_id,
           list_sum(list_transform(range(0, 60), b ->
               CASE WHEN list_sum(list_transform(hs, x ->
                         CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN 1 << b ELSE 0 END))::BIGINT AS sig
    FROM (
        SELECT doc_id, list_transform(
            list_transform(
                range(1, greatest(len(string_split(lower(text), ' ')) - 2, 0) + 1),
                i -> array_to_string(string_split(lower(text), ' ')[i:i+2], ' ')),
            x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        FROM documents
    )
"""

def _sw_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in textstats.STOPWORDS[lang])

def _lang_score(lang: str) -> str:
    return (
        f"round(len(list_filter(string_split(lower(text), ' '), "
        f"t -> list_contains([{_sw_list(lang)}], t))) * 1.0 / "
        f"len(string_split(lower(text), ' ')), 4)"
    )

# The pipeline's near-dedup runs on the quality+exact-dedup survivors; LSH
# band keys and pair Jaccard are per-doc/per-pair quantities independent of
# the corpus, so pairs(subset) == pairs(all) restricted to the subset — the
# oracle reuses the full minhash pair query with both sides restricted.
def _curate_oracle() -> str:
    return f"""
        WITH q AS (
            SELECT doc_id, text, lang, source FROM documents
            WHERE length(text) >= {textstats.MIN_CHARS}
              AND round(list_sum(list_transform(string_split(lower(text), ' '),
                    t -> length(t))) * 1.0 /
                    len(string_split(lower(text), ' ')), 4)
                  BETWEEN {textstats.MIN_MEAN_LEN} AND {textstats.MAX_MEAN_LEN}
              AND round(len(list_filter(string_split(lower(text), ' '),
                    t -> list_contains([{_sw_list("en")}], t))) * 1.0 /
                    len(string_split(lower(text), ' ')), 4)
                  >= {textstats.MIN_STOPWORD_RATIO}
              AND round(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                    * 1.0 / length(text), 4) <= {textstats.MAX_PUNCT_RATIO}
        ),
        ex AS (
            SELECT q.* FROM q
            JOIN (SELECT md5(text) AS h, min(doc_id) AS keep FROM q
                  GROUP BY md5(text)) k
              ON q.doc_id = k.keep
        ),
        pairs AS ({_minhash_oracle()}),
        losers AS (
            SELECT DISTINCT id_b FROM pairs
            WHERE id_a IN (SELECT doc_id FROM ex)
              AND id_b IN (SELECT doc_id FROM ex)
        )
        SELECT doc_id, lang, source FROM ex
        WHERE doc_id NOT IN (SELECT id_b FROM losers)
    """

def _rag_oracle() -> str:
    from rottnest_spark.ops.rag import EMBED_DIM, hash_embed_py

    qv = hash_embed_py(RAG_QUERY)
    stride = CHUNK_TOKENS - CHUNK_OVERLAP

    def comp(j: int) -> str:
        return (
            f"(('0x' || substr(md5('emb:{j}:' || chunk_text), 1, 8))::BIGINT"
            f" % 1000) / 1000.0"
        )

    dot = " + ".join(f"{comp(j)} * {qv[j]!r}" for j in range(EMBED_DIM))
    nu = " + ".join(f"{comp(j)} * {comp(j)}" for j in range(EMBED_DIM))
    nq = sum(v * v for v in qv)
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
        ), c AS (
            SELECT doc_id, tk,
                   CAST(greatest(ceil((len(tk) - {CHUNK_OVERLAP})
                        / {stride}.0), 1) AS INT) AS nch
            FROM t
        ), c2 AS (
            SELECT doc_id, tk, unnest(range(1, nch + 1)) AS i FROM c
        ), chunks AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS chunk_id,
                   CAST(len(tk[(i-1)*{stride}+1 : (i-1)*{stride}+{CHUNK_TOKENS}])
                        AS INT) AS n_chunk_tokens,
                   array_to_string(
                       tk[(i-1)*{stride}+1 : (i-1)*{stride}+{CHUNK_TOKENS}], ' '
                   ) AS chunk_text
            FROM c2
        )
        SELECT doc_id, chunk_id, n_chunk_tokens,
               round(({dot}) / sqrt(({nu}) * {nq!r}), 4) AS score
        FROM chunks
        ORDER BY score DESC, doc_id, chunk_id LIMIT {RAG_K}
    """

ORACLES: dict[str, str] = {
    "exact_match_binary": f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders
        WHERE md5(CAST(o_orderkey AS VARCHAR)) = md5('{BIN_KEY}')
    """,
    "substring_search_binary": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE contains(text, '{BIN_SUB_QUERY.decode()}')
    """,
    "time_travel": f"""
        SELECT 'as_of_0' AS snapshot, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders
        UNION ALL
        SELECT 'current' AS snapshot, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders
        WHERE o_orderkey NOT BETWEEN {TT_DEL_LO} AND {TT_DEL_HI}
    """,
    # the PINNED pre-delete snapshot: the slice WITHOUT the delete
    # predicate — if the pin leaked to the current snapshot, the %7
    # tombstones would shrink n_orders and the hash would miss
    "iceberg_time_travel": f"""
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders
        WHERE o_orderkey % {MOR_SRC_MOD} = 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "iceberg_mor_read": f"""
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders
        WHERE o_orderkey % {MOR_SRC_MOD} = 0
          AND o_orderkey % {MOR_DEL_MOD} <> 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # v3 deletion vectors must be observationally identical to the v2
    # positional-delete twin — same oracle by design
    "iceberg_v3_dv_read": f"""
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders
        WHERE o_orderkey % {MOR_SRC_MOD} = 0
          AND o_orderkey % {MOR_DEL_MOD} <> 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # v3 initial-default fill arithmetic stated directly: pre-evolution
    # rows (the MOR_SRC slice) score the DEFAULT; evolved rows keep their
    # physical value including explicit NULLs (keys % V3D_NULL_MOD = 0)
    # writer-side schema evolution: add column with default, then a
    # keyed upsert overlays real values — default for untouched rows,
    # physical values for upserted ones, in plain SQL
    "iceberg_schema_evolution": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        ),
        final AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   {EVOLVE_DEFAULT} AS score
            FROM src WHERE o_orderkey % {EVOLVE_UPD_MOD} <> 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   o_orderkey % 100 AS score
            FROM src WHERE o_orderkey % {EVOLVE_UPD_MOD} = 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(sum(score) AS BIGINT) AS sum_score,
               round(sum(o_totalprice), 2) AS sum_price
        FROM final
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # Delta evolution: null for pre-evolution rows (no defaults in
    # Delta), physical values for the appended rows and upserted overlay
    "delta_schema_evolution": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        ),
        final AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   CAST(NULL AS BIGINT) AS score
            FROM src WHERE o_orderkey % {EVOLVE_UPD_MOD} <> 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   o_orderkey % 100 AS score
            FROM src WHERE o_orderkey % {EVOLVE_UPD_MOD} = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   o_orderkey % 100 AS score
            FROM orders
            WHERE o_orderkey % {EVOLVE_APP_MOD} = 0
              AND o_orderkey % {MOR_SRC_MOD} <> 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               count(score) AS n_scored,
               CAST(sum(score) AS BIGINT) AS sum_score,
               round(sum(o_totalprice), 2) AS sum_price
        FROM final
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # Delta RENAME+DROP: the renamed column's values ARE the original
    # physical values (rename is metaData-only), the upserted slice is
    # doubled, the dropped column simply never appears
    "delta_rename_column": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(CASE WHEN o_orderkey % {EVOLVE_UPD_MOD} = 0
                              THEN o_totalprice * 2
                              ELSE o_totalprice END), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM src
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # Iceberg NESTED evolution: nested rename/promote keep the physical
    # values (metadata-only), the nested add fills its default into
    # pre-evolution rows ('old') while appends carry 'new'
    "iceberg_nested_evolution": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus,
                   o_orderkey % 1000 AS cnt,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'old'
                        ELSE 'new' END AS tag
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        )
        SELECT o_orderstatus AS state, tag, count(*) AS n_orders,
               CAST(sum(cnt) AS BIGINT) AS sum_cnt,
               max(o_orderkey) AS max_key
        FROM src
        GROUP BY state, tag
        ORDER BY state, tag
    """,
    # Delta evolution on a PARTITIONED table: rename is metaData-only
    # (values are the originals), the upserted slice is doubled, the
    # dropped column never appears
    "delta_partitioned_evolution": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(CASE WHEN o_orderkey % {EVOLVE_UPD_MOD} = 0
                              THEN o_totalprice * 2
                              ELSE o_totalprice END), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM src
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # Row lineage twins: id VALUES depend on file ordering, so the gate
    # pins the deterministic arithmetic — row/id counts, survivor
    # stability, upserted-slice size
    "iceberg_row_lineage": f"""
        WITH src AS (
            SELECT o_orderkey AS k FROM orders
            WHERE o_orderkey % {MOR_SRC_MOD} = 0
        )
        SELECT
            (SELECT count(*) FROM src
             WHERE k % {MOR_DEL_MOD} <> 0 OR k % {EVOLVE_UPD_MOD} = 0
            ) AS n_rows,
            (SELECT count(*) FROM src
             WHERE k % {MOR_DEL_MOD} <> 0 OR k % {EVOLVE_UPD_MOD} = 0
            ) AS n_ids,
            (SELECT count(*) FROM src
             WHERE k % {MOR_DEL_MOD} <> 0 AND k % {EVOLVE_UPD_MOD} <> 0
            ) AS n_stable,
            (SELECT count(*) FROM src
             WHERE k % {EVOLVE_UPD_MOD} = 0) AS n_upserted
    """,
    "delta_row_tracking": f"""
        WITH src AS (
            SELECT o_orderkey AS k FROM orders
            WHERE o_orderkey % {MOR_SRC_MOD} = 0
        )
        SELECT
            (SELECT count(*) FROM src) AS n_rows,
            (SELECT count(*) FROM src) AS n_ids,
            (SELECT count(*) FROM src
             WHERE k % {EVOLVE_UPD_MOD} <> 0) AS n_stable,
            (SELECT count(*) FROM src
             WHERE k % {EVOLVE_UPD_MOD} = 0) AS n_upserted
    """,
    # Iceberg partition-spec evolution: the mixed-spec read + rewrite
    # preserve every row; the positional delete then drops a key slice
    "iceberg_spec_evolution": f"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders
        WHERE o_orderkey % {MOR_SRC_MOD} = 0
          AND o_orderkey % {EVOLVE_UPD_MOD} <> 0
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority
    """,
    # catalog commit: after commit_files through the pointer-store
    # catalog, reads see the FULL slice (half written at create, half
    # committed through the catalog)
    "catalog_commit_read": f"""
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # Iceberg RENAME+DROP: the renamed column's values are the union of
    # pre-rename files (old physical name) and post-rename appends
    "iceberg_rename_column": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM src
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "iceberg_v3_defaults_read": f"""
        WITH tbl AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST({V3D_DEFAULT} AS BIGINT) AS score
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % {V3D_NULL_MOD} <> 0
                        THEN o_orderkey % 100 END AS score
            FROM orders
            WHERE o_orderkey % {V3D_EVOLVED_MOD} = 0
              AND o_orderkey % {MOR_SRC_MOD} <> 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               count(score) AS n_scored,
               CAST(sum(score) AS BIGINT) AS sum_score,
               max(o_orderkey) AS max_key
        FROM tbl
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # partitioned v3 lifecycle (delete on a partition+physical predicate,
    # cross-partition upsert, DV rewrite) — the same slice arithmetic in
    # plain SQL; the rewrite must not change what reads observe
    "iceberg_v3_partitioned_dml": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        ),
        final AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
            WHERE NOT (o_orderstatus = 'F' AND o_orderkey % {MOR_DEL_MOD} = 0)
              AND o_orderkey % {V3P_UPD_MOD} <> 0
            UNION ALL
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   o_orderkey * 2.0 AS o_totalprice
            FROM src WHERE o_orderkey % {V3P_UPD_MOD} = 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM final
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    # transform-partitioned v3 lifecycle (round 10): same slice
    # arithmetic in plain SQL, grouped by the year-transform value
    # recomputed portably (year-1970). Bucket values are
    # spec-murmur3 (not SQL-expressible) — pinned by unit tests against
    # the spec's Appendix B vectors; the oracle verifies the logical
    # rows the transform-partitioned DML cycle produces.
    "iceberg_transform_partitioned_dml": f"""
        WITH src AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        ),
        final AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
            FROM src
            WHERE NOT (o_orderdate >= TIMESTAMP '{XFORM_DEL_CUT}'
                       AND o_orderkey % {MOR_DEL_MOD} = 0)
              AND o_orderkey % {V3P_UPD_MOD} <> 0
            UNION ALL
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   o_orderkey * 2.0 AS o_totalprice, o_orderdate
            FROM src WHERE o_orderkey % {V3P_UPD_MOD} = 0
        )
        SELECT year(o_orderdate) - 1970 AS pyear, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM final
        GROUP BY pyear, o_orderstatus
        ORDER BY pyear, o_orderstatus
    """,
    "delta_mapped_dml_read": f"""
        WITH src AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
        ),
        final AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
            WHERE o_orderkey % {MOR_DEL_MOD} <> 0 AND o_orderkey % 13 <> 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0
            FROM src WHERE o_orderkey % 13 = 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM final
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "delta_dv_read": f"""
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM orders
        WHERE o_orderkey % {MOR_SRC_MOD} = 0
          AND o_orderkey % {MOR_DEL_MOD} <> 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "iceberg_upsert_read": f"""
        WITH base AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {MOR_DEL_MOD} = 0 THEN 'U'
                        ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % {MOR_DEL_MOD} = 0 THEN 0.0
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
            UNION ALL
            SELECT o_orderkey + {CDC_INS_OFFSET}, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % {DIFF_INS_MOD} = 0
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               max(o_orderkey) AS max_key
        FROM base
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "delta_snapshot_diff": f"""
        SELECT * FROM (
            SELECT 'delete' AS _change_type, o_orderstatus,
                   count(*) AS n_rows,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders
            WHERE o_orderkey % {MOR_SRC_MOD} = 0
              AND o_orderkey % {MOR_DEL_MOD} = 0
            GROUP BY o_orderstatus
            UNION ALL
            SELECT 'insert', o_orderstatus, count(*),
                   round(sum(o_totalprice), 2)
            FROM orders
            WHERE o_orderkey % {DIFF_INS_MOD} = 0
            GROUP BY o_orderstatus
        )
        ORDER BY _change_type, o_orderstatus
    """,
    "delta_change_feed": f"""
        SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS _commit_version,
                   'insert' AS _change_type, o_orderstatus,
                   count(*) AS n_rows,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders WHERE o_orderkey % {MOR_SRC_MOD} = 0
            GROUP BY o_orderstatus
            UNION ALL
            SELECT 1, 'delete', o_orderstatus, count(*),
                   round(sum(o_totalprice), 2)
            FROM orders
            WHERE o_orderkey % {MOR_SRC_MOD} = 0
              AND o_orderkey % {MOR_DEL_MOD} = 0
            GROUP BY o_orderstatus
            UNION ALL
            SELECT 2, 'insert', o_orderstatus, count(*),
                   round(sum(o_totalprice), 2)
            FROM orders WHERE o_orderkey % {DIFF_INS_MOD} = 0
            GROUP BY o_orderstatus
        )
        ORDER BY _commit_version, _change_type, o_orderstatus
    """,
    "sync_table_replication": f"""
        SELECT o_orderstatus, count(*) AS n_rows,
               round(sum(o_totalprice), 2) AS sum_price
        FROM (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            WHERE o_orderkey % {MOR_SRC_MOD} = 0
              AND o_orderkey % {MOR_DEL_MOD} <> 0
              AND o_orderkey % {SYNC_UPS_MOD} <> 0
            UNION ALL
            SELECT o_orderkey, 'U', -1.0 FROM orders
            WHERE o_orderkey % {MOR_SRC_MOD} = 0
              AND o_orderkey % {SYNC_UPS_MOD} = 0
        )
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "substring_search": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE contains(lower(text), '{SUBSTRING_QUERY}')
    """,
    "compacted_search": f"""
        SELECT doc_id, lang, source, n_chars,
               TRUE AS compaction_effective
        FROM documents
        WHERE contains(lower(text), '{SUBSTRING_QUERY}')
    """,
    "suffix_search": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE contains(lower(text), '{SUFFIX_QUERY}')
    """,
    "exact_count": f"""
        SELECT count(*) AS n_rows FROM lineitem WHERE l_orderkey = {EXACT_KEY}
    """,
    "key_histogram": f"""
        SELECT l_orderkey, count(*) AS n_rows FROM lineitem
        GROUP BY l_orderkey ORDER BY n_rows DESC, l_orderkey ASC
        LIMIT {HIST_K}
    """,
    "bloom_match": f"""
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment
        FROM customer WHERE c_name = '{BLOOM_KEY}'
    """,
    "exact_match": f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey = {EXACT_KEY}
    """,
    "exact_match_many": " UNION ALL ".join(
        f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               CAST({key} AS BIGINT) AS __query__
        FROM orders WHERE o_orderkey = {key}
        """
        for key in EXACT_KEYS
    ),
    "substring_search_many": " UNION ALL ".join(
        f"""
        SELECT doc_id, lang, source, n_chars, '{q}' AS __query__
        FROM documents WHERE contains(lower(text), '{q}')
        """
        for q in MULTI_QUERIES
    ),
    "exact_range": f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey BETWEEN {RANGE_LO} AND {RANGE_HI}
    """,
    "exact_range_virtual": f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey BETWEEN {RANGE_LO} AND {RANGE_HI}
    """,
    "log_search": f"""
        SELECT event_id, user_id, event_type FROM events
        WHERE contains(props, '{LOG_QUERY.replace("'", "''")}')
    """,
    "logcloud_search": f"""
        SELECT event_id, user_id, event_type FROM events
        WHERE contains(props, '{LOG_QUERY.replace("'", "''")}')
    """,
    "log_search_many": " UNION ALL ".join(
        f"""
        SELECT event_id, user_id, event_type, '{q.replace("'", "''")}' AS __query__
        FROM events WHERE contains(props, '{q.replace("'", "''")}')
        """
        for q in LOG_MULTI_QUERIES
    ),
    "log_timerange": f"""
        SELECT event_id, user_id, event_type FROM events
        WHERE contains(props, '{LOG_QUERY.replace("'", "''")}')
          AND ts BETWEEN TIMESTAMP '{LOG_T_LO}' AND TIMESTAMP '{LOG_T_HI}'
    """,
    "regex_search": r"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE regexp_matches(text, 'merge\s+(sort|join)')
    """,
    "fuzzy_match": f"""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE levenshtein(lower(c_name), lower('{FUZZY_QUERY}')) <= 1
    """,
    "prefix_search": f"""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE starts_with(c_name, '{PREFIX_QUERY}')
    """,
    "disj_search": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE contains(lower(text), '{DISJ_A}')
           OR contains(lower(text), '{DISJ_B}')
    """,
    "phrase_search": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE contains(
            ' ' || array_to_string(
                list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x <> ''
                ), ' '
            ) || ' ',
            ' {SUBSTRING_QUERY} '
        )
    """,
    "pii_redact": r"""
        WITH lines AS (
            SELECT doc_id AS id,
                   text ||
                   CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || doc_id || '@example.com now'
                        ELSE '' END ||
                   CASE WHEN doc_id % 11 = 0
                        THEN ' call +1 555-01' || doc_id ELSE '' END ||
                   CASE WHEN doc_id % 13 = 0
                        THEN ' from 10.0.' || (doc_id % 256) || '.25'
                        ELSE '' END AS line
            FROM documents
        )
        SELECT id,
               len(regexp_extract_all(line,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
                   AS n_email,
               len(regexp_extract_all(line,
                   '\+?[0-9][0-9() .-]{6,}[0-9]')) AS n_phone,
               len(regexp_extract_all(line,
                   '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ipv4,
               (len(regexp_extract_all(line,
                    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) > 0
                OR len(regexp_extract_all(line,
                       '\+?[0-9][0-9() .-]{6,}[0-9]')) > 0
                OR len(regexp_extract_all(line,
                       '([0-9]{1,3}\.){3}[0-9]{1,3}')) > 0) AS has_pii,
               md5(regexp_replace(regexp_replace(regexp_replace(line,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                   '[EMAIL]', 'g'),
                   '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IPV4]', 'g'),
                   '\+?[0-9][0-9() .-]{6,}[0-9]', '[PHONE]', 'g'))
                   AS redacted_md5
        FROM lines
    """,
    "log_timerange_prefix": f"""
        WITH lines AS (
            SELECT event_id, user_id, event_type,
                   CASE WHEN event_id % 17 = 0 THEN 'CORRUPT> ' || props
                        ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') || ' ' ||
                             event_type || ' ' || props END AS line
            FROM events
        ), parsed AS (
            SELECT *, try_strptime(substr(line, 1, 19),
                                   '%Y-%m-%d %H:%M:%S') AS p
            FROM lines
        ), valid AS (
            SELECT *, CASE WHEN p >= TIMESTAMP '2000-01-01'
                            AND p <  TIMESTAMP '2050-01-01'
                           THEN p END AS pv
            FROM parsed
        ), filled AS (
            SELECT event_id, user_id, event_type, line,
                   last_value(pv IGNORE NULLS) OVER (
                       ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS line_ts
            FROM valid
        )
        SELECT event_id, user_id, event_type, line_ts FROM filled
        WHERE line_ts BETWEEN TIMESTAMP '{LOG_T_LO}'
                          AND TIMESTAMP '{LOG_T_HI}'
          AND contains(line, '{LOG_QUERY.replace("'", "''")}')
    """,
    "bm25_topk": _bm25_oracle_sql(BM25_QUERY, BM25_K),
    "bm25_topk_many": " UNION ALL ".join(
        f"SELECT *, '{q}' AS __query__ FROM ({_bm25_oracle_sql(q, BM25_K)})"
        for q in BM25_MANY
    ),
    "bm25_topk_expanded": _bm25_expanded_oracle_sql(BM25_QUERY, BM25_K, 8),
    "vector_knn_exact": _knn_oracle_sql(KNN_K),
    # the ANN paths are oracled against EXACT KNN: a hash match means
    # recall@K == 1.0 at gate scale (the quantitative assertion the
    # rows-only record lacked) — any recall dip fails the gate loudly.
    "vector_knn_ivf": _knn_oracle_sql(KNN_K),
    "vector_knn_pq": _knn_oracle_sql(KNN_K),
    "vector_knn_vamana": _knn_oracle_sql(KNN_K),
    "vector_knn_cosine": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings
                   WHERE vec_id = {KNN_QUERY_ID})
        SELECT e.vec_id,
               round(
                   list_sum(list_transform(
                       range(1, array_length(e.embedding) + 1),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(q.qv[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(
                          range(1, array_length(e.embedding) + 1),
                          i -> CAST(e.embedding[i] AS DOUBLE)
                               * CAST(e.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(
                          range(1, array_length(q.qv) + 1),
                          i -> CAST(q.qv[i] AS DOUBLE)
                               * CAST(q.qv[i] AS DOUBLE))))),
                   4) AS cosine
        FROM embeddings e CROSS JOIN q
        ORDER BY cosine DESC, e.vec_id ASC
        LIMIT {KNN_K}
    """,
    "vector_knn_many": " UNION ALL ".join(
        f"""
        SELECT * FROM (
            WITH q AS (SELECT embedding AS qv FROM embeddings
                       WHERE vec_id = {qid})
            SELECT e.vec_id, 'q{qid}' AS __query__,
                   round(sqrt(list_sum(list_transform(
                       range(1, array_length(e.embedding) + 1),
                       i -> (CAST(e.embedding[i] AS DOUBLE)
                             - CAST(q.qv[i] AS DOUBLE)) ** 2))), 4) AS dist
            FROM embeddings e CROSS JOIN q
            ORDER BY dist ASC, e.vec_id ASC
            LIMIT {KNN_K}
        )
        """
        for qid in KNN_MANY_IDS
    ),
    "hybrid_search": f"""
        WITH bm AS (SELECT * FROM ({_bm25_oracle_sql(BM25_QUERY, HYBRID_N)})),
        bmr AS (SELECT doc_id,
                       row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
                FROM bm),
        kn AS (SELECT * FROM ({_knn_oracle_sql(HYBRID_N)})),
        knr AS (SELECT vec_id AS doc_id,
                       row_number() OVER (ORDER BY dist ASC, vec_id) AS rnk
                FROM kn),
        u AS (SELECT doc_id, rnk FROM bmr
              UNION ALL
              SELECT doc_id, rnk FROM knr)
        SELECT doc_id,
               round(sum(1.0::DOUBLE / ({RRF_K0} + rnk)), 6) AS rrf
        FROM u GROUP BY doc_id
        ORDER BY rrf DESC, doc_id ASC
        LIMIT {HYBRID_K}
    """,
    "decontaminate": f"""
        WITH words AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                               '[^a-z0-9]+'), x -> x <> '') AS w
            FROM documents
        ), grams AS (
            SELECT doc_id, array_to_string(w[i:i+{DECON_N - 1}], ' ') AS g
            FROM words, unnest(range(1, len(w) - {DECON_N} + 2)) AS t(i)
            WHERE len(w) >= {DECON_N}
        ), eval_g AS (
            SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
        ), hits AS (
            SELECT doc_id, count(DISTINCT g) AS n FROM grams
            WHERE doc_id % 50 != 0 AND g IN (SELECT g FROM eval_g)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(h.n, 0) AS n_overlap,
               coalesce(h.n, 0) >= {DECON_MIN_HITS} AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 50 != 0
    """,
    "repetition_filter": f"""
        WITH words AS (
            SELECT doc_id AS id,
                   list_filter(regexp_split_to_array(lower(text),
                               '[^a-z0-9]+'), x -> x <> '') AS w
            FROM documents
        ), g AS (
            SELECT id,
                   CASE WHEN len(w) >= {textstats.REP_N}
                        THEN list_transform(
                            range(1, len(w) - {textstats.REP_N} + 2),
                            i -> array_to_string(
                                w[i:i+{textstats.REP_N - 1}], ' '))
                        ELSE [] END AS grams
            FROM words
        )
        SELECT id,
               len(grams) AS n_grams,
               len(list_distinct(grams)) AS n_distinct_grams,
               CASE WHEN len(grams) > 0
                    THEN round(1.0::DOUBLE
                               - len(list_distinct(grams)) * 1.0 / len(grams),
                               4)
                    ELSE 0.0 END AS rep_ratio,
               (CASE WHEN len(grams) > 0
                     THEN round(1.0::DOUBLE
                                - len(list_distinct(grams)) * 1.0 / len(grams),
                                4)
                     ELSE 0.0 END) <= {textstats.MAX_REP_RATIO}
                   AS keep_repetition
        FROM words JOIN g USING (id)
    """,
    # media_features / media_quality* oracles are DYNAMIC (fixture tables
    # materialize at oracle_sql() time) — see dynamic_oracles() below
    "media_payload_stats": """
        SELECT doc_id AS media_id, 'blob' AS kind,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5,
               ('0x' || hex(encode(substr(text, 1, 4))))::BIGINT AS header_u32
        FROM documents
    """,
    "token_stats": f"""
        SELECT doc_id AS id,
               len(string_split(lower(text), ' ')) AS n_tokens_ws,
               len(regexp_extract_all(lower(text),
                   '[a-z0-9]+|[^a-z0-9\\s]')) AS n_tokens_bpe,
               length(text) AS n_chars,
               round(list_sum(list_transform(string_split(lower(text), ' '),
                     t -> length(t))) * 1.0 /
                     len(string_split(lower(text), ' ')), 4) AS mean_token_len
        FROM documents
    """,
    "quality_filter": f"""
        WITH sig AS (
            SELECT doc_id AS id, length(text) AS n_chars,
                   round(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                         * 1.0 / length(text), 4) AS punct_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         * 1.0 / length(text), 4) AS digit_ratio,
                   round(len(list_filter(string_split(lower(text), ' '),
                         t -> list_contains([{_sw_list("en")}], t))) * 1.0 /
                         len(string_split(lower(text), ' ')), 4) AS stopword_ratio,
                   round(list_sum(list_transform(string_split(lower(text), ' '),
                         t -> length(t))) * 1.0 /
                         len(string_split(lower(text), ' ')), 4) AS mean_word_len
            FROM documents
        )
        SELECT *,
               n_chars >= {textstats.MIN_CHARS}
               AND mean_word_len >= {textstats.MIN_MEAN_LEN}
               AND mean_word_len <= {textstats.MAX_MEAN_LEN}
               AND stopword_ratio >= {textstats.MIN_STOPWORD_RATIO}
               AND punct_ratio <= {textstats.MAX_PUNCT_RATIO} AS keep
        FROM sig
    """,
    "lang_id": f"""
        WITH s AS (
            SELECT doc_id AS id,
                   {_lang_score("en")} AS s_en, {_lang_score("de")} AS s_de,
                   {_lang_score("fr")} AS s_fr, {_lang_score("es")} AS s_es,
                   round(length(regexp_replace(text,
                         '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g'))
                         * 1.0 / length(text), 4) AS s_zh
            FROM documents
        )
        SELECT *,
               CASE WHEN s_zh > 0.3 THEN 'zh'
                    WHEN greatest(s_en, s_de, s_fr, s_es) < 0.02 THEN 'und'
                    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                    ELSE 'es' END AS pred_lang
        FROM s
    """,
    "doc_fingerprint": f"""
        WITH n AS (
            SELECT doc_id AS id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
            FROM documents
        ), sh AS (
            SELECT id, md5(t) AS content_fp,
                   CASE WHEN len(string_split(t, ' ')) >= {textstats.WINNOW_N}
                        THEN list_transform(
                            range(1, len(string_split(t, ' '))
                                     - {textstats.WINNOW_N - 1} + 1),
                            i -> array_to_string(string_split(t, ' ')
                                 [i:i+{textstats.WINNOW_N - 1}], ' '))
                        ELSE [t] END AS shingles
            FROM n
        )
        SELECT id, content_fp,
               array_to_string(list_sort(list_transform(shingles, x -> md5(x)))
                               [1:{textstats.WINNOW_K}], ':') AS winnow_fp
        FROM sh
    """,
    "exact_dedup": """
        SELECT md5(props) AS content_hash, count(*) AS n_dups,
               min(event_id) AS keep_id
        FROM events GROUP BY md5(props) HAVING count(*) > 1
    """,
    "minhash_dedup": _minhash_oracle(),
    "lsh_bucket_stats": f"""
        WITH {_banded_cte()},
        sizes AS (
            SELECT band_key, count(*) AS bsz FROM banded GROUP BY band_key
        )
        SELECT count(*) AS n_buckets,
               max(bsz) AS max_bucket_size,
               CAST(sum(CASE WHEN bsz > {LSH_AUDIT_MAX_BUCKET}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped_buckets,
               CAST(sum(CASE WHEN bsz > {LSH_AUDIT_MAX_BUCKET}
                             THEN (bsz * (bsz - 1)) // 2 ELSE 0 END) AS BIGINT)
                   AS dropped_candidate_pairs,
               CAST({LSH_AUDIT_MAX_BUCKET} AS BIGINT) AS max_bucket
        FROM sizes
    """,
    "dup_components": f"""
        WITH RECURSIVE pairs AS ({_minhash_oracle()}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        walk(id, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, w.lbl
            FROM walk w JOIN edges e ON w.id = e.dst
        )
        SELECT id AS doc_id, min(lbl) AS component
        FROM walk GROUP BY id
    """,
    "simhash_dedup": f"""
        WITH sig AS ({_SIMHASH_SIG})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sig, b.sig)) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 8
    """,
    # exact similarity join: the oracle is the plain all-pairs definition;
    # prefix filtering in the Spark plan is lossless so results coincide
    "ngram_jaccard_join": f"""
        WITH sh AS ({_SH_DISTINCT})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                     (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
                   AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.sh) > 0 AND len(b.sh) > 0
          AND round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
              >= 0.5
    """,
    "embedding_dedup": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4)
              >= {COSINE_TAU}
    """,
    # the SemDeDup guarantee stated as SQL: one kept member per planted
    # cosine==1 twin pair (see q_semantic_dedup_exact_twins — tau 0.99
    # makes every duplicate component exactly one planted pair)
    # round-trip oracle: the encoded container parameters are pure
    # formulas of media_id (see q_mp4_container_meta) — the ISO 14496-12
    # parse must recover them exactly at the spec offsets
    "mp4_container_meta": """
        SELECT mid AS media_id, 'isom' AS brand,
               CAST(2.0 + mid % 7 AS DOUBLE) AS duration_sec,
               320 + 16 * (mid % 5) AS width,
               240 AS height, 1 AS n_tracks
        FROM range(64) t(mid)
    """,
    # structural round-trip oracle: frame counts + every-2nd sampling are
    # formulas of media_id; all_decoded=true IS the byte-range + T.81
    # decode assertion (see q_video_frame_sample)
    "video_frame_sample": """
        SELECT mid AS media_id, 'jpeg' AS codec,
               3 + mid % 4 AS n_frames,
               (3 + mid % 4 + 1) // 2 AS n_sampled,
               true AS all_decoded
        FROM range(24) t(mid)
    """,
    "semantic_dedup_exact_twins": f"""
        SELECT vec_id, 1::BIGINT AS n_kept FROM embeddings
        WHERE vec_id % {SEMDEDUP_TWIN_MOD} = 0
        ORDER BY vec_id
    """,
    "curate_documents": _curate_oracle(),
    # hash bucket: ('0x'||substr(md5(seed:id),1,12))::BIGINT % 1000000 —
    # identical arithmetic to ops/sampling.py:_bucket
    "stratified_mixture": """
        SELECT doc_id, lang, source FROM documents
        WHERE ('0x' || substr(md5('strata:' || doc_id::VARCHAR), 1, 12))::BIGINT
              % 1000000
            < CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000
                        WHEN 'fr' THEN 250000 ELSE 100000 END
    """,
    "unigram_logprob": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ), counts AS (
            SELECT tok, count(*) AS c FROM toks GROUP BY tok
        ), total AS (SELECT sum(c) AS t FROM counts)
        SELECT toks.doc_id,
               round(avg(ln(counts.c / (SELECT t FROM total))), 4)
                   AS unigram_logprob,
               count(*) AS n_tokens
        FROM toks JOIN counts USING (tok)
        GROUP BY toks.doc_id
    """,
    "profile_orders": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column, count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               {f"round(CAST(min({c}) AS DOUBLE), 4)" if num else "NULL::DOUBLE"} AS min_num,
               {f"round(CAST(max({c}) AS DOUBLE), 4)" if num else "NULL::DOUBLE"} AS max_num,
               {f"min({c})" if not num else "NULL::VARCHAR"} AS min_str,
               {f"max({c})" if not num else "NULL::VARCHAR"} AS max_str
        FROM orders
        """
        for c, num in [
            ("o_orderkey", True),
            ("o_orderstatus", False),
            ("o_totalprice", True),
            ("o_orderpriority", False),
        ]
    ),
    "chunk_documents": f"""
        WITH t AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
        ), c AS (
            SELECT doc_id, tk,
                   CAST(greatest(ceil((len(tk) - {CHUNK_OVERLAP})
                        / {CHUNK_TOKENS - CHUNK_OVERLAP}.0), 1) AS INT) AS nch
            FROM t
        )
        , c2 AS (
            SELECT doc_id, tk, unnest(range(1, nch + 1)) AS i FROM c
        )
        SELECT doc_id, CAST(i - 1 AS INT) AS chunk_id,
               CAST(len(tk[(i-1)*{CHUNK_TOKENS - CHUNK_OVERLAP}+1
                         : (i-1)*{CHUNK_TOKENS - CHUNK_OVERLAP}+{CHUNK_TOKENS}])
                    AS INT) AS n_chunk_tokens,
               array_to_string(tk[(i-1)*{CHUNK_TOKENS - CHUNK_OVERLAP}+1
                         : (i-1)*{CHUNK_TOKENS - CHUNK_OVERLAP}+{CHUNK_TOKENS}],
                    ' ') AS chunk_text
        FROM c2
    """,
    "token_mixture": """
        SELECT doc_id, source, n_tokens FROM (
            SELECT doc_id, source,
                   len(string_split(lower(text), ' ')) AS n_tokens,
                   coalesce(sum(len(string_split(lower(text), ' '))) OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 12))::BIGINT
                                % 1000000 ASC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS prior
            FROM documents
        )
        WHERE prior < CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 800
                                  WHEN 'src2' THEN 300 ELSE 0 END
    """,
    "sequence_packing": """
        SELECT doc_id, source, n_tokens,
               CAST(floor((cum - n_tokens) * 1.0 / 500) AS BIGINT) AS batch_id
        FROM (
            SELECT doc_id, source,
                   len(string_split(lower(text), ' ')) AS n_tokens,
                   sum(len(string_split(lower(text), ' ')))
                       OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
            FROM documents
        )
    """,
    "train_val_test": """
        SELECT doc_id,
               CASE
                 WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 12))::BIGINT
                      % 1000000 < 50000 THEN 'test'
                 WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 12))::BIGINT
                      % 1000000 < 950000 THEN 'train'
                 ELSE 'val'
               END AS split
        FROM documents
    """,
    "tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)       AS sum_qty,
               round(sum(l_extendedprice), 2)  AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4)       AS avg_qty,
               count(*)                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q6": f"""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
          AND l_shipdate <  TIMESTAMP '{Q6_HI}'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "top_revenue_orders": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "revenue_by_nation": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
        GROUP BY n_name
    """,
    "asof_join": """
        SELECT e.event_id, e.user_id, e.ts, o.last_order_date
        FROM events e ASOF JOIN
             (SELECT DISTINCT o_custkey, o_orderdate AS last_order_date
              FROM orders) o
        ON e.user_id = o.o_custkey AND e.ts >= o.last_order_date
    """,
    "windowed_event_counts": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "sliding_event_counts": """
        -- each event belongs to exactly window/slide = 4 hopping windows:
        -- starts floor_15min(ts) - k*15min for k in 0..3 (epoch-aligned,
        -- same alignment rule as Spark's F.window(ts, w, s))
        WITH slides AS (SELECT unnest(range(4)) AS k)
        SELECT make_timestamp(
                   CAST(floor(epoch(ts) / 900) * 900 - k * 900 AS BIGINT)
                   * 1000000) AS window_start,
               event_type,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events CROSS JOIN slides
        GROUP BY 1, 2
    """,
    "rolling_revenue": """
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate)::TIMESTAMP AS bucket,
                   count(*) AS n_rows, sum(o_totalprice) AS tv
            FROM orders GROUP BY 1
        )
        SELECT bucket, n_rows,
               round(tv, 2) AS total_value,
               round(sum(tv) OVER w, 2) AS moving_sum,
               round(avg(tv) OVER w, 2) AS moving_avg,
               CASE WHEN stddev_samp(tv) OVER w > 0
                         AND abs(tv - avg(tv) OVER w)
                             > 2.0 * (stddev_samp(tv) OVER w)
                    THEN 1 ELSE 0 END AS is_anomaly
        FROM daily
        WINDOW w AS (ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    # Gap uses whole-second floors on both sides: Spark cast(ts AS long)
    # floors to seconds; DuckDB date_diff('second') counts second boundaries.
    "events_sessionize": """
        WITH ordered AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR date_diff('second',
                                          lag(ts) OVER (PARTITION BY user_id
                                                        ORDER BY ts, event_id),
                                          ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sess AS (
            SELECT user_id, value,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered
        ), per_session AS (
            SELECT user_id, session_id, count(*) AS n_events,
                   round(sum(value), 2) AS session_value
            FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id,
               count(*) AS n_sessions,
               max(n_events) AS max_session_events,
               round(sum(session_value), 2) AS total_value
        FROM per_session GROUP BY user_id
    """,
    # duplicate 8-token spans: tk[i:i+7] is 1-based end-INCLUSIVE (8 tokens),
    # i ranges over the window starts 1..len-7 (range() end-exclusive).
    "dup_spans": f"""
        WITH t AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
        ), w AS (
            SELECT doc_id, tk,
                   unnest(range(1, len(tk) - {DUP_SPAN_WINDOW} + 2)) AS i
            FROM t WHERE len(tk) >= {DUP_SPAN_WINDOW}
        )
        SELECT md5(array_to_string(tk[i:i+{DUP_SPAN_WINDOW - 1}], ' '))
                   AS span_hash,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occ,
               min(doc_id) AS first_doc
        FROM w
        GROUP BY span_hash
        HAVING count(DISTINCT doc_id) >= 2
    """,
    "frequent_ngrams": f"""
        WITH t AS (
            SELECT string_split(lower(text), ' ') AS tk FROM documents
        ), g AS (
            SELECT array_to_string(tk[i:i+2], ' ') AS gram
            FROM (SELECT tk, unnest(range(1, len(tk) - 1)) AS i
                  FROM t WHERE len(tk) >= 3)
        )
        SELECT gram, count(*) AS n_occ
        FROM g GROUP BY gram
        ORDER BY n_occ DESC, gram LIMIT {NGRAM_TOP_K}
    """,
    # DuckDB date_trunc on a timestamp yields DATE; cast back to TIMESTAMP
    # to align with Spark's date_trunc (midnight timestamp). GROUPING(a, b)
    # is the same bitmask as Spark's grouping_id().
    "events_rollup": """
        WITH t AS (
            SELECT date_trunc('day', ts)::TIMESTAMP AS bucket,
                   event_type AS key, value AS v
            FROM events
        )
        SELECT bucket, key, GROUPING(bucket, key) AS lvl,
               count(*) AS n_rows, round(sum(v), 2) AS total_value
        FROM t GROUP BY ROLLUP(bucket, key)
    """,
    "range_join": """
        WITH bands(band, lo, hi) AS (VALUES {bands})
        SELECT band, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders JOIN bands
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """.format(
        bands=", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)
    ),
    "event_kpis": """
        SELECT event_type AS key,
               count(*) AS n_rows,
               count(DISTINCT user_id) AS n_users,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY event_type
    """,
    "time_gapfill": """
        WITH agg AS (
            SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket,
                   event_type AS key,
                   count(*) AS n_rows, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        ),
        axis AS (
            SELECT unnest(generate_series(min(bucket), max(bucket),
                                          INTERVAL 1 HOUR)) AS bucket
            FROM agg
        ),
        keys AS (SELECT DISTINCT key FROM agg)
        SELECT a.bucket, k.key,
               coalesce(g.n_rows, 0) AS n_rows,
               coalesce(g.total_value, 0.0) AS total_value
        FROM axis a
        CROSS JOIN keys k
        LEFT JOIN agg g ON g.bucket = a.bucket AND g.key = k.key
    """,
    "attribution": """
        SELECT c.user_id, c.event_id AS conv_id, c.ts AS conv_ts,
               c.value AS conv_value, max(t.ts) AS attributed_trig_ts
        FROM events c
        JOIN events t ON c.user_id = t.user_id
         AND t.ts <= c.ts AND c.ts < t.ts + INTERVAL 1 HOUR
        WHERE c.event_type = 'purchase' AND t.event_type = 'click'
        GROUP BY 1, 2, 3, 4
    """,
    "session_stats": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER w < INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id, min(ts) AS session_start,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM sess GROUP BY user_id, sid
    """,
    "events_funnel": f"""
        WITH s0 AS (
            SELECT user_id AS u, min(ts) AS t FROM events
            WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY u
        ),
        s1 AS (
            SELECT e.user_id AS u, min(e.ts) AS t FROM events e
            JOIN s0 ON e.user_id = s0.u AND e.ts > s0.t
            WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id
        ),
        s2 AS (
            SELECT e.user_id AS u, min(e.ts) AS t FROM events e
            JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
            WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id
        )
        SELECT CAST(0 AS BIGINT) AS step_idx, '{FUNNEL_STEPS[0]}' AS step,
               count(*) AS n_users FROM s0
        UNION ALL SELECT 1, '{FUNNEL_STEPS[1]}', count(*) FROM s1
        UNION ALL SELECT 2, '{FUNNEL_STEPS[2]}', count(*) FROM s2
    """,
    "cohort_retention": """
        WITH act AS (
            SELECT DISTINCT user_id AS u,
                   date_trunc('day', ts)::TIMESTAMP AS day FROM events
        ),
        first AS (SELECT u, min(day) AS cohort_day FROM act GROUP BY u)
        SELECT f.cohort_day,
               CAST(datediff('day', f.cohort_day, a.day) AS INT) AS day_offset,
               count(*) AS n_active
        FROM act a JOIN first f ON a.u = f.u
        GROUP BY 1, 2
    """,
    "top_orders_per_segment": f"""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (
                       PARTITION BY c.c_mktsegment
                       ORDER BY o.o_totalprice DESC, o.o_orderkey
                   ) AS rnk
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rnk <= {TOP_PER_SEGMENT}
    """,
    "value_histogram": f"""
        SELECT count(*) AS n_rows,
               round(sum(value), 2) AS sum_value,
               round(min(value), 2) AS min_value,
               round(max(value), 2) AS max_value,
               round(floor(value / {HIST_BIN_WIDTH}) * {HIST_BIN_WIDTH}, 2)
                   AS bin_lo
        FROM events
        GROUP BY floor(value / {HIST_BIN_WIDTH})
    """,
    "tpch_q3": f"""
        SELECT l_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '{Q3_CUTOFF}'
          AND l_shipdate > DATE '{Q3_CUTOFF}'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "tpch_q4": f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{Q45_LO} 00:00:00'
          AND o_orderdate < TIMESTAMP '{Q45_HI} 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
    """,
    "tpch_q5": f"""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{Q5_REGION}'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '{Q45_LO} 00:00:00'
          AND o_orderdate < TIMESTAMP '{Q45_HI} 00:00:00'
        GROUP BY n_name
    """,
    "tpch_q12": f"""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '{Q45_LO} 00:00:00'
          AND l_shipdate < TIMESTAMP '{Q45_HI} 00:00:00'
        GROUP BY l_returnflag
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q18": f"""
        WITH big AS (
            SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING round(sum(l_quantity), 2) > {Q18_QTY}
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "quality_weighted_sample": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE ('0x' || substr(md5('qsample:' || doc_id::VARCHAR), 1, 12))::BIGINT
              % 1000000
            < CAST(floor(least(n_chars / {QW_CHARS}, 1.0) * 1000000) AS BIGINT)
    """,
    "json_extract_agg": """
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY event_type, k_bucket
        ORDER BY event_type, k_bucket
    """,
    "events_pivot": """
        SELECT event_type,
               count(*) FILTER (dayofweek(ts) = 0) AS dow_1,
               count(*) FILTER (dayofweek(ts) = 1) AS dow_2,
               count(*) FILTER (dayofweek(ts) = 2) AS dow_3,
               count(*) FILTER (dayofweek(ts) = 3) AS dow_4,
               count(*) FILTER (dayofweek(ts) = 4) AS dow_5,
               count(*) FILTER (dayofweek(ts) = 5) AS dow_6,
               count(*) FILTER (dayofweek(ts) = 6) AS dow_7
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "rag_retrieval": _rag_oracle(),
    "event_cooccurrence": """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_users
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY type_a, type_b ORDER BY n_users DESC, type_a, type_b
    """,
    "value_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "conj_not_search": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE contains(lower(text), '{CONJ_NOT_POS}')
          AND NOT contains(lower(text), '{CONJ_NOT_NEG}')
    """,
    "domain_curation": f"""
        WITH docs AS (
            SELECT doc_id,
                   'https://site' || (doc_id % {N_DOMAINS})::VARCHAR
                       || '.example.com/page/' || doc_id::VARCHAR AS url
            FROM documents
        ), dom AS (
            SELECT doc_id,
                   regexp_extract(lower(url),
                       '^[a-z][a-z0-9+.-]*://([^/:?#]+).*$', 1) AS domain
            FROM docs
        ), allowed AS (
            SELECT * FROM dom
            WHERE domain NOT IN ({", ".join(f"'{d}'" for d in DOMAIN_BLOCKLIST)})
        ), ranked AS (
            SELECT doc_id, domain,
                   row_number() OVER (
                       PARTITION BY domain
                       ORDER BY md5(doc_id::VARCHAR), doc_id
                   ) AS rk
            FROM allowed
        )
        SELECT domain, count(*) AS n_kept,
               min(doc_id) AS min_kept, max(doc_id) AS max_kept
        FROM ranked WHERE rk <= {DOMAIN_CAP}
        GROUP BY domain ORDER BY domain
    """,
    "orders_cube": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus)
                    + 2 * GROUPING(o_orderpriority) AS INT) AS gid,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY gid, status, priority
    """,
    "price_deciles": """
        WITH d AS (
            SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
            FROM orders
        )
        SELECT decile, count(*) AS n, round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi,
               round(sum(o_totalprice), 2) AS total
        FROM d GROUP BY decile ORDER BY decile
    """,
    "customer_ltv": f"""
        WITH r AS (
            SELECT o_custkey,
                   sum(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS run_total,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS rn
            FROM orders
        )
        SELECT o_custkey, round(max(run_total), 2) AS lifetime_value,
               max(rn) AS n_orders
        FROM r GROUP BY o_custkey
        ORDER BY lifetime_value DESC, o_custkey LIMIT {LTV_TOP}
    """,
    "value_outliers": f"""
        WITH med AS (
            SELECT event_type AS g, median(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_id, e.event_type, e.value,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m ON e.event_type = m.g
        ),
        mad AS (
            SELECT event_type AS g, median(adev) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_id, d.event_type, d.value,
               round(d.adev / (1.4826 * m.mad), 4) AS score
        FROM dev d JOIN mad m ON d.event_type = m.g
        WHERE d.adev > {OUTLIER_Z} * 1.4826 * m.mad
    """,
    "tpch_q7": f"""
        SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
                OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
              AND l_shipdate BETWEEN DATE '{Q7_LO}' AND DATE '{Q7_HI}'
        ) GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8": f"""
        SELECT o_year,
               round(sum(CASE WHEN nation = '{Q8_NATION}' THEN volume
                              ELSE 0 END) / sum(volume), 4) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = '{Q8_REGION}'
              AND o_orderdate BETWEEN DATE '{Q8_LO}' AND DATE '{Q8_HI}'
              AND p_type = '{Q8_TYPE}'
        ) GROUP BY o_year ORDER BY o_year
    """,
    "tpch_q13": f"""
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCL_PRIO}'
            GROUP BY c_custkey
        ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q14": f"""
        SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
            / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '{Q14_LO}' AND l_shipdate < DATE '{Q14_HI}'
    """,
    "tpch_q15": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '{Q15_LO}'
              AND l_shipdate < DATE '{Q15_HI}'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "tpch_q17": f"""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = '{Q17_BRAND}'
          AND l_quantity < (
            SELECT 0.5 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)
    """,
    "tpch_q19": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE {}
    """.format(
        " OR ".join(
            f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s} "
            f"AND l_quantity BETWEEN {lo} AND {hi})"
            for b, s, lo, hi in Q19_ARMS
        )
    ),
    "tpch_q22": f"""
        WITH avg_bal AS (
            SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
        )
        SELECT n_name, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT a FROM avg_bal)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '{Q22_PRIO}')
        GROUP BY n_name ORDER BY n_name
    """,
    "tpch_q2": f"""
        WITH ps AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   min(l_extendedprice) AS ps_cost
            FROM lineitem GROUP BY 1, 2
        ), s AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '{Q2_REGION}'
        ), p AS (
            SELECT p_partkey, p_name FROM part
            WHERE p_type = '{Q2_TYPE}' AND p_size = {Q2_SIZE}
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(ps_cost, 2) AS supplycost
        FROM ps
        JOIN p ON ps_partkey = p_partkey
        JOIN s ON ps_suppkey = s_suppkey
        WHERE ps_cost = (SELECT min(ps2.ps_cost) FROM ps ps2
                         JOIN s s2 ON ps2.ps_suppkey = s2.s_suppkey
                         WHERE ps2.ps_partkey = ps.ps_partkey)
    """,
    "tpch_q9": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND contains(p_name, '{Q9_NAME}')
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    """,
    "tpch_q11": f"""
        WITH v AS (
            SELECT l_partkey AS ps_partkey, sum(l_extendedprice) AS value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = '{Q11_NATION}'
            GROUP BY 1
        )
        SELECT ps_partkey, round(value, 2) AS value FROM v
        WHERE value > (SELECT sum(value) FROM v) * {Q11_FRACTION}
    """,
    "tpch_q16": f"""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                     l_suppkey AS ps_suppkey FROM lineitem) ps
        JOIN part ON ps_partkey = p_partkey
        WHERE p_brand <> '{Q16_BRAND}'
          AND NOT starts_with(p_type, '{Q16_TYPE_PREFIX}')
          AND ps_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "tpch_q20": f"""
        WITH li AS (
            SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
            JOIN part ON l_partkey = p_partkey
                     AND contains(p_name, '{Q20_NAME}')
            WHERE l_shipdate >= TIMESTAMP '{Q20_LO}'
              AND l_shipdate < TIMESTAMP '{Q20_HI}'
        ), pair AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM li GROUP BY 1, 2
        ), tot AS (
            SELECT l_partkey AS pk, sum(qty) AS total_qty
            FROM pair GROUP BY 1
        )
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM pair
                            JOIN tot ON l_partkey = pk
                            WHERE qty > 0.5 * total_qty)
    """,
    "tpch_q21": f"""
        WITH li AS (
            SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate
                    + INTERVAL {Q21_LATE_DAYS} DAY) AS late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ), per_order AS (
            SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN late THEN l_suppkey END)
                       AS n_late_supp
            FROM li GROUP BY 1
        )
        SELECT s_name, count(*) AS numwait
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late) w
        JOIN per_order USING (l_orderkey)
        JOIN supplier ON w.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{Q21_NATION}' AND n_supp >= 2 AND n_late_supp = 1
        GROUP BY 1
    """,
    "cdc_merge": f"""
        WITH changes AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   round(o_totalprice + 1000.0, 2) AS o_totalprice,
                   o_orderdate, 'cdc-update' AS o_orderpriority,
                   2 AS seq, 'U' AS op
            FROM orders WHERE o_orderkey % {CDC_UPD_MOD} = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority, 1, 'D'
            FROM orders WHERE o_orderkey % {CDC_DEL_MOD} = 0
            UNION ALL
            SELECT o_orderkey + {CDC_INS_OFFSET}, o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, 'cdc-insert', 3, 'I'
            FROM orders WHERE o_orderkey % {CDC_INS_MOD} = 0
        ),
        final AS (
            SELECT * EXCLUDE (rn) FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_orderkey ORDER BY seq DESC
                ) AS rn FROM changes
            ) WHERE rn = 1
        ),
        merged AS (
            SELECT o.* FROM orders o
            WHERE NOT EXISTS (
                SELECT 1 FROM final f WHERE f.o_orderkey = o.o_orderkey
            )
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority
            FROM final WHERE op <> 'D'
        )
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               CAST(sum(CASE WHEN o_orderpriority = 'cdc-update'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
               CAST(sum(CASE WHEN o_orderpriority = 'cdc-insert'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
               max(o_orderkey) AS max_key
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
}


# --------------------------------------------------------------------------
# Dynamic oracles: decode-metric queries verified against a
# PRE-MATERIALIZED pixel table + plain SQL aggregation (round-7; closes
# the media_quality / media_quality_jpeg rows-only residue).
#
# The pattern extends mp4_container_meta's round-trip oracle to lossy /
# pseudo-random fixtures: the oracle writes the per-image PIXELS to a
# parquet file at oracle_sql() time and states brightness/contrast/
# entropy as DuckDB aggregation over them — an INDEPENDENT
# implementation of the stats arithmetic (avg/stddev_pop/-Σp·log2 p in
# SQL vs numpy in the executor closure).
#
# - media_quality: the pixel table is regenerated from the SAME seeded
#   formula synthesize_media uses, WITHOUT touching the FAKE codec — so
#   the oracle independently checks the encode → executor decode → stats
#   round trip end-to-end.
# - media_quality_jpeg: baseline JPEG is lossy, so post-decode pixels
#   cannot be derived without a decoder; the oracle decodes the fixture
#   bytes DRIVER-side with the same public-spec T.81 codec and lets SQL
#   recompute the stats — verifying the executor-shipping plumbing
#   (mapInPandas batching, closure capture) and the stats arithmetic,
#   while sharing the codec (whose own correctness is pinned by
#   tests/test_multimodal.py exact-value cases).
# --------------------------------------------------------------------------

# per-process scratch: two concurrent gate/bench runs must never read
# each other's half-written fixture (pyarrow writes are not atomic)
_ORACLE_SCRATCH = f"/tmp/rottnest_spark_oracle_media.{os.getpid()}"


def _pixel_stats_sql(path: str, select_kind: str | None) -> str:
    kind_col = f"'{select_kind}' AS kind, " if select_kind else ""
    return f"""
        WITH px AS (
            SELECT media_id, CAST(pixel AS DOUBLE) AS v
            FROM read_parquet('{path}')
        ),
        s AS (
            SELECT media_id, round(avg(v), 2) AS brightness,
                   round(stddev_pop(v), 2) AS contrast
            FROM px GROUP BY media_id
        ),
        h AS (
            SELECT media_id, v, CAST(count(*) AS DOUBLE) AS c
            FROM px GROUP BY media_id, v
        ),
        n AS (SELECT media_id, sum(c) AS tot FROM h GROUP BY media_id),
        e AS (
            SELECT h.media_id,
                   round(-sum((c / tot) * log2(c / tot)), 3) AS entropy
            FROM h JOIN n USING (media_id) GROUP BY h.media_id
        )
        SELECT s.media_id, {kind_col}s.brightness, s.contrast, e.entropy
        FROM s JOIN e USING (media_id)
    """


def _write_pixel_table(name: str, images: list) -> str:
    """(media_id, pixel) parquet from a list of (media_id, uint8 ndarray)."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    os.makedirs(_ORACLE_SCRATCH, exist_ok=True)
    path = os.path.join(_ORACLE_SCRATCH, f"{name}.parquet")
    ids, px = [], []
    for mid, arr in images:
        flat = _np.asarray(arr, _np.uint8).reshape(-1)
        ids.append(_np.full(flat.size, mid, _np.int64))
        px.append(flat.astype(_np.int32))
    _pq.write_table(
        _pa.table(
            {
                "media_id": _pa.array(_np.concatenate(ids)),
                "pixel": _pa.array(_np.concatenate(px)),
            }
        ),
        path,
    )
    return path


def _media_quality_oracle_sql() -> str:
    import numpy as _np

    images = []
    for mid in range(256):  # mirrors synthesize_media's seeded generator
        h, w = 8 + mid % 8, 8 + mid % 5
        images.append(
            (mid, _np.random.default_rng(mid).integers(
                0, 256, size=h * w, dtype=_np.uint8
            ))
        )
    return _pixel_stats_sql(
        _write_pixel_table("media_quality_pixels", images), "image"
    )


def _media_quality_jpeg_oracle_sql() -> str:
    import numpy as _np

    from rottnest_spark.ops.jpegcodec import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from rottnest_spark.ops.multimodal import _make_decoder

    decode = _make_decoder()
    images = []
    for mid in range(64):  # mirrors q_media_quality_jpeg's fixture
        yy, xx = _np.mgrid[0 : 24 + mid % 8, 0:32]
        raw = (
            128 + (30 + mid % 50) * _np.sin(yy / 5.0) * _np.cos(xx / 7.0)
        ).astype(_np.uint8)
        enc = encode_jpeg_progressive if mid % 2 else encode_jpeg
        images.append((mid, decode(enc(raw, quality=90))))
    return _pixel_stats_sql(
        _write_pixel_table("media_quality_jpeg_pixels", images), None
    )


def _media_features_oracle_sql() -> str:
    """The f0 feature (share of payload bytes in histogram bucket 0) is
    recomputed driver-side from the SAME deterministic payload bytes
    synthesize_media emits (FAKE magic + dims + seeded pixels) and
    stated as a VALUES table — fully independent of the mapInPandas
    extraction under test."""
    import struct as _struct

    import numpy as _np

    from rottnest_spark.ops.multimodal import FAKE_MAGIC, HIST_BINS

    shift = 8 - HIST_BINS.bit_length() + 1
    rows = []
    for mid in range(256):  # mirrors synthesize_media's generator
        h, w = 8 + mid % 8, 8 + mid % 5
        px = _np.random.default_rng(mid).integers(
            0, 256, size=h * w, dtype=_np.uint8
        )
        payload = FAKE_MAGIC + _struct.pack("<HH", h, w) + px.tobytes()
        arr = _np.frombuffer(payload, dtype=_np.uint8)
        hist = _np.bincount(arr >> shift, minlength=HIST_BINS)
        f0 = float(
            (hist / max(len(arr), 1)).astype(_np.float32)[0]
        )  # float32 then exact widening — the executor's dtype path
        rows.append(f"({mid}, {f0!r})")
    return (
        # CAST AS DOUBLE: DuckDB types bare VALUES literals as DECIMAL,
        # whose round() keeps trailing zeros ('0.0500' vs 0.05) and
        # string-mismatches the gate's normalized cells
        "SELECT media_id, round(CAST(f0 AS DOUBLE), 4) AS f0 FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(media_id, f0)"
    )


def dynamic_oracles() -> dict[str, str]:
    """Oracles whose SQL references fixture tables materialized at CALL
    time (underneath {scratch}). Merged over ORACLES by
    __spark_entry__.oracle_sql(); failures here must not take down the
    static oracle set, so each entry degrades independently."""
    from rottnest_spark import oracles as _orc

    out: dict[str, str] = {}
    for name, builder in (
        ("media_quality", _media_quality_oracle_sql),
        ("media_quality_jpeg", _media_quality_jpeg_oracle_sql),
        ("media_features", _media_features_oracle_sql),
        # the last two formerly-rows-only queries: k-means is iterative,
        # but the pipelines are deterministic functions of the data, so
        # the oracle recomputes them independently (rottnest_spark/oracles
        # — numpy, no engine imports) as signature-branched VALUES tables
        ("semantic_dedup", lambda: _orc.semantic_dedup_oracle_sql(COSINE_TAU)),
        ("diversity_sample", _orc.diversity_sample_oracle_sql),
    ):
        try:
            out[name] = builder()
        except Exception:  # pragma: no cover - environment-degraded path
            pass
    return out
