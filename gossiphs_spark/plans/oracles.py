"""DuckDB oracle SQL — the ANSI-SQL twins of plans/queries.py.

Each string is runnable by DuckDB 1.0 over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) and reproduces the matching Spark query bit-for-bit on integer
columns and to 4-6 rounded decimals on float columns.

Portability rules used throughout:
* 60-bit hash: CAST(('0x' || substring(md5(s),1,15)) AS BIGINT)
  == Spark conv(substring(md5(s),1,15),16,10)::long
* integer division spelled `//` (DuckDB) to match Spark floor(x/y);
  CAST(double AS INT) is avoided (DuckDB rounds, Spark truncates)
* regexp_replace always carries the 'g' flag (DuckDB is first-match)
"""

from __future__ import annotations

DOCN = "CAST(string_split({col}, '//')[2] AS BIGINT)"


def _kg_ctes(prefix: str = "", pages_where: str = "TRUE",
             pages_sql: str | None = None) -> str:
    """The text-mode KG pipeline as a CTE chain (mentions → filtered →
    edges → related), optionally name-prefixed so two corpora can coexist
    in one statement (snapshot diff). ``pages_sql`` overrides the pages
    source (must yield url, content, source) — used by oracles whose
    corpus is range-generated rather than documents-derived."""
    p = prefix
    if pages_sql is None:
        pages_sql = (
            "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
            f"text AS content, lang, source FROM documents WHERE {pages_where}"
        )
    return f"""
{p}pages AS (
  {pages_sql}
),
{p}tok0 AS (
  SELECT url, source,
         unnest(string_split(content, ' ')) AS name,
         generate_subscripts(string_split(content, ' '), 1) - 1 AS pos
  FROM {p}pages
),
{p}tokb AS (
  SELECT url, source, name, pos,
         CAST(SUM(length(name) + 1) OVER (PARTITION BY url ORDER BY pos)
              - (length(name) + 1) AS BIGINT) AS start_byte
  FROM {p}tok0
),
{p}mentions AS (
  SELECT url, source, name,
         CASE WHEN pos = MIN(pos) OVER (PARTITION BY url, name)
              THEN 'DEF' ELSE 'REF' END AS kind,
         CAST(pos AS BIGINT) AS pos, start_byte,
         CAST(start_byte + length(name) AS BIGINT) AS end_byte
  FROM {p}tokb WHERE name <> ''
),
{p}fm AS (SELECT * FROM {p}mentions WHERE length(name) > 3),
{p}fdefs AS (SELECT * FROM {p}fm WHERE kind = 'DEF'),
{p}frefs AS (SELECT * FROM {p}fm WHERE kind = 'REF'),
{p}kept_defs AS (
  SELECT d.* FROM {p}fdefs d
  WHERE EXISTS (SELECT 1 FROM {p}frefs r WHERE r.name = d.name)
),
{p}kept_refs AS (
  SELECT r.* FROM {p}frefs r
  WHERE EXISTS (SELECT 1 FROM {p}fdefs d WHERE d.name = r.name)
),
{p}filtered AS (SELECT * FROM {p}kept_defs UNION ALL SELECT * FROM {p}kept_refs),
{p}refcnt AS (
  SELECT url AS src_url, name, CAST(COUNT(*) AS BIGINT) AS weight
  FROM {p}kept_refs GROUP BY url, name
),
{p}ddist AS (SELECT DISTINCT url AS dst_url, name FROM {p}kept_defs),
{p}edges AS (
  SELECT r.src_url, d.dst_url, r.name, r.weight
  FROM {p}refcnt r JOIN {p}ddist d ON r.name = d.name
  WHERE r.src_url <> d.dst_url
),
{p}defcnt AS (SELECT url, COUNT(*) AS def_count FROM {p}kept_defs GROUP BY url),
{p}rel_in AS (
  SELECT e.dst_url AS page, e.src_url AS other,
         GREATEST(CAST(FLOOR(e.weight / dc.def_count) AS BIGINT), 1) AS w
  FROM {p}edges e JOIN {p}defcnt dc ON e.dst_url = dc.url
),
{p}rel_out AS (SELECT src_url AS page, dst_url AS other, weight AS w FROM {p}edges),
{p}related AS (
  SELECT page, other, CAST(SUM(w) AS BIGINT) AS score
  FROM (SELECT * FROM {p}rel_in UNION ALL SELECT * FROM {p}rel_out) u
  GROUP BY page, other HAVING SUM(w) > 0
)"""


KG = "WITH " + _kg_ctes().lstrip()

EVIDENCE_CTES = """
evidence AS (
  SELECT DISTINCT 'u://' || CAST(user_id AS VARCHAR) AS url,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS evidence_id,
         date_trunc('day', ts) AS ts
  FROM events
),
anchor AS (SELECT MAX(ts) AS mx FROM evidence),
decayed AS (
  SELECT url, evidence_id,
         POWER(2.0, -(EPOCH(a.mx) - EPOCH(ts)) / 86400.0 / 10.0) AS w
  FROM evidence, anchor a
)"""

USCORE_CTES = """
uscore AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
)"""

SHINGLE_CTES = """
sh_tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents WHERE doc_id < {limit}
),
sh_tok2 AS (SELECT * FROM sh_tok WHERE w <> ''),
shingles AS (
  SELECT DISTINCT doc_id, w || ' ' || w2 || ' ' || w3 AS shingle FROM (
    SELECT doc_id, w,
           LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
           LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
    FROM sh_tok2
  ) WHERE w3 IS NOT NULL
)"""


ORACLES: dict[str, str] = {}

ORACLES["u1_mentions"] = KG + f"""
SELECT url, name, kind, pos, start_byte, end_byte
FROM mentions WHERE {DOCN.format(col='url')} < 50
"""

ORACLES["u1_md_mentions"] = """
WITH mdtoks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
mdrefs AS (
  SELECT doc_id, COUNT(*) AS n_refs
  FROM mdtoks WHERE length(w) >= 6 AND regexp_matches(w, '^[a-z][a-z0-9]*$')
  GROUP BY doc_id
)
SELECT 'doc://' || CAST(d.doc_id AS VARCHAR) || '/index.md' AS url,
       CAST(1 AS BIGINT) AS n_defs,
       CAST(COALESCE(r.n_refs, 0) AS BIGINT) AS n_refs,
       CAST(1 AS BIGINT) AS n_imports,
       'Doc' || CAST(d.doc_id AS VARCHAR) AS title
FROM documents d LEFT JOIN mdrefs r ON d.doc_id = r.doc_id
"""

ORACLES["u1_mixed_profiles"] = """
WITH mixtoks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
mixrefs AS (
  SELECT doc_id, COUNT(*) AS n_refs
  FROM mixtoks WHERE length(w) >= 6 AND regexp_matches(w, '^[a-z][a-z0-9]*$')
  GROUP BY doc_id
)
SELECT 'doc://' || CAST(d.doc_id AS VARCHAR) ||
         CASE WHEN d.doc_id % 7 = 0 THEN '/page.html'
              WHEN d.doc_id % 7 = 1 THEN '/page.md'
              WHEN d.doc_id % 7 = 2 THEN '/page'
              WHEN d.doc_id % 7 = 3 THEN '/page.json'
              WHEN d.doc_id % 7 = 4 THEN '/feed.xml'
              WHEN d.doc_id % 7 = 5 THEN '/page.yaml'
              ELSE '/page.toml' END AS url,
       CAST(1 AS BIGINT) AS n_defs,
       CAST(COALESCE(r.n_refs, 0) AS BIGINT) AS n_refs,
       CAST(1 AS BIGINT) AS n_imports,
       'Doc' || CAST(d.doc_id AS VARCHAR) AS title
FROM documents d LEFT JOIN mixrefs r ON d.doc_id = r.doc_id
"""

# u1_profile_counts: the Spark side runs the REAL dispatch selector
# (extract.profile_name_of over string-typed heads, Arrow-batched
# map-side Counter); the oracle re-derives the extension + sniff rules
# arithmetically — extension wins, extensionless heads sniff by leading
# markup/json/xml markers (did%28 picks the head shape)
ORACLES["u1_profile_counts"] = """
SELECT profile, CAST(COUNT(*) AS BIGINT) AS n_pages FROM (
  SELECT CASE WHEN doc_id % 7 = 0 THEN 'html'
              WHEN doc_id % 7 = 1 THEN 'md'
              WHEN doc_id % 7 = 3 THEN 'json'
              WHEN doc_id % 7 = 4 THEN 'xml'
              WHEN doc_id % 7 = 5 THEN 'yaml'
              WHEN doc_id % 7 = 6 THEN 'ini'
              WHEN doc_id % 28 = 9 THEN 'sniff:html'
              WHEN doc_id % 28 = 16 THEN 'sniff:json'
              WHEN doc_id % 28 = 23 THEN 'sniff:xml'
              ELSE 'sniff:text' END AS profile
  FROM documents
) GROUP BY profile
"""

ORACLES["f7_pointless_counts"] = KG + """
SELECT url, kind, CAST(COUNT(*) AS BIGINT) AS n FROM filtered GROUP BY url, kind
"""

ORACLES["a3_idf"] = KG + """
SELECT name, CAST(COUNT(DISTINCT url) AS BIGINT) AS df,
       ROUND(LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                / COUNT(DISTINCT url)) + 1.0, 6) AS idf
FROM kept_defs GROUP BY name
"""

ORACLES["j1_link_exact"] = KG + f"""
SELECT r.url AS ref_url, d.url AS def_url, r.name, r.start_byte
FROM kept_refs r JOIN kept_defs d ON r.name = d.name
WHERE r.url <> d.url AND {DOCN.format(col='r.url')} < 5
"""

ORACLES["j1_candidate_counts"] = KG + """
SELECT r.url AS ref_url, r.name, CAST(COUNT(DISTINCT d.url) AS BIGINT) AS n_defs
FROM kept_refs r
JOIN (SELECT DISTINCT url, name FROM kept_defs) d ON r.name = d.name
WHERE r.url <> d.url GROUP BY r.url, r.name
"""

ORACLES["j2_link_basename"] = KG + f"""
SELECT r.url AS ref_url, d.qualified_name, d.url AS def_url
FROM (SELECT DISTINCT url, name FROM kept_refs
      WHERE {DOCN.format(col='url')} < 5) r
JOIN (SELECT DISTINCT url, source || '.' || name AS qualified_name, name
      FROM kept_defs) d
  ON r.name = d.name
WHERE r.url <> d.url
"""

ORACLES["a8_edges"] = KG + f"""
SELECT src_url, dst_url, CAST(SUM(weight) AS BIGINT) AS weight
FROM edges WHERE {DOCN.format(col='src_url')} < 10
GROUP BY src_url, dst_url
"""

ORACLES["a9_related_pages"] = KG + f"""
SELECT page, other, score FROM related WHERE {DOCN.format(col='page')} < 10
"""

ORACLES["a9_related_with_symbols"] = KG + f""",
rsym_in AS (
  SELECT e.dst_url AS page, e.src_url AS other, e.name,
         GREATEST(CAST(FLOOR(e.weight / dc.def_count) AS BIGINT), 1) AS w
  FROM edges e JOIN defcnt dc ON e.dst_url = dc.url
),
rsym_out AS (
  SELECT src_url AS page, dst_url AS other, name, CAST(weight AS BIGINT) AS w
  FROM edges
),
rsym AS (
  SELECT page, other, name, CAST(SUM(w) AS BIGINT) AS w
  FROM (SELECT * FROM rsym_in UNION ALL SELECT * FROM rsym_out) u
  GROUP BY page, other, name
),
ostats AS (
  SELECT url,
         CAST(SUM(CASE WHEN kind = 'DEF' THEN 1 ELSE 0 END) AS BIGINT) AS n_defs,
         CAST(SUM(CASE WHEN kind = 'REF' THEN 1 ELSE 0 END) AS BIGINT) AS n_refs
  FROM filtered GROUP BY url
)
SELECT r.page, r.other, CAST(SUM(r.w) AS BIGINT) AS score,
       string_agg(r.name || ':' || CAST(r.w AS VARCHAR), '|' ORDER BY r.name, r.w) AS symbols,
       MAX(o.n_defs) AS n_defs, MAX(o.n_refs) AS n_refs
FROM rsym r JOIN ostats o ON r.other = o.url
WHERE {DOCN.format(col='r.page')} < 10
GROUP BY r.page, r.other
HAVING SUM(r.w) > 0
"""

ORACLES["w8_topk_neighbors"] = KG + f"""
SELECT page, other, score, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT page, other, score,
         ROW_NUMBER() OVER (PARTITION BY page ORDER BY score DESC, other ASC) AS rnk
  FROM related WHERE {DOCN.format(col='page')} < 20
) WHERE rnk <= 5
"""

ORACLES["a9_symbol_neighbors"] = KG + """,
probe AS (SELECT DISTINCT name FROM edges ORDER BY name LIMIT 3),
pe AS (SELECT e.* FROM edges e WHERE EXISTS (SELECT 1 FROM probe p WHERE p.name = e.name)),
sn AS (
  SELECT 'DEF' AS kind, dst_url AS anchor_url, src_url AS neighbor_url, name, weight FROM pe
  UNION ALL
  SELECT 'REF' AS kind, src_url AS anchor_url, dst_url AS neighbor_url, name, weight FROM pe
)
SELECT * FROM sn WHERE {anchor} < 5
""".format(anchor=DOCN.format(col="anchor_url"))

ORACLES["eval_cutoff_search"] = KG + """,
links AS (
  SELECT page AS src, other AS dst, score,
         CASE WHEN ({pn} * 7 + {on} * 13) % 10 < 5 THEN 'confirmed'
              WHEN ({pn} * 7 + {on} * 13) % 10 < 7 THEN 'true_bonus'
              ELSE 'phantom' END AS label
  FROM related WHERE {pn} < 400
),
fullstats AS (
  SELECT COUNT(*) AS total_links, COUNT(DISTINCT src) AS n_src_total,
         -- FLOOR mirrors Python int() truncation (evalx min_kept_links);
         -- a bare CAST rounds half-away-from-zero in DuckDB
         GREATEST(50, CAST(FLOOR(COUNT(*) * 0.01) AS BIGINT)) AS min_kept
  FROM links
),
items AS (SELECT * FROM links ORDER BY score DESC, src ASC, dst ASC LIMIT 2000),
dscores AS (SELECT DISTINCT score AS s FROM items),
iscores AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s) - 1 AS i, COUNT(*) OVER () AS n
  FROM dscores
),
cutoffs AS (
  SELECT DISTINCT cutoff FROM (
    SELECT s AS cutoff
    FROM iscores, (VALUES (0.0), (0.5), (0.7), (0.8), (0.9), (0.95)) q(q)
    WHERE i = CAST(FLOOR((n - 1) * q.q) AS INT)
    UNION ALL SELECT 0
  )
),
stats AS (
  SELECT c.cutoff,
         COUNT(*) AS total,
         SUM(CASE WHEN label = 'confirmed' THEN 1 ELSE 0 END) AS confirmed,
         SUM(CASE WHEN label = 'true_bonus' THEN 1 ELSE 0 END) AS true_bonus,
         SUM(CASE WHEN label = 'phantom' THEN 1 ELSE 0 END) AS phantom,
         COUNT(DISTINCT src) AS n_src
  FROM items, cutoffs c WHERE items.score >= c.cutoff GROUP BY c.cutoff
),
pt AS (
  SELECT t.target, s.*,
         s.phantom * 1.0 / s.total AS hr,
         (s.confirmed + s.true_bonus) * 1.0 / s.total AS precision,
         s.n_src * 1.0 / f.n_src_total AS src_coverage,
         (s.phantom * 1.0 / s.total <= t.target
          AND s.total >= f.min_kept
          AND s.n_src * 1.0 / f.n_src_total >= 0.10) AS meets,
         (s.confirmed + s.true_bonus) * 1.0 / s.total
           - s.phantom * 1.0 / s.total
           + 0.15 * (s.n_src * 1.0 / f.n_src_total) AS utility
  FROM stats s, (VALUES (0.30), (0.20), (0.10)) t(target), fullstats f
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY target
    ORDER BY meets DESC,
             CASE WHEN meets THEN 0.0 ELSE -utility END ASC,
             cutoff ASC
  ) AS rn
  FROM pt
)
SELECT CAST(target AS DOUBLE) AS target, CAST(cutoff AS BIGINT) AS cutoff,
       CAST(total AS BIGINT) AS total, CAST(confirmed AS BIGINT) AS confirmed,
       CAST(true_bonus AS BIGINT) AS true_bonus, CAST(phantom AS BIGINT) AS phantom,
       ROUND(hr, 6) AS hr, ROUND(precision, 6) AS precision,
       ROUND(src_coverage, 6) AS src_coverage
FROM ranked WHERE rn = 1
""".format(pn=DOCN.format(col="page"), on=DOCN.format(col="other"))

ORACLES["o8_hub_damped_counts"] = KG + """,
dftbl AS (
  SELECT name, CAST(COUNT(DISTINCT url) AS BIGINT) AS df
  FROM kept_defs GROUP BY name
),
hot AS (
  SELECT d.name FROM dftbl d
  WHERE d.df > GREATEST(
    CAST(FLOOR(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) * 0.78) AS BIGINT), 1)
),
keptm AS (
  SELECT f.name, CAST(COUNT(*) AS BIGINT) AS n_kept FROM filtered f
  WHERE f.name NOT IN (SELECT name FROM hot) GROUP BY f.name
)
SELECT t.name, t.df, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM dftbl t LEFT JOIN keptm k ON t.name = k.name
"""

# J3 same-host fallback with the skew cap binding: every host holds
# ndocs/4 pages (>> cap 8), so the oracle must reproduce the exact
# top-8-per-host-by-lexical-url rule or the value hash flips.
ORACLES["j3_same_host_cap"] = """WITH
j3pages AS (
  SELECT 'https://h' || CAST(doc_id % 4 AS VARCHAR)
         || '.example.org/p' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
j3links AS (
  SELECT 'https://h' || CAST(doc_id % 4 AS VARCHAR)
         || '.example.org/p' || CAST(doc_id AS VARCHAR) AS url,
         'https://h' || CAST(((doc_id * 7 + 1) % (SELECT COUNT(*) FROM documents)) % 4 AS VARCHAR)
         || '.example.org/p'
         || CAST((doc_id * 7 + 1) % (SELECT COUNT(*) FROM documents) AS VARCHAR) AS target
  FROM documents WHERE doc_id < 30
  UNION ALL
  SELECT 'https://h' || CAST(doc_id % 4 AS VARCHAR)
         || '.example.org/p' || CAST(doc_id AS VARCHAR) AS url,
         'https://h' || CAST(doc_id % 4 AS VARCHAR)
         || '.example.org/missing/' || CAST(doc_id AS VARCHAR) AS target
  FROM documents WHERE doc_id < 30
),
j3exact AS (
  SELECT l.url AS src_url, l.target AS dst_url, 'exact' AS match_kind
  FROM j3links l JOIN (SELECT DISTINCT url FROM j3pages) p ON l.target = p.url
),
j3unmatched AS (
  SELECT * FROM j3links l
  WHERE NOT EXISTS (SELECT 1 FROM j3pages p WHERE p.url = l.target)
),
j3host_pages AS (
  SELECT host, dst_url FROM (
    SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           url AS dst_url,
           ROW_NUMBER() OVER (
             PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)
             ORDER BY url) AS rn
    FROM (SELECT DISTINCT url FROM j3pages)
  ) WHERE rn <= 8
),
j3by_host AS (
  SELECT u.url AS src_url, h.dst_url, 'same_host' AS match_kind
  FROM j3unmatched u
  JOIN j3host_pages h
    ON regexp_extract(u.target, '^[a-z]+://([^/]+)', 1) = h.host
  WHERE regexp_extract(u.target, '^[a-z]+://([^/]+)', 1) <> ''
)
SELECT * FROM j3exact UNION ALL SELECT * FROM j3by_host
"""

ORACLES["w4_related_filtered"] = KG + f""",
w4rel AS (SELECT * FROM related WHERE {DOCN.format(col='page')} < 50),
w4ds AS (SELECT DISTINCT page, score AS s FROM w4rel),
w4ranked AS (
  SELECT page, s,
         CAST(ROW_NUMBER() OVER (PARTITION BY page ORDER BY s DESC) AS BIGINT) - 1 AS i
  FROM w4ds
),
w4stats AS (
  SELECT page, s, i,
         COUNT(*) OVER (PARTITION BY page) AS n,
         MAX(s) OVER (PARTITION BY page) AS top,
         MIN(s) OVER (PARTITION BY page) AS last,
         LAG(s) OVER (PARTITION BY page ORDER BY s DESC) AS prev
  FROM w4ranked
),
w4knee0 AS (
  SELECT *,
    CASE WHEN n <= 2 OR top <= 0 THEN NULL
         ELSE (1.0 + (CAST(last AS DOUBLE) / top - 1.0)
               * (CAST(i AS DOUBLE) / (n - 1))) - CAST(s AS DOUBLE) / top
    END AS dist,
    CASE WHEN prev IS NOT NULL AND prev > 0
         THEN (CAST(prev AS DOUBLE) - s) / prev END AS drp
  FROM w4stats
),
w4knee1 AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY page ORDER BY dist DESC NULLS LAST, i ASC) AS knee_rn,
    ROW_NUMBER() OVER (PARTITION BY page ORDER BY drp DESC NULLS LAST, i ASC) AS drop_rn
  FROM w4knee0
),
w4cut AS (
  SELECT page,
    CAST(GREATEST(
      CASE WHEN MAX(n) <= 2 THEN MIN(s)
           WHEN MAX(top) <= 0 THEN MAX(CASE WHEN i = 0 THEN s END)
           ELSE MAX(CASE WHEN knee_rn = 1 AND dist IS NOT NULL THEN s END) END,
      COALESCE(MAX(CASE WHEN drop_rn = 1 AND drp IS NOT NULL THEN prev END),
               MAX(CASE WHEN i = 0 THEN s END))) AS BIGINT) AS cutoff
  FROM w4knee1 GROUP BY page
),
w4ranked2 AS (
  SELECT r.page, r.other, r.score, c.cutoff,
         ROW_NUMBER() OVER (PARTITION BY r.page ORDER BY r.score DESC, r.other ASC) AS rn
  FROM w4rel r JOIN w4cut c ON r.page = c.page
),
w4kept AS (
  SELECT *,
    SUM(CASE WHEN score >= cutoff THEN 1 ELSE 0 END) OVER (PARTITION BY page) AS n_kept
  FROM w4ranked2
)
SELECT page, other, score FROM w4kept
WHERE (CASE WHEN n_kept < 2 THEN rn <= 2 ELSE score >= cutoff END) AND rn <= 4
"""

ORACLES["j7_trigram_fallback"] = KG + """,
tri AS (
  SELECT url, name || ' ' || w2 || ' ' || w3 AS name3, kind FROM (
    SELECT url, name, kind,
           LEAD(name, 1) OVER (PARTITION BY url ORDER BY pos) AS w2,
           LEAD(name, 2) OVER (PARTITION BY url ORDER BY pos) AS w3
    FROM mentions
  ) WHERE w3 IS NOT NULL
),
tdefs AS (SELECT DISTINCT url, name3 AS name FROM tri WHERE kind = 'DEF'),
trefs AS (SELECT DISTINCT url, name3 AS name FROM tri WHERE kind = 'REF'),
uniq AS (
  SELECT name, MIN(url) AS def_url FROM tdefs
  GROUP BY name HAVING COUNT(DISTINCT url) = 1
)
SELECT DISTINCT u.name, u.def_url, r.url AS ref_url
FROM uniq u JOIN trefs r ON u.name = r.name
"""

ORACLES["triples_extract"] = KG + f""",
m25 AS (SELECT * FROM mentions WHERE {DOCN.format(col='url')} < 25),
heads AS (
  SELECT url, name AS subj FROM (
    SELECT url, name, ROW_NUMBER() OVER (PARTITION BY url ORDER BY pos) AS rn
    FROM m25
  ) WHERE rn = 1
),
objs AS (
  SELECT url, name AS obj, MIN(start_byte) AS start_byte
  FROM m25 WHERE length(name) > 3 GROUP BY url, name
)
SELECT h.subj, 'mentions' AS pred, o.obj, o.url, o.start_byte
FROM objs o JOIN heads h ON o.url = h.url WHERE o.obj <> h.subj
"""

ORACLES["so1_snapshot_diff"] = (
    "WITH "
    + _kg_ctes("old_", "doc_id < (SELECT COUNT(*) // 2 FROM documents)").lstrip()
    + ","
    + _kg_ctes("new_")
    + f"""
SELECT COALESCE(o.page, n.page) AS page, COALESCE(o.other, n.other) AS other,
       CASE WHEN o.page IS NULL THEN 'ADDED'
            WHEN n.page IS NULL THEN 'DELETED'
            ELSE 'MODIFIED' END AS state
FROM (SELECT DISTINCT page, other FROM old_related
      WHERE {DOCN.format(col='page')} < 5) o
FULL OUTER JOIN
     (SELECT DISTINCT page, other FROM new_related
      WHERE {DOCN.format(col='page')} < 5) n
  ON o.page = n.page AND o.other = n.other
"""
)

ORACLES["s5_dense_export"] = KG + f""",
rel5 AS (
  SELECT * FROM related
  WHERE {DOCN.format(col='page')} < 5 AND {DOCN.format(col='other')} < 5
),
urls AS (SELECT page AS url FROM rel5 UNION SELECT other FROM rel5),
nodes AS (
  SELECT url, CAST(DENSE_RANK() OVER (ORDER BY url) - 1 AS BIGINT) AS id FROM urls
)
SELECT ns.id AS src, nd.id AS dst, r.score
FROM rel5 r JOIN nodes ns ON r.page = ns.url JOIN nodes nd ON r.other = nd.url
"""

ORACLES["s6_source_matrix"] = KG + """
SELECT pa.source AS source_a, pb.source AS source_b,
       CAST(SUM(r.score) AS BIGINT) AS score
FROM related r
JOIN pages pa ON r.page = pa.url
JOIN pages pb ON r.other = pb.url
GROUP BY pa.source, pb.source
"""

ORACLES["f8_valid_evidence"] = "WITH" + EVIDENCE_CTES + """
SELECT s.evidence_id, s.n_urls FROM (
  SELECT evidence_id, CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls
  FROM evidence GROUP BY evidence_id
) s
WHERE s.n_urls < CAST(FLOOR((SELECT COUNT(DISTINCT url) FROM evidence) * 0.9) AS BIGINT)
"""

ORACLES["a4_decayed_cardinality"] = "WITH" + EVIDENCE_CTES + """
SELECT url, ROUND(SUM(w), 6) AS card FROM decayed GROUP BY url
"""

ORACLES["j5_jaccard_pairs"] = "WITH" + EVIDENCE_CTES + f""",
pairs AS (
  SELECT a1.url AS url_a, b.url AS url_b, SUM(a1.w) AS inter
  FROM decayed a1 JOIN evidence b ON a1.evidence_id = b.evidence_id
  WHERE a1.url <> b.url AND {DOCN.format(col='a1.url')} < 20
  GROUP BY 1, 2
),
card AS (SELECT url, SUM(w) AS card FROM decayed GROUP BY url)
SELECT p.url_a, p.url_b, ROUND(p.inter, 6) AS inter,
       ROUND(CASE WHEN ca.card + cb.card - p.inter > 0
                  THEN p.inter / (ca.card + cb.card - p.inter)
                  ELSE 0 END, 6) AS jaccard
FROM pairs p
JOIN card ca ON p.url_a = ca.url
JOIN card cb ON p.url_b = cb.url
"""

ORACLES["w1_knee_cutoffs"] = "WITH" + USCORE_CTES + """,
ds AS (SELECT DISTINCT user_id, s FROM uscore),
ranked AS (
  SELECT user_id, s,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s DESC) AS BIGINT) - 1 AS i
  FROM ds
),
head AS (SELECT * FROM ranked WHERE i < 12),
stats AS (
  SELECT user_id, s, i,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         MAX(s) OVER (PARTITION BY user_id) AS top,
         MIN(s) OVER (PARTITION BY user_id) AS last,
         LAG(s) OVER (PARTITION BY user_id ORDER BY s DESC) AS prev
  FROM head
),
knee0 AS (
  SELECT *,
    CASE WHEN n <= 2 OR top <= 0 THEN NULL
         ELSE (1.0 + (CAST(last AS DOUBLE) / top - 1.0)
               * (CAST(i AS DOUBLE) / (n - 1))) - CAST(s AS DOUBLE) / top
    END AS dist,
    CASE WHEN prev IS NOT NULL AND prev > 0
         THEN (CAST(prev AS DOUBLE) - s) / prev END AS drp
  FROM stats
),
knee1 AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dist DESC NULLS LAST, i ASC) AS knee_rn,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY drp DESC NULLS LAST, i ASC) AS drop_rn
  FROM knee0
),
agg AS (
  SELECT user_id, MAX(n) AS n, MAX(top) AS top, MIN(s) AS last_s,
         MAX(CASE WHEN i = 0 THEN s END) AS first_s,
         MAX(CASE WHEN knee_rn = 1 AND dist IS NOT NULL THEN s END) AS knee_raw,
         MAX(CASE WHEN drop_rn = 1 AND drp IS NOT NULL THEN prev END) AS drop_raw
  FROM knee1 GROUP BY user_id
)
SELECT user_id,
  CAST(CASE WHEN n <= 2 THEN last_s WHEN top <= 0 THEN first_s ELSE knee_raw END AS BIGINT) AS knee_cutoff,
  CAST(COALESCE(drop_raw, first_s) AS BIGINT) AS max_drop_cutoff,
  CAST(GREATEST(
    CASE WHEN n <= 2 THEN last_s WHEN top <= 0 THEN first_s ELSE knee_raw END,
    COALESCE(drop_raw, first_s)) AS BIGINT) AS cutoff
FROM agg
"""

ORACLES["w6_entropy_zscore"] = "WITH" + USCORE_CTES + """,
base AS (SELECT user_id, day, CAST(s AS DOUBLE) AS score FROM uscore),
stats AS (
  SELECT user_id, day, score,
         SUM(score) OVER (PARTITION BY user_id) AS gsum,
         COUNT(*) OVER (PARTITION BY user_id) AS gcnt,
         AVG(score) OVER (PARTITION BY user_id) AS gmean,
         COALESCE(STDDEV_POP(score) OVER (PARTITION BY user_id), 0) AS gstd
  FROM base
),
ent AS (
  SELECT *, SUM(CASE WHEN score / gsum > 0
                     THEN -(score / gsum) * LN(score / gsum) ELSE 0 END)
            OVER (PARTITION BY user_id) AS entropy
  FROM stats
)
SELECT user_id, day,
  ROUND(CASE WHEN gcnt > 1 AND gsum > 0 THEN
    (CASE WHEN gcnt > 2 AND score < gmean + 0.5 * gstd THEN score * 0.1
          ELSE score END) * EXP(-entropy)
  ELSE score END, 6) AS adj_score
FROM ent
"""

ORACLES["a13_score_buckets"] = """
WITH scored AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS s, event_type FROM events
),
lab AS (
  SELECT event_type,
    CASE WHEN s >= 500 THEN '500+'
         WHEN s >= 100 THEN '100-500'
         WHEN s >= 50 THEN '50-100'
         WHEN s >= 10 THEN '10-50'
         WHEN s >= 0 THEN '0-10'
         ELSE NULL END AS bucket
  FROM scored
)
SELECT bucket,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM lab GROUP BY bucket
"""

ORACLES["a10_file_metadata"] = KG + """,
names AS (
  SELECT url, string_agg(name, ',' ORDER BY name) AS name_list
  FROM (SELECT DISTINCT url, name FROM filtered) GROUP BY url
)
SELECT f.url,
  CAST(SUM(CASE WHEN kind = 'DEF' THEN 1 ELSE 0 END) AS BIGINT) AS n_defs,
  CAST(SUM(CASE WHEN kind = 'REF' THEN 1 ELSE 0 END) AS BIGINT) AS n_refs,
  MIN(start_byte) AS first_byte,
  MAX(end_byte) AS last_byte,
  CAST(('0x' || substring(md5(MAX(n.name_list)), 1, 15)) AS BIGINT) AS names_sig
FROM filtered f JOIN names n ON f.url = n.url
GROUP BY f.url
"""

ORACLES["x_scalar_suite"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  lower(string_split('doc://' || CAST(doc_id AS VARCHAR) || '/index.html', '.')[-1]) AS ext,
  string_split('web.' || source || '.' || lang, '.')[-1] AS base,
  ends_with('web.' || source || '.' || lang, '.' || lang) AS is_suffix,
  'doc://' || CAST(doc_id AS VARCHAR) || ':' || source || ':DEF:' || CAST(n_chars AS VARCHAR) AS symbol_id,
  CAST(('0x' || substring(md5('doc://' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS url_hash,
  ROUND(POWER(2.0, -n_chars / 365.0), 6) AS decay
FROM documents WHERE doc_id < 100
"""

ORACLES["a10_metadata_arrays"] = """
WITH base AS (
  SELECT DISTINCT 'u://' || CAST(user_id AS VARCHAR) AS url,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type
  FROM events
),
d AS (SELECT DISTINCT url, day FROM base),
t AS (SELECT DISTINCT url, event_type FROM base),
dc AS (
  SELECT url, string_agg(day, '|' ORDER BY day) AS commits,
         CAST(COUNT(*) AS BIGINT) AS n_commits
  FROM d GROUP BY url
),
tc AS (
  SELECT url, string_agg(event_type, '|' ORDER BY event_type) AS issues,
         CAST(COUNT(*) AS BIGINT) AS n_issues
  FROM t GROUP BY url
)
SELECT dc.url, dc.commits, tc.issues, dc.n_commits, tc.n_issues
FROM dc JOIN tc ON dc.url = tc.url
"""

ORACLES["dd_exact_dups"] = """
WITH seeded AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 20
)
SELECT md5(text) AS text_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM seeded GROUP BY md5(text) HAVING COUNT(*) > 1
"""

ORACLES["dd_ngram_jaccard"] = "WITH" + SHINGLE_CTES.format(limit=60) + """,
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
scored AS (
  SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS inter,
         ROUND(i.inter / (na.n + nb.n - i.inter), 6) AS jacc
  FROM inter i
  JOIN sizes na ON i.doc_a = na.doc_id
  JOIN sizes nb ON i.doc_b = nb.doc_id
)
SELECT doc_a, doc_b, inter, jacc, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY jacc DESC, doc_a ASC, doc_b ASC) AS rnk
  FROM scored
) WHERE rnk <= 50
"""

ORACLES["dd_minhash_lsh"] = "WITH" + SHINGLE_CTES.format(limit=100) + """,
perms AS (SELECT CAST(unnest(range(16)) AS INT) AS p),
sig AS (
  SELECT doc_id, p,
         MIN(CAST(('0x' || substring(md5(shingle || '#' || CAST(p AS VARCHAR)), 1, 15)) AS BIGINT)) AS sig
  FROM shingles, perms GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, CAST(p // 4 AS INT) AS band,
         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY p) AS band_key
  FROM sig GROUP BY doc_id, CAST(p // 4 AS INT)
)
SELECT doc_id, CAST(band AS BIGINT) AS band,
       CAST(('0x' || substring(md5(CAST(band AS VARCHAR) || '|' || band_key), 1, 15)) AS BIGINT) AS band_sig
FROM bands
"""

ORACLES["kg_pagerank"] = KG + f""",
pr_e AS (
  SELECT src_url, dst_url, CAST(SUM(weight) AS BIGINT) AS w
  FROM edges
  WHERE {DOCN.format(col='src_url')} < 300 AND {DOCN.format(col='dst_url')} < 300
  GROUP BY src_url, dst_url
),
pr_nodes AS (SELECT src_url AS node FROM pr_e UNION SELECT dst_url FROM pr_e),
pr_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pr_nodes),
pr_out AS (SELECT src_url, SUM(w) AS out_w FROM pr_e GROUP BY src_url),
pr_share AS (
  SELECT e.src_url AS s, e.dst_url AS d,
         CAST(e.w AS DOUBLE) / CAST(o.out_w AS DOUBLE) AS share
  FROM pr_e e JOIN pr_out o ON e.src_url = o.src_url
),
pr_r0 AS (SELECT node, CAST(1 AS DOUBLE) / pn.n AS rank FROM pr_nodes, pr_n pn),
-- teleport mirrors Spark's IEEE (1.0 - 0.85), NOT DuckDB's exact decimal 0.15
pr_r1 AS (
  SELECT nd.node,
         ROUND((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / pn.n
               + CAST(0.85 AS DOUBLE) * COALESCE(c.c, 0), 12) AS rank
  FROM pr_nodes nd CROSS JOIN pr_n pn
  LEFT JOIN (
    SELECT s.d, SUM(s.share * r.rank) AS c
    FROM pr_share s JOIN pr_r0 r ON r.node = s.s GROUP BY s.d
  ) c ON c.d = nd.node
),
pr_r2 AS (
  SELECT nd.node,
         ROUND((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / pn.n
               + CAST(0.85 AS DOUBLE) * COALESCE(c.c, 0), 12) AS rank
  FROM pr_nodes nd CROSS JOIN pr_n pn
  LEFT JOIN (
    SELECT s.d, SUM(s.share * r.rank) AS c
    FROM pr_share s JOIN pr_r1 r ON r.node = s.s GROUP BY s.d
  ) c ON c.d = nd.node
),
pr_r3 AS (
  SELECT nd.node,
         ROUND((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / pn.n
               + CAST(0.85 AS DOUBLE) * COALESCE(c.c, 0), 12) AS rank
  FROM pr_nodes nd CROSS JOIN pr_n pn
  LEFT JOIN (
    SELECT s.d, SUM(s.share * r.rank) AS c
    FROM pr_share s JOIN pr_r2 r ON r.node = s.s GROUP BY s.d
  ) c ON c.d = nd.node
)
SELECT node AS page, ROUND(rank, 6) AS pagerank FROM pr_r3
"""

def _canon_ctes(p: str, names_cte: str) -> str:
    """The U4 canonicalization chain (shingles → MinHash banding →
    blocked candidate pairs → exact-Jaccard verify → recursive min-label
    closure) over ``names_cte`` (must yield a ``name`` column), prefixed
    so several instances can coexist. Mirrors canonicalize.canonical_
    entities at its defaults (16 perms, 4 rows/band, jaccard ≥ 0.6,
    3-char shingles, 4-char block key)."""
    return f"""
{p}norm AS (
  SELECT name, lower(regexp_replace(name, '[^A-Za-z0-9]', '', 'g')) AS norm
  FROM {names_cte}
),
{p}sh AS (
  SELECT DISTINCT name, substring(norm, CAST(i AS INT), 3) AS shingle
  FROM {p}norm,
       LATERAL (SELECT unnest(range(1, GREATEST(length(norm) - 2, 1) + 1)) AS i)
  WHERE length(substring(norm, CAST(i AS INT), 3)) > 0
),
{p}perms AS (SELECT CAST(unnest(range(16)) AS INT) AS p),
{p}sig AS (
  SELECT name, p,
         MIN(CAST(('0x' || substring(md5(shingle || '#' || CAST(p AS VARCHAR)), 1, 15)) AS BIGINT)) AS sig
  FROM {p}sh, {p}perms GROUP BY name, p
),
{p}bands AS (
  SELECT name, CAST(p // 4 AS INT) AS band,
         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY p) AS band_key
  FROM {p}sig GROUP BY name, CAST(p // 4 AS INT)
),
{p}blocked AS (
  SELECT b.name, b.band, b.band_key,
         substring(lower(regexp_replace(
             string_split(b.name, '.')[-1], '[^A-Za-z0-9]', '', 'g')), 1, 4) AS block
  FROM {p}bands b
),
{p}cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM {p}blocked a
  JOIN {p}blocked b
    ON a.block = b.block AND a.band = b.band AND a.band_key = b.band_key
  WHERE a.name < b.name
),
{p}sizes AS (SELECT name, COUNT(*) AS n_sh FROM {p}sh GROUP BY name),
{p}inter AS (
  SELECT c.name_a, c.name_b, COUNT(*) AS inter
  FROM {p}cand c
  JOIN {p}sh sa ON sa.name = c.name_a
  JOIN {p}sh sb ON sb.name = c.name_b AND sb.shingle = sa.shingle
  GROUP BY c.name_a, c.name_b
),
{p}verified AS (
  SELECT i.name_a, i.name_b
  FROM {p}inter i
  JOIN {p}sizes za ON za.name = i.name_a
  JOIN {p}sizes zb ON zb.name = i.name_b
  WHERE i.inter * 1.0 / (za.n_sh + zb.n_sh - i.inter) >= 0.6
),
{p}cedges AS (
  SELECT name_a, name_b FROM {p}verified
  UNION ALL SELECT name_b, name_a FROM {p}verified
),
{p}reach(name, m) AS (
  SELECT name, name FROM {names_cte}
  UNION
  SELECT r.name, e.name_b FROM {p}reach r JOIN {p}cedges e ON e.name_a = r.m
),
{p}labels AS (SELECT name, MIN(m) AS label FROM {p}reach GROUP BY name)"""


ORACLES["u4_canonical_components"] = (
    """
WITH RECURSIVE
cc_base AS (SELECT DISTINCT p_name AS name FROM part),
cc_names AS (
  SELECT name FROM cc_base
  UNION SELECT name || 's' FROM cc_base
  UNION SELECT name || 'es' FROM cc_base
),"""
    + _canon_ctes("cc_", "cc_names")
    + """
SELECT name,
       CAST(('0x' || substring(md5(label), 1, 15)) AS BIGINT) AS entity_id,
       label AS canonical_name
FROM cc_labels
"""
)

# kg_build_scored: the COMPOSED scored pipeline (plans/pipeline.build_graph)
# as one DuckDB CTE chain — the reference's exact-score test
# (/root/reference/src/api.rs:457-526) done engine-vs-engine. The corpus is
# range-generated with the same arithmetic as the Spark query; everything
# downstream (F6/F7 → gate → damping → J1/J2 candidates → J3/J4 physical →
# F8/A4/A12 decayed Jaccard → A3 IDF → A11 /√ref_count → W6 entropy →
# F11 → X8 buckets → W1 knee+cap → J7 fallback → A8/A9 rollup) is
# recomputed relationally, mirroring the pipeline's float ops exactly
# (same operation order; no mid-chain rounding — the X8 floor and the
# integer rollup absorb sub-ulp drift). The corpus size is a template
# parameter (r7 verdict item 7): the CONTRACT pair runs at 500 pages
# (480 regular + 20 solo — knee/entropy branches over ~50-candidate
# groups), while the original 44-page twin stays registered for the
# fast parity pytest (kg_build_scored_sql(40, 4)).


def kg_build_scored_sql(n_reg: int, n_solo: int) -> str:
    return _KG_BUILD_SCORED_TPL.format(
        n_all=n_reg + n_solo, n_reg=n_reg, n_solo=n_solo)


_KG_BUILD_SCORED_TPL = """
WITH ids AS (SELECT CAST(unnest(range({n_all})) AS BIGINT) AS i),
pg AS (
  SELECT i,
    'https://w.example/d' || CAST(i // 5 AS VARCHAR) || '/p'
      || CAST(i AS VARCHAR) || '.html' AS url,
    CASE WHEN i >= {n_reg} THEN 'Solo' || CAST(i AS VARCHAR)
         WHEN i % 5 = 0 THEN 'Hub1'
         ELSE 'Ent' || CAST(i % 10 AS VARCHAR) END AS title,
    (i < {n_reg} AND i % 8 <> 7) AS has_ev,
    (i < {n_reg} AND i % 4 <> 3) AS has_imp,
    'https://w.example/d' || CAST(((i + 1) % 10) // 5 AS VARCHAR) || '/p'
      || CAST((i + 1) % 10 AS VARCHAR) || '.html' AS imp_target
  FROM ids
),
mdefs AS (SELECT url, title AS name FROM pg),
mrefs AS (
  SELECT url, 'Hub1' AS name FROM pg WHERE i < {n_reg}
  UNION ALL SELECT url, 'Ent' || CAST((i + 1) % 10 AS VARCHAR) FROM pg WHERE i < {n_reg}
  UNION ALL SELECT url, 'Ent' || CAST((i + 1) % 10 AS VARCHAR) FROM pg WHERE i < {n_reg}
  UNION ALL SELECT url, 'Ent' || CAST((i + 3) % 10 AS VARCHAR) FROM pg WHERE i < {n_reg}
  UNION ALL SELECT url, 'Alpha.Ent' || CAST((i + 7) % 10 AS VARCHAR) FROM pg WHERE i < {n_reg}
  UNION ALL SELECT url, 'Solo' || CAST({n_reg} + (i // 8) % {n_solo} AS VARCHAR)
    FROM pg WHERE i < {n_reg} AND i % 8 = 7
),
np AS (
  SELECT COUNT(DISTINCT url) AS n FROM (
    SELECT url FROM mdefs UNION ALL SELECT url FROM mrefs
  )
),
-- F6 (len > 3: every fixture name passes) + F7 with dotted suffixes
def_keep AS (
  SELECT DISTINCT name FROM mrefs
  UNION
  SELECT DISTINCT string_split(name, '.')[-1] FROM mrefs WHERE name LIKE '%.%'
),
fdefs AS (SELECT * FROM mdefs WHERE name IN (SELECT name FROM def_keep)),
dnames AS (SELECT DISTINCT name FROM fdefs),
frefs AS (
  SELECT * FROM mrefs
  WHERE name IN (SELECT name FROM dnames)
     OR (name NOT IN (SELECT name FROM dnames)
         AND string_split(name, '.')[-1] IN (SELECT name FROM dnames))
),
-- F8 fat-evidence filter + A12 anchor + A4 decay (half-life 365 d)
evr AS (
  SELECT url, 'e' || CAST(i % 6 AS VARCHAR) AS eid,
         CAST(1704067200 + (i % 6) * 86400 AS DOUBLE) AS ep
  FROM pg WHERE has_ev
  UNION ALL
  SELECT url, 'e' || CAST((i % 6 + 1) % 6 AS VARCHAR),
         CAST(1704067200 + ((i % 6 + 1) % 6) * 86400 AS DOUBLE)
  FROM pg WHERE has_ev
  UNION ALL
  SELECT url, 'fat', CAST(1704067200 + 6 * 86400 AS DOUBLE) FROM pg
),
evd0 AS (SELECT DISTINCT url, eid, ep FROM evr),
evsz AS (SELECT eid, COUNT(DISTINCT url) AS nu FROM evd0 GROUP BY eid),
evv AS (
  SELECT e.* FROM evd0 e
  WHERE e.eid IN (SELECT eid FROM evsz, np WHERE nu < CAST(FLOOR(np.n * 1.0) AS BIGINT))
),
anch AS (SELECT MAX(ep) AS mx FROM evv),
evd AS (
  SELECT url, eid,
         POWER(2.0, -(((SELECT mx FROM anch) - ep) / 86400.0) / 365.0) AS w
  FROM evv
),
cardt AS (SELECT url, SUM(w) AS card FROM evd GROUP BY url),
signal AS (SELECT url FROM evv UNION SELECT url FROM pg WHERE has_imp),
-- O8 hub damping at ratio 0.15: limit = max(int(n_pages*0.15), 1)
dftbl AS (SELECT name, COUNT(DISTINCT url) AS df FROM fdefs GROUP BY name),
stop AS (
  SELECT name FROM dftbl, np
  WHERE df > GREATEST(CAST(FLOOR(np.n * 0.15) AS BIGINT), 1)
),
cdefs AS (SELECT * FROM fdefs WHERE name NOT IN (SELECT name FROM stop)),
crefs AS (SELECT * FROM frefs WHERE name NOT IN (SELECT name FROM stop)),
-- J1/J2 candidates at the (ref_url, ref_name) grain + per-file gate
rgg AS (
  SELECT url AS ref_url, name AS ref_name, CAST(COUNT(*) AS BIGINT) AS occ
  FROM crefs WHERE url IN (SELECT url FROM signal)
  GROUP BY url, name
),
ddt AS (SELECT url AS def_url, name AS def_name FROM cdefs),
cands0 AS (
  SELECT g.ref_url, g.ref_name, g.occ, d.def_url, d.def_name
  FROM rgg g JOIN ddt d ON g.ref_name = d.def_name
  UNION ALL
  SELECT g.ref_url, g.ref_name, g.occ, d.def_url, d.def_name
  FROM (
    SELECT * FROM rgg WHERE ref_name NOT IN (SELECT def_name FROM ddt)
    UNION ALL
    SELECT * FROM rgg WHERE ref_name IN (SELECT def_name FROM ddt)
      AND ref_name LIKE '%.%'
  ) g
  JOIN ddt d ON string_split(g.ref_name, '.')[-1] = d.def_name
),
-- J3 imports (U3-resolved targets) + J4 same host+directory
impt AS (SELECT DISTINCT url AS ref_url, imp_target AS def_url FROM pg WHERE has_imp),
cand AS (
  SELECT c.*,
         (m.def_url IS NOT NULL) AS imported,
         (regexp_extract(c.ref_url, '^(.*)/', 1)
            = regexp_extract(c.def_url, '^(.*)/', 1)) AS same_pkg,
         ((m.def_url IS NOT NULL)
            OR regexp_extract(c.ref_url, '^(.*)/', 1)
                 = regexp_extract(c.def_url, '^(.*)/', 1)) AS has_physical
  FROM cands0 c
  LEFT JOIN impt m ON c.ref_url = m.ref_url AND c.def_url = m.def_url
),
-- J5/A5/A6 decayed co-occurrence restricted to candidate pairs
cpairs AS (SELECT DISTINCT ref_url, def_url FROM cand),
intert AS (
  SELECT p.ref_url, p.def_url, SUM(a.w) AS inter
  FROM cpairs p JOIN evd a ON a.url = p.ref_url
  WHERE EXISTS (SELECT 1 FROM evd b WHERE b.url = p.def_url AND b.eid = a.eid)
  GROUP BY p.ref_url, p.def_url
),
-- A3 IDF (undamped defs) + A11 ref_count (undamped refs)
idft AS (
  SELECT name AS def_name,
         LN(CAST((SELECT n FROM np) AS DOUBLE) / COUNT(DISTINCT url)) + 1.0 AS idf
  FROM fdefs GROUP BY name
),
rct AS (SELECT url AS def_url, CAST(COUNT(*) AS BIGINT) AS ref_count FROM frefs GROUP BY url),
scored0 AS (
  SELECT c.ref_url, c.ref_name, c.occ, c.def_url, c.def_name,
         c.has_physical, c.imported,
         COALESCE(i.idf, 1.0) AS idf,
         COALESCE(n.inter, 0.0) AS inter,
         COALESCE(ca.card, 0.0) AS card_a,
         COALESCE(cb.card, 0.0) AS card_b,
         COALESCE(r.ref_count, 0) AS ref_count
  FROM cand c
  LEFT JOIN idft i ON c.def_name = i.def_name
  LEFT JOIN intert n ON c.ref_url = n.ref_url AND c.def_url = n.def_url
  LEFT JOIN cardt ca ON c.ref_url = ca.url
  LEFT JOIN cardt cb ON c.def_url = cb.url
  LEFT JOIN rct r ON c.def_url = r.def_url
),
scored1 AS (
  SELECT *, CASE WHEN ref_count > 0
                 THEN base_s / SQRT(CAST(ref_count AS DOUBLE))
                 ELSE base_s END AS score
  FROM (
    SELECT *,
      idf * (CASE WHEN card_a + card_b - inter > 0
                  THEN inter / (card_a + card_b - inter) ELSE 0.0 END) * 10.0
      + (CASE WHEN has_physical THEN 100.0 ELSE 0.0 END)
      + (CASE WHEN imported THEN 50.0 ELSE 0.0 END) AS base_s
    FROM scored0
  )
),
-- W6 entropy / z-score ambiguity pruning per (ref_url, ref_name)
ent0 AS (
  SELECT *, SUM(score) OVER w AS gsum, COUNT(*) OVER w AS gcnt,
         AVG(score) OVER w AS gmean,
         COALESCE(STDDEV_POP(score) OVER w, 0.0) AS gstd
  FROM scored1 WINDOW w AS (PARTITION BY ref_url, ref_name)
),
ent1 AS (
  SELECT *, SUM(CASE WHEN gsum > 0 AND score > 0
                     THEN -(score / gsum) * LN(score / gsum) ELSE 0.0 END)
            OVER (PARTITION BY ref_url, ref_name) AS entropy
  FROM ent0
),
adjt AS (
  SELECT ref_url, ref_name, occ, def_url, def_name, has_physical,
    CASE WHEN gcnt > 1 AND gsum > 0 THEN
      (CASE WHEN (NOT has_physical) AND gcnt > 2 AND score < gmean + 0.5 * gstd
            THEN score * 0.1 ELSE score END) * EXP(-entropy)
    ELSE score END AS score
  FROM ent1
),
-- F11 min_score (0.01) + X8 integer buckets
buck AS (
  SELECT *, CAST(FLOOR(score) AS BIGINT) AS bucket
  FROM adjt WHERE has_physical OR score >= 0.01
),
-- W1 knee/max-drop over distinct buckets, head k = max(def_limit,2) = 3
wds AS (SELECT DISTINCT ref_url, ref_name, bucket AS s FROM buck),
whead AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY ref_url, ref_name ORDER BY s DESC) - 1 AS i
    FROM wds
  ) WHERE i < 3
),
wst AS (
  SELECT *, COUNT(*) OVER w AS n, MAX(s) OVER w AS top, MIN(s) OVER w AS last,
         LAG(s) OVER (PARTITION BY ref_url, ref_name ORDER BY s DESC) AS prev
  FROM whead WINDOW w AS (PARTITION BY ref_url, ref_name)
),
wk0 AS (
  SELECT *,
    CASE WHEN n <= 2 OR top <= 0 THEN NULL
         ELSE (1.0 + (CAST(last AS DOUBLE) / top - 1.0)
               * (CAST(i AS DOUBLE) / (n - 1))) - CAST(s AS DOUBLE) / top
    END AS dist,
    CASE WHEN prev IS NOT NULL AND prev > 0
         THEN (CAST(prev AS DOUBLE) - s) / prev END AS drp
  FROM wst
),
wk1 AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY ref_url, ref_name
                       ORDER BY dist DESC NULLS LAST, i ASC) AS knee_rn,
    ROW_NUMBER() OVER (PARTITION BY ref_url, ref_name
                       ORDER BY drp DESC NULLS LAST, i ASC) AS drop_rn
  FROM wk0
),
wcut AS (
  SELECT ref_url, ref_name,
    GREATEST(
      CASE WHEN MAX(n) <= 2 THEN MIN(s)
           WHEN MAX(top) <= 0 THEN MAX(CASE WHEN i = 0 THEN s END)
           ELSE MAX(CASE WHEN knee_rn = 1 AND dist IS NOT NULL THEN s END) END,
      COALESCE(MAX(CASE WHEN drop_rn = 1 AND drp IS NOT NULL THEN prev END),
               MAX(CASE WHEN i = 0 THEN s END))
    ) AS cutoff
  FROM wk1 GROUP BY ref_url, ref_name
),
keptt AS (
  SELECT ref_url, ref_name, occ, def_url, def_name, bucket FROM (
    SELECT b.*, c.cutoff,
      ROW_NUMBER() OVER (PARTITION BY b.ref_url, b.ref_name
                         ORDER BY b.bucket DESC, b.def_url ASC) AS rn
    FROM buck b JOIN wcut c
      ON b.ref_url = c.ref_url AND b.ref_name = c.ref_name
  ) WHERE (bucket >= cutoff OR rn = 1) AND rn <= 3
),
-- J7 unique-def fallback (weight-0 links; global refs, ungated)
uniqt AS (
  SELECT name AS def_name, MIN(url) AS def_url FROM fdefs
  GROUP BY name HAVING COUNT(DISTINCT url) = 1
),
uniq2 AS (
  SELECT u.* FROM uniqt u
  WHERE NOT EXISTS (SELECT 1 FROM keptt k
                    WHERE k.def_url = u.def_url AND k.def_name = u.def_name)
),
fbt AS (
  SELECT r.url AS ref_url, CAST(COUNT(*) AS BIGINT) AS occ,
         u.def_url, CAST(0 AS BIGINT) AS bucket
  FROM frefs r JOIN uniq2 u ON r.name = u.def_name
  WHERE r.url <> u.def_url GROUP BY r.url, u.def_url
),
-- A8 edges + A9 related rollup (F10 score > 0)
syme AS (
  SELECT ref_url, def_url, occ, bucket FROM keptt
  UNION ALL SELECT ref_url, def_url, occ, bucket FROM fbt
),
dct AS (SELECT url AS def_url, COUNT(*) AS def_count FROM fdefs GROUP BY url),
rin AS (
  SELECT s.def_url AS page, s.ref_url AS other,
    CAST(s.occ * (CASE WHEN COALESCE(d.def_count, 0) > 0
                       THEN GREATEST(CAST(FLOOR(s.bucket / d.def_count) AS BIGINT), 1)
                       ELSE s.bucket END) AS BIGINT) AS w
  FROM syme s LEFT JOIN dct d ON s.def_url = d.def_url
),
rout AS (
  SELECT ref_url AS page, def_url AS other, CAST(occ * bucket AS BIGINT) AS w
  FROM syme
)
SELECT page, other, CAST(SUM(w) AS BIGINT) AS score
FROM (SELECT * FROM rin UNION ALL SELECT * FROM rout)
WHERE page <> other GROUP BY page, other HAVING SUM(w) > 0
"""

ORACLES["kg_build_scored"] = kg_build_scored_sql(480, 20)

# kg_delta_related: the incremental splice equals a from-scratch rebuild
# (pinned by tests/test_incremental.py), and the rebuilt graph over the
# POST-delta corpus is plain SQL — so the iterative splice is value-
# verified engine-vs-engine, like kg_pagerank / u4_canonical_components.
# The corpus is range-generated identically to the Spark query: 300 pages
# in 30 ten-page vocabulary islands; pages 0-4 carry the delta suffix.
_DELTA_PAGES_SQL = """
SELECT 'doc://' || CAST(i AS VARCHAR) AS url,
         'ent' || CAST(i // 10 AS VARCHAR) || '_alpha ent'
         || CAST(i // 10 AS VARCHAR) || '_beta ent'
         || CAST(i // 10 AS VARCHAR) || '_alpha ent'
         || CAST(i // 10 AS VARCHAR) || '_gamma page'
         || CAST(i AS VARCHAR) || '_title'
         || CASE WHEN i < 5 THEN ' ent1_alpha ent1_beta' ELSE '' END AS content,
         's' AS source
  FROM (SELECT CAST(unnest(range(300)) AS BIGINT) AS i)"""

ORACLES["kg_delta_related"] = (
    "WITH "
    + _kg_ctes("dr_", pages_sql=_DELTA_PAGES_SQL).lstrip()
    + """
SELECT page, other, CAST(score AS BIGINT) AS score FROM dr_related
"""
)

# u4_triples_canonical: the COMPOSED canonicalize_triples post-stage —
# triples → canonicalization (chain verified standalone in u4_canonical_
# components) → subj/obj mapping joins → min-start_byte re-aggregation.
_U4T_PAGES_SQL = """
SELECT 'doc://' || CAST(i AS VARCHAR) AS url,
         'page' || CAST(i AS VARCHAR) || '_title entity'
         || CAST(i % 12 AS VARCHAR) || ' entity' || CAST(i % 12 AS VARCHAR)
         || 's entity' || CAST(i % 12 AS VARCHAR) || 'es entity'
         || CAST((i + 5) % 12 AS VARCHAR) AS content,
         's' AS source
  FROM (SELECT CAST(unnest(range(120)) AS BIGINT) AS i)"""

ORACLES["u4_triples_canonical"] = (
    "WITH RECURSIVE "
    + _kg_ctes("tc_", pages_sql=_U4T_PAGES_SQL).lstrip()
    + """,
tc_heads AS (
  SELECT url, name AS subj FROM (
    SELECT url, name, ROW_NUMBER() OVER (PARTITION BY url ORDER BY pos) AS rn
    FROM tc_mentions
  ) WHERE rn = 1
),
tc_objs AS (
  SELECT url, name AS obj, MIN(start_byte) AS start_byte
  FROM tc_mentions WHERE length(name) > 3 GROUP BY url, name
),
tc_triples AS MATERIALIZED (
  -- MATERIALIZED: tc_triples/tc_names are referenced from the shingle
  -- chain, the RECURSIVE closure base, AND the final mapping — without
  -- it DuckDB re-inlines the whole tokenization window chain at every
  -- reference (measured ~50x slower under memory pressure)
  SELECT h.subj, 'mentions' AS pred, o.obj, o.url, o.start_byte
  FROM tc_objs o JOIN tc_heads h ON o.url = h.url WHERE o.obj <> h.subj
),
tc_names AS MATERIALIZED (
  SELECT DISTINCT subj AS name FROM tc_triples
  UNION SELECT DISTINCT obj FROM tc_triples
),"""
    + _canon_ctes("tc_", "tc_names")
    + """
SELECT COALESCE(ls.label, t.subj) AS subj, t.pred,
       COALESCE(lo.label, t.obj) AS obj, t.url,
       CAST(MIN(t.start_byte) AS BIGINT) AS start_byte
FROM tc_triples t
LEFT JOIN tc_labels ls ON t.subj = ls.name
LEFT JOIN tc_labels lo ON t.obj = lo.name
GROUP BY 1, 2, 3, 4
"""
)

ORACLES["dd_simhash"] = """
WITH sim_tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 100
),
sim_tok2 AS (
  SELECT doc_id, CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) AS h
  FROM sim_tok WHERE w <> ''
),
bits AS (SELECT CAST(unnest(range(64)) AS INT) AS b),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
  FROM sim_tok2, bits GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN v >= 0 AND b >= 32 THEN (CAST(1 AS BIGINT) << (b % 32)) ELSE 0 END) AS BIGINT) AS simhash_hi,
       CAST(SUM(CASE WHEN v >= 0 AND b < 32 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash_lo
FROM votes GROUP BY doc_id
"""

ORACLES["tq_token_stats"] = """
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct,
       ROUND(AVG(length(w)), 6) AS avg_len
FROM toks WHERE w <> '' GROUP BY doc_id
"""

ORACLES["tq_quality"] = """
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
)
SELECT doc_id,
  ROUND(SUM(CASE WHEN w IN ('the','a','of','to','and','in') THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE), 6) AS stopword_ratio,
  ROUND(COUNT(DISTINCT w) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr,
  ROUND(AVG(length(w)), 6) AS avg_word_len
FROM toks WHERE w <> '' GROUP BY doc_id
"""

ORACLES["tq_langid"] = """
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
q AS (
  SELECT doc_id,
    SUM(CASE WHEN w IN ('the','a','of','to','and','in') THEN 1 ELSE 0 END)
      / CAST(COUNT(*) AS DOUBLE) AS stopword_ratio,
    COUNT(DISTINCT w) / CAST(COUNT(*) AS DOUBLE) AS ttr
  FROM toks WHERE w <> '' GROUP BY doc_id
)
SELECT q.doc_id,
  CASE WHEN q.stopword_ratio >= 0.08 THEN 'en'
       WHEN q.ttr >= 0.6 THEN 'sparse'
       ELSE 'unk' END AS guess,
  d.lang
FROM q JOIN documents d ON q.doc_id = d.doc_id
"""

from gossiphs_spark.operators.textquality import PROFILES as _LANG_PROFILES

_PROFILE_VALUES = ", ".join(
    f"('{p}', '{w}')" for p, ws in sorted(_LANG_PROFILES.items()) for w in ws
)

ORACLES["tq_langid_profiles"] = f"""
WITH profiles(profile, w) AS (VALUES {_PROFILE_VALUES}),
docs2 AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CASE WHEN doc_id % 2 = 1
      THEN array_to_string(list_transform(string_split(text, ' '), t -> reverse(t)), ' ')
      ELSE text END AS text
  FROM documents
),
lp_toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs2
),
lp_toks2 AS (SELECT * FROM lp_toks WHERE w <> ''),
lp_tot AS (SELECT doc_id, COUNT(*) AS n_tok FROM lp_toks2 GROUP BY doc_id),
lp_hits AS (
  SELECT t.doc_id, p.profile, COUNT(*) AS n_hit
  FROM lp_toks2 t JOIN profiles p ON t.w = p.w
  GROUP BY t.doc_id, p.profile
),
lp_best AS (
  SELECT doc_id, profile AS guess, ratio FROM (
    SELECT h.doc_id, h.profile,
           ROUND(h.n_hit / CAST(tt.n_tok AS DOUBLE), 6) AS ratio,
           ROW_NUMBER() OVER (
             PARTITION BY h.doc_id
             ORDER BY ROUND(h.n_hit / CAST(tt.n_tok AS DOUBLE), 6) DESC, h.profile ASC
           ) AS rn
    FROM lp_hits h JOIN lp_tot tt ON h.doc_id = tt.doc_id
  ) WHERE rn = 1
)
SELECT d.doc_id, COALESCE(b.guess, 'unk') AS guess,
       COALESCE(b.ratio, 0.0) AS ratio
FROM (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
LEFT JOIN lp_best b ON d.doc_id = b.doc_id
"""

ORACLES["tq_bpe_tokens"] = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_ws_tokens,
       ROUND(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) * 1.0
             / len(list_filter(string_split(text, ' '), w -> w <> '')), 6) AS bpe_per_ws
FROM documents
"""

ORACLES["tq_winnow_fingerprints"] = """
WITH wd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         length(text) - 7 AS n_grams
  FROM documents
),
grams AS (
  SELECT doc_id, n_grams, CAST(unnest(range(1, GREATEST(n_grams, 0) + 1)) AS BIGINT) AS i, text
  FROM wd
),
hashed AS (
  SELECT doc_id, n_grams, i,
         CAST(('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15)) AS BIGINT) AS h
  FROM grams
),
winmin AS (
  SELECT doc_id, i, n_grams,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS mh
  FROM hashed
),
picked AS (
  SELECT DISTINCT doc_id, mh FROM winmin WHERE i <= n_grams - 15
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       CAST(bit_xor(mh) AS BIGINT) AS xor_sig
FROM picked GROUP BY doc_id
"""

ORACLES["ev_sessions"] = """
WITH ev AS (
  -- floor, not CAST: Spark's unix_timestamp truncates sub-second parts,
  -- DuckDB CAST(DOUBLE AS BIGINT) rounds to nearest
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, value
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ep, value,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
),
sessed AS (
  SELECT user_id, ep, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sid AS BIGINT) AS session_idx,
       CAST(MIN(ep) AS BIGINT) AS session_start_ep,
       CAST(MAX(ep) AS BIGINT) AS session_end_ep,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM sessed GROUP BY user_id, sid
"""

ORACLES["mm_image_dims"] = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 29 ELSE 10 END AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS format,
       CAST(doc_id % 240 + 16 AS BIGINT) AS width,
       CAST((doc_id * 7) % 240 + 16 AS BIGINT) AS height
FROM documents
"""

# mm_pixel_stats: the BMP decoder reads real padded pixel rows; the oracle
# recomputes the channel sums from the per-pixel arithmetic the builder
# used (row order cancels in the sums; the decoder never sees this form)
ORACLES["mm_pixel_stats"] = """
WITH mp AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id % 5 + 2 AS BIGINT) AS w,
         CAST(doc_id % 3 + 1 AS BIGINT) AS h
  FROM documents
),
px AS (
  SELECT did, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
  FROM mp,
       LATERAL (SELECT unnest(range(w)) AS x) xs,
       LATERAL (SELECT unnest(range(h)) AS y) ys
),
sums AS (
  SELECT did, MAX(w * h) AS n_px,
         CAST(SUM((did + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
         CAST(SUM((did * 2 + x * 3 + y * 5) % 256) AS BIGINT) AS sum_g,
         CAST(SUM((did * 5 + x * 11 + y * 2) % 256) AS BIGINT) AS sum_b
  FROM px GROUP BY did
)
SELECT 'doc://' || CAST(did AS VARCHAR) AS url,
       CAST(n_px AS BIGINT) AS n_px, sum_r, sum_g, sum_b,
       ROUND((CAST(0.299 AS DOUBLE) * sum_r + CAST(0.587 AS DOUBLE) * sum_g
              + CAST(0.114 AS DOUBLE) * sum_b) / n_px, 6) AS mean_lum
FROM sums
"""

# mm_png_pixels: the PNG decoder walks CRC'd chunks, inflates IDAT and
# undoes per-row filters; the oracle recomputes the channel sums from the
# per-pixel arithmetic the builder filtered-and-compressed away (the
# decoder never sees this form — filters, zlib and chunk framing all
# cancel only if the inverse transform is exactly right)
ORACLES["mm_png_pixels"] = """
WITH mp AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id % 6 + 3 AS BIGINT) AS w,
         CAST(doc_id % 4 + 2 AS BIGINT) AS h
  FROM documents
),
px AS (
  SELECT did, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
  FROM mp,
       LATERAL (SELECT unnest(range(w)) AS x) xs,
       LATERAL (SELECT unnest(range(h)) AS y) ys
),
sums AS (
  -- did%4 = 2 is the PALETTE variant: pixel index (did+5x+3y)%8 routed
  -- through the did-derived PLTE entries; other variants carry direct
  -- RGB(A) samples (alpha never enters the sums; Adam7 row order cancels)
  SELECT did, MAX(w * h) AS n_px,
         CAST(SUM(CASE WHEN did % 4 = 2
              THEN (did * 7 + ((did + 5 * x + 3 * y) % 8) * 31) % 256
              ELSE (did * 3 + x * 5 + y * 7) % 256 END) AS BIGINT) AS sum_r,
         CAST(SUM(CASE WHEN did % 4 = 2
              THEN (did * 5 + ((did + 5 * x + 3 * y) % 8) * 3) % 256
              ELSE (did * 7 + x * 2 + y * 3) % 256 END) AS BIGINT) AS sum_g,
         CAST(SUM(CASE WHEN did % 4 = 2
              THEN (did + ((did + 5 * x + 3 * y) % 8) * 13) % 256
              ELSE (did + x * 13 + y * 11) % 256 END) AS BIGINT) AS sum_b
  FROM px GROUP BY did
)
SELECT 'doc://' || CAST(did AS VARCHAR) AS url,
       CAST(n_px AS BIGINT) AS n_px, sum_r, sum_g, sum_b,
       ROUND((CAST(0.299 AS DOUBLE) * sum_r + CAST(0.587 AS DOUBLE) * sum_g
              + CAST(0.114 AS DOUBLE) * sum_b) / n_px, 6) AS mean_lum
FROM sums
"""

# mm_gif_pixels: the GIF decoder reassembles sub-blocks, LZW-decodes the
# index stream and routes it through the active color table; the oracle
# recomputes the channel sums from the index/palette arithmetic the
# builder LZW-compressed away (interlaced row order cancels in the sums)
ORACLES["mm_gif_pixels"] = """
WITH mp AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id % 7 + 2 AS BIGINT) AS w,
         CAST(doc_id % 5 + 2 AS BIGINT) AS h
  FROM documents
),
px AS (
  SELECT did, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
  FROM mp,
       LATERAL (SELECT unnest(range(w)) AS x) xs,
       LATERAL (SELECT unnest(range(h)) AS y) ys
),
sums AS (
  SELECT did, MAX(w * h) AS n_px,
         CAST(SUM((did * 7 + ((did + 5 * x + 3 * y) % 16) * 31) % 256)
              AS BIGINT) AS sum_r,
         CAST(SUM((did * 5 + ((did + 5 * x + 3 * y) % 16) * 3) % 256)
              AS BIGINT) AS sum_g,
         CAST(SUM((did + ((did + 5 * x + 3 * y) % 16) * 13) % 256)
              AS BIGINT) AS sum_b
  FROM px GROUP BY did
)
SELECT 'doc://' || CAST(did AS VARCHAR) AS url,
       CAST(n_px AS BIGINT) AS n_px, sum_r, sum_g, sum_b,
       ROUND((CAST(0.299 AS DOUBLE) * sum_r + CAST(0.587 AS DOUBLE) * sum_g
              + CAST(0.114 AS DOUBLE) * sum_b) / n_px, 6) AS mean_lum
FROM sums
"""

# mm_jpeg_pixels: the JPEG decoder Huffman-decodes the MCU scan (DC
# prediction, EXTEND, byte unstuffing, restart markers), dequantizes,
# inverse-DCTs and color-converts; the oracle recomputes the channel sums
# from the constant-per-block arithmetic the builder entropy-coded away.
# quant=1 DC-only blocks make the DCT round-trip EXACT, and the YCbCr→RGB
# floor(x+0.5) arithmetic below mirrors the kernel's double-op order
# exactly (multimodal._jpeg_decode_scan) — a bug in either side's Huffman
# walk, MCU geometry, IDCT scaling, upsample mapping, or conversion flips
# the hash. did%4 routes the variant: 0 grayscale (r=g=b=Y), 1 = 4:4:4
# (chroma region 8x8), 2 = 4:2:0 (16x16), 3 = 4:2:2 (16x8, restarts).
ORACLES["mm_jpeg_pixels"] = """
WITH mp AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id % 21 + 4 AS BIGINT) AS w,
         CAST(doc_id % 13 + 4 AS BIGINT) AS h
  FROM documents
),
px AS (
  SELECT did, w, h, CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
  FROM mp,
       LATERAL (SELECT unnest(range(w)) AS x) xs,
       LATERAL (SELECT unnest(range(h)) AS y) ys
),
ycc AS (
  SELECT did, w, h,
    (did * 3 + (x // 8) * 5 + (y // 8) * 7) % 256 AS yv,
    CASE WHEN did % 4 = 1 THEN (did * 7 + (x // 8) * 11 + (y // 8) * 13) % 256
         WHEN did % 4 = 2 THEN (did * 7 + (x // 16) * 11 + (y // 16) * 13) % 256
         ELSE (did * 7 + (x // 16) * 11 + (y // 8) * 13) % 256 END AS cb,
    CASE WHEN did % 4 = 1 THEN (did * 5 + (x // 8) * 3 + (y // 8) * 17) % 256
         WHEN did % 4 = 2 THEN (did * 5 + (x // 16) * 3 + (y // 16) * 17) % 256
         ELSE (did * 5 + (x // 16) * 3 + (y // 8) * 17) % 256 END AS cr
  FROM px
),
rgb AS (
  SELECT did, w, h,
    CASE WHEN did % 4 = 0 THEN yv ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
      yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5) AS BIGINT))) END AS r,
    CASE WHEN did % 4 = 0 THEN yv ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
      yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
         - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5) AS BIGINT))) END AS g,
    CASE WHEN did % 4 = 0 THEN yv ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
      yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5) AS BIGINT))) END AS b
  FROM ycc
),
sums AS (
  SELECT did, MAX(w * h) AS n_px,
         CAST(SUM(r) AS BIGINT) AS sum_r,
         CAST(SUM(g) AS BIGINT) AS sum_g,
         CAST(SUM(b) AS BIGINT) AS sum_b
  FROM rgb GROUP BY did
)
SELECT 'doc://' || CAST(did AS VARCHAR) AS url,
       CAST(n_px AS BIGINT) AS n_px, sum_r, sum_g, sum_b,
       ROUND((CAST(0.299 AS DOUBLE) * sum_r + CAST(0.587 AS DOUBLE) * sum_g
              + CAST(0.114 AS DOUBLE) * sum_b) / n_px, 6) AS mean_lum
FROM sums
"""

# mm_wav_stats: the WAV decoder walks word-aligned RIFF chunks and runs
# one vectorized pass over the interleaved int16 samples; the oracle
# recomputes amplitude/energy sums and per-channel zero crossings from
# the sample formula directly. sqrt is correctly rounded in both engines,
# so the RMS double matches exactly.
ORACLES["mm_wav_stats"] = """
WITH mp AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id % 300 + 20 AS BIGINT) AS f,
         CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
         CAST(8000 + (doc_id % 5) * 4000 AS BIGINT) AS rate
  FROM documents
),
agg AS (
  SELECT did, MAX(f) AS f, MAX(ch) AS ch, MAX(rate) AS rate,
         CAST(SUM(ABS(((did * 7 + i.i * 13 + c.c * 5) % 4096) - 2048))
              AS BIGINT) AS sum_abs,
         CAST(SUM((((did * 7 + i.i * 13 + c.c * 5) % 4096) - 2048)
                * (((did * 7 + i.i * 13 + c.c * 5) % 4096) - 2048))
              AS BIGINT) AS sum_sq
  FROM mp,
       LATERAL (SELECT unnest(range(f)) AS i) i,
       LATERAL (SELECT unnest(range(ch)) AS c) c
  GROUP BY did
),
zc AS (
  SELECT did,
         CAST(SUM(CASE WHEN
             ((((did * 7 + i.i * 13 + c.c * 5) % 4096) - 2048 < 0)
              <> (((did * 7 + (i.i + 1) * 13 + c.c * 5) % 4096) - 2048 < 0))
           THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
  FROM mp,
       LATERAL (SELECT unnest(range(f - 1)) AS i) i,
       LATERAL (SELECT unnest(range(ch)) AS c) c
  GROUP BY did
)
SELECT 'doc://' || CAST(agg.did AS VARCHAR) AS url,
       CAST(agg.f AS BIGINT) AS n_frames,
       CAST(agg.ch AS BIGINT) AS n_channels,
       CAST(agg.rate AS BIGINT) AS sample_rate,
       sum_abs, sum_sq, zc.zero_cross,
       ROUND(SQRT(CAST(sum_sq AS DOUBLE) / (agg.f * agg.ch)), 6) AS rms
FROM agg JOIN zc ON agg.did = zc.did
"""

# dd_image_phash: the kernel decodes real BMP planes and computes the
# 64-bit average hash (integer luminance 299r+587g+114b, nearest 8x8
# resample at (k·dim)//8, strict mean threshold lum·64 > total, bit
# k = i·8+j split into two 32-bit halves); the oracle recomputes each
# content group's hash from the pixel formulas with identical integer
# arithmetic, then groups counts by hash exactly as the query does.
ORACLES["dd_image_phash"] = """
WITH grp AS (
  SELECT CAST(doc_id % 64 AS BIGINT) AS g, COUNT(*) AS n
  FROM documents GROUP BY 1
),
dims AS (
  SELECT g, n, g % 12 + 3 AS w, g % 9 + 3 AS h FROM grp
),
cell AS (
  SELECT g, n, w, h,
         CAST(i.i AS BIGINT) AS i, CAST(j.j AS BIGINT) AS j,
         ((j.j * w) // 8) AS x, ((i.i * h) // 8) AS y
  FROM dims,
       LATERAL (SELECT unnest(range(8)) AS i) i,
       LATERAL (SELECT unnest(range(8)) AS j) j
),
lum AS (
  SELECT g, n, i, j,
         299 * ((g * 5 + x * 7 + y * 13) % 256)
         + 587 * ((g * 3 + x * 2 + y * 5) % 256)
         + 114 * ((g + x * 11 + y * 3) % 256) AS l
  FROM cell
),
tot AS (SELECT g, SUM(l) AS s FROM lum GROUP BY g),
hashes AS (
  SELECT lum.g, MAX(lum.n) AS n,
         CAST(SUM(CASE WHEN l * 64 > s AND i * 8 + j >= 32
              THEN CAST(1 AS BIGINT) << CAST(i * 8 + j - 32 AS INTEGER)
              ELSE 0 END) AS BIGINT) AS ahash_hi,
         CAST(SUM(CASE WHEN l * 64 > s AND i * 8 + j < 32
              THEN CAST(1 AS BIGINT) << CAST(i * 8 + j AS INTEGER)
              ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM lum JOIN tot ON lum.g = tot.g
  GROUP BY lum.g
)
SELECT ahash_hi, ahash_lo, CAST(SUM(n) AS BIGINT) AS n_images
FROM hashes GROUP BY ahash_hi, ahash_lo
"""

# mm_jpeg_progressive: the SAME constant-per-block images and closed-form
# arithmetic as mm_jpeg_pixels — the query encodes them as four
# successive-approximation scans instead, so the hash pins the
# progressive multi-scan machinery (DC first/refine Al shifts,
# non-interleaved grids, EOBRUN spans) against the identical truth.
ORACLES["mm_jpeg_progressive"] = ORACLES["mm_jpeg_pixels"]

# mm_resize_stats: the kernel decodes BMP planes and area-average
# downsamples by 2 in exact integer math (output pixel = 2x2 block sum
# // 4); the oracle recomputes the resized channel sums from the same
# block arithmetic over the builder's pixel formulas.
ORACLES["mm_resize_stats"] = """
WITH mp AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         CAST(doc_id % 10 + 8 AS BIGINT) AS w,
         CAST(doc_id % 8 + 8 AS BIGINT) AS h
  FROM documents
),
cell AS (
  SELECT did, w, h,
         CAST(oy.oy AS BIGINT) AS oy, CAST(ox.ox AS BIGINT) AS ox,
         (ox.ox * 2 + dx.dx) AS x, (oy.oy * 2 + dy.dy) AS y
  FROM mp,
       LATERAL (SELECT unnest(range(h // 2)) AS oy) oy,
       LATERAL (SELECT unnest(range(w // 2)) AS ox) ox,
       LATERAL (SELECT unnest(range(2)) AS dy) dy,
       LATERAL (SELECT unnest(range(2)) AS dx) dx
),
opx AS (
  SELECT did, MAX(w) AS w, MAX(h) AS h,
         SUM((did * 5 + x * 7 + y * 13) % 256) // 4 AS r,
         SUM((did * 3 + x * 2 + y * 5) % 256) // 4 AS g,
         SUM((did + x * 11 + y * 3) % 256) // 4 AS b
  FROM cell GROUP BY did, oy, ox
)
SELECT 'doc://' || CAST(did AS VARCHAR) AS url,
       CAST(MAX(w) // 2 AS BIGINT) AS out_w,
       CAST(MAX(h) // 2 AS BIGINT) AS out_h,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b
FROM opx GROUP BY did
"""

# mm_avi_meta: the AVI decoder walks the nested word-aligned RIFF LIST
# tree to avih/strh; the oracle recomputes the header fields from the
# same doc_id arithmetic the builder serialized.
ORACLES["mm_avi_meta"] = """
SELECT 'doc://' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR) AS url,
       CAST(doc_id % 1000 + 10 AS BIGINT) AS n_frames,
       CAST(doc_id % 640 + 16 AS BIGINT) AS width,
       CAST(doc_id % 480 + 16 AS BIGINT) AS height,
       CAST(33333 + (doc_id % 5) * 8333 AS BIGINT) AS us_per_frame,
       CAST(1 + doc_id % 2 AS BIGINT) AS n_streams,
       CAST(1 AS BIGINT) AS n_video,
       CAST(doc_id % 2 AS BIGINT) AS n_audio,
       ROUND(CAST(1000000 AS DOUBLE) / (33333 + (doc_id % 5) * 8333), 6) AS fps
FROM documents
"""

ORACLES["tq_source_curation"] = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
       ROUND((COUNT(*) - COUNT(DISTINCT md5(text))) * 1.0 / COUNT(*), 6) AS dup_rate,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
       ROUND(AVG(CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS DOUBLE)), 6) AS avg_tokens
FROM documents GROUP BY source
"""

ORACLES["tq_fingerprint"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(('0x' || substring(md5(regexp_replace(lower(text), ' +', ' ', 'g')), 1, 15)) AS BIGINT) AS fingerprint
FROM documents
"""

ORACLES["ann_cosine_topk"] = """
WITH emb AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
c AS (SELECT vec_id, v FROM emb WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, c.vec_id,
         ROUND(list_dot_product(q.qv, c.v)
               / (SQRT(list_dot_product(q.qv, q.qv)) * SQRT(list_dot_product(c.v, c.v))), 4) AS cos
  FROM c, q
)
SELECT query_id, vec_id, cos, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 10
"""

ORACLES["ann_ivf_search"] = """
WITH emb0 AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v, label
  FROM embeddings
),
dims AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS di, unnest(v) AS x FROM emb0
),
vpd AS (
  SELECT vec_id, di,
    (CASE WHEN CAST(('0x' || substring(md5(CAST(label AS VARCHAR) || '#' || CAST(di - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
          THEN 1.0 ELSE -1.0 END) + 0.5 * x AS x
  FROM dims
),
emb AS (SELECT vec_id, list(x ORDER BY di) AS v FROM vpd GROUP BY vec_id),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
c AS (SELECT vec_id, v FROM emb WHERE vec_id >= 5),
cents AS (SELECT vec_id AS cid, v AS cv FROM c ORDER BY vec_id LIMIT 16),
ac AS (
  SELECT c.vec_id, ct.cid,
    ROUND(list_dot_product(c.v, ct.cv)
          / (SQRT(list_dot_product(c.v, c.v)) * SQRT(list_dot_product(ct.cv, ct.cv))), 6) AS cosc
  FROM c, cents ct
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosc DESC, cid ASC) AS rn FROM ac
  ) WHERE rn = 1
),
pq AS (
  SELECT q.query_id, q.qv, ct.cid,
    ROUND(list_dot_product(q.qv, ct.cv)
          / (SQRT(list_dot_product(q.qv, q.qv)) * SQRT(list_dot_product(ct.cv, ct.cv))), 6) AS cosc
  FROM q, cents ct
),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosc DESC, cid ASC) AS rn FROM pq
  ) WHERE rn <= 3
),
scored AS (
  SELECT p.query_id, a.vec_id,
    ROUND(list_dot_product(p.qv, c.v)
          / (SQRT(list_dot_product(p.qv, p.qv)) * SQRT(list_dot_product(c.v, c.v))), 4) AS cos
  FROM probes p JOIN assign a ON p.cid = a.cid JOIN c ON a.vec_id = c.vec_id
)
SELECT query_id, vec_id, cos, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 10
"""

ORACLES["dd_embedding_neardup"] = """
WITH emb0 AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v, label
  FROM embeddings
),
dims AS (
  SELECT vec_id, label, generate_subscripts(v, 1) AS di, unnest(v) AS x FROM emb0
),
vpd AS (
  SELECT vec_id, di,
    (CASE WHEN CAST(('0x' || substring(md5(CAST(label AS VARCHAR) || '#' || CAST(di - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
          THEN 1.0 ELSE -1.0 END) + 0.5 * x AS x
  FROM dims
),
emb AS (SELECT vec_id, list(x ORDER BY di) AS v FROM vpd GROUP BY vec_id),
cents AS (SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT 16),
ac AS (
  SELECT e.vec_id, e.v, ct.cid,
    ROUND(list_dot_product(e.v, ct.cv)
          / (SQRT(list_dot_product(e.v, e.v)) * SQRT(list_dot_product(ct.cv, ct.cv))), 6) AS cosc
  FROM emb e, cents ct
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosc DESC, cid ASC) AS rn FROM ac
  ) WHERE rn <= 2
),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
    ROUND(list_dot_product(a.v, b.v)
          / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 4) AS cos
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= 0.6
"""

ORACLES["ann_lsh_buckets"] = """
WITH emb AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v, label
  FROM embeddings
)
SELECT
  (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN v[5] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN v[6] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN v[7] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN v[8] >= 0 THEN '1' ELSE '0' END) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  ROUND(AVG(label), 6) AS avg_label
FROM emb GROUP BY 1
"""
