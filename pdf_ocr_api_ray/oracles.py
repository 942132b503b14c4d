"""Generated DuckDB oracle SQL for the corpus-derived queries.

Every SQL string here embeds the corpus-regeneration CTE chain
(``sources/corpus_sql.py``) so DuckDB independently re-derives the
spans corpus from ``documents.parquet`` and recomputes each query's
projection from first principles — the driver's hard correctness
signal for the flagship extraction pipeline and the span-surgery /
layout / byte-transform families that were rows-only in round 1.

The per-branch service-count formulas mirror the engine semantics
derived from the reference parser chain (parser/parseServices.js
tiers 1-3 + parser/parseDocument.js:104-215 filters):

- table/media/boiler docs: every generated table row parses to one
  record; the three boiler junk rows are dropped (category-header
  filter for the two label rows, the ``^TOTAL`` skip for the total
  row) → n = nrows.
- cat docs: the first "Atividade Técnica" segment carries the header
  lines (the split regex only fires on "; " joints), so its record
  matches the "Certidão de Acervo Técnico" boilerplate pattern and is
  filtered → n = nsegs - 1.
- free-line docs: the PLANILHA marker cuts the header lines; every
  generated line parses → n = nlines.
- multi docs: chunk 0 table + per-chunk CAT segments (prefix stripped
  at chunk level → all survive) + chunk-2 table → sum.
- empty docs: no records; output row is header-only (n_spans = 1).

CORPUS-VOCABULARY ASSUMPTIONS (guarded by
tests/test_corpus_sql.py::test_vocab_is_filter_safe — a regenerated
documents.parquet that violates them fails loudly there instead of
silently breaking parity):

- window text never *starts with* "total" (tier-1 rows whose
  normalized Descricao matches ``^TOTAL\\b`` are skipped by the
  engine's parser — the oracle counts every generated row);
- window text contains no standalone unit sigla (``m``/``m2``/``m3``/
  ``un``/``kg``/``h``/``mes``/``%`` as whole tokens) — tiers 2/3 run
  detect_unidade over the whole line, so such a token would shift
  Unidade/Descricao versus the oracle's positional unit id and
  verbatim-window serialization;
- window text has no " - " or ":" separators (Categoria = Descricao);
- document text is ASCII (Python's Unicode-aware tokenizers vs
  DuckDB's ASCII ``\\S+`` diverge on exotic whitespace).

``tests/test_queries_vs_duckdb.py`` and the CORRECTNESS driver verify
these formulas against the live engine at sf0.001/sf0.01.
"""

from __future__ import annotations

from .sources.corpus_sql import _arr, corpus_ctes, h_u32, zpad
from .sources.fixtures import _ESTADOS, _NIVEIS, _OBJETOS

def _flags_tipo_case(fn: str) -> str:
    """detect_tipo_from_flags precedence over substring flags of the
    full normalized text (parser/detectTipoCertidao.js:9-45)."""
    cat = f"(contains({fn},'ACERVOTECNICO') OR contains({fn},'CAT'))"
    cao = f"(contains({fn},'ACERVOOPERACIONAL') OR contains({fn},'CAO'))"
    combos = [
        (cat, "CREA", 1),
        (cao, "CREA", 2),
        (cat, "CAU", 3),
        (cao, "CAU", 4),
        (cat, "CRT", 5),
        (cao, "CRT", 6),
        (cat, "CRA", 7),
        (cao, "CRA", 8),
        (cao, "CFTA", 9),
    ]
    whens = "\n".join(
        f"WHEN {kind} AND contains({fn},'{council}') THEN {tid}"
        for kind, council, tid in combos
    )
    return f"CASE WHEN {fn} IS NULL THEN NULL {whens} ELSE NULL END"


# per-branch derived scalars, computed purely from b2 (draw formulas
# identical to sources/corpus.py)
_NCHUNKS = f"2 + ({h_u32('nc')}) % 3"
_NROWS_C0 = f"3 + ({h_u32('c0n')}) % 6"
_NSERV = f"""CASE branch
    WHEN 'cat'   THEN 2 + ({h_u32('ns')}) % 4
    WHEN 'free'  THEN 3 + ({h_u32('nl')}) % 5
    WHEN 'empty' THEN 0
    WHEN 'multi' THEN ({_NROWS_C0})
         + (2 + ({h_u32('c1ns')}) % 2)
         + (CASE WHEN ({_NCHUNKS}) > 2 THEN 3 + ({h_u32('c2n')}) % 6 ELSE 0 END)
         + (CASE WHEN ({_NCHUNKS}) > 3 THEN 2 + ({h_u32('c3ns')}) % 2 ELSE 0 END)
    ELSE {_NROWS_C0} END"""


def extract_documents_sql() -> str:
    from .sources.corpus_sql import _v, h_expr, qty_expr, win_expr

    US = "chr(31)"
    win = win_expr()
    lab_unit_t = "'c'||c||'r'||i||'u'"
    lab_unit_f = "'l'||i||'u'"
    unit_t = f"CAST(1 + ({h_expr(lab_unit_t)}) % 8 AS VARCHAR)"
    unit_f = f"CAST(1 + ({h_expr(lab_unit_f)}) % 8 AS VARCHAR)"
    qty_t = qty_expr("'c'||c||'r'||i")
    qty_c = qty_expr("'s'||i")
    qty_f = qty_expr("'l'||i")
    qty_m = qty_expr("'c'||c||'s'||i")
    # per-servico serialized strings rebuilt from the generator CTEs
    # (trow3/catseg3/fline3/mseg3 carry W/wn/ws + the unit/qty draws).
    # Field order Item\x1fCategoria\x1fDescricao\x1fUnidade\x1f
    # Quantidade; Categoria = Descricao for every corpus record
    # (categoria_por_prefixo falls through to the whole string — window
    # text has no ' - '/':' separators); unit ids are positional
    # (_UNIDADES_COL order = DEFAULT_UNIDADES ids 1..8).
    return f"""WITH {corpus_ctes()},
serv AS (
    -- tier-1 table rows (table/media/boiler/multi chunks)
    SELECT doc_id_s, c, i,
           prefix||{_v('i+1')}||{US}
           ||({win})||{US}||({win})||{US}
           ||{unit_t}||{US}||{qty_t} AS s
    FROM trow3
    UNION ALL
    -- tier-2 CAT segments (seg 0 carries the header lines and is
    -- boilerplate-filtered by the engine → excluded here)
    SELECT doc_id_s, 0 AS c, i,
           {_v('i+1')}||{US}
           ||('- Execução de '||({win}))||{US}||('- Execução de '||({win}))||{US}
           ||'1'||{US}||{qty_c} AS s
    FROM catseg3 WHERE i >= 1
    UNION ALL
    -- tier-3 free lines
    SELECT doc_id_s, 0 AS c, i,
           {_v('i+1')}||'.1'||{US}
           ||({win})||{US}||({win})||{US}
           ||{unit_f}||{US}||{qty_f} AS s
    FROM fline3
    UNION ALL
    -- multi-chunk CAT segments (all survive — prefix stripped per chunk)
    SELECT doc_id_s, c, i,
           {_v('i+1')}||{US}
           ||('- Coordenação de '||({win}))||{US}||('- Coordenação de '||({win}))||{US}
           ||'5'||{US}||{qty_m} AS s
    FROM mseg3
),
servagg AS (
    SELECT doc_id_s, md5(string_agg(s, chr(30) ORDER BY c, i)) AS smd5
    FROM serv GROUP BY doc_id_s
),
fulln AS (
    SELECT doc_id,
           regexp_replace(upper(strip_accents(string_agg(text, '' ORDER BY "offset"))),
                          '[^A-Z0-9]', '', 'g') AS fn
    FROM corpus_spans GROUP BY doc_id
),
scal AS (
    SELECT doc_id_s, branch,
           CASE WHEN branch = 'empty' THEN NULL
                ELSE CAST(10000 + ({h_u32('nu')}) % 989999 AS VARCHAR)
                     || '/' || CAST(2010 + ({h_u32('yr')}) % 16 AS VARCHAR) END AS numero,
           CASE WHEN branch = 'empty' THEN NULL
                ELSE {_arr(_ESTADOS)}[1 + ({h_u32('es')}) % {len(_ESTADOS)}] END AS estado,
           CASE WHEN branch = 'empty' THEN NULL
                WHEN branch = 'cat' THEN 1
                ELSE 1 + ({h_u32('nv')}) % {len(_NIVEIS)} END AS nivel_id,
           ({h_u32('ob')}) % {len(_OBJETOS)} AS objeto_idx,
           {_NSERV} AS nserv
    FROM b2
),
scal2 AS (
    -- the objeto strings (generated from fixtures._OBJETOS — cannot
    -- drift from the corpus) map 1:1 to header-rule outcomes:
    -- hospital→obra 1, escola→2, residencial→3, industrial→4,
    -- pavimentação→none; only objeto 4 contains a qualificação-
    -- específica list value ("PAVIMENTACAO URBANA" → id 1). The CASE
    -- below is the oracle's independent statement of those rules
    -- (pinned by tests/test_functions header-rule cases).
    SELECT *,
           CASE WHEN branch = 'empty' THEN NULL ELSE
               {_arr(_OBJETOS)}[1 + objeto_idx] END AS objeto,
           CASE WHEN branch = 'empty' THEN NULL
                WHEN objeto_idx = 0 THEN 1
                WHEN objeto_idx = 1 THEN 2
                WHEN objeto_idx = 2 THEN 3
                WHEN objeto_idx = 3 THEN 4
                ELSE NULL END AS qual_obra,
           CASE WHEN branch = 'empty' THEN NULL
                WHEN objeto_idx = 4 THEN 1
                ELSE NULL END AS qual_esp
    FROM scal
)
SELECT s.doc_id_s AS "doc_id",
       s.numero AS "NumerodaCertidao",
       s.objeto AS "ObjetodaCertidao",
       CAST({_flags_tipo_case('f.fn')} AS BIGINT) AS "TipodaCertidao",
       CAST(s.qual_obra AS BIGINT) AS "QualificacaoObra",
       CAST(s.qual_esp AS BIGINT) AS "QualificacaoEspecifica",
       CAST(s.nivel_id AS BIGINT) AS "NiveldeAtividade",
       s.estado AS "Estado",
       CAST(s.nserv AS BIGINT) AS "n_servicos",
       CAST(1 + s.nserv + (CASE WHEN s.branch = 'media' THEN 2 ELSE 0 END) AS BIGINT) AS "n_spans",
       coalesce(v.smd5, md5('')) AS "servico_md5"
FROM scal2 s
LEFT JOIN fulln f ON f.doc_id = s.doc_id_s
LEFT JOIN servagg v ON v.doc_id_s = s.doc_id_s"""


def span_properties_sql() -> str:
    return f"""WITH {corpus_ctes()},
agg AS (
    SELECT doc_id,
           count(*) AS n_spans,
           count(DISTINCT "offset" // 10000) AS n_chunks,
           sum(CASE WHEN kind = 'page_image' THEN 1 ELSE 0 END) AS n_media,
           sum(length(text)) AS total_text_len
    FROM corpus_spans GROUP BY doc_id
)
SELECT b.doc_id_s AS doc_id,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(coalesce(a.n_media, 0) AS BIGINT) AS n_media,
       CAST(coalesce(a.total_text_len, 0) AS BIGINT) AS total_text_len
FROM b2 b LEFT JOIN agg a ON a.doc_id = b.doc_id_s"""


def span_split_sql() -> str:
    return f"""WITH {corpus_ctes()},
chunks AS (
    SELECT doc_id, "offset" // 10000 AS c,
           count(*) AS n,
           sum(("offset" % 10000) * 31 % 1000003) AS cs
    FROM corpus_spans GROUP BY 1, 2
),
ranked AS (
    SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY c) - 1 AS newc, n, cs
    FROM chunks
)
SELECT doc_id || '#c' || CAST(newc AS VARCHAR) AS doc_id,
       CAST(n AS BIGINT) AS n_spans, CAST(cs AS BIGINT) AS offset_checksum
FROM ranked
UNION ALL
SELECT doc_id_s || '#c0', 0, 0
FROM b2 WHERE branch = 'empty' AND ({h_u32('ek')}) % 2 = 0"""


def span_delete_sql(lo: int = 1, hi: int = 3) -> str:
    return f"""WITH {corpus_ctes()},
kept AS (
    SELECT doc_id, "offset" // 10000 AS c, "offset" % 10000 AS r
    FROM corpus_spans
    WHERE NOT ("offset" // 10000 >= {lo} AND "offset" // 10000 < {hi})
),
ranked AS (
    SELECT doc_id, dense_rank() OVER (PARTITION BY doc_id ORDER BY c) - 1 AS newc, r
    FROM kept
),
agg AS (
    SELECT doc_id, count(*) AS n, sum((newc * 10000 + r) * 31 % 1000003) AS cs
    FROM ranked GROUP BY doc_id
)
SELECT b.doc_id_s AS doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.cs, 0) AS BIGINT) AS offset_checksum
FROM b2 b LEFT JOIN agg a ON a.doc_id = b.doc_id_s"""


def span_reorder_sql() -> str:
    return f"""WITH {corpus_ctes()},
ranked AS (
    SELECT doc_id,
           dense_rank() OVER (PARTITION BY doc_id ORDER BY "offset" // 10000 DESC) - 1 AS newc,
           "offset" % 10000 AS r
    FROM corpus_spans
),
agg AS (
    SELECT doc_id, count(*) AS n, sum((newc * 10000 + r) * 31 % 1000003) AS cs
    FROM ranked GROUP BY doc_id
)
SELECT b.doc_id_s AS doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.cs, 0) AS BIGINT) AS offset_checksum
FROM b2 b LEFT JOIN agg a ON a.doc_id = b.doc_id_s"""


def span_watermark_sql() -> str:
    return f"""WITH {corpus_ctes()},
shifted AS (
    SELECT doc_id, count(*) AS n, sum(("offset" + 1) * 31 % 1000003) AS cs
    FROM corpus_spans GROUP BY doc_id
),
inserted AS (
    SELECT doc_id, count(*) AS n, sum(c * 10000 * 31 % 1000003) AS cs
    FROM (SELECT DISTINCT doc_id, "offset" // 10000 AS c FROM corpus_spans)
    GROUP BY doc_id
)
SELECT b.doc_id_s AS doc_id,
       CAST(coalesce(s.n, 0) + coalesce(i.n, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(s.cs, 0) + coalesce(i.cs, 0) AS BIGINT) AS offset_checksum
FROM b2 b
LEFT JOIN shifted s ON s.doc_id = b.doc_id_s
LEFT JOIN inserted i ON i.doc_id = b.doc_id_s"""


def span_combine_sql(group_size: int = 10) -> str:
    return f"""WITH {corpus_ctes()},
pdoc AS (
    SELECT doc_id, max("offset" // 10000) AS mx FROM corpus_spans GROUP BY doc_id
),
alldocs AS (
    SELECT b.doc_id_s AS doc_id, b.did // {group_size} AS gk, b.did AS did,
           coalesce(p.mx, -1) AS mx
    FROM b2 b LEFT JOIN pdoc p ON p.doc_id = b.doc_id_s
),
based AS (
    SELECT *, coalesce(sum(mx + 1) OVER (
        PARTITION BY gk ORDER BY did
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbase
    FROM alldocs
),
shifted AS (
    SELECT a.gk,
           (a.cbase + s."offset" // 10000) * 10000 + s."offset" % 10000 AS off
    FROM corpus_spans s JOIN based a ON a.doc_id = s.doc_id
),
agg AS (
    SELECT gk, count(*) AS n, sum(off * 31 % 1000003) AS cs FROM shifted GROUP BY gk
)
SELECT 'group-' || {zpad("CAST(g.gk AS VARCHAR)", 6)} AS doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.cs, 0) AS BIGINT) AS offset_checksum
FROM (SELECT DISTINCT did // {group_size} AS gk FROM b2) g
LEFT JOIN agg a ON a.gk = g.gk"""


def extract_layout_sql() -> str:
    return f"""WITH {corpus_ctes()},
chunkagg AS (
    SELECT doc_id, "offset" // 10000 AS c,
           count(*) FILTER (WHERE kind <> 'page_image') AS n_lines,
           count(*) FILTER (WHERE kind = 'table_cell') AS n_cells,
           count(*) FILTER (WHERE kind = 'table_header') AS n_theads,
           sum(CASE WHEN kind <> 'page_image' THEN length(text) ELSE 0 END) AS text_len
    FROM corpus_spans GROUP BY 1, 2
)
SELECT doc_id, '//Document/Sect/Table' AS path, CAST(c AS BIGINT) AS page,
       CAST(n_cells AS BIGINT) AS num_rows, CAST(4 AS BIGINT) AS num_cols
FROM chunkagg WHERE n_theads > 0
UNION ALL
SELECT doc_id, '//Document/Sect/P', CAST(c AS BIGINT), CAST(n_lines AS BIGINT), 0
FROM chunkagg WHERE n_lines >= 2 OR (n_lines = 1 AND text_len > 0)
UNION ALL
SELECT doc_id, '//Document/Sect/Figure', CAST("offset" // 10000 AS BIGINT), 0, 0
FROM corpus_spans WHERE kind = 'page_image'"""


def rotate_pages_sql(angle: int = 90) -> str:
    tag_len = len(f"#rot{angle}")
    return f"""WITH {corpus_ctes()},
agg AS (
    SELECT doc_id, count(*) AS n_spans,
           sum(CASE WHEN kind = 'page_image' AND media_ref <> '' THEN 1 ELSE 0 END) AS n_rot,
           sum(length(media_ref)
               + CASE WHEN kind = 'page_image' AND media_ref <> '' THEN {tag_len} ELSE 0 END) AS rlen
    FROM corpus_spans GROUP BY doc_id
)
SELECT b.doc_id_s AS doc_id,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.n_rot, 0) AS BIGINT) AS n_media_rotated,
       CAST(coalesce(a.rlen, 0) AS BIGINT) AS rot_ref_len
FROM b2 b LEFT JOIN agg a ON a.doc_id = b.doc_id_s"""


def _pair_merge_sql(mode: str) -> str:
    if mode == "insert":
        mapped = """CASE WHEN role = 1 THEN 1 + rank
                 WHEN rank = 0 THEN 0
                 ELSE 1 + coalesce(np1, 0) + rank - 1 END"""
        keep = "TRUE"
    else:  # replace
        mapped = """CASE WHEN role = 1 THEN 1
                 WHEN rank = 0 THEN 0
                 ELSE rank - 1 END"""
        keep = "(role = 0 AND (rank = 0 OR rank >= 3)) OR (role = 1 AND rank = 0)"
    return f"""WITH {corpus_ctes()},
sp AS (
    SELECT s.doc_id, b.did, s."offset" FROM corpus_spans s
    JOIN b2 b ON b.doc_id_s = s.doc_id
),
rk AS (
    SELECT did // 2 AS pair, did % 2 AS role, "offset" % 10000 AS r_off,
           dense_rank() OVER (PARTITION BY doc_id ORDER BY "offset" // 10000) - 1 AS rank
    FROM sp
),
nch AS (
    SELECT did // 2 AS pair, count(DISTINCT "offset" // 10000) AS np1
    FROM sp WHERE did % 2 = 1 GROUP BY 1
),
mapped AS (
    SELECT rk.pair, ({mapped}) AS nc, r_off
    FROM rk LEFT JOIN nch ON nch.pair = rk.pair
    WHERE {keep}
),
agg AS (
    SELECT pair, count(*) AS n, sum((nc * 10000 + r_off) * 31 % 1000003) AS cs
    FROM mapped GROUP BY pair
)
SELECT 'doc-' || {zpad("CAST(p.pair * 2 AS VARCHAR)", 8)} AS doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.cs, 0) AS BIGINT) AS offset_checksum
FROM (SELECT DISTINCT did // 2 AS pair FROM b2) p
LEFT JOIN agg a ON a.pair = p.pair"""


def autotag_report_sql(page_start: int = 0, page_end: int = 2) -> str:
    """The autotag/accessibility report recomputed from the regenerated
    corpus (see pipelines/spanops.autotag_report for the column
    definitions and the reference file:line anchors)."""
    return f"""WITH {corpus_ctes()},
agg AS (
    SELECT doc_id,
           sum(CASE WHEN kind = 'text' AND text <> '' THEN 1 ELSE 0 END) AS n_p,
           count(DISTINCT CASE WHEN kind = 'table_header' THEN "offset" // 10000 END) AS n_tables,
           sum(CASE WHEN kind = 'page_image' THEN 1 ELSE 0 END) AS n_figures,
           sum(CASE WHEN kind = 'text' AND text <> '' AND "offset" % 10000 = 0
               THEN 1 ELSE 0 END) AS n_h_shifted,
           count(DISTINCT CASE WHEN "offset" // 10000 BETWEEN {page_start} AND {page_end}
                 THEN "offset" // 10000 END) AS n_pages_checked,
           sum(CASE WHEN kind = 'page_image' AND text = ''
                     AND "offset" // 10000 BETWEEN {page_start} AND {page_end}
               THEN 1 ELSE 0 END) AS n_figs_no_alt
    FROM corpus_spans GROUP BY doc_id
)
SELECT b.doc_id_s AS doc_id,
       CAST(coalesce(a.n_p, 0) AS BIGINT) AS n_p,
       CAST(coalesce(a.n_tables, 0) AS BIGINT) AS n_tables,
       CAST(coalesce(a.n_figures, 0) AS BIGINT) AS n_figures,
       CAST(coalesce(a.n_h_shifted, 0) AS BIGINT) AS n_h_shifted,
       CAST(coalesce(a.n_pages_checked, 0) AS BIGINT) AS n_pages_checked,
       CAST(coalesce(a.n_figs_no_alt, 0) AS BIGINT) AS n_figs_no_alt,
       coalesce(a.n_figs_no_alt, 0) = 0 AS passed
FROM b2 b LEFT JOIN agg a ON a.doc_id = b.doc_id_s"""


def compress_payloads_sql() -> str:
    return """
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS raw_len,
               TRUE AS roundtrip_ok
        FROM documents"""


def protect_payloads_sql() -> str:
    return """
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS raw_len,
               TRUE AS roundtrip_ok
        FROM documents"""


_AUG_CORPUS = r"""
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 2000000, regexp_replace(text, '^(\S+)', '\1 \1')
    FROM documents WHERE doc_id % 7 = 0
)"""


def dedup_minhash_lsh_sql(threshold: float = 0.6) -> str:
    """Exact 3-token-shingle Jaccard pairs over the augmented corpus —
    the from-first-principles twin of the engine's LSH+verify output
    (banding at 32×2 has P(miss | J ≥ τ) ≈ 2e-7 and the corpus has a
    wide planted-vs-natural margin, so verified-LSH = exact)."""
    return rf"""WITH {_AUG_CORPUS},
tokl AS (
    -- zero-token docs have NO shingles (the engine's shingle set is
    -- empty and verification skips them) — exclude, or the forced
    -- single '' shingle would fabricate J=1 pairs the engine never emits
    SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM corpus
    WHERE len(regexp_extract_all(text, '\S+')) > 0
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+3], ' ') AS s
    FROM (SELECT doc_id, toks, unnest(range(greatest(1, len(toks) - 2))) AS i FROM tokl)
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b, round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = id_a
JOIN cnt cb ON cb.doc_id = id_b
WHERE i * 1.0 / (ca.n + cb.n - i) >= {threshold}"""


def _md5_le64(expr: str) -> str:
    """Little-endian 64-bit int of md5(expr) — dedup._stable64's twin."""
    m = f"md5({expr})"
    bytes_rev = "||".join(f"substr({m},{15 - 2 * k},2)" for k in range(8))
    return f"CAST(('0x'||{bytes_rev}) AS UBIGINT)"


def _md5_le64_hi(expr: str) -> str:
    """Little-endian 64-bit int of md5(expr) bytes 8..15 — the second
    independent draw (prep.span_corruption's length field)."""
    m = f"md5({expr})"
    bytes_rev = "||".join(f"substr({m},{31 - 2 * k},2)" for k in range(8))
    return f"CAST(('0x'||{bytes_rev}) AS UBIGINT)"


def dedup_simhash_sql(max_hamming: int = 3) -> str:
    """Recompute the 64-bit count-weighted SimHash fingerprints from
    md5 token hashes bit-for-bit, then all-pairs hamming ≤ k — the
    engine's pigeonhole blocking is exact for k ≤ 3, so engine output
    equals this oracle identically."""
    bit_terms = "+\n        ".join(
        f"(CASE WHEN sum(c * (CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN CAST({1 << j} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
        for j in range(64)
    )
    return rf"""WITH {_AUG_CORPUS},
tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS w FROM corpus
),
tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
th AS (SELECT doc_id, c, {_md5_le64('w')} AS h FROM tc),
fp0 AS (
    SELECT doc_id,
        {bit_terms} AS f
    FROM th GROUP BY doc_id
),
fp AS (
    -- zero-token docs fingerprint to 0 in the engine (simhash64([])=0)
    -- and pair with each other at hamming 0 — include them
    SELECT doc_id, f FROM fp0
    UNION ALL
    SELECT doc_id, CAST(0 AS UBIGINT) FROM corpus
    WHERE len(regexp_extract_all(lower(text), '\S+')) = 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {max_hamming}"""


def ann_topk_lsh_sql() -> str:
    """Brute-force top-k over the probe-duplicate-augmented corpus.
    The planted copies (cos = 1 exactly, ids tie-broken ascending) are
    the full top-10 on both sides, so LSH output = exact output."""
    return """WITH probes AS (
    SELECT vec_id AS probe_id, embedding AS pe
    FROM embeddings ORDER BY vec_id LIMIT 5
),
aug AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT 200000 + p.probe_id * 100 + j.j, p.pe
    FROM probes p, (SELECT unnest(range(10)) AS j) j
),
sims AS (
    SELECT p.probe_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(p.pe, e.embedding) AS sim
    FROM probes p JOIN aug e ON e.vec_id <> p.probe_id
)
SELECT probe_id, rank, neighbor_id FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY round(sim, 9) DESC, neighbor_id) AS rank
    FROM sims
) WHERE rank <= 10"""


def fingerprint_sql(k: int = 3, w: int = 4) -> str:
    """The fused ``fingerprint`` oracle: md5 of the normalized text
    PLUS winnowing fingerprints recomputed from the same md5 k-gram
    hashes, including the engine's short-doc fallbacks: < k tokens →
    one k-gram of all tokens (the greatest(1,…) range), < w k-grams →
    one fingerprint = min over all k-gram hashes, zero tokens → a row
    with n_fingerprints = 0 / checksum 0."""
    kg_h = _md5_le64(f"array_to_string(toks[i+1:i+{k}], ' ')")
    return rf"""WITH tokl AS (
    SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents
),
kg AS (
    SELECT doc_id, i, {kg_h} AS h, greatest(1, len(toks) - {k - 1}) AS n_kg
    FROM (SELECT doc_id, toks,
                 unnest(range(greatest(1, len(toks) - {k - 1}))) AS i
          FROM tokl WHERE len(toks) > 0)
),
wins AS (
    SELECT doc_id, i, n_kg,
           min(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mh
    FROM kg
),
fps AS (
    SELECT DISTINCT doc_id, mh FROM wins WHERE i <= n_kg - {w}
    UNION
    -- short-doc fallback (< w k-grams): one fingerprint = global min
    SELECT doc_id, min(h) AS mh FROM kg WHERE n_kg < {w} GROUP BY doc_id
),
agg AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(sum(mh % 1000000007) % {2**62} AS BIGINT) AS fp_checksum
    FROM fps GROUP BY doc_id
)
SELECT d.doc_id,
       md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) AS fp,
       coalesce(a.n_fingerprints, 0) AS n_fingerprints,
       coalesce(a.fp_checksum, 0) AS fp_checksum
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"""


def dedup_clusters_sql() -> str:
    """Transitive closure over the exact-Jaccard pair graph (the
    minhash oracle inlined as a CTE): connected components with
    min-id representative and component size — ``dedup_clusters``'s
    from-first-principles twin."""
    return f"""WITH RECURSIVE pairs AS (
{dedup_minhash_lsh_sql()}
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach(src, node) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
),
reps AS (SELECT node, min(src) AS cluster_rep FROM reach GROUP BY node),
sizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM reps GROUP BY cluster_rep)
SELECT r.node AS doc_id, r.cluster_rep, s.cluster_size
FROM reps r JOIN sizes s ON s.cluster_rep = r.cluster_rep"""


def dedup_survivors_sql() -> str:
    """Per-cluster longest-member survivor (ties → smallest id) over
    the same transitive closure — ``dedup_survivors('longest')``'s
    twin. Mutant copies are one token longer than their source, so the
    policy genuinely diverges from min-id on mutant clusters."""
    return f"""WITH RECURSIVE pairs AS (
{dedup_minhash_lsh_sql()}
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach(src, node) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
),
reps AS (SELECT node, min(src) AS cluster_rep FROM reach GROUP BY node),
sizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM reps GROUP BY cluster_rep),
{_AUG_CORPUS.strip()},
m AS (
    SELECT r.cluster_rep, r.node,
           row_number() OVER (PARTITION BY r.cluster_rep
                              ORDER BY length(c.text) DESC, r.node) AS rn
    FROM reps r JOIN corpus c ON c.doc_id = r.node
)
SELECT m.cluster_rep, m.node AS survivor_id, s.cluster_size
FROM m JOIN sizes s ON s.cluster_rep = m.cluster_rep
WHERE m.rn = 1"""


def sample_stratified_sql() -> str:
    """Deterministic stratified Bernoulli sample: the identical
    md5-little-endian draw arithmetic as sampling._u32, thresholds =
    DEFAULT_FRACTIONS."""
    id_expr = "'samp|'||CAST(doc_id AS VARCHAR)"
    draw = f"({_md5_le64(id_expr)} % 4294967296)"
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE {draw} < (CASE WHEN lang = 'en' THEN 0.5
                             WHEN lang = 'pt' THEN 0.3
                             ELSE 0.2 END) * 4294967296"""


def split_corpus_sql(weights: tuple[int, int, int] = (98, 1, 1)) -> str:
    """Deterministic holdout assignment: same md5-little-endian draw as
    sampling.split_corpus, bucketed by integer weights."""
    total = sum(weights)
    b1, b2 = weights[0], weights[0] + weights[1]
    id_expr = "'split|'||CAST(doc_id AS VARCHAR)"
    draw = f"(({_md5_le64(id_expr)} % 4294967296) % {total})"
    return f"""
        SELECT doc_id, lang,
               CASE WHEN {draw} < {b1} THEN 'train'
                    WHEN {draw} < {b2} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents"""


def group_topk_sql(k: int = 5) -> str:
    return f"""
        SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars FROM (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars DESC, doc_id) AS rank
            FROM documents
        ) WHERE rank <= {k}"""


def pack_sequences_sql(max_tokens: int = 256, num_buckets: int = 64) -> str:
    """Recursive-CTE replay of the bucket-local next-fit fill rule."""
    return rf"""
        WITH RECURSIVE ord AS (
            SELECT doc_id, doc_id % {num_buckets} AS bucket,
                   len(regexp_extract_all(text, '\S+')) AS n,
                   row_number() OVER (PARTITION BY doc_id % {num_buckets}
                                      ORDER BY doc_id) AS rn
            FROM documents
        ),
        pack(bucket, rn, doc_id, n, bin_id, fill) AS (
            SELECT bucket, rn, doc_id, n, CAST(0 AS BIGINT), n
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.bucket, o.rn, o.doc_id, o.n,
                   CASE WHEN p.fill + o.n <= {max_tokens} THEN p.bin_id ELSE p.bin_id + 1 END,
                   CASE WHEN p.fill + o.n <= {max_tokens} THEN p.fill + o.n ELSE o.n END
            FROM pack p JOIN ord o ON o.bucket = p.bucket AND o.rn = p.rn + 1
        )
        SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, bin_id,
               CAST(n AS BIGINT) AS n_tokens
        FROM pack"""


def media_decode_ppm_sql(target_w: int = 64) -> str:
    """The decoded features are SQL-reproducible because the SYNTH
    payload derives from row scalars — but the pipeline path really
    parses bytes, so a decoder bug (wrong dims, channel swap,
    off-by-one header scan) breaks parity."""
    return f"""
        WITH dims AS (
            SELECT doc_id,
                   32 + (n_chars % 97) AS w,
                   16 + (doc_id % 53) AS h,
                   (doc_id * 7) % 256 AS r,
                   (doc_id * 13) % 256 AS g,
                   (n_chars * 31) % 256 AS b
            FROM documents
        ),
        rs AS (
            SELECT *, greatest(1, CAST(floor(h * {target_w}.0 / w + 0.5) AS BIGINT)) AS oh
            FROM dims
        )
        SELECT doc_id, TRUE AS ok,
               CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
               CAST(r AS BIGINT) AS mean_r, CAST(g AS BIGINT) AS mean_g,
               CAST(b AS BIGINT) AS mean_b,
               CAST({target_w} AS BIGINT) AS out_w, oh AS out_h,
               oh * {target_w} * (r + g + b) AS resized_sum
        FROM rs"""


def media_audio_features_sql() -> str:
    """Audio-feature twin: replays the triangle-wave synth arithmetic
    (length/period/amplitude/rate from row scalars) in exact integer
    SQL — a WAV parser bug (chunk alignment, channel reshape, byte
    order) breaks parity."""
    return """
        WITH p AS (
            SELECT doc_id,
                   64 + (n_chars % 257) AS n,
                   8 + (doc_id % 13) AS period,
                   100 + (doc_id % 900) AS amp,
                   8000 + 1000 * (doc_id % 5) AS rate
            FROM documents
        ), s AS (
            SELECT doc_id, n, period, amp, rate, unnest(range(n)) AS i FROM p
        ), t AS (
            SELECT doc_id, n, amp, rate,
                   CASE WHEN (i % period) * 2 < period
                        THEN i % period ELSE period - (i % period) END AS tri
            FROM s
        )
        SELECT doc_id, TRUE AS ok,
               CAST(max(n) AS BIGINT) AS n_samples,
               CAST(1 AS BIGINT) AS channels,
               CAST(max(rate) AS BIGINT) AS sample_rate,
               CAST(max(n) * 1000 // max(rate) AS BIGINT) AS duration_ms,
               CAST(max(tri * amp) AS BIGINT) AS peak,
               CAST(sum(tri * amp) AS BIGINT) AS abs_sum
        FROM t GROUP BY doc_id"""


def range_join_events_sql(window_s: int = 3600) -> str:
    """Correlated trailing-window count — the range join's twin."""
    return f"""
        SELECT e.event_id, e.user_id,
               (SELECT count(*) FROM events o
                 WHERE o.user_id = e.user_id
                   AND o.ts < e.ts
                   AND o.ts >= e.ts - INTERVAL {window_s} SECOND) AS n_recent_events
        FROM events e"""


def dedup_segments_sql(seg_len: int = 10) -> str:
    """Segment-dedup twin: regenerates the boilerplate augmentation
    from the SAME constants as the engine (no drift possible), keys
    winners on the raw segment STRING (the engine keys on its md5 —
    a collision would surface here as a parity failure), and replays
    the global-first rule as ``row_number() OVER (PARTITION BY seg
    ORDER BY doc_id, seg_idx) = 1``."""
    from .pipelines.curation import SEG_DUP_MOD, SEG_DUP_PHRASES

    p0, p1, p2 = SEG_DUP_PHRASES
    return rf"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % {SEG_DUP_MOD} = 0 THEN
                   (CASE doc_id % 3 WHEN 0 THEN '{p0}' WHEN 1 THEN '{p1}'
                         ELSE '{p2}' END) || ' ' || coalesce(text, '')
                 ELSE coalesce(text, '') END AS text
          FROM documents
        ), ws AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM aug
        ), segs AS (
          SELECT doc_id, i AS seg_idx,
                 array_to_string(
                   w[i*{seg_len}+1 : least((i+1)*{seg_len}, len(w))], ' ') AS seg
          FROM (SELECT doc_id, w,
                       unnest(range(CAST(ceil(len(w)/{seg_len}.0) AS BIGINT))) AS i
                FROM ws)
        ), flag AS (
          SELECT doc_id, seg_idx, seg,
                 row_number() OVER (PARTITION BY seg
                                    ORDER BY doc_id, seg_idx) = 1 AS keep
          FROM segs
        ), agg AS (
          SELECT doc_id, count(*) AS n_segs,
                 count(*) FILTER (WHERE keep) AS n_kept,
                 coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                          FILTER (WHERE keep), '') AS text_clean
          FROM flag GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_segs, 0) AS BIGINT) AS n_segs,
               CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
               coalesce(a.text_clean, '') AS text_clean
        FROM documents d LEFT JOIN agg a USING (doc_id)"""


def dedup_substrings_sql(w: int = 8) -> str:
    """Windowed-ExactSubstr twin: regenerates the boilerplate
    augmentation from the engine's constants, enumerates every
    overlapping ``w``-token window, keys duplicate-tagging on the raw
    window STRING (the engine keys on its md5 — a collision would
    surface as a parity failure), replays the global-first rule as
    ``row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) > 1``,
    expands tagged occurrences to per-token coverage, and rebuilds the
    unmasked token sequence."""
    from .pipelines.curation import SEG_DUP_MOD, SEG_DUP_PHRASES

    p0, p1, p2 = SEG_DUP_PHRASES
    return rf"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % {SEG_DUP_MOD} = 0 THEN
                   (CASE doc_id % 3 WHEN 0 THEN '{p0}' WHEN 1 THEN '{p1}'
                         ELSE '{p2}' END) || ' ' || coalesce(text, '')
                 ELSE coalesce(text, '') END AS text
          FROM documents
        ), ws AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM aug
        ), wins AS (
          SELECT doc_id, i AS pos, array_to_string(w[i+1 : i+{w}], ' ') AS win
          FROM (SELECT doc_id, w,
                       unnest(range(greatest(len(w) - {w} + 1, 0))) AS i
                FROM ws)
        ), tagged AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY win
                                      ORDER BY doc_id, pos) AS rn,
                   count(*) OVER (PARTITION BY win) AS cnt
            FROM wins)
          WHERE cnt >= 2 AND rn > 1
        ), cov AS (
          SELECT DISTINCT doc_id, pos + u AS ti
          FROM tagged, (SELECT unnest(range({w})) AS u)
        ), toks AS (
          SELECT doc_id, i AS ti, w[i+1] AS tok
          FROM (SELECT doc_id, w, unnest(range(len(w))) AS i FROM ws)
        ), agg AS (
          SELECT t.doc_id, count(*) AS n_tokens,
                 count(c.ti) AS n_masked,
                 coalesce(string_agg(tok, ' ' ORDER BY t.ti)
                          FILTER (WHERE c.ti IS NULL), '') AS text_clean
          FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.ti = c.ti
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(a.n_masked, 0) AS BIGINT) AS n_masked,
               coalesce(a.text_clean, '') AS text_clean
        FROM documents d LEFT JOIN agg a USING (doc_id)"""


def pii_scrub_sql() -> str:
    """PII-scrub twin: regenerates the deterministic PII planting and
    runs the byte-identical RE2 regexes (count emails → redact emails →
    count phones → redact phones, same order as the engine)."""
    from .pipelines.curation import PII_MOD, _EMAIL_RE, _PHONE_RE

    return f"""
        WITH aug AS (
          SELECT doc_id,
                 coalesce(text,'')
                 || CASE WHEN doc_id % {PII_MOD} = 0 THEN
                      ' contact user' || doc_id || '@mail.example.com or +1-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
                 || CASE WHEN doc_id % {PII_MOD * 3} = 0 THEN
                      ' alt user' || doc_id || 'b@mail.example.com'
                    ELSE '' END AS text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(
                   regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}')) AS BIGINT) AS n_phones,
               regexp_replace(
                   regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS text_redacted
        FROM aug"""


def mix_sample_sql() -> str:
    """Temperature-resampling twin (default alpha = 0.5): per-language
    keep probability sqrt(c_min / c_l) — sqrt is correctly-rounded
    IEEE in both engines so the row sets are bit-identical — and the
    same md5-little-endian draw as the engine's 'mix|<id>' salt."""
    id_expr = "'mix|'||CAST(doc_id AS VARCHAR)"
    draw = f"({_md5_le64(id_expr)} % 4294967296)"
    return f"""
        WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        m AS (SELECT min(n) AS n_min FROM c),
        p AS (SELECT lang, sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE)) AS p
              FROM c, m)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN p USING (lang)
        WHERE {draw} < p.p * 4294967296"""


def merge_paginated_sql(chars_per_page: int = 11) -> str:
    """document_merge with the htmltopdf pageLayout analogue: integer
    ceil-division pagination — no float surface."""
    return f"""
        SELECT c_custkey, length(doc) AS doc_len, md5(doc) AS doc_md5,
               (length(doc) + {chars_per_page - 1}) // {chars_per_page} AS n_pages
        FROM (
            SELECT c_custkey,
                   'Dear ' || c_name || ', your ' || c_mktsegment
                   || ' account balance is ' || printf('%.2f', c_acctbal)
                   || '.' AS doc
            FROM customer
        )"""


def bigram_fluency_sql(
    top_bigrams: int = 1 << 20, top_words: int = 1 << 20
) -> str:
    """Stupid-Backoff-fluency twin: rebuilds the unigram / bigram
    tables with the engine's exact cap tie-break (count DESC, gram
    ASC), replays the integer-quantized term rule (int64 floor
    division at FLUENCY_SCALE), and performs the one final double
    division — bit-identical by the quantized-sum rule."""
    from .pipelines.curation import FLUENCY_SCALE, SB_LAMBDA_DEN, SB_LAMBDA_NUM

    scale = FLUENCY_SCALE
    return rf"""
        WITH nt AS (
          SELECT doc_id,
                 len(regexp_extract_all(coalesce(text, ''), '\S+')) AS n_tok
          FROM documents
        ), toks AS (
          SELECT doc_id, i AS pos, w[i+1] AS tok
          FROM (SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w,
                       unnest(range(len(w))) AS i
                FROM documents)
        ), uni AS (
          SELECT tok AS g, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
        ), n_total AS (
          SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n FROM uni
        ), uni_cap AS (
          SELECT g, c FROM (
            SELECT g, c, row_number() OVER (ORDER BY c DESC, g ASC) AS rn
            FROM uni) WHERE rn <= {top_words}
        ), big AS (
          SELECT t1.doc_id, t1.tok AS w1, t2.tok AS w2,
                 t1.tok || ' ' || t2.tok AS g
          FROM toks t1 JOIN toks t2
            ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
        ), bcnt AS (
          SELECT g, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY g
        ), bcap AS (
          SELECT g, c FROM (
            SELECT g, c, row_number() OVER (ORDER BY c DESC, g ASC) AS rn
            FROM bcnt) WHERE rn <= {top_bigrams}
        ), terms AS (
          SELECT b.doc_id,
                 CASE WHEN bc.c IS NOT NULL AND u1.c IS NOT NULL
                      THEN 1 ELSE 0 END AS hit,
                 CASE WHEN bc.c IS NOT NULL AND u1.c IS NOT NULL
                      THEN (bc.c * {scale}) // greatest(u1.c, 1)
                      ELSE (coalesce(u2.c, 0) * {SB_LAMBDA_NUM * scale})
                           // ({SB_LAMBDA_DEN} * greatest((SELECT n FROM n_total), 1))
                 END AS term
          FROM big b
          LEFT JOIN bcap bc ON bc.g = b.g
          LEFT JOIN uni_cap u1 ON u1.g = b.w1
          LEFT JOIN uni_cap u2 ON u2.g = b.w2
        ), agg AS (
          SELECT doc_id, CAST(sum(term) AS BIGINT) AS s,
                 CAST(sum(hit) AS BIGINT) AS hits
          FROM terms GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(greatest(nt.n_tok - 1, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(a.hits, 0) AS BIGINT) AS n_hits,
               CASE WHEN nt.n_tok > 1
                    THEN CAST(coalesce(a.s, 0) AS DOUBLE)
                         / CAST(greatest(nt.n_tok - 1, 0) * {scale} AS DOUBLE)
               END AS fluency
        FROM documents d
        JOIN nt ON nt.doc_id = d.doc_id
        LEFT JOIN agg a ON a.doc_id = d.doc_id"""


def source_overlap_sql(n: int = 3) -> str:
    """Cross-source overlap twin: distinct (source, gram-md5) via the
    same little-endian 64-bit md5 as the engine (identical even under
    collisions), sizes + pairwise intersections by self-join, all
    source pairs via a sizes cross join, one final int/int division."""
    assert n == 3, "twin is written for the registry default n=3"
    h = _md5_le64("a.w || ' ' || b.w || ' ' || c.w")
    return rf"""
        WITH tok AS (
            SELECT doc_id, source, unnest(ws) AS w,
                   unnest(range(1, len(ws) + 1)) AS i
            FROM (SELECT doc_id, source,
                         regexp_extract_all(coalesce(text, ''), '\S+') AS ws
                  FROM documents)
        ), grams AS (
            SELECT DISTINCT a.source, {h} AS h
            FROM tok a
            JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN tok c ON c.doc_id = a.doc_id AND c.i = a.i + 2
        ), sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM grams GROUP BY source
        ), inter AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM grams a JOIN grams b
              ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT sa.source AS src_a, sb.source AS src_b,
               sa.n AS n_a, sb.n AS n_b,
               coalesce(i.n_common, 0) AS n_common,
               coalesce(i.n_common, 0)
                 / (sa.n + sb.n - coalesce(i.n_common, 0)) AS jaccard
        FROM sizes sa
        JOIN sizes sb ON sa.source < sb.source
        LEFT JOIN inter i
          ON i.src_a = sa.source AND i.src_b = sb.source"""


def tfidf_terms_sql(k: int = 5) -> str:
    """tf-idf twin: same quantized integer score (tf·(2(N−df)+1)·1000
    // (2df+1)) and (score_q DESC, term ASC) ranking — every output
    column is an integer or string, so the driver hash is exact."""
    from .pipelines.text import TFIDF_SCALE

    assert TFIDF_SCALE == 1000, "twin is written for the engine default scale"
    return rf"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS w
            FROM documents
        ), tf AS (
            SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, w
        ), df AS (
            SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
        ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.w AS term, tf.tf, df.df,
                   tf.tf * (2 * ((SELECT n FROM n) - df.df) + 1) * 1000
                     // (2 * df.df + 1) AS score_q
            FROM tf JOIN df USING (w)
        )
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score_q
        FROM (
            SELECT doc_id, term, tf, df, score_q,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score_q DESC, term) AS rank
            FROM scored
        ) WHERE rank <= {k}"""


def span_corruption_sql() -> str:
    """Span-corruption twin: replays the identical md5 draws (low-64 →
    selection, high-64 → length), rebuilds coverage by a position-range
    join (non-overlap is structural: MAX_LEN < STRIDE), and reassembles
    both text sides with ordered string_agg — sentinels sort before the
    covered token sharing their position via the kind column."""
    from .pipelines.prep import CORRUPT_MAX_LEN, CORRUPT_PCT, CORRUPT_STRIDE

    draw = _md5_le64("'corrupt|' || CAST(t.doc_id AS VARCHAR) || '|' || CAST(t.pos AS VARCHAR)")
    ln = _md5_le64_hi("'corrupt|' || CAST(t.doc_id AS VARCHAR) || '|' || CAST(t.pos AS VARCHAR)")
    return rf"""
        WITH tok AS (
            SELECT doc_id, i AS pos, w[i+1] AS tok
            FROM (SELECT doc_id,
                         regexp_extract_all(coalesce(text, ''), '\S+') AS w,
                         unnest(range(len(w))) AS i
                  FROM documents)
        ), nt AS (
            SELECT doc_id,
                   len(regexp_extract_all(coalesce(text, ''), '\S+')) AS n_tok
            FROM documents
        ), spans AS (
            SELECT doc_id, pos AS a, pos + ln AS e,
                   row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS k
            FROM (SELECT t.doc_id, t.pos,
                         {draw} % 100 AS draw,
                         {ln} % {CORRUPT_MAX_LEN} + 1 AS ln
                  FROM tok t WHERE t.pos % {CORRUPT_STRIDE} = 0)
            WHERE draw < {CORRUPT_PCT}
        ), cov AS (
            SELECT t.doc_id, t.pos, s.k
            FROM tok t JOIN spans s
              ON t.doc_id = s.doc_id AND t.pos >= s.a AND t.pos < s.e
        ), inp AS (
            SELECT doc_id, a AS pos, 0 AS kind,
                   '<extra_id_' || k || '>' AS piece FROM spans
            UNION ALL
            SELECT t.doc_id, t.pos, 1, t.tok
            FROM tok t LEFT JOIN cov c
              ON t.doc_id = c.doc_id AND t.pos = c.pos
            WHERE c.pos IS NULL
        ), tgt AS (
            SELECT doc_id, a AS pos, 0 AS kind,
                   '<extra_id_' || k || '>' AS piece FROM spans
            UNION ALL
            SELECT c.doc_id, c.pos, 1, t.tok
            FROM cov c JOIN tok t
              ON t.doc_id = c.doc_id AND t.pos = c.pos
        ), agg_i AS (
            SELECT doc_id, string_agg(piece, ' ' ORDER BY pos, kind) AS input_text
            FROM inp GROUP BY doc_id
        ), agg_t AS (
            SELECT doc_id, string_agg(piece, ' ' ORDER BY pos, kind) AS target_text
            FROM tgt GROUP BY doc_id
        ), st AS (
            SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id
        ), cv AS (
            SELECT doc_id, count(*) AS n_masked FROM cov GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(nt.n_tok AS BIGINT) AS n_tokens,
               CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(cv.n_masked, 0) AS BIGINT) AS n_masked,
               coalesce(agg_i.input_text, '') AS input_text,
               coalesce(agg_t.target_text, '') AS target_text
        FROM documents d
        JOIN nt USING (doc_id)
        LEFT JOIN st USING (doc_id)
        LEFT JOIN cv USING (doc_id)
        LEFT JOIN agg_i USING (doc_id)
        LEFT JOIN agg_t USING (doc_id)"""


def collocations_sql(k: int = 100, min_count: int = 5) -> str:
    """PMI-collocation twin: identical quantized rational score
    (c(ab)·N·10⁶ // (c(a)·c(b))) and (score_q DESC, gram ASC) ranking —
    all-integer outputs, hash-exact."""
    from .pipelines.curation import PMI_SCALE

    return rf"""
        WITH toks AS (
            SELECT doc_id, i AS pos, w[i+1] AS tok
            FROM (SELECT doc_id,
                         regexp_extract_all(coalesce(text, ''), '\S+') AS w,
                         unnest(range(len(w))) AS i
                  FROM documents)
        ), uni AS (
            SELECT tok AS g, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY tok
        ), n_total AS (
            SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n FROM uni
        ), cand AS (
            SELECT w1, w2, c_ab FROM (
                SELECT t1.tok AS w1, t2.tok AS w2,
                       CAST(count(*) AS BIGINT) AS c_ab
                FROM toks t1 JOIN toks t2
                  ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
                GROUP BY 1, 2
            ) WHERE c_ab >= {min_count}
        ), scored AS (
            SELECT w1 || ' ' || w2 AS gram, c_ab, ua.c AS c_a, ub.c AS c_b,
                   c_ab * (SELECT n FROM n_total) * {PMI_SCALE}
                     // greatest(ua.c * ub.c, 1) AS score_q
            FROM cand
            JOIN uni ua ON ua.g = cand.w1
            JOIN uni ub ON ub.g = cand.w2
        )
        SELECT CAST(rank AS BIGINT) AS rank, gram, c_ab, c_a, c_b, score_q
        FROM (
            SELECT gram, c_ab, c_a, c_b, score_q,
                   row_number() OVER (ORDER BY score_q DESC, gram) AS rank
            FROM scored
        ) WHERE rank <= {k}"""


def corpus_oracles() -> dict[str, str]:
    """All corpus-derived oracle SQL, keyed by queries() name."""
    return {
        "extract_documents": extract_documents_sql(),
        "span_properties": span_properties_sql(),
        "span_split": span_split_sql(),
        "span_delete": span_delete_sql(),
        "span_reorder": span_reorder_sql(),
        "span_watermark": span_watermark_sql(),
        "span_combine": span_combine_sql(),
        "extract_layout": extract_layout_sql(),
        "autotag_report": autotag_report_sql(),
        "compress_payloads": compress_payloads_sql(),
        "protect_payloads": protect_payloads_sql(),
        "dedup_minhash_lsh": dedup_minhash_lsh_sql(),
        "dedup_simhash": dedup_simhash_sql(),
        "ann_topk_lsh": ann_topk_lsh_sql(),
        # same planted-dup corpus + output contract → same oracle
        "ann_topk_ivf": ann_topk_lsh_sql(),
        "rotate_pages": rotate_pages_sql(),
        "insert_pages": _pair_merge_sql("insert"),
        "replace_pages": _pair_merge_sql("replace"),
        "fingerprint": fingerprint_sql(),
        # countersign with the same (demo) credential
        "seal_documents": """
            SELECT doc_id, md5(text) AS content_fp,
                   md5('demo-credential|' || CAST(doc_id AS VARCHAR) || '|' || md5(text)) AS seal
            FROM documents""",
        # r4 registry rotation: the formerly pytest-only library ops
        "dedup_clusters": dedup_clusters_sql(),
        "dedup_survivors": dedup_survivors_sql(),
        "sample_stratified": sample_stratified_sql(),
        "group_topk": group_topk_sql(),
        "pack_sequences": pack_sequences_sql(),
        "media_decode_ppm": media_decode_ppm_sql(),
        # r5 real WAV/PCM16 audio decode (rotated_out gate)
        "media_audio_features": media_audio_features_sql(),
        "range_join_events": range_join_events_sql(),
        # r4 curation additions (pipelines/curation.py + merge_paginated)
        "dedup_segments": dedup_segments_sql(),
        "dedup_substrings": dedup_substrings_sql(),
        "pii_scrub": pii_scrub_sql(),
        "mix_sample": mix_sample_sql(),
        "merge_paginated": merge_paginated_sql(),
        # late-r4 holdout split (library op; rotated_out gate)
        "split_corpus": split_corpus_sql(),
        # continued-r4 Stupid Backoff bigram LM fluency
        "bigram_fluency": bigram_fluency_sql(),
        # continued-r4 cross-source n-gram overlap matrix
        "source_overlap": source_overlap_sql(),
        # continued-r4 per-document tf-idf keyword extraction
        "tfidf_terms": tfidf_terms_sql(),
        # continued-r4 T5 span-corruption sample prep
        "span_corruption": span_corruption_sql(),
        # continued-r4 PMI collocation mining
        "collocations": collocations_sql(),
        # late-r4 persisted-index near-dup: the minhash oracle's exact
        # cross (base x increment) restriction
        "neardup_index": f"""SELECT * FROM ({dedup_minhash_lsh_sql()})
            WHERE id_a < 1000000 AND id_b >= 1000000""",
        # late-r4 exact token-budget fill (budget 25000; the window
        # cumulative-sum rule IS the engine's kept-prefix definition)
        "select_token_budget": r"""
            WITH s AS (
              SELECT doc_id,
                     CAST(round(10000 * round(0.5 * round(len(regexp_extract_all(lower(text), '\b(?:the|a|of|to|and)\b'))
                           / greatest(len(regexp_extract_all(lower(text), '\S+')), 1), 4)
                           + 0.5 * least(greatest(len(regexp_extract_all(lower(text), '\S+')), 1) / 100.0, 1.0),
                           4)) AS BIGINT) AS quality_idx,
                     len(regexp_extract_all(lower(text), '\S+')) AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, quality_idx, n_tokens,
                     sum(n_tokens) OVER (ORDER BY quality_idx DESC, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM s
            )
            SELECT doc_id, quality_idx, n_tokens FROM c WHERE cum <= 25000
        """,
        # late-r4 cross-language calibration: percent_rank() is
        # (rank-1)/(n-1) — one int division, bit-exact in both engines
        "quality_percentile_by_lang": r"""
            WITH s AS (
              SELECT doc_id, lang,
                     round(0.5 * round(len(regexp_extract_all(lower(text), '\b(?:the|a|of|to|and)\b'))
                           / greatest(len(regexp_extract_all(lower(text), '\S+')), 1), 4)
                           + 0.5 * least(greatest(len(regexp_extract_all(lower(text), '\S+')), 1) / 100.0, 1.0),
                           4) AS quality
              FROM documents
            )
            SELECT doc_id, lang, quality,
                   percent_rank() OVER (PARTITION BY lang ORDER BY quality) AS pct_rank
            FROM s
        """,
        # late-r4 composed recipe: train split -> exact top-20% quality
        # within the split -> 64/32 chunk accounting, per language
        "curate_corpus": rf"""
            WITH s AS (
              SELECT doc_id, lang,
                     round(0.5 * round(len(regexp_extract_all(lower(text), '\b(?:the|a|of|to|and)\b'))
                           / greatest(len(regexp_extract_all(lower(text), '\S+')), 1), 4)
                           + 0.5 * least(greatest(len(regexp_extract_all(lower(text), '\S+')), 1) / 100.0, 1.0),
                           4) AS quality,
                     len(regexp_extract_all(lower(text), '\S+')) AS n_tokens
              FROM documents
              WHERE ((({_md5_le64("'split|'||CAST(doc_id AS VARCHAR)")} % 4294967296) % 100) < 98)
            ), r AS (
              SELECT *, rank() OVER (ORDER BY quality DESC) AS rk,
                     count(*) OVER () AS n
              FROM s
            ), k AS (SELECT * FROM r WHERE rk <= ceil(0.2 * n))
            SELECT lang, count(*) AS n_docs, sum(n_tokens) AS n_tokens,
                   sum(CASE WHEN n_tokens > 0 THEN (n_tokens + 31) // 32 ELSE 0 END) AS n_chunks
            FROM k GROUP BY lang
        """,
        # r5 fourth-session additions: exact-integer PageRank over the
        # deterministic domain graph + per-user Markov transitions
        "pagerank_domains": pagerank_domains_sql(),
        "event_transitions": event_transitions_sql(),
        "coalesce_intervals": coalesce_intervals_sql(),
        "global_row_number": global_row_number_sql(),
        "event_cooccurrence": event_cooccurrence_sql(),
        "quality_deciles": quality_deciles_sql(),
        "crawl_priority": crawl_priority_sql(),
    }


def pagerank_domains_sql() -> str:
    """K-unrolled exact-integer PageRank twin. Rebuilds the identical
    deterministic domain graph (little-endian md5 mod D — the
    _md5_le64 arithmetic) and replays graph.pagerank_domains' int64
    contract verbatim: per-EDGE floor division r//outw, damped update
    BASE + (DAMP*c)//100, all in DuckDB integer arithmetic (HUGEINT
    sums, // floor division on positives). Constants are imported from
    the op module so a default drift breaks loudly, not silently."""
    from pdf_ocr_api_ray.pipelines.graph import (
        DAMP_DEN,
        DAMP_NUM,
        N_DOMAINS,
        N_ITERS,
        OUT_LINKS,
        RANK_SCALE,
    )

    D, L, K, S = N_DOMAINS, OUT_LINKS, N_ITERS, RANK_SCALE
    base = (S * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    src_h = _md5_le64("'dom|'||CAST(doc_id AS VARCHAR)")
    dst_h = _md5_le64("'lnk|'||CAST(doc_id AS VARCHAR)||'|'||CAST(j AS VARCHAR)")
    src = f"CAST({src_h} % {D} AS BIGINT)"
    dst = f"CAST({dst_h} % {D} AS BIGINT)"
    iters, prev = "", "r0"
    for t in range(1, K + 1):
        iters += f""",
c{t} AS (SELECT e.dst AS v, SUM({prev}.r // ow.outw) AS c
        FROM e JOIN ow USING (src) JOIN {prev} ON {prev}.v = e.src GROUP BY e.dst),
r{t} AS (SELECT d.v, CAST({base} + ({DAMP_NUM} * COALESCE(c{t}.c, 0)) // {DAMP_DEN} AS BIGINT) AS r
        FROM d LEFT JOIN c{t} ON c{t}.v = d.v)"""
        prev = f"r{t}"
    return f"""
WITH e AS (
  SELECT {src} AS src, {dst} AS dst
  FROM documents, range({L}) t(j)
),
ow AS (SELECT src, count(*) AS outw FROM e GROUP BY src),
d AS (SELECT CAST(range AS BIGINT) AS v FROM range({D})),
r0 AS (SELECT v, CAST({S} AS BIGINT) AS r FROM d){iters}
SELECT d.v AS domain, {prev}.r AS rank_u,
       CAST(COALESCE(ow.outw, 0) // {L} AS BIGINT) AS n_docs
FROM d JOIN {prev} ON {prev}.v = d.v LEFT JOIN ow ON ow.src = d.v
ORDER BY domain"""


def event_transitions_sql() -> str:
    """lag()-window twin of events.event_transitions: consecutive-event
    pairs per user under the same total order (ts, event_id), counts
    grouped exactly, probabilities quantized with the op module's
    P_SCALE in integer arithmetic (HUGEINT product, // floor)."""
    from pdf_ocr_api_ray.pipelines.events import P_SCALE

    return f"""
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
c AS (SELECT prev AS prev_type, event_type AS next_type, count(*) AS n
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST((n * {P_SCALE}) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_u
FROM c ORDER BY prev_type, next_type"""


def coalesce_intervals_sql() -> str:
    """Gaps-and-islands twin of events.coalesce_intervals: identical
    integer-microsecond intervals (epoch_us + quantized |value| +
    INTERVAL_MIN_US), the same STRICT s > prev_max island opener
    (touching intervals merge), same (s, e, event_id) total order."""
    from pdf_ocr_api_ray.pipelines.events import INTERVAL_MIN_US

    return f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + abs(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) + {INTERVAL_MIN_US} AS e,
         event_id
  FROM events
),
m AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max FROM iv),
fl AS (SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS isl FROM m),
g AS (SELECT *, SUM(isl) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                               ROWS UNBOUNDED PRECEDING) AS island FROM fl)
SELECT user_id, min(s) AS start_us, max(e) AS end_us, CAST(count(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, island"""


def global_row_number_sql() -> str:
    """row_number() twin of sampling.global_row_number — the engine's
    histogram-offset + range-bucket assignment must equal the global
    ORDER BY rank exactly."""
    return (
        "SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS row_no"
        " FROM documents"
    )


def event_cooccurrence_sql() -> str:
    """Distinct-pair self-join twin of events.event_cooccurrence with
    the identical integer lift quantization (HUGEINT product, //)."""
    from pdf_ocr_api_ray.pipelines.events import COOC_SCALE

    return f"""
WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT count(DISTINCT user_id) AS t FROM events),
s AS (SELECT event_type, count(*) AS n1 FROM du GROUP BY event_type),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n
      FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT p.type_a, p.type_b, CAST(p.n AS BIGINT) AS n_users,
       CAST((p.n * tot.t * {COOC_SCALE}) // (sa.n1 * sb.n1) AS BIGINT) AS lift_u
FROM p, tot
JOIN s sa ON sa.event_type = p.type_a
JOIN s sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b"""


def quality_deciles_sql(k: int = 10) -> str:
    """ntile(k) window twin of text.quality_deciles over the identical
    quantized quality lattice (the select_token_budget expression) and
    the identical (quality DESC, doc_id) total order."""
    return rf"""
WITH s AS (
  SELECT doc_id,
         CAST(round(10000 * round(0.5 * round(len(regexp_extract_all(lower(text), '\b(?:the|a|of|to|and)\b'))
               / greatest(len(regexp_extract_all(lower(text), '\S+')), 1), 4)
               + 0.5 * least(greatest(len(regexp_extract_all(lower(text), '\S+')), 1) / 100.0, 1.0),
               4)) AS BIGINT) AS quality_idx
  FROM documents
)
SELECT doc_id, quality_idx,
       CAST(ntile({k}) OVER (ORDER BY quality_idx DESC, doc_id) AS BIGINT) AS decile
FROM s"""


def crawl_priority_sql() -> str:
    """Composition twin of graph.crawl_priority: the K-unrolled
    PageRank CTE joined onto per-document domains (same md5
    arithmetic) and crossed with the select_token_budget quality
    lattice — the exact int64 product."""
    from pdf_ocr_api_ray.pipelines.graph import N_DOMAINS

    dom_h = _md5_le64("'dom|'||CAST(doc_id AS VARCHAR)")
    return rf"""
WITH pr AS ({pagerank_domains_sql()}),
s AS (
  SELECT doc_id, CAST({dom_h} % {N_DOMAINS} AS BIGINT) AS domain,
         CAST(round(10000 * round(0.5 * round(len(regexp_extract_all(lower(text), '\b(?:the|a|of|to|and)\b'))
               / greatest(len(regexp_extract_all(lower(text), '\S+')), 1), 4)
               + 0.5 * least(greatest(len(regexp_extract_all(lower(text), '\S+')), 1) / 100.0, 1.0),
               4)) AS BIGINT) AS quality_idx
  FROM documents
)
SELECT s.doc_id, s.domain, s.quality_idx,
       CAST(pr.rank_u * s.quality_idx AS BIGINT) AS priority_u
FROM s JOIN pr ON pr.domain = s.domain"""
