"""DuckDB SQL regeneration of the spans corpus (corpus v2 twin).

``corpus.py`` derives the interleaved-spans corpus from
``documents.parquet`` with md5-counter-addressed draws; this module
emits a DuckDB CTE chain that regenerates the **exact same spans
table** (doc_id, kind, text, media_ref, offset) in pure SQL. Every
oracle over the spans corpus (the flagship ``extract_documents``, the
``span_*`` surgery queries, ``extract_layout``) embeds these CTEs, so
the driver's DuckDB side recomputes the corpus independently instead
of trusting the Python generator — ``tests/test_corpus_sql.py`` pins
byte-equality of the two derivations.

The SQL is *generated* from the same constant tables the Python
corpus uses (``fixtures._COUNCILS`` …), so the two sides cannot drift
silently.
"""

from __future__ import annotations

from .fixtures import _COUNCILS, _ESTADOS, _NIVEIS, _OBJETOS, _UNIDADES_COL


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _arr(xs: list[str]) -> str:
    return "([" + ",".join(_lit(x) for x in xs) + "])"


def _h(label_sql: str) -> str:
    """u32 draw H(doc_id, label) — mirrors corpus._h byte for byte.
    ``label_sql`` is a SQL expression; references column ``did_s``."""
    return (
        "CAST(('0x'||substr(md5(did_s||'|'||" + label_sql + "),1,8)) AS UBIGINT)::BIGINT"
    )


def h_u32(label: str) -> str:
    """Public helper: the u32 draw for a *literal* label."""
    return _h(_lit(label))


def h_expr(label_sql: str) -> str:
    """Public helper: the u32 draw for a dynamic label SQL expression."""
    return _h(label_sql)


def win_expr() -> str:
    """The shared word-window expression — valid in any CTE that
    carries columns ``W``, ``wn``, ``ws`` (trow3/catseg3/fline3/mseg3).
    Same object as the generator's own expression — cannot drift."""
    return _WIN_EXPR


def qty_expr(label_sql: str) -> str:
    """Public helper: the qty string expression for a dynamic label."""
    return _qty(label_sql)


def _v(expr: str) -> str:
    return f"CAST({expr} AS VARCHAR)"


_TAB = "chr(9)"


# the shared window expression — ONE definition (win_expr() returns the
# same string; an edit here propagates to every consumer)
_WIN_EXPR = (
    "CASE WHEN len(W) = 0 THEN 'servico generico' "
    "ELSE array_to_string(W[ws+1:ws+wn], ' ') END"
)


def _win(label_sql: str) -> tuple[str, str, str]:
    """(wn_expr, ws_expr_using_wn, win_expr_using_wn_ws) for a window label."""
    lab_n = label_sql + "||'n'"
    lab_s = label_sql + "||'s'"
    wn = f"3 + ({_h(lab_n)}) % 4"
    ws = f"({_h(lab_s)}) % greatest(1, len(W) - wn)"
    return wn, ws, _WIN_EXPR


def zpad(expr: str, width: int) -> str:
    """Non-truncating zero-pad (DuckDB's lpad TRUNCATES strings longer
    than the target — Python's %0Nd never does; ids past 10^width would
    silently collide otherwise)."""
    return (
        f"CASE WHEN length({expr}) >= {width} THEN {expr} "
        f"ELSE lpad({expr}, {width}, '0') END"
    )


def _qty(label_sql: str) -> str:
    lab_qa = label_sql + "||'qa'"
    lab_qb = label_sql + "||'qb'"
    qa = f"1 + ({_h(lab_qa)}) % 9998"
    qb = f"({_h(lab_qb)}) % 100"
    return f"{_v(qa)}||','||lpad({_v(qb)},2,'0')"


_SPAN_COLS = 'doc_id, kind, text, media_ref, "offset"'

_TABLE_HEADER_LIT = (
    "'ITEM'||chr(9)||'DESCRIÇÃO DOS SERVIÇOS'||chr(9)||'UNIDADE'||chr(9)||'QUANTIDADE'"
)


def corpus_ctes(documents_rel: str = "documents") -> str:
    """The CTE chain ``base, hdr, tchunk, trow, …, corpus_spans``.

    Embed as ``WITH {corpus_ctes()} SELECT … FROM corpus_spans …``.
    ``documents_rel`` is the relation holding (doc_id BIGINT, text).
    """
    wn_t, ws_t, win_t = _win("'c'||c||'r'||i||'w'")
    wn_c, ws_c, win_c = _win("'s'||i||'w'")
    wn_f, ws_f, win_f = _win("'l'||i||'w'")
    wn_m, ws_m, win_m = _win("'c'||c||'s'||i||'w'")

    return f"""
base AS (
    SELECT doc_id AS did,
           CAST(doc_id AS VARCHAR) AS did_s,
           'doc-'||{zpad("CAST(doc_id AS VARCHAR)", 8)} AS doc_id_s,
           'mem://doc-'||CAST(doc_id AS VARCHAR) AS media_base,
           regexp_extract_all(coalesce(text, ''), '\\S+') AS W,
           {_h("'roll'")} AS roll
    FROM {documents_rel}
),
b2 AS (
    SELECT *,
           CASE WHEN roll < 85899345  THEN 'empty'
                WHEN roll < 300647710 THEN 'cat'
                WHEN roll < 515396075 THEN 'free'
                WHEN roll < 644245094 THEN 'boiler'
                WHEN roll < 858993459 THEN 'media'
                WHEN roll < 1288490188 THEN 'multi'
                ELSE 'table' END AS branch
    FROM base
),
hdr AS (
    SELECT *,
           {_arr(_COUNCILS)}[1 + ({_h("'co'")}) % {len(_COUNCILS)}] AS council,
           {_arr(_ESTADOS)}[1 + ({_h("'es'")}) % {len(_ESTADOS)}] AS estado,
           10000 + ({_h("'nu'")}) % 989999 AS num,
           2010 + ({_h("'yr'")}) % 16 AS yr,
           {_arr(_OBJETOS)}[1 + ({_h("'ob'")}) % {len(_OBJETOS)}] AS objeto,
           {_arr(_NIVEIS)}[1 + ({_h("'nv'")}) % {len(_NIVEIS)}] AS nivel,
           2 + ({_h("'nc'")}) % 3 AS nchunks
    FROM b2 WHERE branch <> 'empty'
),
tchunk AS (
    SELECT doc_id_s, did_s, W, branch, media_base, 0 AS c, '' AS prefix,
           CASE WHEN branch = 'media' THEN 5 ELSE 4 END AS rowbase
    FROM hdr WHERE branch IN ('table','media','boiler','multi')
    UNION ALL
    SELECT doc_id_s, did_s, W, branch, media_base, 2 AS c, '2.' AS prefix, 0 AS rowbase
    FROM hdr WHERE branch = 'multi' AND nchunks > 2
),
tchunk2 AS (
    SELECT *, 3 + ({_h("'c'||c||'n'")}) % 6 AS nrows FROM tchunk
),
trow AS (
    SELECT *, unnest(range(nrows)) AS i FROM tchunk2
),
trow2 AS (SELECT *, {wn_t} AS wn FROM trow),
trow3 AS (SELECT *, {ws_t} AS ws FROM trow2),
catseg AS (
    SELECT *, unnest(range(3 + ({_h("'ns'")}) % 4)) AS i FROM hdr WHERE branch = 'cat'
),
catseg2 AS (SELECT *, {wn_c} AS wn FROM catseg),
catseg3 AS (SELECT *, {ws_c} AS ws FROM catseg2),
fline AS (
    SELECT *, unnest(range(3 + ({_h("'nl'")}) % 5)) AS i FROM hdr WHERE branch = 'free'
),
fline2 AS (SELECT *, {wn_f} AS wn FROM fline),
fline3 AS (SELECT *, {ws_f} AS ws FROM fline2),
mseg AS (
    SELECT h.*, cc.c,
           unnest(range(2 + ({_h("'c'||c||'ns'")}) % 2)) AS i
    FROM hdr h, (SELECT unnest([1,3]) AS c) cc
    WHERE branch = 'multi' AND cc.c < nchunks
),
mseg2 AS (SELECT *, {wn_m} AS wn FROM mseg),
mseg3 AS (SELECT *, {ws_m} AS ws FROM mseg2),
corpus_spans AS (
    -- empty-branch single empty span
    SELECT doc_id_s AS doc_id, 'text' AS kind, '' AS text, '' AS media_ref, 0 AS "offset"
    FROM b2 WHERE branch = 'empty' AND ({_h("'ek'")}) % 2 = 1
    UNION ALL
    -- header lines 0-3
    SELECT doc_id_s, 'text', 'Certidão de Acervo Técnico Nº '||{_v('num')}||'/'||{_v('yr')}, '', 0 FROM hdr
    UNION ALL SELECT doc_id_s, 'text', council||'-'||estado, '', 1 FROM hdr
    UNION ALL SELECT doc_id_s, 'text', 'Objeto: '||objeto, '', 2 FROM hdr
    UNION ALL SELECT doc_id_s, 'text', 'Nível de Atividade: '||nivel, '', 3 FROM hdr
    UNION ALL
    -- table headers
    SELECT doc_id_s, 'table_header', {_TABLE_HEADER_LIT}, '', c*10000 + rowbase FROM tchunk2
    UNION ALL
    -- table cells
    SELECT doc_id_s, 'table_cell',
           prefix||{_v('i+1')}||{_TAB}||({win_t})||{_TAB}
           ||{_arr(_UNIDADES_COL)}[1 + ({_h("'c'||c||'r'||i||'u'")}) % {len(_UNIDADES_COL)}]
           ||{_TAB}||{_qty("'c'||c||'r'||i")},
           '', c*10000 + rowbase + 1 + i
    FROM trow3
    UNION ALL
    -- boilerplate junk rows
    SELECT doc_id_s, 'table_cell', {_TAB}||'Página 1/9'||{_TAB}||{_TAB}, '', rowbase + 1 + nrows
    FROM tchunk2 WHERE branch = 'boiler'
    UNION ALL
    SELECT doc_id_s, 'table_cell', {_TAB}||'Tel: + 55 (71) 3453-8000'||{_TAB}||{_TAB}, '', rowbase + 2 + nrows
    FROM tchunk2 WHERE branch = 'boiler'
    UNION ALL
    SELECT doc_id_s, 'table_cell', {_TAB}||'TOTAL GERAL'||{_TAB}||{_TAB}||{_qty("'tg'")}, '', rowbase + 3 + nrows
    FROM tchunk2 WHERE branch = 'boiler'
    UNION ALL
    -- media spans (before header at row 4, after cells)
    SELECT doc_id_s, 'page_image', '', media_base||'/p0', 4 FROM tchunk2 WHERE branch = 'media'
    UNION ALL
    SELECT doc_id_s, 'page_image', '', media_base||'/p1', rowbase + 1 + nrows
    FROM tchunk2 WHERE branch = 'media'
    UNION ALL
    -- CAT segment span (row 4)
    SELECT doc_id_s, 'text',
           'Atividade Técnica: '||string_agg(
               {_v('i+1')}||' - Execução de '||({win_c})||' m2 '||{_qty("'s'||i")},
               '; ' ORDER BY i),
           '', 4
    FROM catseg3 GROUP BY doc_id_s
    UNION ALL
    -- free-line marker + lines
    SELECT doc_id_s, 'text', 'PLANILHA DOS SERVIÇOS EXECUTADOS', '', 4 FROM hdr WHERE branch = 'free'
    UNION ALL
    SELECT doc_id_s, 'text',
           {_v('i+1')}||'.1 '||({win_f})||' '
           ||{_arr(_UNIDADES_COL)}[1 + ({_h("'l'||i||'u'")}) % {len(_UNIDADES_COL)}]
           ||' '||{_qty("'l'||i")},
           '', 5 + i
    FROM fline3
    UNION ALL
    -- multi-chunk CAT chunks (row 0 of chunks 1/3)
    SELECT doc_id_s, 'text',
           'Atividade Técnica: '||string_agg(
               {_v('i+1')}||' - Coordenação de '||({win_m})||' un '||{_qty("'c'||c||'s'||i")},
               '; ' ORDER BY i),
           '', c*10000
    FROM mseg3 GROUP BY doc_id_s, c
)"""


def corpus_query(select_sql: str, documents_rel: str = "documents") -> str:
    """Wrap a SELECT over ``corpus_spans`` with the generator CTEs."""
    return f"WITH {corpus_ctes(documents_rel)}\n{select_sql}"
