"""DataFusion -> Spark SQL dialect compatibility.

The reference's SQL surface is DataFusion's (SURVEY.md §2.7). Catalyst
covers it semantically, but some function names differ; queries written for
the reference are rewritten token-wise before execution. Only bare function
names are translated (word boundary + following '('), string literals are
left untouched.
"""

from __future__ import annotations

import re

# DataFusion name -> Spark name (docs/docs/sql/5-aggregate_functions.md and
# 7-scalar_functions.md vs Spark builtins)
FUNCTION_ALIASES: dict[str, str] = {
    "approx_distinct": "approx_count_distinct",
    "approx_median": "median",
    "approx_percentile_cont": "percentile_approx",
    "arrow_typeof": "typeof",
    "arrow_cast": "cast",
    "array_cat": "concat",
    "array_concat": "concat",
    "array_indexof": "array_position",
    "array_length": "size",
    "array_ndims": "size",
    "array_push_back": "array_append",
    "array_push_front": "array_prepend",
    "array_has": "array_contains",
    "array_element": "element_at",
    "array_extract": "element_at",
    "array_to_string": "array_join",
    "array_join": "array_join",
    "list_extract": "element_at",
    "list_element": "element_at",
    "list_append": "array_append",
    "list_cat": "concat",
    "list_concat": "concat",
    "list_distinct": "array_distinct",
    "list_sort": "array_sort",
    "cardinality": "size",
    "character_length": "length",
    "char_length": "length",
    "ends_with": "endswith",
    "starts_with": "startswith",
    "instr": "instr",
    "strpos": "instr",
    "to_hex": "hex",
    "from_unixtime": "from_unixtime",
    "to_unixtime": "unix_timestamp",
    "now": "current_timestamp",
    "today": "current_date",
    "date_bin": "date_bin",
    "to_local_time": "from_utc_timestamp",
    "ifnull": "nvl",
    "iszero": "iszero",  # expanded below
    "json_get_str": "get_json_object",
    "json_as_text": "get_json_object",
    "json_length": "json_array_length",
    "mean": "avg",
    "median": "median",
    "nanvl": "nanvl",
    "regexp_like": "rlike",
    "regexp_match": "regexp_extract_all",
    "substr_index": "substring_index",
    "uuid": "uuid",
    "make_array": "array",
    "range": "sequence",
    "generate_series": "sequence",
    "string_to_array": "split",
    "bit_count": "bit_count",
    "digest": "sha2",
    # remaining list_* aliases (docs/docs/sql/7-scalar_functions.md:2510+
    # documents list_* as synonyms of array_*)
    "list_has": "array_contains",
    "list_indexof": "array_position",
    "list_position": "array_position",
    "list_to_string": "array_join",
    "list_join": "array_join",
    "list_push_back": "array_append",
    "list_push_front": "array_prepend",
    "list_prepend": "array_prepend",
    "list_length": "size",
    "list_ndims": "size",
    "list_repeat": "array_repeat",
    "list_slice": "slice",
    "array_slice": "slice",
    "list_union": "array_union",
    "list_intersect": "array_intersect",
    "list_except": "array_except",
    "list_reverse": "reverse",
    "array_reverse": "reverse",
    "array_position": "array_position",
    "array_union": "array_union",
    # temporal epoch constructors
    "to_timestamp_seconds": "timestamp_seconds",
    "to_timestamp_millis": "timestamp_millis",
    "to_timestamp_micros": "timestamp_micros",
    # misc scalars
    "random": "rand",
    "octet_length": "octet_length",
    "levenshtein": "levenshtein",
    "find_in_set": "find_in_set",
    "overlay": "overlay",
    "translate": "translate",
}

_FN_RE = re.compile(
    r"\b(" + "|".join(sorted(FUNCTION_ALIASES, key=len, reverse=True)) + r")\s*\("
)
_STRING_RE = re.compile(r"'(?:[^']|'')*'")


def translate_sql(sql: str) -> str:
    """Rewrite DataFusion function names to Spark equivalents, preserving
    string literals."""
    literals: list[str] = []

    def stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00L{len(literals) - 1}\x00"

    def rename(m: re.Match) -> str:
        return FUNCTION_ALIASES[m.group(1).lower()] + "("

    body = _STRING_RE.sub(stash, sql)
    body = _FN_RE.sub(rename, body)
    for i, lit in enumerate(literals):
        body = body.replace(f"\x00L{i}\x00", lit)
    return body


_FORBIDDEN_RE = re.compile(
    r"^\s*(INSERT|UPDATE|DELETE|CREATE|DROP|ALTER|TRUNCATE|MERGE|GRANT|REVOKE|"
    r"SET|COPY|CALL|USE|ANALYZE|VACUUM|REFRESH|MSCK|EXPLAIN)\b",
    re.IGNORECASE,
)


def assert_query_only(sql: str) -> None:
    """Reject DDL/DML — the reference's sql processor is statement-only
    (processor/sql.rs:189-198 SQLOptions with ddl/dml forbidden)."""
    if _FORBIDDEN_RE.match(sql.strip()):
        raise ValueError(
            "only SELECT/WITH/VALUES statements are allowed in the sql"
            f" processor (got: {sql.strip().split()[0]})"
        )


# --------------------------------------------------------------- VRL surface

#: VRL builtin -> Spark SQL recipe (the reference's vrl processor,
#: crates/arkflow-plugin/src/processor/vrl.rs:26,60-106, is a per-row
#: parse/enrich/reshape DSL; each row below is the equivalent Spark
#: expression for a `remap` processor `fields:` entry). Templates use
#: `{x}` for the input expression; fallible VRL calls (`fn!`) abort the
#: event on failure — the Spark analog raises (failing the batch into
#: error_output/DLQ routing) or, for route-style programs, uses the remap
#: processor's `where:` to drop/divert rows.
#:
#: Non-expression VRL idioms map to remap conf, not expressions:
#:   del(.f)            -> drop: [f]
#:   abort / route      -> where: <keep condition>  (dropped rows = aborted)
#:   . = parse_json!(.) -> json_to_arrow processor (whole-event reshape)
VRL_TO_SPARK: dict[str, str] = {
    # permissive parse yields null-filled structs on bad input; the
    # fallible variant uses FAILFAST so malformed input raises (aborting
    # the batch into DLQ routing) exactly like VRL's `!`.
    "parse_json": "from_json({x}, '{schema}')",
    "parse_json!": "from_json({x}, '{schema}', map('mode', 'FAILFAST'))",
    "parse_timestamp": "try_to_timestamp({x}, '{fmt}')",
    "parse_timestamp!": (
        "CASE WHEN try_to_timestamp({x}, '{fmt}') IS NULL"
        " THEN raise_error('parse_timestamp failed') "
        "ELSE try_to_timestamp({x}, '{fmt}') END"
    ),
    "parse_syslog!": "__see syslog_expr()__",
    "to_int": "try_cast({x} AS BIGINT)",
    "to_int!": (
        "CASE WHEN try_cast({x} AS BIGINT) IS NULL"
        " THEN raise_error('to_int failed') "
        "ELSE try_cast({x} AS BIGINT) END"
    ),
    "to_float": "try_cast({x} AS DOUBLE)",
    "to_float!": (
        "CASE WHEN try_cast({x} AS DOUBLE) IS NULL"
        " THEN raise_error('to_float failed') "
        "ELSE try_cast({x} AS DOUBLE) END"
    ),
    "to_string": "cast({x} AS STRING)",
    "upcase": "upper({x})",
    "downcase": "lower({x})",
    "strip_whitespace": "trim({x})",
    "now": "current_timestamp()",
    "to_unix_timestamp": "unix_timestamp({x})",
    "format_timestamp!": "date_format({x}, '{fmt}')",
    "md5": "md5({x})",
    "sha2": "sha2({x}, 256)",
    "replace": "replace({x}, '{pat}', '{sub}')",
    "split": "split({x}, '{pat}')",
    "join!": "array_join({x}, '{sep}')",
    "length": "length({x})",
    "contains": "contains({x}, '{substr}')",
    "starts_with": "startswith({x}, '{prefix}')",
    "slice!": "substring({x}, {start}, {len})",
    "merge": "to_json(map_concat(from_json({x}, 'map<string,string>'),"
             " from_json({y}, 'map<string,string>')))",
    "exists": "{x} IS NOT NULL",
    "is_nullish": "({x} IS NULL OR trim({x}) = '')",
}


def vrl_sql(builtin: str, **kw: str) -> str:
    """Format a :data:`VRL_TO_SPARK` recipe with its placeholders —
    ``vrl_sql('to_int!', x='port')`` -> the guarded cast expression."""
    template = VRL_TO_SPARK[builtin]
    if template.startswith("__"):
        raise ValueError(f"{builtin} maps to a helper, see VRL_TO_SPARK docs")
    return template.format(**kw)


# RFC-3164 syslog line anatomy, one capture group per field.
_SYSLOG_RE = (
    r"^<(\d+)>([A-Z][a-z]{2}\s+\d+ \d\d:\d\d:\d\d) (\S+) ([^:\[]+)"
    r"(?:\[(\d+)\])?: (.*)$"
)


def syslog_expr(x: str) -> str:
    """VRL ``parse_syslog!({x})`` analog: RFC-3164 line -> named struct
    (facility/severity from PRI, timestamp, hostname, appname, procid,
    message). Pure regexp_extract — stays in whole-stage codegen."""

    def g(i: int) -> str:
        # Spark SQL string literals process backslash escapes; double them
        # so the regex reaches regexp_extract intact.
        pat = _SYSLOG_RE.replace("\\", "\\\\")
        return f"regexp_extract({x}, '{pat}', {i})"

    pri = g(1)
    return (
        f"CASE WHEN {pri} = '' THEN raise_error('parse_syslog failed') "
        f"ELSE named_struct("
        f"'facility', CAST({pri} AS INT) DIV 8, "
        f"'severity', CAST({pri} AS INT) % 8, "
        f"'timestamp', {g(2)}, "
        f"'hostname', {g(3)}, "
        f"'appname', trim({g(4)}), "
        f"'procid', try_cast({g(5)} AS INT), "
        f"'message', {g(6)}) END"
    )
