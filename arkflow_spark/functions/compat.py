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
    # remaining pure renames (docs/docs/sql/7-scalar_functions.md,
    # 5-aggregate_functions.md)
    "list_contains": "array_contains",
    "list_max": "array_max",
    "make_list": "array",
    "row": "struct",
    "string_to_list": "split",
    "datetrunc": "date_trunc",
    "covar": "covar_samp",
    "var": "var_samp",
    "var_population": "var_pop",
    "var_sample": "var_samp",
    # DataFusion array_remove_all removes EVERY occurrence — that is what
    # Spark's array_remove does (DataFusion's array_remove = first only,
    # handled as a structural rewrite below)
    "array_remove_all": "array_remove",
    "list_remove_all": "array_remove",
}

# DataFusion functions with no same-shape Spark builtin: each rewrites to a
# Spark expression over its parsed argument list ({0}, {1}, ... = top-level
# args). Applied before the token renames; nested rewritable calls are
# handled by iterating to fixpoint. Names per
# docs/docs/sql/7-scalar_functions.md (array/list sections, json section).
REWRITE_TEMPLATES: dict[str, tuple[int, str] | list[tuple[int, str]]] = {
    # ---- array/list predicates & accessors
    "empty": (1, "(size({0}) = 0)"),
    "array_empty": (1, "(size({0}) = 0)"),
    "list_empty": (1, "(size({0}) = 0)"),
    "array_any_value": (1, "try_element_at(array_compact({0}), 1)"),
    "list_any_value": (1, "try_element_at(array_compact({0}), 1)"),
    "array_has_all": (2, "(size(array_except({1}, {0})) = 0)"),
    "list_has_all": (2, "(size(array_except({1}, {0})) = 0)"),
    "array_has_any": (2, "arrays_overlap({0}, {1})"),
    "list_has_any": (2, "arrays_overlap({0}, {1})"),
    "array_pop_back": (1, "slice({0}, 1, greatest(size({0}) - 1, 0))"),
    "list_pop_back": (1, "slice({0}, 1, greatest(size({0}) - 1, 0))"),
    "array_pop_front": (
        1,
        "CASE WHEN size({0}) > 1 THEN slice({0}, 2, size({0}) - 1)"
        " ELSE slice({0}, 1, 0) END",
    ),
    "list_pop_front": (
        1,
        "CASE WHEN size({0}) > 1 THEN slice({0}, 2, size({0}) - 1)"
        " ELSE slice({0}, 1, 0) END",
    ),
    "array_positions": (
        2,
        "filter(transform({0}, (e, i) -> CASE WHEN e <=> {1} THEN i + 1"
        " END), p -> p IS NOT NULL)",
    ),
    "list_positions": (
        2,
        "filter(transform({0}, (e, i) -> CASE WHEN e <=> {1} THEN i + 1"
        " END), p -> p IS NOT NULL)",
    ),
    # first-occurrence remove/replace (the _all variants are renames above)
    "array_remove": (
        2,
        "CASE WHEN array_position({0}, {1}) > 0 THEN concat("
        "slice({0}, 1, array_position({0}, {1}) - 1), "
        "slice({0}, array_position({0}, {1}) + 1,"
        " size({0}) - array_position({0}, {1}))) ELSE {0} END",
    ),
    "list_remove": (
        2,
        "CASE WHEN array_position({0}, {1}) > 0 THEN concat("
        "slice({0}, 1, array_position({0}, {1}) - 1), "
        "slice({0}, array_position({0}, {1}) + 1,"
        " size({0}) - array_position({0}, {1}))) ELSE {0} END",
    ),
    # first-N-occurrence remove/replace (reference :3280 array_remove_n,
    # :3382 array_replace_n): occurrence index = matches in the prefix
    # (O(n^2) per array, exact; arrays here are row-local and small)
    "array_remove_n": (3, "transform(filter(transform({0}, (e, i) -> named_struct('e', e, 'occ', size(filter(slice({0}, 1, i + 1), x -> x <=> {1})))), s -> NOT (s.e <=> {1} AND s.occ <= {2})), s -> s.e)"),
    "list_remove_n": (3, "transform(filter(transform({0}, (e, i) -> named_struct('e', e, 'occ', size(filter(slice({0}, 1, i + 1), x -> x <=> {1})))), s -> NOT (s.e <=> {1} AND s.occ <= {2})), s -> s.e)"),
    "array_replace_n": (4, "transform({0}, (e, i) -> CASE WHEN e <=> {1} AND size(filter(slice({0}, 1, i + 1), x -> x <=> {1})) <= {3} THEN {2} ELSE e END)"),
    "list_replace_n": (4, "transform({0}, (e, i) -> CASE WHEN e <=> {1} AND size(filter(slice({0}, 1, i + 1), x -> x <=> {1})) <= {3} THEN {2} ELSE e END)"),
    "array_replace": (
        3,
        "transform({0}, (e, i) -> CASE WHEN i + 1 ="
        " array_position({0}, {1}) THEN {2} ELSE e END)",
    ),
    "list_replace": (
        3,
        "transform({0}, (e, i) -> CASE WHEN i + 1 ="
        " array_position({0}, {1}) THEN {2} ELSE e END)",
    ),
    "array_replace_all": (
        3,
        "transform({0}, e -> CASE WHEN e <=> {1} THEN {2} ELSE e END)",
    ),
    "list_replace_all": (
        3,
        "transform({0}, e -> CASE WHEN e <=> {1} THEN {2} ELSE e END)",
    ),
    "array_resize": (
        3,
        "concat(slice({0}, 1, least(size({0}), {1})),"
        " array_repeat({2}, greatest({1} - size({0}), 0)))",
    ),
    "list_resize": (
        3,
        "concat(slice({0}, 1, least(size({0}), {1})),"
        " array_repeat({2}, greatest({1} - size({0}), 0)))",
    ),
    "array_dims": (1, "array(size({0}))"),  # 1-D columns (Spark arrays)
    "list_dims": (1, "array(size({0}))"),
    "array_distance": (
        2,
        "sqrt(aggregate(zip_with({0}, {1}, (a, b) ->"
        " (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
        " * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v))",
    ),
    "list_distance": (
        2,
        "sqrt(aggregate(zip_with({0}, {1}, (a, b) ->"
        " (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
        " * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v))",
    ),
    # ---- struct / map access
    "get_field": (2, "{0}[{1}]"),
    "map_extract": (2, "array(try_element_at({0}, {1}))"),
    # ---- hashes
    "sha224": (1, "sha2({0}, 224)"),
    "sha256": (1, "sha2({0}, 256)"),
    "sha384": (1, "sha2({0}, 384)"),
    "sha512": (1, "sha2({0}, 512)"),
    # ---- misc scalars
    "iszero": (1, "({0} = 0)"),
    "to_timestamp_nanos": (
        1,
        "timestamp_micros(CAST({0} AS BIGINT) div 1000)",
    ),
    # ---- json_get family: key-based access (DataFusion json functions);
    # Spark's get_json_object takes a JSONPath, built from the key
    "json_get": (2, "get_json_object({0}, concat('$.', {1}))"),
    "json_get_json": (2, "get_json_object({0}, concat('$.', {1}))"),
    "json_get_int": (
        2,
        "CAST(get_json_object({0}, concat('$.', {1})) AS BIGINT)",
    ),
    "json_get_float": (
        2,
        "CAST(get_json_object({0}, concat('$.', {1})) AS DOUBLE)",
    ),
    "json_get_bool": (
        2,
        "CAST(get_json_object({0}, concat('$.', {1})) AS BOOLEAN)",
    ),
    "json_contains": (
        2,
        "(get_json_object({0}, concat('$.', {1})) IS NOT NULL)",
    ),
    # ---- date_bin: Spark 4 has no builtin; exact integer-microsecond
    # arithmetic with FLOOR semantics (pmod keeps pre-origin timestamps on
    # the correct bin, matching DataFusion/DuckDB time_bucket and the
    # Python helper arkflow_spark.functions.date_bin). Stride micros are
    # derived by adding the INTERVAL literal to the epoch.
    "date_bin": [
        (
            2,
            "timestamp_micros(unix_micros(CAST({1} AS TIMESTAMP))"
            " - pmod(unix_micros(CAST({1} AS TIMESTAMP)),"
            " unix_micros(CAST('1970-01-01 00:00:00' AS TIMESTAMP)"
            " + {0})))",
        ),
        (
            3,
            "timestamp_micros(unix_micros(CAST({1} AS TIMESTAMP))"
            " - pmod(unix_micros(CAST({1} AS TIMESTAMP))"
            " - unix_micros(CAST({2} AS TIMESTAMP)),"
            " unix_micros(CAST('1970-01-01 00:00:00' AS TIMESTAMP)"
            " + {0})))",
        ),
    ],
}

# Documented NOT mapped (no faithful Spark expression):
#   array_remove_n / array_replace_n / list_*_n — positional n-th variants
#     (compose the first-occurrence rewrite n times, or use a pandas UDF);
#   union_extract — Spark has no union type;
#   approx_percentile_cont_with_weight — use the exact cumulative-weight
#     construction in queries/stats.py (agg_weighted_percentile);
#   gcd / lcm — no Spark builtin: vectorized pandas UDFs are provided by
#     arkflow_spark.queries.udf_q (udf_gcd_lcm) — register with
#     spark.udf.register for SQL use.

_REWRITE_RE = re.compile(
    r"\b(" + "|".join(sorted(REWRITE_TEMPLATES, key=len, reverse=True)) + r")\s*\("
)


def _split_args(s: str, start: int) -> tuple[list[str], int] | None:
    """Parse a balanced argument list beginning at ``s[start] == '('``;
    return (top-level args, index past the closing paren), or None if the
    parens never balance (malformed input is left untouched)."""
    depth = 0
    args: list[str] = []
    buf: list[str] = []
    i = start
    while i < len(s):
        c = s[i]
        if c in "([":
            depth += 1
            if depth > 1:
                buf.append(c)
        elif c in ")]":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                return args, i + 1
            buf.append(c)
        elif c == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    return None


def _rewrite_calls(body: str) -> str:
    """Expand every REWRITE_TEMPLATES call (innermost-last via fixpoint
    iteration; arguments keep their stashed-literal placeholders)."""
    for _ in range(32):  # fixpoint bound: templates don't self-reference
        m = _REWRITE_RE.search(body)
        if m is None:
            return body
        name = m.group(1).lower()
        parsed = _split_args(body, m.end() - 1)
        if parsed is None:
            return body
        args, end = parsed
        spec = REWRITE_TEMPLATES[name]
        forms = spec if isinstance(spec, list) else [spec]
        by_arity = {n: t for n, t in forms}
        if len(args) not in by_arity:
            raise ValueError(
                f"{name} expects {sorted(by_arity)} argument(s),"
                f" got {len(args)}"
            )
        template = by_arity[len(args)]
        body = body[: m.start()] + template.format(*args) + body[end:]
    return body

_FN_RE = re.compile(
    r"\b(" + "|".join(sorted(FUNCTION_ALIASES, key=len, reverse=True)) + r")\s*\("
)
_STRING_RE = re.compile(r"'(?:[^']|'')*'")


_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_QUALIFY_END_RE = re.compile(r"\b(ORDER\s+BY|LIMIT|OFFSET)\b", re.IGNORECASE)
_SELECT_RE = re.compile(r"\bSELECT\b", re.IGNORECASE)
_FROM_RE = re.compile(r"\bFROM\b", re.IGNORECASE)


def _depth0_find(body: str, rx: re.Pattern, start: int = 0) -> re.Match | None:
    """First rx match at paren depth 0 from ``start``."""
    depth = 0
    i = start
    while i < len(body):
        c = body[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = rx.match(body, i)
            if m:
                return m
        i += 1
    return None


def _rewrite_qualify(body: str) -> str:
    """Expand a top-level QUALIFY clause (DuckDB/Snowflake/BigQuery; the
    post-window filter Spark does not parse) into a subquery + WHERE.

    Predicates with inline window functions are lifted into the inner
    select list as a ``__qualify`` boolean (windows cannot appear in an
    outer WHERE) and dropped again via ``SELECT * EXCEPT``; plain
    predicates over select aliases filter the wrapped subquery directly.
    Applies to the statement's outermost select (CTE prefixes are wrapped
    whole — Spark allows WITH inside a subquery)."""
    q = _depth0_find(body, _QUALIFY_RE)
    if q is None:
        return body
    end_m = _depth0_find(body, _QUALIFY_END_RE, q.end())
    clause_end = end_m.start() if end_m else len(body)
    pre = body[: q.start()].rstrip()
    pred = body[q.end():clause_end].strip()
    tail = " " + body[clause_end:].lstrip() if end_m else ""
    if re.search(r"\bOVER\b", pred, re.IGNORECASE):
        sel = _depth0_find(pre, _SELECT_RE)  # outermost SELECT (skips CTEs)
        frm = _depth0_find(pre, _FROM_RE, sel.end()) if sel else None
        if frm is None:  # malformed; leave for Spark to report
            return body
        inner = (
            pre[: frm.start()].rstrip()
            + f", ({pred}) AS __qualify "
            + pre[frm.start():]
        )
        return (
            f"SELECT * EXCEPT (__qualify) FROM ({inner}) WHERE __qualify"
            + tail
        )
    return f"SELECT * FROM ({pre}) WHERE {pred}" + tail


_DISTINCT_ON_RE = re.compile(r"\bSELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_LIMIT_OFFSET_RE = re.compile(r"\b(LIMIT|OFFSET)\b", re.IGNORECASE)


def _rewrite_distinct_on(body: str) -> str:
    """Expand Postgres/DuckDB ``SELECT DISTINCT ON (keys) ...`` (one
    surviving row per key combination, chosen by the ORDER BY) into the
    exact Spark equivalent: a ``row_number`` window partitioned on the
    keys, filtered to 1. Plans as one shuffle on the keys — identical to
    what Postgres does with a unique-on-sorted pass, and the same shape
    Spark would use for a native deduplicating top-1.

    Contract (documented in docs/MIGRATION.md): the ORDER BY must
    reference input columns (not select aliases), and — as in Postgres —
    its leftmost expressions should be the DISTINCT ON keys; without an
    ORDER BY the surviving row per key is arbitrary (as in Postgres). The
    ORDER BY is consumed by the row_number window; it is re-attached to
    the rewritten outer query only when a LIMIT/OFFSET makes output order
    semantic (in which case its columns must appear in the projection) —
    otherwise output order is unspecified, as for any distributed
    query."""
    m = _depth0_find(body, _DISTINCT_ON_RE)
    if m is None:
        return body
    i, depth = m.end(), 1
    while i < len(body) and depth:
        if body[i] == "(":
            depth += 1
        elif body[i] == ")":
            depth -= 1
        i += 1
    keys = body[m.end() : i - 1].strip()
    rest = body[i:]
    frm = _depth0_find(rest, _FROM_RE)
    if frm is None:  # malformed; leave for Spark to report
        return body
    projection = rest[: frm.start()].strip()
    after = rest[frm.start() :]
    ob = _depth0_find(after, _ORDER_BY_RE)
    if ob is not None:
        lim = _depth0_find(after, _LIMIT_OFFSET_RE, ob.end())
        order_list = after[ob.end() : lim.start() if lim else len(after)]
        order_list = order_list.strip()
        from_part = after[: ob.start()].rstrip()
        tail = " " + after[lim.start() :].lstrip() if lim else ""
        outer_order = f" ORDER BY {order_list}" if lim else ""
    else:
        lim = _depth0_find(after, _LIMIT_OFFSET_RE)
        order_list = keys
        from_part = after[: lim.start()].rstrip() if lim else after
        tail = " " + after[lim.start() :].lstrip() if lim else ""
        outer_order = ""
    pre = body[: m.start()]
    inner = (
        f"SELECT {projection}, row_number() OVER (PARTITION BY {keys} "
        f"ORDER BY {order_list}) AS __don_rn {from_part}"
    )
    return (
        pre
        + f"SELECT * EXCEPT (__don_rn) FROM ({inner}) WHERE __don_rn = 1"
        + outer_order
        + tail
    )


# Postgres-style operators the reference documents (docs/docs/sql/
# 1-operators.md: regex/LIKE matches, bitwise XOR `#`, array containment
# `@>`/`<@`) that Spark's parser rejects. Operands are matched as single
# tokens: function call (one paren level), qualified identifier, stashed
# string literal, parenthesized group, or number — the shapes the
# reference's own examples use; anything more exotic should be wrapped in
# parentheses by the caller.
_OPERAND = (
    r"(?:[A-Za-z_][\w.]*\s*\([^()]*\)|[A-Za-z_][\w.]*"
    r"|\x00L\d+\x00|\([^()]*\)|[0-9][\w.]*)"
)
_PGOP_RE = re.compile(
    rf"({_OPERAND})\s*(!~~\*|!~~|~~\*|~~|!~\*|!~|~\*|~|@>|<@|#)\s*({_OPERAND})"
)


def _rewrite_pg_operators(body: str) -> str:
    def sub(m: re.Match) -> str:
        left, op, right = m.group(1), m.group(2), m.group(3)
        return {
            "~": f"{left} RLIKE {right}",
            "!~": f"{left} NOT RLIKE {right}",
            "~*": f"{left} RLIKE concat('(?i)', {right})",
            "!~*": f"{left} NOT RLIKE concat('(?i)', {right})",
            "~~": f"{left} LIKE {right}",
            "!~~": f"{left} NOT LIKE {right}",
            "~~*": f"{left} ILIKE {right}",
            "!~~*": f"{left} NOT ILIKE {right}",
            "#": f"{left} ^ {right}",
            "@>": f"forall({right}, __x -> array_contains({left}, __x))",
            "<@": f"forall({left}, __x -> array_contains({right}, __x))",
        }[op]

    prev = None
    while prev != body:  # fixpoint: `a ~ b AND c ~ d` chains
        prev = body
        body = _PGOP_RE.sub(sub, body)
    return body


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
    body = _rewrite_qualify(body)
    body = _rewrite_distinct_on(body)
    body = _rewrite_pg_operators(body)
    body = _rewrite_calls(body)
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
