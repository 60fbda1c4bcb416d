"""VRL (Vector Remap Language) mini-interpreter -> Spark SQL lowering.

The reference executes arbitrary VRL programs row-by-row
(crates/arkflow-plugin/src/processor/vrl.rs:26,60-106: compile the
program once, resolve per event, surface runtime errors instead of
dropping the batch). This module parses the assignment / ``del`` /
``if``/``else`` / ``abort`` / fallible-call subset that covers the
reference's examples and docs and lowers every statement onto the
:data:`arkflow_spark.functions.compat.VRL_TO_SPARK` builtin table —
so a reference YAML with a short VRL program runs unmodified, and the
whole program executes as JVM-side column expressions in whole-stage
codegen instead of a per-row interpreter.

Semantics preserved from the reference processor:

- compile errors are rejected at build time (vrl.rs test
  ``test_compile_error_rejected``);
- a program whose result is a bare scalar (``1 + 1``) is rejected —
  a scalar cannot form a row (``test_scalar_result_returns_err``);
- fallible calls (``fn!``) abort the event on failure: the lowered
  expression raises, which the engine routes to the DLQ
  (``test_runtime_error_returns_err``);
- the identity program ``.`` round-trips every column unchanged,
  including binary and timestamp columns
  (``test_string_roundtrip_stays_utf8`` / ``test_binary_stays_binary``
  / ``test_timestamp_second_not_dropped``);
- an invalid ``timezone`` falls back to the default with a warning
  (``test_invalid_timezone_falls_back``).

``target, err = expr`` lowers the expression to its infallible
(NULL-on-error) variant and materializes ``err`` as a per-row error
MESSAGE ('function call error for "fn": ...', non-NULL exactly when the
call failed) — mirroring the reference's surfaced VRL errors
(vrl.rs:60-106) — captured BEFORE the target write so
``.v, err = to_int!(.v)`` reports on the original value. ``del`` inside
a conditional NULLs the field for matching rows (columns are statically
typed and cannot be conditionally dropped).

Documented deviations (MIGRATION.md): ``abort`` drops the row (the
engine's route analog); ``parse_json`` needs a schema (second argument
or the processor's ``schemas:`` hint) because Spark columns are
statically typed.
"""

from __future__ import annotations

import re
import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arkflow_spark.batch import meta_columns
from arkflow_spark.functions.compat import VRL_TO_SPARK, syslog_expr
from arkflow_spark.registry import PROCESSORS


class VrlCompileError(ValueError):
    """Raised at build time for programs outside the supported subset —
    the reference rejects uncompilable statements at build time too."""


# ----------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>\#[^\n]*)
  | (?P<newline>\n)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|&&|\|\||\?\?|[=<>+\-*/!.,(){};])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise VrlCompileError(
                f"vrl: cannot tokenize at {src[pos:pos+20]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "newline":
            if toks and toks[-1] != ("sep", ";"):
                toks.append(("sep", ";"))
            continue
        if kind == "op" and m.group() == ";":
            if toks and toks[-1] == ("sep", ";"):
                continue
            toks.append(("sep", ";"))
            continue
        toks.append((kind, m.group()))
    return toks


# ------------------------------------------------------------------- AST


@dataclass
class Lit:
    value: str  # SQL-rendered literal
    raw: str | None = None  # unquoted python string for string literals


@dataclass
class Path:
    parts: tuple[str, ...]  # () = whole event (".")


@dataclass
class Local:
    name: str


@dataclass
class Call:
    name: str
    fallible: bool
    args: list


@dataclass
class Bin:
    op: str
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class ErrCoalesce:  # a ?? b
    left: object
    right: object


@dataclass
class Assign:
    target: Path  # () parts = root reshape
    expr: object
    err_local: str | None = None


@dataclass
class LocalAssign:
    name: str
    expr: object
    err_local: str | None = None


@dataclass
class Del:
    fld: str


@dataclass
class If:
    cond: object
    then: list = field(default_factory=list)
    other: list = field(default_factory=list)


class Abort:
    pass


class Identity:
    pass


# ---------------------------------------------------------------- parser


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def _peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val: str):
        t = self._next()
        if t[1] != val:
            raise VrlCompileError(f"vrl: expected {val!r}, got {t[1]!r}")
        return t

    def _skip_seps(self):
        while self._peek() == ("sep", ";"):
            self.i += 1

    def parse_program(self) -> list:
        stmts = []
        self._skip_seps()
        while self._peek()[0] != "eof":
            stmts.append(self.parse_stmt())
            self._skip_seps()
        return stmts

    def parse_stmt(self):
        kind, val = self._peek()
        if val == "del":
            self._next()
            self._expect("(")
            p = self.parse_path()
            if len(p.parts) != 1:
                raise VrlCompileError("vrl: del() supports top-level fields")
            self._expect(")")
            return Del(p.parts[0])
        if val == "if":
            return self.parse_if()
        if val == "abort":
            self._next()
            return Abort()
        if val == ".":
            # either the identity program "." or a field assignment
            nxt = self._peek(1)
            if nxt[0] == "name":
                p = self.parse_path()
                return self._finish_assign(p)
            self._next()
            if self._peek()[1] == "=":
                self._next()
                return Assign(Path(()), self.parse_expr())
            return Identity()
        if kind == "name" and self._peek(1)[1] in ("=", ","):
            name = self._next()[1]
            return self._finish_assign(name)
        # anything else is an expression statement: only "." is a row
        expr = self.parse_expr()
        raise VrlCompileError(
            f"vrl: a bare {type(expr).__name__} expression result cannot"
            " form a row (assign it to a field: .x = ...)"
        )

    def _finish_assign(self, target):
        err_local = None
        if self._peek()[1] == ",":
            self._next()
            t = self._next()
            if t[0] != "name":
                raise VrlCompileError("vrl: expected error-capture name")
            err_local = t[1]
        self._expect("=")
        expr = self.parse_expr()
        if isinstance(target, Path):
            return Assign(target, expr, err_local)
        return LocalAssign(target, expr, err_local)

    def parse_if(self) -> If:
        self._expect("if")
        cond = self.parse_expr()
        then = self.parse_block()
        other: list = []
        if self._peek()[1] == "else":
            self._next()
            if self._peek()[1] == "if":
                other = [self.parse_if()]
            else:
                other = self.parse_block()
        return If(cond, then, other)

    def parse_block(self) -> list:
        self._expect("{")
        stmts = []
        self._skip_seps()
        while self._peek()[1] != "}":
            if self._peek()[0] == "eof":
                raise VrlCompileError("vrl: unterminated block")
            stmts.append(self.parse_stmt())
            self._skip_seps()
        self._expect("}")
        return stmts

    def parse_path(self) -> Path:
        self._expect(".")
        parts = []
        t = self._next()
        if t[0] != "name":
            raise VrlCompileError(f"vrl: expected field name, got {t[1]!r}")
        parts.append(t[1])
        while self._peek()[1] == "." and self._peek(1)[0] == "name":
            self._next()
            parts.append(self._next()[1])
        return Path(tuple(parts))

    # expression precedence: ?? < || < && < cmp < add < mul < unary
    def parse_expr(self):
        left = self.parse_or()
        while self._peek()[1] == "??":
            self._next()
            left = ErrCoalesce(left, self.parse_or())
        return left

    def parse_or(self):
        left = self.parse_and()
        while self._peek()[1] == "||":
            self._next()
            left = Bin("OR", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self._peek()[1] == "&&":
            self._next()
            left = Bin("AND", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_add()
        if self._peek()[1] in ("==", "!=", "<", ">", "<=", ">="):
            op = self._next()[1]
            op = {"==": "=", "!=": "!="}.get(op, op)
            return Bin(op, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self._peek()[1] in ("+", "-"):
            op = self._next()[1]
            left = Bin(op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self._peek()[1] in ("*", "/"):
            op = self._next()[1]
            left = Bin(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self._peek()[1] == "!":
            self._next()
            return Not(self.parse_unary())
        if self._peek()[1] == "-":
            self._next()
            inner = self.parse_unary()
            return Bin("-", Lit("0"), inner)
        return self.parse_primary()

    def parse_primary(self):
        kind, val = self._peek()
        if val == "(":
            self._next()
            e = self.parse_expr()
            self._expect(")")
            return e
        if val == ".":
            return self.parse_path()
        if kind == "string":
            self._next()
            raw = val[1:-1]
            raw = re.sub(r"\\(.)", r"\1", raw)
            return Lit("'" + raw.replace("'", "''") + "'", raw=raw)
        if kind == "number":
            self._next()
            return Lit(val)
        if kind == "name":
            if val == "true":
                self._next()
                return Lit("TRUE")
            if val == "false":
                self._next()
                return Lit("FALSE")
            if val == "null":
                self._next()
                return Lit("NULL")
            # function call or local reference
            if self._peek(1)[1] == "(" or (
                self._peek(1)[1] == "!" and self._peek(2)[1] == "("
            ):
                name = self._next()[1]
                fallible = False
                if self._peek()[1] == "!":
                    self._next()
                    fallible = True
                self._expect("(")
                args = []
                if self._peek()[1] != ")":
                    args.append(self.parse_expr())
                    while self._peek()[1] == ",":
                        self._next()
                        args.append(self.parse_expr())
                self._expect(")")
                return Call(name, fallible, args)
            self._next()
            return Local(val)
        raise VrlCompileError(f"vrl: unexpected token {val!r}")


# -------------------------------------------------------------- lowering

# positional argument names per VRL builtin; names other than x/y bind
# template placeholders that require *literal* arguments.
_ARG_SPEC: dict[str, tuple[str, ...]] = {
    "parse_json": ("x", "schema"),
    "parse_timestamp": ("x", "fmt"),
    "parse_syslog": ("x",),
    "format_timestamp": ("x", "fmt"),
    "to_int": ("x",),
    "to_float": ("x",),
    "to_string": ("x",),
    "to_bool": ("x",),
    "upcase": ("x",),
    "downcase": ("x",),
    "strip_whitespace": ("x",),
    "now": (),
    "to_unix_timestamp": ("x",),
    "md5": ("x",),
    "sha1": ("x",),
    "sha2": ("x",),
    "replace": ("x", "pat", "sub"),
    "split": ("x", "pat"),
    "join": ("x", "sep"),
    "length": ("x",),
    "contains": ("x", "substr"),
    "starts_with": ("x", "prefix"),
    "ends_with": ("x", "suffix"),
    "slice": ("x", "start", "len"),
    "merge": ("x", "y"),
    "exists": ("x",),
    "is_nullish": ("x",),
    "string": ("x",),
    "int": ("x",),
    "float": ("x",),
    "bool": ("x",),
    "round": ("x",),
    "floor": ("x",),
    "ceil": ("x",),
    "abs": ("x",),
    "truncate": ("x", "len"),
}

_EXPR_PLACEHOLDERS = {"x", "y"}
_NUMERIC_PLACEHOLDERS = {"start", "len"}


def _quote(col: str) -> str:
    return "`" + col.replace("`", "``") + "`"


class _Lowerer:
    """AST -> Spark SQL strings, resolving VRL builtins through
    VRL_TO_SPARK and locals through textual substitution."""

    def __init__(self, schemas: dict[str, str]):
        self.schemas = dict(schemas or {})
        self.locals: dict[str, str] = {}

    def sql(self, node) -> str:
        if isinstance(node, Lit):
            return node.value
        if isinstance(node, Path):
            if not node.parts:
                raise VrlCompileError(
                    "vrl: whole-event '.' is only valid alone or as"
                    " '. = parse_json!(...)'"
                )
            return ".".join(_quote(p) for p in node.parts)
        if isinstance(node, Local):
            if node.name not in self.locals:
                raise VrlCompileError(
                    f"vrl: undefined variable {node.name!r}"
                )
            return self.locals[node.name]
        if isinstance(node, Not):
            return f"(NOT {self.sql(node.expr)})"
        if isinstance(node, Bin):
            # VRL null comparisons are membership tests, not SQL
            # three-valued logic: `x == null` / `x != null` must lower
            # to IS [NOT] NULL (bare `x != NULL` is never TRUE in SQL)
            if node.op in ("==", "!="):
                for a, b in ((node.left, node.right),
                             (node.right, node.left)):
                    if isinstance(b, Lit) and b.value == "NULL":
                        neg = " NOT" if node.op == "!=" else ""
                        return f"({self.sql(a)} IS{neg} NULL)"
            l, r = self.sql(node.left), self.sql(node.right)
            if node.op == "+" and (
                self._is_string(node.left) or self._is_string(node.right)
            ):
                return f"concat({l}, {r})"
            return f"({l} {node.op} {r})"
        if isinstance(node, ErrCoalesce):
            left = node.left
            if isinstance(left, Call) and left.fallible:
                left = Call(left.name, False, left.args)
            return f"coalesce({self.sql(left)}, {self.sql(node.right)})"
        if isinstance(node, Call):
            return self.call_sql(node)
        raise VrlCompileError(f"vrl: cannot lower {node!r}")

    def _is_string(self, node) -> bool:
        return isinstance(node, Lit) and node.raw is not None

    def call_sql(self, node: Call) -> str:
        name = node.name
        if name not in _ARG_SPEC:
            raise VrlCompileError(
                f"vrl: unsupported builtin {name!r} (supported:"
                f" {sorted(_ARG_SPEC)})"
            )
        if name == "parse_syslog":
            if not node.fallible:
                raise VrlCompileError("vrl: use parse_syslog!(...)")
            return syslog_expr(self.sql(node.args[0]))
        spec = _ARG_SPEC[name]
        # schema may come from the processor's schemas: hint
        args = list(node.args)
        if name == "parse_json" and len(args) == 1:
            src = args[0]
            key = ".".join(src.parts) if isinstance(src, Path) else None
            if key is None or key not in self.schemas:
                raise VrlCompileError(
                    "vrl: parse_json needs a schema — pass it as a second"
                    " argument (parse_json!(.msg, 'a INT, b STRING')) or"
                    f" add a schemas: hint for {key or 'the input'!r}"
                )
            args.append(Lit(None, raw=self.schemas[key]))
        if len(args) != len(spec):
            raise VrlCompileError(
                f"vrl: {name} takes {len(spec)} argument(s), got {len(args)}"
            )
        key = name + ("!" if node.fallible else "")
        template = VRL_TO_SPARK.get(key) or VRL_TO_SPARK.get(
            name + ("" if node.fallible else "!")
        )
        if template is None:
            template = self._extra_template(name, node.fallible)
        kw: dict[str, str] = {}
        for ph, arg in zip(spec, args):
            if ph in _EXPR_PLACEHOLDERS:
                kw[ph] = self.sql(arg)
            elif ph in _NUMERIC_PLACEHOLDERS:
                if not isinstance(arg, Lit) or arg.raw is not None:
                    raise VrlCompileError(
                        f"vrl: {name} argument {ph} must be a number"
                    )
                kw[ph] = arg.value
            else:  # string literal placeholder, embedded in quotes
                if not isinstance(arg, Lit) or arg.raw is None:
                    raise VrlCompileError(
                        f"vrl: {name} argument {ph} must be a string literal"
                    )
                kw[ph] = arg.raw.replace("'", "''")
        return template.format(**kw)

    @staticmethod
    def _extra_template(name: str, fallible: bool) -> str:
        """VRL stdlib builtins that need no migration-table entry — they
        are direct Spark builtins or simple casts."""
        extras = {
            "string": "cast({x} AS STRING)",
            "int": (
                "CASE WHEN try_cast({x} AS BIGINT) IS NULL"
                " THEN raise_error('int! failed')"
                " ELSE try_cast({x} AS BIGINT) END"
                if fallible
                else "try_cast({x} AS BIGINT)"
            ),
            "float": (
                "CASE WHEN try_cast({x} AS DOUBLE) IS NULL"
                " THEN raise_error('float! failed')"
                " ELSE try_cast({x} AS DOUBLE) END"
                if fallible
                else "try_cast({x} AS DOUBLE)"
            ),
            "bool": "cast({x} AS BOOLEAN)",
            "to_bool": "try_cast({x} AS BOOLEAN)",
            "round": "round({x})",
            "floor": "floor({x})",
            "ceil": "ceil({x})",
            "abs": "abs({x})",
            "sha1": "sha1({x})",
            "truncate": "substring({x}, 1, {len})",
            "ends_with": "endswith({x}, '{suffix}')",
        }
        if name not in extras:
            raise VrlCompileError(f"vrl: unsupported builtin {name!r}")
        return extras[name]

    def infallible(self, node):
        """Rewrite the outermost fallible call to its NULL-on-error
        variant (``target, err = expr`` semantics)."""
        if isinstance(node, Call) and node.fallible:
            return Call(node.name, False, node.args)
        return node


# ------------------------------------------------------------ operations


@dataclass
class _SetOp:
    fld: str
    value_sql: str
    cond_sql: str | None = None  # CASE WHEN cond THEN value ELSE old END


@dataclass
class _ReshapeOp:
    source_sql: str
    schema: str


@dataclass
class _DropOp:
    fld: str


@dataclass
class _WhereOp:
    keep_sql: str


class VrlProgram:
    """A compiled VRL program: an ordered list of column operations."""

    def __init__(self, statement: str, schemas: dict[str, str] | None = None):
        self.statement = statement
        self.lowerer = _Lowerer(schemas or {})
        stmts = _Parser(_tokenize(statement)).parse_program()
        self.ops: list = []
        self.hidden: list[str] = []  # materialized err locals, dropped last
        for s in stmts:
            self._lower_stmt(s, cond=None)

    def _bind_err(self, err_local: str, expr) -> None:
        """``target, err = expr``: materialize the error as a hidden
        column BEFORE the target write (so it reflects pre-assignment
        inputs even when the target overwrites its own source, the
        canonical ``.v, err = to_int!(.v)`` pattern), then bind the
        local to that column. The message mirrors the reference's
        surfaced VRL errors (vrl.rs:78-80 formats the resolve error;
        in-program err captures carry VRL's 'function call error for
        "fn"' text): non-NULL exactly when the fallible call failed
        (its NULL-on-error variant returned NULL)."""
        lw = self.lowerer
        col = f"__vrl_err_{len(self.hidden)}"
        if isinstance(expr, Call) and expr.fallible:
            probe = lw.sql(lw.infallible(expr))
            msg = (
                f'function call error for "{expr.name}":'
                " call failed (null result)"
            ).replace("'", "''")
            err_sql = (
                f"(CASE WHEN ({probe}) IS NULL THEN '{msg}'"
                " ELSE CAST(NULL AS STRING) END)"
            )
        else:
            err_sql = "CAST(NULL AS STRING)"
        self.ops.append(_SetOp(col, err_sql))
        self.hidden.append(col)
        lw.locals[err_local] = _quote(col)

    def _lower_stmt(self, s, cond: str | None) -> None:
        lw = self.lowerer
        if isinstance(s, Identity):
            return
        if isinstance(s, Abort):
            if cond is None:
                raise VrlCompileError(
                    "vrl: unconditional abort drops every row — wrap it"
                    " in an if"
                )
            self.ops.append(_WhereOp(f"(NOT coalesce({cond}, FALSE))"))
            return
        if isinstance(s, Del):
            if cond is not None:
                # Spark columns are statically typed and cannot be
                # conditionally dropped: conditional del NULLs the field
                # for matching rows (VRL readers observe the same "field
                # absent" semantics through NULL)
                self.ops.append(_SetOp(s.fld, "NULL", cond_sql=cond))
                return
            self.ops.append(_DropOp(s.fld))
            return
        if isinstance(s, LocalAssign):
            if cond is not None:
                raise VrlCompileError(
                    "vrl: variable assignment inside if is unsupported"
                )
            if s.err_local:
                self._bind_err(s.err_local, s.expr)
            expr = lw.infallible(s.expr) if s.err_local else s.expr
            lw.locals[s.name] = f"({lw.sql(expr)})"
            return
        if isinstance(s, Assign):
            if not s.target.parts:  # root reshape: . = parse_json!(.f)
                if cond is not None:
                    raise VrlCompileError(
                        "vrl: conditional whole-event reshape unsupported"
                    )
                if not (
                    isinstance(s.expr, Call) and s.expr.name == "parse_json"
                ):
                    raise VrlCompileError(
                        "vrl: '. = ...' supports only parse_json"
                    )
                call_sql = lw.call_sql(s.expr)
                self.ops.append(_ReshapeOp(call_sql, ""))
                return
            if len(s.target.parts) != 1:
                raise VrlCompileError(
                    "vrl: assignment targets top-level fields only"
                )
            if s.err_local:
                self._bind_err(s.err_local, s.expr)
            expr = lw.infallible(s.expr) if s.err_local else s.expr
            self.ops.append(
                _SetOp(s.target.parts[0], lw.sql(expr), cond_sql=cond)
            )
            return
        if isinstance(s, If):
            c = lw.sql(s.cond)
            c_and = c if cond is None else f"({cond} AND {c})"
            not_c = f"(NOT coalesce({c}, FALSE))"
            c_not = not_c if cond is None else f"({cond} AND {not_c})"
            for sub in s.then:
                self._lower_stmt(sub, c_and)
            for sub in s.other:
                self._lower_stmt(sub, c_not)
            return
        raise VrlCompileError(f"vrl: cannot lower statement {s!r}")

    def apply(self, df: DataFrame) -> DataFrame:
        out = df
        for op in self.ops:
            if isinstance(op, _SetOp):
                if op.cond_sql is None:
                    out = out.withColumn(op.fld, F.expr(op.value_sql))
                else:
                    old = (
                        _quote(op.fld)
                        if op.fld in out.columns
                        else "NULL"
                    )
                    out = out.withColumn(
                        op.fld,
                        F.expr(
                            f"CASE WHEN coalesce({op.cond_sql}, FALSE)"
                            f" THEN {op.value_sql} ELSE {old} END"
                        ),
                    )
            elif isinstance(op, _DropOp):
                out = out.drop(op.fld)
            elif isinstance(op, _WhereOp):
                out = out.filter(F.expr(op.keep_sql))
            elif isinstance(op, _ReshapeOp):
                out = out.withColumn("__vrl_root__", F.expr(op.source_sql))
                keep = meta_columns(out)
                out = out.select("__vrl_root__.*", *keep)
        if self.hidden:  # materialized err locals are not output fields
            out = out.drop(*[c for c in self.hidden if c in out.columns])
        return out


@PROCESSORS.register("vrl")
class VrlProcessor:
    """The reference's ``vrl`` processor (vrl.rs:26): run a VRL program
    against each batch. This implementation COMPILES the program to
    Spark column expressions at build time (one-time cost, like the
    reference's ``compiler::compile``) and applies them per micro-batch
    — zero per-row Python, full whole-stage codegen.

    conf:
      ``statement``: VRL source (assignments, ``del``, ``if``/``else``,
        ``abort``, fallible ``fn!`` calls, ``target, err =`` captures);
      ``timezone``: optional; invalid values warn and fall back, as in
        the reference builder;
      ``schemas``: optional {path: spark-ddl} hints for ``parse_json``
        (Spark columns are statically typed; VRL's are not).
    """

    def __init__(self, conf: dict):
        statement = conf.get("statement")
        if not statement or not isinstance(statement, str):
            raise VrlCompileError("vrl: conf requires a 'statement' string")
        self.timezone = self._resolve_tz(conf.get("timezone"))
        self.program = VrlProgram(statement, conf.get("schemas"))

    @staticmethod
    def _resolve_tz(tz: str | None) -> str | None:
        if tz is None or tz == "local":
            return None
        try:
            import zoneinfo

            zoneinfo.ZoneInfo(tz)
            return tz
        except Exception:
            warnings.warn(
                f"vrl: invalid timezone {tz!r}; falling back to default"
            )
            return None

    def process(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        return self.program.apply(df)
