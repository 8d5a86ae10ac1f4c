"""Minimal AQL front-end — the reference's query-language surface
compiled to DataFrame plans (SURVEY.md §1.3).

The reference evaluates a pipeline language over the tagged event log::

    FROM 'type:purchase' & 'cat:conversion'   -- tag expression
    FILTER _.k > 50                            -- payload predicate
    SELECT _.k * 2                             -- payload projection
    AGGREGATE SUM(_.k)                         -- stream fold
    LIMIT 10

This module implements the *structural subset* of that language —
enough that a reference user's everyday pipeline strings run unchanged:

* ``FROM``      → :func:`events_to_db_spark.functions.tags.parse_tag_expr`
  (tag algebra compiles to ``array_contains`` conjunctions — pure
  Catalyst predicates, pushdown-eligible);
* ``FILTER``    → ``df.filter`` over a payload-expression AST;
* ``SELECT``    → ``df.select`` of one expression, or an object
  construction ``SELECT { a: expr, b: { c: expr } }`` (nested objects
  compile to struct literals; later stages address leaves as
  ``_.b.c``, and a bare ``_`` spreads the whole current payload into
  a field); a comma-separated list is the beta *multi-emission*
  surface — ``SELECT e1, e2`` emits one row per expression per event
  via a single ``posexplode`` (no join), rebinding the event key to
  the packed emission key ``id*n + pos`` (order-preserving, unique)
  so every later stage keeps total-order semantics;
* ``AGGREGATE`` → ``df.agg``; ``SUM/MIN/MAX/AVG/COUNT`` map to native
  aggregates, ``FIRST/LAST`` to ``min_by/max_by`` over the total
  (ts, event_id) event order — NOT Spark's order-undefined
  ``first/last``; ``AGGREGATE { a: SUM(_.x), b: COUNT() }`` computes
  every field in ONE aggregation pass (one scan, one agg row);
* ``LIMIT``     → first-n in event order (TakeOrderedAndProject);
* ``LET x := e``→ named binding usable in every later stage (the
  public AQL beta binding surface) — compiles to ``withColumn``, so
  Catalyst inlines or CSE-shares it like any projection;
* ``LET x := FROM … END`` → sub-query binding (the AQL beta
  nested-pipeline surface): an UNCORRELATED sub-pipeline over the full
  tagged event log, bound as a scalar (AGGREGATE-terminated), a struct
  (object AGGREGATE), or the event-ordered array of row values (SELECT
  pipelines).  Compiles to a broadcast-cross-joined 1-row sub-plan —
  scalar-subquery shape, no per-row re-execution.  Sub-queries nest.
  Binding-rooted paths (``s.n``, ``top[0]``) address struct fields and
  array elements of bound values.

Envelope metadata is addressable in FILTER/SELECT/LET expressions via
the reserved paths ``_time`` (event timestamp), ``_key`` (event id —
the total-order key), ``_appId`` (source application) and ``_tags``
(the tag array; ``_tags[0]`` indexes) — compiling straight to the
envelope columns the tagged frame carries, so a user porting
``FILTER _time > …`` or projecting the event key runs unchanged.
Referencing metadata the frame does not carry is a compile error.

Payload access ``_.a`` (and ``_.a.b``) compiles to
``get_json_object(props, '$.a.b')``; AQL is dynamically typed, so
numeric contexts wrap paths in ``try_cast(double)`` (NULL on
non-numeric, never an ANSI error) and string comparisons compare text.
Expression grammar (precedence low→high)::

    expr    := or ('??' or)*              -- alternative / fallback (beta)
    or      := and ('|' and)*
    and     := cmp ('&' cmp)*
    cmp     := add (('='|'!='|'<'|'<='|'>'|'>=') add)?
    add     := mul (('+'|'-') mul)*
    mul     := unary (('*'|'/'|'%') unary)*
    unary   := '!' unary | '-' unary | atom
    atom    := number | 'string' | TRUE | FALSE | NULL | path | '(' expr ')'
             | CASE (WHEN expr THEN expr)+ (ELSE expr)? ENDCASE
             | FUNC '(' args ')'          -- aggregate calls
             | IsDefined '(' expr ')'     -- presence test (beta)
             | '[' expr (',' expr)* ']'   -- array literal (beta)
             | `text {expr} …`            -- interpolation (beta)

A query may open with ``PRAGMA features := name …`` header lines (the
public feature-gate preamble, e.g. ``subQuery interpolation
multiEmission``) — accepted verbatim and recorded on the parse result;
this compiler supports the whole surface unconditionally, so real AQL
strings run unchanged.

Everything compiles to Catalyst expressions — the AQL front-end adds
zero execution machinery, exactly the §1.3 design stance ("a strict
subset of Spark SQL's expression language").
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from events_to_db_spark.functions.tags import parse_tag_expr

_AGG_FUNCS = {"SUM", "MIN", "MAX", "AVG", "COUNT", "FIRST", "LAST"}

#: Envelope columns carried across SELECT rebinds so later stages can
#: still reference ``_tags``/``_appId``/``_lamport``/``_stream``/
#: ``_offset`` (Catalyst prunes unused carries at the final
#: projection).  ``_time``/``_key`` ride separately as the event order.
_ENVELOPE_COLS = ("app_id", "lamport", "stream_id", "offset")


def _ENVELOPE_CARRY(tags_col: str) -> tuple[str, ...]:
    return (tags_col, *_ENVELOPE_COLS)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | '(?P<str>(?:[^'\\]|\\.)*)'
      | `(?P<interp>(?:[^`\\]|\\.)*)`
      | (?P<meta>_(?:time|key|appId|tags|lamport|stream|offset)\b(?:\[\d+\])?)
      | (?P<path>_(?:\.[A-Za-z_][A-Za-z_0-9]*|\[\d+\])*)
      | (?P<appid>appId\(\s*[A-Za-z0-9_.:\-]+\s*\))
      | (?P<bpath>[A-Za-z][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*|\[\d+\])+)
      | (?P<word>[A-Za-z][A-Za-z_0-9]*)
      | (?P<op>:=|\?\?|<=|>=|!=|[-+*/%=<>()!&|,{}:\[\]])
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "FROM",
    "FILTER",
    "SELECT",
    "AGGREGATE",
    "LIMIT",
    "LET",
    "END",
    "CASE",
    "WHEN",
    "THEN",
    "ELSE",
    "ENDCASE",
    "TRUE",
    "FALSE",
    "NULL",
}


@dataclass
class _Tok:
    kind: str  # num | str | path | word | op
    text: str


def _tokenize(text: str) -> list[_Tok]:
    out: list[_Tok] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise ValueError(f"AQL: bad token at {text[pos:]!r}")
            break
        if m.group("num") is not None:
            out.append(_Tok("num", m.group("num")))
        elif m.group("str") is not None:
            out.append(_Tok("str", m.group("str").replace("\\'", "'")))
        elif m.group("interp") is not None:
            # backtick interpolation string: kept raw; the expression
            # parser splits the `{expr}` splices against the current
            # payload binding (they cannot be resolved at lex time).
            out.append(_Tok("interp", m.group("interp")))
        elif m.group("meta") is not None:
            # envelope metadata path (`_time`, `_appId`, `_tags[0]`):
            # addresses the event envelope, not the payload.
            out.append(_Tok("meta", m.group("meta")))
        elif m.group("path") is not None:
            out.append(_Tok("path", m.group("path")))
        elif m.group("appid") is not None:
            # FROM-clause source atom: kept verbatim (the value may
            # contain '.'/'-'/':' which are not expression tokens).
            out.append(_Tok("word", m.group("appid")))
        elif m.group("bpath") is not None:
            # binding-rooted path (`s.n`, `top[0]`): addresses a field /
            # element of a LET-bound struct or array.
            out.append(_Tok("bpath", m.group("bpath")))
        elif m.group("word") is not None:
            w = m.group("word")
            up = w.upper()
            out.append(_Tok("word", up if up in _KEYWORDS or up in _AGG_FUNCS else w))
        else:
            out.append(_Tok("op", m.group("op")))
        pos = m.end()
    return out


# --- expression AST -> Column -------------------------------------------

#: value kinds the mini type system tracks to pick casts
_NUM, _STR, _BOOL, _ANY = "num", "str", "bool", "any"


@dataclass
class _Val:
    col: Column
    kind: str

    def as_num(self) -> Column:
        if self.kind in (_NUM, _BOOL):
            return self.col
        # dynamic typing: non-numeric payloads become NULL, never an
        # ANSI cast error
        return self.col.try_cast("double")

    def as_str(self) -> Column:
        return self.col if self.kind == _STR else self.col.cast("string")


@dataclass
class _Payload:
    """What ``_`` currently denotes.  At pipeline start it is the raw
    JSON payload string (paths compile to ``get_json_object``); after a
    SELECT stage it is that stage's computed column (paths compile to
    struct-field / array-index access) — AQL's "each stage feeds the
    next" semantics."""

    col: Column
    kind: str  # _Val kind of the whole payload
    is_json: bool
    #: EVOLVED envelope columns (r11, etl.evolve_landing_schema): names
    #: a caller explicitly registered as frame columns — `_.<name>`
    #: resolves to the COLUMN for exactly these, payload-JSON semantics
    #: for everything else.  Opt-in and name-scoped by design: a blanket
    #: column-first rule would let envelope columns silently shadow
    #: same-named payload fields in every existing query.
    column_fields: frozenset = frozenset()

    def resolve(self, parts: list[str | int]) -> _Val:
        if not parts:
            return _Val(self.col, self.kind)
        if self.is_json:
            if (
                isinstance(parts[0], str)
                and parts[0] in self.column_fields
            ):
                c = F.col(parts[0])
                for p in parts[1:]:
                    c = c.getItem(p)
                return _Val(c, _ANY)
            path = "$" + "".join(
                f"[{p}]" if isinstance(p, int) else f".{p}" for p in parts
            )
            return _Val(F.get_json_object(self.col, path), _ANY)
        c = self.col
        for p in parts:
            c = c.getItem(p)
        return _Val(c, _ANY)


def _split_path(text: str) -> list[str | int]:
    """``_.a[0].b`` → ['a', 0, 'b']."""
    parts: list[str | int] = []
    for m in re.finditer(r"\.([A-Za-z_][A-Za-z_0-9]*)|\[(\d+)\]", text):
        parts.append(m.group(1) if m.group(1) is not None else int(m.group(2)))
    return parts


class _ExprParser:
    """Pratt-style recursive-descent over the token stream; produces
    :class:`_Val` (Column + coarse kind) so numeric contexts can insert
    ``try_cast`` exactly where AQL's dynamic typing needs it."""

    def __init__(
        self,
        toks: list[_Tok],
        payload: _Payload,
        order_cols: tuple[str, str],
        bindings: dict[str, str] | None = None,
        meta_cols: dict[str, tuple[str, str]] | None = None,
    ):
        self.toks = toks
        self.payload = payload
        self.order_cols = order_cols
        self.bindings = bindings or {}
        #: envelope metadata: reserved path -> (frame column, kind)
        self.meta_cols = meta_cols or {}
        self.uses_agg = False

    def peek(self) -> _Tok | None:
        return self.toks[0] if self.toks else None

    def take(self) -> _Tok:
        return self.toks.pop(0)

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "op" and t.text in ops

    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "word" and t.text in words

    # precedence ladder ---------------------------------------------------
    def expr(self) -> _Val:
        # `??` — the public AQL *alternative* operator (dynamic typing's
        # fallback: left value if present, else right).  Missing values
        # are NULL in this engine, so it compiles to coalesce; lowest
        # precedence, left-associative.
        v = self.or_()
        while self.at_op("??"):
            self.take()
            r = self.or_()
            kind = v.kind if v.kind == r.kind else _ANY
            v = _Val(F.coalesce(v.col, r.col), kind)
        return v

    def or_(self) -> _Val:
        v = self.and_()
        while self.at_op("|"):
            self.take()
            r = self.and_()
            v = _Val(v.col | r.col, _BOOL)
        return v

    def and_(self) -> _Val:
        v = self.cmp()
        while self.at_op("&"):
            self.take()
            r = self.cmp()
            v = _Val(v.col & r.col, _BOOL)
        return v

    def cmp(self) -> _Val:
        v = self.add()
        if self.at_op("=", "!=", "<", "<=", ">", ">="):
            op = self.take().text
            r = self.add()
            # string = string compares text; anything else numeric
            if v.kind == _STR or r.kind == _STR:
                lc, rc = v.as_str(), r.as_str()
            else:
                lc, rc = v.as_num(), r.as_num()
            col = {
                "=": lc == rc,
                "!=": lc != rc,
                "<": lc < rc,
                "<=": lc <= rc,
                ">": lc > rc,
                ">=": lc >= rc,
            }[op]
            return _Val(col, _BOOL)
        return v

    def add(self) -> _Val:
        v = self.mul()
        while self.at_op("+", "-"):
            op = self.take().text
            r = self.mul()
            col = v.as_num() + r.as_num() if op == "+" else v.as_num() - r.as_num()
            v = _Val(col, _NUM)
        return v

    def mul(self) -> _Val:
        v = self.unary()
        while self.at_op("*", "/", "%"):
            op = self.take().text
            r = self.unary()
            ln, rn = v.as_num(), r.as_num()
            col = ln * rn if op == "*" else ln / rn if op == "/" else ln % rn
            v = _Val(col, _NUM)
        return v

    def unary(self) -> _Val:
        if self.at_op("!"):
            self.take()
            return _Val(~self.unary().col, _BOOL)
        if self.at_op("-"):
            self.take()
            return _Val(-self.unary().as_num(), _NUM)
        return self.atom()

    def atom(self) -> _Val:
        t = self.peek()
        if t is None:
            raise ValueError("AQL: unexpected end of expression")
        if t.kind == "num":
            self.take()
            return _Val(F.lit(float(t.text) if "." in t.text else int(t.text)), _NUM)
        if t.kind == "str":
            self.take()
            return _Val(F.lit(t.text), _STR)
        if t.kind == "interp":
            self.take()
            return self.interp(t.text)
        if t.kind == "path":
            self.take()
            return self.payload.resolve(_split_path(t.text))
        if t.kind == "meta":
            self.take()
            name = re.match(r"_[A-Za-z]+", t.text).group(0)
            entry = self.meta_cols.get(name)
            if entry is None:
                raise ValueError(
                    f"AQL: envelope metadata {name} is not available on"
                    " this frame"
                )
            col_name, kind = entry
            c = F.col(col_name)
            idx = re.search(r"\[(\d+)\]", t.text)
            if idx is not None:
                if name != "_tags":
                    raise ValueError(f"AQL: {name} is not indexable")
                c = c.getItem(int(idx.group(1)))
                kind = _STR
            return _Val(c, kind)
        if t.kind == "bpath":
            self.take()
            root = re.match(r"[A-Za-z][A-Za-z_0-9]*", t.text).group(0)
            if root not in self.bindings:
                raise ValueError(f"AQL: unknown binding {root!r}")
            c = F.col(f"__let_{root}")
            for p in _split_path(t.text):
                c = c.getItem(p)
            return _Val(c, _ANY)
        if t.kind == "word" and t.text in ("TRUE", "FALSE"):
            self.take()
            return _Val(F.lit(t.text == "TRUE"), _BOOL)
        if t.kind == "word" and t.text == "NULL":
            self.take()
            return _Val(F.lit(None), _ANY)
        if t.kind == "word" and t.text in self.bindings:
            self.take()
            return _Val(F.col(f"__let_{t.text}"), self.bindings[t.text])
        if t.kind == "word" and t.text == "IsDefined":
            # public AQL presence test — TRUE iff the expression has a
            # value (missing payload paths are NULL in this engine).
            self.take()
            if not self.at_op("("):
                raise ValueError("AQL: IsDefined needs '('")
            self.take()
            v = self.expr()
            if not self.at_op(")"):
                raise ValueError("AQL: IsDefined missing ')'")
            self.take()
            return _Val(v.col.isNotNull(), _BOOL)
        if t.kind == "word" and t.text == "CASE":
            return self.case()
        if t.kind == "word" and t.text in _AGG_FUNCS:
            return self.agg_call()
        if self.at_op("("):
            self.take()
            v = self.expr()
            if not self.at_op(")"):
                raise ValueError("AQL: missing ')'")
            self.take()
            return v
        if self.at_op("["):
            # array literal `[e1, e2, …]` — elements must share one
            # Spark type (AQL is dynamically typed; a columnar engine
            # is not — Spark's array() type-check raises otherwise).
            self.take()
            items: list[_Val] = []
            if not self.at_op("]"):
                while True:
                    items.append(self.expr())
                    if self.at_op(","):
                        self.take()
                        continue
                    break
            if not self.at_op("]"):
                raise ValueError("AQL: array literal missing ']'")
            self.take()
            return _Val(F.array(*[v.col for v in items]), _ANY)
        if self.at_op("{"):
            # nested object construction anywhere an expression is
            # valid: `{ a: 1, b: { c: _.x } }` compiles to a struct
            # literal; later stages address leaves as `_.b.c` (the
            # payload resolver already walks struct chains).
            self.take()
            fields = _parse_object(self)
            return _Val(
                F.struct(*[v.col.alias(name) for name, v in fields]), _ANY
            )
        raise ValueError(f"AQL: unexpected token {t.text!r}")

    def case(self) -> _Val:
        self.take()  # CASE
        branches: list[tuple[Column, _Val]] = []
        while self.at_word("WHEN"):
            self.take()
            pred = self.expr()
            if not self.at_word("THEN"):
                raise ValueError("AQL: CASE missing THEN")
            self.take()
            branches.append((pred.col, self.expr()))
        default = None
        if self.at_word("ELSE"):
            self.take()
            default = self.expr()
        if not self.at_word("ENDCASE"):
            raise ValueError("AQL: CASE missing ENDCASE")
        self.take()
        if not branches:
            raise ValueError("AQL: CASE needs at least one WHEN")
        kinds = {v.kind for _c, v in branches} | ({default.kind} if default else set())
        kind = kinds.pop() if len(kinds) == 1 else _ANY
        col = F.when(branches[0][0], branches[0][1].col)
        for pred, val in branches[1:]:
            col = col.when(pred, val.col)
        if default is not None:
            col = col.otherwise(default.col)
        return _Val(col, kind)

    def interp(self, raw: str) -> _Val:
        """Backtick interpolation string (the public AQL beta surface):
        ``\\`user {_.name} spent {_.k}\\``` — literal segments and
        ``{expr}`` splices concatenate to one string.  Splices are full
        expressions over the current payload/bindings/envelope; each
        compiles with a child parser and casts to text.  NULL splices
        propagate (SQL concat semantics — a reconstruction choice,
        documented).  Escapes: ``\\``` ``\\{`` ``\\}`` ``\\\\``."""
        parts: list[Column] = []
        lit: list[str] = []
        i = 0
        while i < len(raw):
            ch = raw[i]
            if ch == "\\" and i + 1 < len(raw):
                lit.append(raw[i + 1])
                i += 2
                continue
            if ch == "{":
                depth = 1
                j = i + 1
                while j < len(raw) and depth:
                    if raw[j] == "\\":
                        j += 2
                        continue
                    if raw[j] == "'":
                        # '…' string literal inside the splice: braces in
                        # it are text, not nesting (ADVICE r06 — the
                        # scanner mis-closed on `{concat(_.a, '}')}`).
                        # Honors the tokenizer's \-escapes.
                        j += 1
                        while j < len(raw) and raw[j] != "'":
                            j += 2 if raw[j] == "\\" else 1
                        j += 1
                        continue
                    if raw[j] == "{":
                        depth += 1
                    elif raw[j] == "}":
                        depth -= 1
                    j += 1
                if depth:
                    raise ValueError("AQL: unterminated {expr} in `…`")
                seg = raw[i + 1 : j - 1]
                sub = _ExprParser(
                    _tokenize(seg),
                    self.payload,
                    self.order_cols,
                    self.bindings,
                    self.meta_cols,
                )
                v = sub.expr()
                if sub.toks:
                    raise ValueError(
                        f"AQL: trailing tokens in interpolation {seg!r}"
                    )
                if sub.uses_agg:
                    raise ValueError(
                        "AQL: aggregates are not allowed inside `…`"
                    )
                if lit:
                    parts.append(F.lit("".join(lit)))
                    lit = []
                parts.append(v.as_str())
                i = j
                continue
            if ch == "}":
                raise ValueError("AQL: '}' outside {expr} in `…`")
            lit.append(ch)
            i += 1
        if lit or not parts:
            parts.append(F.lit("".join(lit)))
        return _Val(parts[0] if len(parts) == 1 else F.concat(*parts), _STR)

    def agg_call(self) -> _Val:
        name = self.take().text
        self.uses_agg = True
        if not self.at_op("("):
            raise ValueError(f"AQL: {name} needs '('")
        self.take()
        if name == "COUNT":
            if not self.at_op(")"):
                raise ValueError("AQL: COUNT takes no argument")
            self.take()
            return _Val(F.count(F.lit(1)), _NUM)
        arg = self.expr()
        if not self.at_op(")"):
            raise ValueError(f"AQL: missing ')' after {name}")
        self.take()
        ts_col, id_col = self.order_cols
        order = F.struct(F.col(ts_col), F.col(id_col))
        if name in ("SUM", "AVG", "MIN", "MAX"):
            fn = {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}[name]
            return _Val(fn(arg.as_num()), _NUM)
        if name == "FIRST":
            return _Val(F.min_by(arg.col, order), arg.kind)
        if name == "LAST":
            return _Val(F.max_by(arg.col, order), arg.kind)
        raise ValueError(f"AQL: unknown aggregate {name}")


# --- pipeline compiler ---------------------------------------------------


@dataclass
class AqlQuery:
    """Parsed AQL pipeline: the FROM tag text plus the ordered stage
    list — AQL is a *pipeline*, so FILTER/SELECT/LIMIT may appear any
    number of times in any order, each feeding the next (AGGREGATE
    terminates the pipeline)."""

    from_text: str
    stages: list[tuple[str, list[_Tok] | int]]
    #: feature names a leading ``PRAGMA features := …`` header declared.
    #: The public AQL gates beta syntax behind such headers; this
    #: compiler supports the whole surface unconditionally, so the
    #: header is accepted (queries run verbatim) and recorded, never
    #: required.
    features: tuple[str, ...] = ()


#: ``PRAGMA features := subQuery interpolation`` header lines (the
#: public AQL feature-gate preamble).  Line-based: each pragma ends at
#: its newline.
_PRAGMA_RE = re.compile(r"\s*PRAGMA\s+features\s*:=[ \t]*([^\n]*)\n", re.IGNORECASE)


_FROM_STAGE_KW_RE = re.compile(r"(FILTER|SELECT|AGGREGATE|LIMIT|LET)\b")


def _raw_from_clause(text: str) -> str:
    """The raw FROM-clause slice: everything up to the first top-level
    stage keyword, skipping '…'/`…` quoted segments (a tag named
    'FILTER' must not terminate the clause)."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in ("'", "`"):
            q = c
            i += 1
            while i < n and text[i] != q:
                i += 2 if text[i] == "\\" else 1
            i += 1
            continue
        m = _FROM_STAGE_KW_RE.match(text, i)
        if m and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")):
            return text[:i]
        i += 1
    return text


def parse_aql(text: str) -> AqlQuery:
    """Split the pipeline into its ordered stages; stage payloads stay
    as token lists so :func:`run_aql` can bind them against the frame."""
    features: list[str] = []
    while (m := _PRAGMA_RE.match(text)) is not None:
        features.extend(m.group(1).split())
        text = text[m.end() :]
    toks = _tokenize(text)
    if not (toks and toks[0].kind == "word" and toks[0].text == "FROM"):
        raise ValueError("AQL: query must start with FROM")
    toks.pop(0)
    stage_kws = ("FILTER", "SELECT", "AGGREGATE", "LIMIT", "LET")
    # FROM clause: the RAW text slice up to the first top-level stage
    # keyword (quote-aware scan) — a token-reassembly would insert
    # spaces inside TIME-bound instants (`2024-01-10` tokenizes as
    # num/op/num/op/num, r7); the tokens are still consumed below so
    # stage parsing starts in the right place.
    raw_rest = re.match(r"\s*FROM\b", text)
    from_text = _raw_from_clause(text[raw_rest.end():]).strip()
    while toks and not (toks[0].kind == "word" and toks[0].text in stage_kws):
        toks.pop(0)
    stages: list[tuple[str, list[_Tok] | int]] = []
    while toks:
        kw = toks.pop(0)
        if kw.kind != "word" or kw.text not in stage_kws:
            raise ValueError(f"AQL: expected stage keyword, got {kw.text!r}")
        if stages and stages[-1][0] == "AGGREGATE":
            raise ValueError("AQL: AGGREGATE must be the last stage")
        if kw.text == "LIMIT":
            if not toks or toks[0].kind != "num":
                raise ValueError("AQL: LIMIT needs a number")
            stages.append(("LIMIT", int(toks.pop(0).text)))
            continue
        # Stage body: stage keywords do NOT terminate while inside a
        # sub-query (`FROM … END` nests a whole pipeline, stage
        # keywords and all — depth counts FROM/END pairs).
        body: list[_Tok] = []
        depth = 0
        while toks:
            t = toks[0]
            if t.kind == "word" and t.text == "FROM":
                depth += 1
            elif t.kind == "word" and t.text == "END":
                depth -= 1
                if depth < 0:
                    raise ValueError("AQL: END without matching FROM")
            elif depth == 0 and t.kind == "word" and t.text in stage_kws:
                break
            body.append(toks.pop(0))
        if depth != 0:
            raise ValueError("AQL: sub-query FROM missing END")
        stages.append((kw.text, body))
    return AqlQuery(
        from_text=from_text, stages=stages, features=tuple(features)
    )


def _parse_object(p: _ExprParser) -> list[tuple[str, _Val]]:
    """``{ name: expr, ... }`` body (the ``{`` is already consumed)."""
    fields: list[tuple[str, _Val]] = []
    while True:
        name_tok = p.take()
        if name_tok.kind not in ("word", "str"):
            raise ValueError("AQL: object field name expected")
        if not p.at_op(":"):
            raise ValueError("AQL: object field needs ':'")
        p.take()
        fields.append((name_tok.text, p.expr()))
        if p.at_op(","):
            p.take()
            continue
        if p.at_op("}"):
            p.take()
            break
        raise ValueError("AQL: object needs ',' or '}'")
    return fields


def _toks_to_text(toks: list[_Tok]) -> str:
    """Reconstruct pipeline text from tokens (sub-query re-parse)."""
    parts = []
    for t in toks:
        if t.kind == "str":
            parts.append("'" + t.text.replace("'", "\\'") + "'")
        elif t.kind == "interp":
            # raw interpolation body still carries its own escapes —
            # re-wrap verbatim or the sub-query re-parse would read it
            # as bare tokens
            parts.append("`" + t.text + "`")
        else:
            parts.append(t.text)
    return " ".join(parts)


def run_aql(
    events_with_tags: DataFrame,
    query: str,
    payload_col: str = "props",
    tags_col: str = "tags",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    limit_impl=None,
    column_fields: frozenset = frozenset(),
) -> DataFrame:
    """Compile and run an AQL pipeline string against the tagged event
    frame.

    Stages apply strictly in order, each rebinding ``_`` for the next —
    ``FROM … FILTER … SELECT … FILTER … SELECT … LIMIT n`` works, with
    post-SELECT filters reading the selected value (struct fields for
    object SELECTs).  Returns (event_id, ts, value) rows in event order
    for SELECT pipelines — or one column per field when the FINAL stage
    is an object SELECT — and a single ``value`` row for AGGREGATE
    pipelines.  A mid-pipeline LIMIT takes the first n in event order
    and keeps piping (the reference's stream-prefix semantics).

    ``column_fields`` (r11): names for which ``_.<name>`` resolves to
    the FRAME COLUMN instead of a payload-JSON path — the surface the
    landing layout's EVOLVED columns (``etl.evolve_landing_schema``)
    ride into AQL configs.  Opt-in and name-scoped; everything else
    keeps the dynamic-payload semantics.
    """
    q = parse_aql(query)
    ts_col, id_col = order_cols
    df = events_with_tags.filter(
        parse_tag_expr(q.from_text).to_column(
            tags_col, avail_cols=set(events_with_tags.columns)
        )
    )
    payload = _Payload(
        F.col(payload_col), _ANY, is_json=True,
        column_fields=frozenset(column_fields),
    )
    obj_fields: list[str] | None = None  # set while payload is an object
    bindings: dict[str, str] = {}  # LET name -> value kind

    def meta_for(frame: DataFrame) -> dict[str, tuple[str, str]]:
        """Envelope metadata available to expressions (VERDICT r04 #5,
        completed r07): reserved paths → (column, kind).  ``_time``/
        ``_key`` always exist (they are the event order); ``_tags``/
        ``_appId``/``_lamport``/``_stream``/``_offset`` only when the
        frame carries their columns (with_tags synthesizes all of them
        on the testdata; a real deployment stores them) — referencing
        an absent one is a compile error, not a NULL."""
        m = {"_time": (ts_col, _ANY), "_key": (id_col, _NUM)}
        if tags_col in frame.columns:
            m["_tags"] = (tags_col, _ANY)
        if "app_id" in frame.columns:
            m["_appId"] = ("app_id", _STR)
        if "lamport" in frame.columns:
            m["_lamport"] = ("lamport", _NUM)
        if "stream_id" in frame.columns:
            m["_stream"] = ("stream_id", _STR)
        if "offset" in frame.columns:
            m["_offset"] = ("offset", _NUM)
        return m

    def materialize(val: Column, kind: str) -> None:
        """Bind a computed value as the new payload column ``__v``,
        carrying LET binding and envelope columns across the rebind
        (Catalyst prunes the unused carries at the final projection)."""
        nonlocal df, payload
        carry = [c for c in _ENVELOPE_CARRY(tags_col) if c in df.columns]
        df = df.select(
            ts_col,
            id_col,
            val.alias("__v"),
            *carry,
            *[F.col(f"__let_{n}") for n in bindings],
        )
        payload = _Payload(F.col("__v"), kind, is_json=False)

    for idx, (kind, body) in enumerate(q.stages):
        last = idx == len(q.stages) - 1
        if kind == "LIMIT":
            # AQL LIMIT = first n in the event order, not an arbitrary n.
            # ``limit_impl`` lets a caller substitute an equivalent
            # operator for execution models where orderBy().limit() is
            # unsupported (the streaming subscription's stateful
            # take-first-n) — semantics must match on an ordered feed.
            if limit_impl is not None:
                df = limit_impl(df, body)
            else:
                df = df.orderBy(ts_col, id_col).limit(body)
            continue
        if kind == "LET":
            # LET name := expr — bind a named value for later stages
            # (public AQL beta binding surface; ``:=`` as documented).
            toks = list(body)
            if not toks or toks[0].kind != "word":
                raise ValueError("AQL: LET needs a binding name")
            name = toks.pop(0).text
            if not (toks and toks[0].kind == "op" and toks[0].text == ":="):
                raise ValueError("AQL: LET needs ':='")
            toks.pop(0)
            if toks and toks[0].kind == "word" and toks[0].text == "FROM":
                # LET x := FROM … END — sub-query binding (the public
                # AQL beta nested-pipeline surface).  The sub-pipeline
                # runs UNCORRELATED over the full tagged event frame
                # (its own FROM, its own `_`), producing either a
                # scalar (AGGREGATE-terminated) or the event-ordered
                # array of its row values (SELECT pipelines; an object
                # AGGREGATE binds a struct).  The 1-row result is
                # broadcast-cross-joined onto the outer pipeline —
                # exactly a scalar-subquery plan, no per-row
                # re-execution, no driver collect.
                if not (toks[-1].kind == "word" and toks[-1].text == "END"):
                    raise ValueError(
                        "AQL: LET sub-query must be the whole binding"
                        " (… := FROM … END)"
                    )
                sub = run_aql(
                    events_with_tags,
                    _toks_to_text(toks[:-1]),
                    payload_col,
                    tags_col,
                    order_cols,
                )
                out_name = f"__let_{name}"
                if ts_col in sub.columns:
                    # Array-valued binding: the sub-result materializes
                    # as ONE collect_list row — an unfiltered sub-
                    # pipeline would concentrate the whole event log
                    # into a single aggregation task (ADVICE r04).  Cap
                    # it: scan at most cap+1 rows (the limit bounds the
                    # aggregation's input, not just the output) and
                    # raise loudly when the cap is crossed so the user
                    # adds a FILTER/LIMIT instead of silently OOMing.
                    cap = int(
                        os.environ.get("SPARK_GRAFT_AQL_SUB_MAX", "100000")
                    )
                    sub = sub.limit(cap + 1)
                    val_cols = [
                        c for c in sub.columns if c not in (ts_col, id_col)
                    ]
                    row_val = (
                        F.col("value")
                        if val_cols == ["value"]
                        else F.struct(*[F.col(c) for c in val_cols])
                    )
                    arr = F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct(
                                    F.col(ts_col).alias("t"),
                                    F.col(id_col).alias("i"),
                                    row_val.alias("v"),
                                )
                            )
                        ),
                        lambda s: s["v"],
                    )
                    one = sub.agg(
                        F.when(F.size(arr) <= cap, arr)
                        .otherwise(
                            F.raise_error(
                                F.lit(
                                    f"AQL: LET sub-query '{name}' exceeds "
                                    f"{cap} rows; add a FILTER or LIMIT "
                                    "(cap: SPARK_GRAFT_AQL_SUB_MAX)"
                                )
                            )
                        )
                        .alias(out_name)
                    )
                else:
                    one = sub.select(
                        (
                            F.col("value")
                            if sub.columns == ["value"]
                            else F.struct(*sub.columns)
                        ).alias(out_name)
                    )
                df = df.crossJoin(F.broadcast(one))
                bindings[name] = _ANY
                continue
            p = _ExprParser(toks, payload, order_cols, bindings, meta_for(df))
            val = p.expr()
            if p.toks:
                raise ValueError("AQL: trailing tokens in LET")
            if p.uses_agg:
                raise ValueError("AQL: LET cannot contain aggregates")
            df = df.withColumn(f"__let_{name}", val.col)
            bindings[name] = val.kind
            continue
        p = _ExprParser(list(body), payload, order_cols, bindings, meta_for(df))
        if kind == "FILTER":
            cond = p.expr()
            if p.toks:
                raise ValueError("AQL: trailing tokens in FILTER")
            df = df.filter(cond.col)
            continue
        if kind == "AGGREGATE":
            if p.at_op("{"):
                # AGGREGATE { a: SUM(_.x), b: COUNT() } — one agg row
                # with a column per field (no N-fold scan / cross join)
                p.take()
                fields = _parse_object(p)
                if p.toks:
                    raise ValueError("AQL: trailing tokens in AGGREGATE")
                if not p.uses_agg:
                    raise ValueError("AQL: AGGREGATE needs an aggregate call")
                return df.agg(
                    *[v.col.alias(name) for name, v in fields]
                )
            val = p.expr()
            if p.toks:
                raise ValueError("AQL: trailing tokens in AGGREGATE")
            if not p.uses_agg:
                raise ValueError("AQL: AGGREGATE needs an aggregate call")
            return df.agg(val.col.alias("value"))
        # SELECT — one or more emissions (scalar or object
        # construction), comma-separated.  Multi-emission is the public
        # AQL beta surface: `SELECT _.a, _.b` emits one row per listed
        # expression per input event, in listed order.
        emissions: list[tuple[Column, str, list[str] | None]] = []
        while True:
            if p.at_op("{"):
                p.take()
                fields = _parse_object(p)
                emissions.append(
                    (
                        F.struct(*[v.col.alias(name) for name, v in fields]),
                        _ANY,
                        [name for name, _v in fields],
                    )
                )
            else:
                val = p.expr()
                emissions.append((val.col, val.kind, None))
            if p.at_op(","):
                p.take()
                continue
            break
        if p.toks:
            raise ValueError("AQL: trailing tokens in SELECT")
        if len(emissions) == 1:
            col, kind, names = emissions[0]
            materialize(col, kind)
            obj_fields = names
        else:
            # Emissions must share one Spark type (object emissions:
            # the same field list) — AQL is dynamically typed, a
            # columnar engine is not; mixed-type emission lists are a
            # compile error here.
            kinds = {k for _c, k, _n in emissions if k != _ANY}
            name_sets = {tuple(n) if n else None for _c, _k, n in emissions}
            if len(kinds) > 1 or len(name_sets) > 1:
                raise ValueError(
                    "AQL: multi-emission SELECT needs same-shaped"
                    " emissions (one type / one object field list)"
                )
            n_emit = len(emissions)
            carry = [c for c in _ENVELOPE_CARRY(tags_col) if c in df.columns]
            lets = [F.col(f"__let_{nm}") for nm in bindings]
            # One row per (event, emission), in emission order.  The
            # event key REBINDS to the packed emission key
            # id*n + pos — order-preserving and unique, so every
            # downstream stage (FIRST/LAST folds, LIMIT prefixes,
            # `_key` addressing) keeps total-order semantics; the
            # source key is recoverable as `_key / n` (integer div).
            df = df.select(
                ts_col,
                F.col(id_col),
                F.posexplode(
                    F.array(*[c for c, _k, _n in emissions])
                ).alias("__pos", "__v"),
                *carry,
                *lets,
            ).select(
                ts_col,
                (F.col(id_col) * n_emit + F.col("__pos")).alias(id_col),
                F.col("__v"),
                *carry,
                *lets,
            )
            payload = _Payload(
                F.col("__v"), kinds.pop() if kinds else _ANY, is_json=False
            )
            obj_fields = list(name_sets.pop() or []) or None
        del last  # stage position no longer special-cased

    if obj_fields is not None:
        # final payload is an object — flatten to one column per field
        return df.select(
            ts_col, id_col, *[F.col(f"__v.{name}").alias(name) for name in obj_fields]
        )
    if payload.is_json:
        df = df.select(ts_col, id_col, F.col(payload_col).alias("value"))
    else:
        df = df.select(ts_col, id_col, F.col("__v").alias("value"))
    return df
