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
* ``SELECT``    → ``df.select`` of one expression (object construction
  is out of scope — documented, not silently wrong);
* ``AGGREGATE`` → ``df.agg``; ``SUM/MIN/MAX/AVG/COUNT`` map to native
  aggregates, ``FIRST/LAST`` to ``min_by/max_by`` over the total
  (ts, event_id) event order — NOT Spark's order-undefined
  ``first/last``;
* ``LIMIT``     → first-n in event order (TakeOrderedAndProject).

Payload access ``_.a`` (and ``_.a.b``) compiles to
``get_json_object(props, '$.a.b')``; AQL is dynamically typed, so
numeric contexts wrap paths in ``try_cast(double)`` (NULL on
non-numeric, never an ANSI error) and string comparisons compare text.
Expression grammar (precedence low→high)::

    expr    := or
    or      := and ('|' and)*
    and     := cmp ('&' cmp)*
    cmp     := add (('='|'!='|'<'|'<='|'>'|'>=') add)?
    add     := mul (('+'|'-') mul)*
    mul     := unary (('*'|'/'|'%') unary)*
    unary   := '!' unary | '-' unary | atom
    atom    := number | 'string' | TRUE | FALSE | NULL | path | '(' expr ')'
             | CASE (WHEN expr THEN expr)+ (ELSE expr)? ENDCASE
             | FUNC '(' args ')'          -- aggregate calls

Everything compiles to Catalyst expressions — the AQL front-end adds
zero execution machinery, exactly the §1.3 design stance ("a strict
subset of Spark SQL's expression language").
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from events_to_db_spark.functions.tags import parse_tag_expr

_AGG_FUNCS = {"SUM", "MIN", "MAX", "AVG", "COUNT", "FIRST", "LAST"}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | '(?P<str>(?:[^'\\]|\\.)*)'
      | (?P<path>_(?:\.[A-Za-z_][A-Za-z_0-9]*)*)
      | (?P<word>[A-Za-z][A-Za-z_0-9]*)
      | (?P<op><=|>=|!=|[-+*/%=<>()!&|,{}:])
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "FROM",
    "FILTER",
    "SELECT",
    "AGGREGATE",
    "LIMIT",
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
        elif m.group("path") is not None:
            out.append(_Tok("path", m.group("path")))
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


class _ExprParser:
    """Pratt-style recursive-descent over the token stream; produces
    :class:`_Val` (Column + coarse kind) so numeric contexts can insert
    ``try_cast`` exactly where AQL's dynamic typing needs it."""

    def __init__(self, toks: list[_Tok], payload_col: str, order_cols: tuple[str, str]):
        self.toks = toks
        self.payload_col = payload_col
        self.order_cols = order_cols
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
        if t.kind == "path":
            self.take()
            if t.text == "_":
                return _Val(F.col(self.payload_col), _ANY)
            json_path = "$" + t.text[1:]
            return _Val(
                F.get_json_object(F.col(self.payload_col), json_path), _ANY
            )
        if t.kind == "word" and t.text in ("TRUE", "FALSE"):
            self.take()
            return _Val(F.lit(t.text == "TRUE"), _BOOL)
        if t.kind == "word" and t.text == "NULL":
            self.take()
            return _Val(F.lit(None), _ANY)
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
    """Parsed AQL pipeline (stage texts, not yet bound to a frame)."""

    from_text: str
    filter_toks: list[_Tok] | None
    select_toks: list[_Tok] | None
    aggregate_toks: list[_Tok] | None
    limit_n: int | None


def parse_aql(text: str) -> AqlQuery:
    """Split the pipeline into stages; stage payloads stay as token
    lists so :func:`run_aql` can bind them against the frame."""
    toks = _tokenize(text)
    if not (toks and toks[0].kind == "word" and toks[0].text == "FROM"):
        raise ValueError("AQL: query must start with FROM")
    toks.pop(0)
    stages = {"FILTER": None, "SELECT": None, "AGGREGATE": None}
    order = ["FILTER", "SELECT", "AGGREGATE", "LIMIT"]
    # FROM clause: consume tokens until the next stage keyword
    from_parts: list[str] = []
    while toks and not (toks[0].kind == "word" and toks[0].text in order):
        t = toks.pop(0)
        from_parts.append(f"'{t.text}'" if t.kind == "str" else t.text)
    from_text = " ".join(from_parts)
    limit_n: int | None = None
    while toks:
        kw = toks.pop(0)
        if kw.kind != "word" or kw.text not in order:
            raise ValueError(f"AQL: expected stage keyword, got {kw.text!r}")
        if kw.text == "LIMIT":
            if not toks or toks[0].kind != "num":
                raise ValueError("AQL: LIMIT needs a number")
            limit_n = int(toks.pop(0).text)
            continue
        body: list[_Tok] = []
        while toks and not (toks[0].kind == "word" and toks[0].text in order):
            body.append(toks.pop(0))
        if stages[kw.text] is not None:
            raise ValueError(f"AQL: duplicate {kw.text}")
        stages[kw.text] = body
    return AqlQuery(
        from_text=from_text,
        filter_toks=stages["FILTER"],
        select_toks=stages["SELECT"],
        aggregate_toks=stages["AGGREGATE"],
        limit_n=limit_n,
    )


def run_aql(
    events_with_tags: DataFrame,
    query: str,
    payload_col: str = "props",
    tags_col: str = "tags",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Compile and run an AQL pipeline string against the tagged event
    frame.  Returns (event_id, ts, value) rows in event order for
    SELECT pipelines, a single ``value`` row for AGGREGATE pipelines.
    """
    q = parse_aql(query)
    df = events_with_tags.filter(
        parse_tag_expr(q.from_text).to_column(tags_col)
    )
    if q.filter_toks is not None:
        p = _ExprParser(list(q.filter_toks), payload_col, order_cols)
        cond = p.expr()
        if p.toks:
            raise ValueError("AQL: trailing tokens in FILTER")
        df = df.filter(cond.col)
    ts_col, id_col = order_cols
    if q.aggregate_toks is not None:
        p = _ExprParser(list(q.aggregate_toks), payload_col, order_cols)
        val = p.expr()
        if p.toks:
            raise ValueError("AQL: trailing tokens in AGGREGATE")
        if not p.uses_agg:
            raise ValueError("AQL: AGGREGATE needs an aggregate call")
        out = df.agg(val.col.alias("value"))
        return out.limit(q.limit_n) if q.limit_n is not None else out
    if q.select_toks is not None:
        p = _ExprParser(list(q.select_toks), payload_col, order_cols)
        # AQL object construction `{ name: expr, ... }` — flattened to
        # one output column per field (objects don't nest here;
        # documented subset)
        if p.at_op("{"):
            p.take()
            cols: list[Column] = []
            while True:
                name_tok = p.take()
                if name_tok.kind not in ("word", "str"):
                    raise ValueError("AQL: object field name expected")
                if not p.at_op(":"):
                    raise ValueError("AQL: object field needs ':'")
                p.take()
                cols.append(p.expr().col.alias(name_tok.text))
                if p.at_op(","):
                    p.take()
                    continue
                if p.at_op("}"):
                    p.take()
                    break
                raise ValueError("AQL: object needs ',' or '}'")
            if p.toks:
                raise ValueError("AQL: trailing tokens in SELECT")
            df = df.select(ts_col, id_col, *cols)
            if q.limit_n is not None:
                df = df.orderBy(ts_col, id_col).limit(q.limit_n)
            return df
        val = p.expr()
        if p.toks:
            raise ValueError("AQL: trailing tokens in SELECT")
        df = df.select(ts_col, id_col, val.col.alias("value"))
    else:
        df = df.select(ts_col, id_col, F.col(payload_col).alias("value"))
    if q.limit_n is not None:
        # AQL LIMIT = first n in the event order, not an arbitrary n
        df = df.orderBy(ts_col, id_col).limit(q.limit_n)
    return df
