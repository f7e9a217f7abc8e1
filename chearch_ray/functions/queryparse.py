"""Lucene-style query-string grammar -> engine AST.

The reference's only query surface is programmatic CHASM bytecode
construction (chasm.chpl:10-13: HALT/PUSH/AND/OR postfix) — there is
no textual query language.  This module is the §2.10 extension that
gives users one, layered strictly ON TOP of the existing AST: the
parser emits the same `chearch_ray.ast` nodes the engine already
plans, so everything downstream (CHASM round-trip for pure boolean
trees, skip-block lazy evaluation, prefix/fuzzy expansion) is reused
unchanged.

Grammar (recursive descent; UPPERCASE keywords are operators,
anything else is a term — the Lucene convention, so `and` the word is
searchable):

    query    := or_expr
    or_expr  := and_expr ( OR and_expr )*
    and_expr := unary ( [AND] unary )*        # juxtaposition = AND
    unary    := (NOT | '-') unary | atom
    atom     := '(' or_expr ')' | '"' words '"' | term
    term     := word | word'*' | '*'word | word'*'word | word'~'[12]
               | '/'pattern'/'
               # prefix / suffix (leading) / infix wildcard / fuzzy
               # / regexp (fullmatch, RE2-agreeing subset)

Semantics notes:

* Negation is positive-anchored (`ast.AndNot`, the engine's
  evaluation never materializes a complement), so NOT factors are
  only legal inside a conjunction that has at least one positive
  factor: `a AND NOT b` parses, `NOT b` and `a OR NOT b` raise.
  Double negation cancels (`NOT NOT a` == `a`).
* `"quoted words"` is an exact-phrase leaf (`ast.Phrase`) — legal in
  boolean context only (QueryEngine.search_boolean); the BM25 path
  rejects it (ranked phrase search remains `search_phrase`).
* Precedence: NOT > AND (and juxtaposition) > OR, i.e.
  `a OR b AND c` == `a OR (b AND c)` — the Lucene/SQL convention.
* Terms are lowercased through the same leaf rules as the flat
  parser (engine.parse_query): trailing `*` = prefix, `~1`/`~2` =
  fuzzy.  Phrase words are split by the index tokenizer's regex so a
  quoted phrase matches exactly what the positional index stored.
"""

from __future__ import annotations

import re

from chearch_ray import ast

#: one token: parenthesis, quoted phrase, a bracketed range filter
#: (`field:[lo TO hi]` — spaces inside the brackets stay in ONE token;
#: parse_with_filters consumes it, parse() rejects it), or a bare word
#: (anything up to whitespace / paren / quote — leaf rules refine it
#: afterwards)
_TOKEN_RE = re.compile(
    r"/[^/\s]+/"  # regexp term `/pattern/` — parens inside stay in ONE token
    r'|\(|\)|"[^"]*"'
    r"|-?[a-z_][a-z0-9_]*:[\[{][^\]}]*[\]}]"
    r'|[^\s()"]+'
)

#: keeps [a-z0-9_] runs — MUST match functions.tokenizer
#: DEFAULT_SPLIT_REGEX so phrase words align with stored positions
_WORD_RE = re.compile(r"[a-z0-9_]+")


class QueryParseError(ValueError):
    pass


#: regexp-pattern syntax subset on which Python `re` and DuckDB's RE2
#: agree exactly: lowercase literals, `.` any-char, classes (ranges,
#: `^` negation), quantifiers `* + ?` and bounded `{m,n}`, groups and
#: alternation.  No backslash escapes (RE2 and `re` diverge on
#: backreferences), no anchors (fullmatch anchors both engines), no
#: uppercase (the vocabulary is lowercase by tokenizer contract).
_REGEXP_ALLOWED_RE = re.compile(r"[a-z0-9_.*+?|()\[\]{}^,-]+")

#: constructs the allowed charset admits but where Python `re` and
#: RE2 genuinely DIVERGE — each must be rejected, not compiled:
#: `{,n}` (re: {0,n}; RE2: literal braces), inline groups `(?...)`
#: (RE2 rejects flags like `(?a)`), and possessive quantifiers
#: `*+ ++ ?+ {m,n}+` (re 3.11 supports them; RE2 errors).  Lazy
#: `*? +? ??` stay legal — both engines support them and laziness
#: cannot change fullmatch MEMBERSHIP.
_REGEXP_DIVERGENT_RE = re.compile(r"\{(?!\d+(,\d*)?\})|\(\?|[*+?}]\+")

#: class-internal constructs Python WARNS it may reinterpret as
#: set operations in a future version (`[a[b]` nested set, `[a--b]`
#: difference, `[a||b]` union) — RE2 reads them as literals today and
#: so does current re, but a future re would silently diverge; reject
#: now (FutureWarning is the contract telling us to)
_REGEXP_FUTURE_SET_RE = re.compile(r"\[[^\]]*(\[|--|\|\|)")


def validate_regexp(pattern: str) -> str:
    """Validate a `/pattern/` body against the RE2-agreeing subset and
    compile-check it; returns the pattern unchanged.  Raises
    QueryParseError with the reason otherwise — silent acceptance of a
    diverging construct would make engine and oracle disagree."""
    if not pattern:
        raise QueryParseError("empty regexp pattern")
    if not _REGEXP_ALLOWED_RE.fullmatch(pattern):
        bad = sorted({c for c in pattern if not _REGEXP_ALLOWED_RE.fullmatch(c)})
        raise QueryParseError(
            f"regexp /{pattern}/ uses unsupported character(s) {bad} — "
            "allowed: lowercase literals, . * + ? | ( ) [ ] {m,n} "
            "classes and ranges (no backslash escapes)")
    m = _REGEXP_DIVERGENT_RE.search(pattern)
    if m:
        raise QueryParseError(
            f"regexp /{pattern}/ uses {m.group(0)!r} at {m.start()} — "
            "a construct where Python re and RE2 disagree (inline "
            "(?...) groups, possessive quantifiers, and braces not of "
            "the {m} / {m,} / {m,n} form are rejected)")
    if _REGEXP_FUTURE_SET_RE.search(pattern):
        raise QueryParseError(
            f"regexp /{pattern}/ uses a class-internal construct "
            "(nested '[', '--', '||') Python re has reserved for "
            "future set-operation syntax — rejected to keep the RE2 "
            "agreement future-proof")
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            re.compile(pattern)
    except FutureWarning as exc:  # any remaining reserved syntax
        raise QueryParseError(
            f"regexp /{pattern}/: {exc} — reserved future syntax is "
            "rejected to keep the RE2 agreement future-proof") from None
    except re.error as exc:
        raise QueryParseError(f"invalid regexp /{pattern}/: {exc}") from None
    return pattern


def _leaf(tok: str) -> ast.Node:
    """Bare-word leaf: same rules as the flat parser
    (engine.parse_query) — trailing `*` prefix, `~1`/`~2` fuzzy."""
    t = tok.lower()
    # `/pattern/` = regexp term query (Lucene RegexpQuery syntax);
    # lowercasing first is safe — the validated subset has no
    # case-sensitive constructs and the vocabulary is lowercase
    if len(t) > 2 and t[0] == "/" and t[-1] == "/":
        return ast.Regexp(validate_regexp(t[1:-1]))
    if len(t) > 1 and t.endswith("*") and "*" not in t[:-1]:
        return ast.Prefix(t[:-1])
    # word-shape guard: `*ab~1` must fall through to the fuzzy rule,
    # not become a match-nothing Suffix("ab~1")
    if len(t) > 1 and t.startswith("*") and _WORD_RE.fullmatch(t[1:]):
        return ast.Suffix(t[1:])
    if "*" in t:
        head, _, tail = t.partition("*")
        # single INFIX star (`a*b`) — pure prefix/suffix handled above
        if (head and tail and "*" not in tail
                and _WORD_RE.fullmatch(head) and _WORD_RE.fullmatch(tail)):
            return ast.Wildcard(head, tail)
    if len(t) > 2 and t[-2] == "~" and t[-1] in "12" and "~" not in t[:-2]:
        return ast.Fuzzy(t[:-2], int(t[-1]))
    if not _WORD_RE.fullmatch(t):
        raise QueryParseError(f"cannot tokenize query term {tok!r}")
    return ast.Term(t)


class _Neg:
    """Parse-time negation wrapper, resolved at the conjunction
    level (never escapes the parser)."""

    __slots__ = ("node",)

    def __init__(self, node):
        self.node = node


class _Parser:
    def __init__(self, query: str, default_op: str = "and"):
        if default_op not in ("and", "or"):
            raise QueryParseError(f"default_op must be 'and' or 'or', not {default_op!r}")
        self.toks = _TOKEN_RE.findall(query)
        self.i = 0
        self.default_op = default_op

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    # query := or_expr EOF
    def parse(self) -> ast.Node:
        node = self.or_expr()
        if self.peek() is not None:
            raise QueryParseError(f"unexpected {self.peek()!r} after query")
        if isinstance(node, _Neg):
            raise QueryParseError(
                "pure negation is an unbounded complement and cannot be "
                "evaluated — anchor it: `positive AND NOT negative`"
            )
        return node

    # or_expr := and_expr (OR and_expr)*         (default_op == "and")
    # or_expr := and_expr ([OR] and_expr)*       (default_op == "or":
    #   juxtaposition joins HERE, Lucene default-operator semantics —
    #   positives OR together, `-`/NOT factors anchor under one AndNot
    #   exactly like the flat parser's or-default)
    def or_expr(self) -> ast.Node | _Neg:
        if self.default_op == "or":
            factors = [self.and_expr()]
            while True:
                tok = self.peek()
                if tok == "OR":
                    self.next()
                    factors.append(self.and_expr())
                elif tok is not None and tok != ")":
                    factors.append(self.and_expr())
                else:
                    break
            pos = [f for f in factors if not isinstance(f, _Neg)]
            neg = [f.node for f in factors if isinstance(f, _Neg)]
            if not pos:
                if len(factors) == 1:
                    return factors[0]  # bare _Neg — parse() rejects it
                raise QueryParseError(
                    "disjunction of pure negations is an unbounded "
                    "complement — include at least one positive factor"
                )
            node = pos[0]
            for f in pos[1:]:
                node = ast.Or(node, f)
            if neg:
                n = neg[0]
                for f in neg[1:]:
                    n = ast.Or(n, f)
                node = ast.AndNot(node, n)
            return node
        node = self.and_expr()
        while self.peek() == "OR":
            self.next()
            rhs = self.and_expr()
            if isinstance(node, _Neg) or isinstance(rhs, _Neg):
                raise QueryParseError(
                    "NOT under OR is an unbounded complement — rewrite as "
                    "`a AND NOT b` (negation must anchor to a conjunction)"
                )
            node = ast.Or(node, rhs)
        return node

    # and_expr := unary ([AND] unary)* — juxtaposition = AND only when
    # default_op == "and"; under an "or" default juxtaposition belongs
    # to or_expr and only the explicit AND keyword conjoins
    def and_expr(self) -> ast.Node | _Neg:
        factors = [self.unary()]
        while True:
            tok = self.peek()
            if tok == "AND":
                self.next()
                factors.append(self.unary())
            elif (self.default_op == "and" and tok is not None
                  and tok not in (")", "OR")):
                factors.append(self.unary())
            else:
                break
        pos = [f for f in factors if not isinstance(f, _Neg)]
        neg = [f.node for f in factors if isinstance(f, _Neg)]
        if not pos:
            if len(factors) == 1:
                return factors[0]  # bare _Neg — or_expr/parse rejects it
            raise QueryParseError(
                "conjunction of pure negations is an unbounded complement "
                "— include at least one positive factor"
            )
        node = pos[0]
        for f in pos[1:]:
            node = ast.And(node, f)
        if neg:
            n = neg[0]
            for f in neg[1:]:
                n = ast.Or(n, f)
            node = ast.AndNot(node, n)
        return node

    # unary := (NOT | '-') unary | atom
    def unary(self) -> ast.Node | _Neg:
        tok = self.peek()
        if tok == "NOT":
            self.next()
            inner = self.unary()
            return inner.node if isinstance(inner, _Neg) else _Neg(inner)
        if tok is not None and len(tok) > 1 and tok[0] == "-" and tok not in ("(", ")"):
            # `-term` sugar == NOT term (flat-parser continuity)
            self.next()
            return _Neg(_leaf(tok[1:]))
        return self.atom()

    # atom := '(' or_expr ')' | phrase | term
    def atom(self) -> ast.Node | _Neg:
        tok = self.peek()
        if tok is None:
            raise QueryParseError("unexpected end of query")
        if tok == "(":
            self.next()
            node = self.or_expr()
            if self.peek() != ")":
                raise QueryParseError("unbalanced '(' in query")
            self.next()
            return node
        if tok == ")":
            raise QueryParseError("unbalanced ')' in query")
        if tok.startswith('"'):
            self.next()
            words = _WORD_RE.findall(tok[1:-1].lower())
            if not words:
                raise QueryParseError("empty phrase in query")
            if len(words) == 1:  # one-word phrase == plain term
                return ast.Term(words[0])
            return ast.Phrase(tuple(words))
        self.next()
        if tok in ("AND", "OR"):
            raise QueryParseError(f"operator {tok} is missing an operand")
        return _leaf(tok)


def parse(query: str, default_op: str = "and") -> ast.Node:
    """Parse a grammar query string into an engine AST.  `default_op`
    sets the implicit operator for juxtaposed terms (Lucene default-
    operator semantics): "and" (the grammar's documented default) or
    "or" (positives OR, negations anchor under one AndNot)."""
    if not query or not query.strip():
        raise QueryParseError("empty query")
    if '"' in query and query.count('"') % 2:
        raise QueryParseError("unbalanced '\"' in query")
    return _Parser(query, default_op).parse()


def is_grammar_query(query: str) -> bool:
    """True when the string uses grammar syntax the flat parser
    (engine.parse_query) cannot express: parens, quoted phrases, or
    UPPERCASE boolean keywords.  Legacy flat strings (lowercased
    terms, `-neg`, `pre*`, `t~1`) return False, so routing on this
    predicate changes no existing query's meaning."""
    if "(" in query or ")" in query or '"' in query:
        return True
    return any(t in ("AND", "OR", "NOT") for t in query.split())


def contains_phrase(node: ast.Node) -> bool:
    if isinstance(node, ast.Phrase):
        return True
    if isinstance(node, (ast.And, ast.Or, ast.AndNot)):
        return contains_phrase(node.a) or contains_phrase(node.b)
    return False


#: `field:value` filter token — Lucene field syntax restricted to the
#: docmap metadata filter surface (top-level conjunctive only)
_FIELD_RE = re.compile(r"^([a-z_][a-z0-9_]*):([^\s()\"]+)$")

#: `field:[lo TO hi]` range filter — Lucene bracket syntax: `[`/`]`
#: inclusive, `{`/`}` exclusive (mixable), `*` = unbounded end
_RANGE_RE = re.compile(
    r"^([a-z_][a-z0-9_]*):([\[{])([^\s\]}]+) TO ([^\s\]}]+)([\]}])$"
)
#: anything that LOOKS like a range filter (so near-misses raise a
#: parse error instead of silently becoming an IN-filter on '[lo')
_RANGEISH_RE = re.compile(r"^-?[a-z_][a-z0-9_]*:[\[{]")


def _range_spec(m: "re.Match") -> tuple:
    """RANGE_RE match -> the engine filter spec tuple
    ("range", lo|None, hi|None, lo_inclusive, hi_inclusive).  Bounds
    are verbatim strings (docmap values may hold paths, dots, case)
    EXCEPT shapes that are clearly a mistyped range — a bound starting
    with a bracket or a non-lone '*' — which raise instead of silently
    filtering on the literal (`lang:[[a TO b]` would otherwise behave
    as an open lower end: '[' sorts below every tokenizer term)."""
    for bound in (m.group(3), m.group(4)):
        if bound != "*" and bound[0] in "[{}]()*":
            raise QueryParseError(
                f"malformed range bound {bound!r} in {m.group(0)!r} — "
                "expected field:[lo TO hi] (or {...} exclusive, "
                "* = open end)")
    lo = None if m.group(3) == "*" else m.group(3)
    hi = None if m.group(4) == "*" else m.group(4)
    if lo is None and hi is None:
        raise QueryParseError(
            f"range filter {m.group(0)!r} is unbounded on both ends — "
            "drop the filter instead")
    # an open end's inclusivity is meaningless — canonicalize to True
    # so `{* TO x}` and `[* TO x}` share one filter-cache entry
    return ("range", lo, hi,
            lo is None or m.group(2) == "[",
            hi is None or m.group(5) == "]")


def parse_with_filters(query: str, default_op: str = "and") -> tuple[ast.Node, dict[str, list] | None]:
    """Lucene-style `field:value` extension over `parse`: top-level
    (paren-depth-0, non-negated) `field:value` tokens become the
    engine's docmap metadata filter — repeated same-field tokens OR
    together (`lang:py lang:go` == lang IN (py, go)), distinct fields
    AND, exactly the `QueryEngine.search(filter=...)` contract.
    `field:[lo TO hi]` is a RANGE filter over the same columns
    (inclusive `[]`, exclusive `{}`, `*` = open end; numeric columns
    compare numerically, string columns lexicographically — the
    searcher types the bounds from the docmap schema); ranges and
    values on the same field OR together like repeated values.  The
    rest of the string parses through the unchanged grammar.

    Field tokens inside parentheses, under NOT/-, or as the only
    content raise: a metadata filter narrows a candidate set, it is
    not a term (the engine never materializes all docs of a lang)."""
    if not query or not query.strip():
        raise QueryParseError("empty query")
    if '"' in query and query.count('"') % 2:
        raise QueryParseError("unbalanced '\"' in query")
    toks = _TOKEN_RE.findall(query)
    depth = 0
    rest: list[str] = []
    filters: dict[str, list[str]] = {}
    prev: str | None = None
    for tok in toks:
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        rm = None if tok.startswith('"') else _RANGE_RE.match(tok)
        m = None if (tok.startswith('"') or rm) else _FIELD_RE.match(tok)
        if rm or m:
            if depth > 0:
                raise QueryParseError(
                    f"field filter {tok!r} must be top-level (conjunctive), "
                    "not inside a group")
            if prev == "NOT":
                raise QueryParseError(f"field filter {tok!r} cannot be negated")
            if rm:
                field, value = rm.group(1), _range_spec(rm)
            else:
                field, value = m.group(1), m.group(2)
                if value[0] in "[{":
                    raise QueryParseError(
                        f"malformed range filter {tok!r} — expected "
                        "field:[lo TO hi] (or {...} exclusive, * = open end)")
                if value.startswith("-"):
                    raise QueryParseError(f"field filter {tok!r} cannot be negated")
            vals = filters.setdefault(field, [])
            if value not in vals:
                vals.append(value)
        else:
            if tok.startswith("-") and (
                _FIELD_RE.match(tok[1:]) or _RANGE_RE.match(tok[1:])
            ):
                raise QueryParseError(f"field filter {tok!r} cannot be negated")
            if not tok.startswith('"') and _RANGEISH_RE.match(tok):
                raise QueryParseError(
                    f"malformed range filter {tok!r} — expected "
                    "field:[lo TO hi] (or {...} exclusive, * = open end)")
            rest.append(tok)
        prev = tok
    if not rest:
        raise QueryParseError(
            "query is only field filters — add at least one term")
    node = _Parser(" ".join(rest), default_op).parse()
    return node, (filters or None)


#: `term^boost` token — boost is a positive int/float literal
_BOOST_RE = re.compile(r"^([^\s()\"^]+)\^(\d+(?:\.\d+)?)$")


def parse_full(query: str, default_op: str = "and") -> tuple["ast.Node", dict | None, dict | None]:
    """The whole query-string surface in one call: (node, field
    filters, per-term boosts).  `term^2` / `term^1.5` multiplies that
    TERM's BM25 idf (Lucene boost semantics — linear in the score
    contribution); the token otherwise parses as its bare leaf, so
    boosts compose with the grammar anywhere a term may appear.
    Boosting non-term leaves (prefix/fuzzy/phrase/field filters)
    raises — their expansions own their weights."""
    if not query or not query.strip():
        raise QueryParseError("empty query")
    if '"' in query and query.count('"') % 2:
        raise QueryParseError("unbalanced '\"' in query")
    boosts: dict[str, float] = {}
    out_toks: list[str] = []
    for tok in _TOKEN_RE.findall(query):
        m = None if tok.startswith('"') else _BOOST_RE.match(tok)
        if m:
            word, w = m.group(1), float(m.group(2))
            t = word.lower()
            if not _WORD_RE.fullmatch(t):
                raise QueryParseError(
                    f"only plain terms take a ^boost, not {word!r}")
            if w <= 0:
                raise QueryParseError("boost must be positive")
            boosts[t] = w
            out_toks.append(word)
        else:
            out_toks.append(tok)
    node, filters = parse_with_filters(" ".join(out_toks), default_op)
    return node, filters, (boosts or None)
