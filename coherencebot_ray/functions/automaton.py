"""urlfilter-automaton (src/plugin/urlfilter-automaton/.../
AutomatonURLFilter.java:95-108): regex rules compiled to a TRUE DFA
(the reference uses dk.brics.automaton's RegExp→RunAutomaton;
``run(url)`` accepts the FULL string).

This implementation goes further than per-rule automata: the whole
+/- rule chain compiles into ONE union DFA whose accept states carry
the MINIMUM matching rule index, so the reference's
first-matching-rule-wins semantics costs a single pass per URL — and
the pass itself is vectorized: the DFA steps COLUMN-MAJOR over a
padded byte matrix (one numpy gather per character position for the
whole batch), which is the actual scale path for 10^10-URL filtering
(a Python-regex loop is per-row; this is per-position).

Pipeline: restricted-regex parse (literals, escapes, ``.``, char
classes with ranges/negation, groups, ``|``, ``* + ?``) → Thompson NFA
(byte alphabet; inputs are utf-8 encoded — '.' matches any byte, an
acceptable divergence for URL filtering, noted) → alphabet equivalence
classes → subset-construction DFA with a dead-state trap.
"""

from __future__ import annotations

import numpy as np

_ALL = frozenset(range(256))


# ---------------------------------------------------------------------------
# restricted regex -> AST
# ---------------------------------------------------------------------------


class _Parser:
    """Grammar: alt = cat ('|' cat)*; cat = rep*; rep = atom [*+?];
    atom = literal | '.' | class | '(' alt ')'."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def _peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def _next(self):
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r} at {self.i} in {self.p!r}")
        return node

    def _alt(self):
        branches = [self._cat()]
        while self._peek() == "|":
            self._next()
            branches.append(self._cat())
        return ("alt", branches) if len(branches) > 1 else branches[0]

    def _cat(self):
        parts = []
        while self._peek() not in (None, "|", ")"):
            parts.append(self._rep())
        if not parts:
            return ("eps",)
        return ("cat", parts) if len(parts) > 1 else parts[0]

    def _rep(self):
        a = self._atom()
        while self._peek() in ("*", "+", "?"):
            op = self._next()
            a = ({"*": "star", "+": "plus", "?": "opt"}[op], a)
        return a

    def _atom(self):
        c = self._next()
        if c == "(":
            node = self._alt()
            if self._peek() != ")":
                raise ValueError(f"unclosed group in {self.p!r}")
            self._next()
            return node
        if c == "[":
            return ("set", self._cls())
        if c == ".":
            return ("set", _ALL)
        if c == "\\":
            return ("set", _escape(self._next()))
        if ord(c) < 128:
            return ("set", frozenset(c.encode("utf-8")))
        # non-ASCII literal: one NFA transition per UTF-8 byte (inputs
        # are utf-8 encoded, so 'é' must match its 2-byte sequence, not
        # any string whose byte happens to be the 0xC3 lead byte)
        return ("cat", [("set", frozenset([b])) for b in c.encode("utf-8")])

    def _cls(self):
        negate = False
        if self._peek() == "^":
            self._next()
            negate = True
        members: set[int] = set()
        first = True
        while True:
            c = self._peek()
            if c is None:
                raise ValueError(f"unclosed class in {self.p!r}")
            if c == "]" and not first:
                self._next()
                break
            first = False
            c = self._next()
            if c == "\\":
                members |= _escape(self._next())
                continue
            lo = ord(c)
            if lo > 127:
                raise ValueError(f"non-ASCII {c!r} not supported in character classes")
            if self._peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self._next()
                hi = ord(self._next())
                if hi > 127:
                    raise ValueError("non-ASCII range bound not supported in character classes")
                members |= set(range(lo, hi + 1))
            else:
                members.add(lo)
        return frozenset(range(256)) - frozenset(members) if negate else frozenset(members)


def _escape(c: str) -> frozenset:
    table = {
        "d": frozenset(range(48, 58)),
        "w": frozenset(list(range(48, 58)) + list(range(65, 91)) + list(range(97, 123)) + [95]),
        "s": frozenset(b" \t\r\n\f\v"),
        "n": frozenset(b"\n"), "t": frozenset(b"\t"), "r": frozenset(b"\r"),
    }
    if c in table:
        return table[c]
    if c == "D":
        return _ALL - table["d"]
    if c == "W":
        return _ALL - table["w"]
    if c == "S":
        return _ALL - table["s"]
    if ord(c) < 128:
        return frozenset([ord(c)])
    # a byte-set can't express a multi-byte UTF-8 sequence; refuse
    # loudly rather than silently over-match on the lead byte
    raise ValueError(f"non-ASCII {c!r} not supported in escapes/character classes")


# ---------------------------------------------------------------------------
# Thompson NFA
# ---------------------------------------------------------------------------


class _NFA:
    def __init__(self):
        self.eps: list[list[int]] = []       # state -> eps targets
        self.trans: list[list[tuple]] = []   # state -> [(symset, target)]
        self.accept_rule: dict[int, int] = {}  # accept state -> rule id

    def new_state(self) -> int:
        self.eps.append([])
        self.trans.append([])
        return len(self.eps) - 1

    def build(self, node, start: int) -> int:
        """Wire ``node`` from ``start``; returns the end state."""
        kind = node[0]
        if kind == "eps":
            return start
        if kind == "set":
            end = self.new_state()
            self.trans[start].append((node[1], end))
            return end
        if kind == "cat":
            cur = start
            for part in node[1]:
                cur = self.build(part, cur)
            return cur
        if kind == "alt":
            end = self.new_state()
            for br in node[1]:
                s = self.new_state()
                self.eps[start].append(s)
                e = self.build(br, s)
                self.eps[e].append(end)
            return end
        if kind in ("star", "plus", "opt"):
            s = self.new_state()
            e = self.build(node[1], s)
            end = self.new_state()
            self.eps[start].append(s)
            if kind in ("star", "opt"):
                self.eps[start].append(end)
            self.eps[e].append(end)
            if kind in ("star", "plus"):
                self.eps[e].append(s)
            return end
        raise ValueError(f"unknown node {kind}")


# ---------------------------------------------------------------------------
# subset construction -> dense DFA + vectorized runner
# ---------------------------------------------------------------------------


class UnionDFA:
    """One DFA for a whole +/- rule chain. ``rule_of[state]`` = the
    minimum rule index accepting there (-1 = none); signs decide."""

    def __init__(self, patterns: list[str]):
        nfa = _NFA()
        start = nfa.new_state()
        for rid, pat in enumerate(patterns):
            s = nfa.new_state()
            nfa.eps[start].append(s)
            end = nfa.build(_Parser(pat).parse(), s)
            # keep the smallest rule id per accept state
            nfa.accept_rule[end] = min(nfa.accept_rule.get(end, rid), rid)

        # alphabet equivalence classes: bytes with identical membership
        # across every distinct symbol set behave identically
        symsets = {ss for row in nfa.trans for ss, _ in row}
        sig = np.zeros((256, max(1, len(symsets))), dtype=bool)
        for k, ss in enumerate(symsets):
            idx = np.fromiter(ss, dtype=np.int64) if ss else np.array([], dtype=np.int64)
            sig[idx, k] = True
        _, classes = np.unique(sig, axis=0, return_inverse=True)
        self.classes = classes.astype(np.int32)  # byte -> class id
        n_classes = int(classes.max()) + 1

        def closure(states: frozenset) -> frozenset:
            stack, seen = list(states), set(states)
            while stack:
                s = stack.pop()
                for t in nfa.eps[s]:
                    if t not in seen:
                        seen.add(t)
                        stack.append(t)
            return frozenset(seen)

        # class id -> a representative byte (for stepping symbol sets)
        rep_byte = np.zeros(n_classes, dtype=np.int64)
        for b in range(255, -1, -1):
            rep_byte[self.classes[b]] = b

        start_set = closure(frozenset([start]))
        ids = {start_set: 0}
        table_rows: list[np.ndarray] = []
        rules: list[int] = []
        worklist = [start_set]
        while worklist:
            cur = worklist.pop()
            i = ids[cur]
            while len(table_rows) <= i:
                table_rows.append(np.zeros(n_classes, dtype=np.int32))
                rules.append(-1)
            acc = [nfa.accept_rule[s] for s in cur if s in nfa.accept_rule]
            rules[i] = min(acc) if acc else -1
            row = np.zeros(n_classes, dtype=np.int32)
            for cid in range(n_classes):
                b = int(rep_byte[cid])
                nxt = frozenset(
                    t for s in cur for ss, t in nfa.trans[s] if b in ss
                )
                if not nxt:
                    row[cid] = 0  # dead/trap slot handled below
                    continue
                nxt = closure(nxt)
                if nxt not in ids:
                    ids[nxt] = len(ids)
                    worklist.append(nxt)
                row[cid] = ids[nxt] + 1  # shift: 0 is the trap state
            table_rows[i] = row

        # state 0 = trap (all transitions self, no accept)
        n_states = len(ids) + 1
        self.table = np.zeros((n_states, n_classes), dtype=np.int32)
        self.rule_of = np.full(n_states, -1, dtype=np.int32)
        for i, row in enumerate(table_rows):
            self.table[i + 1] = row
            self.rule_of[i + 1] = rules[i]
        self.start = 1

    def match_rule(self, urls) -> np.ndarray:
        """Vectorized full-match: returns per-url the minimum matching
        rule index, -1 when no rule accepts. Column-major stepping: one
        gather per character position for the entire batch."""
        import pyarrow as pa

        arr = pa.array([u if isinstance(u, str) else "" for u in urls], type=pa.string())
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)
        data_buf = arr.buffers()[2]
        buf = (
            np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None and data_buf.size
            else np.zeros(1, dtype=np.uint8)
        )
        starts = offsets[:-1].astype(np.int64)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
        n = len(lengths)
        states = np.full(n, self.start, dtype=np.int32)
        maxlen = int(lengths.max()) if n else 0
        for i in range(maxlen):
            active = np.flatnonzero((lengths > i) & (states != 0))
            if not len(active):
                break
            chars = buf[starts[active] + i]
            states[active] = self.table[states[active], self.classes[chars]]
        return self.rule_of[states]
