#!/usr/bin/env python3
"""Cross-engine fuzz for the q_window_pattern DuckDB oracle (driver-side
tooling — duckdb is not on the library classpath).

The Spark-side artifacts (machine fold, SQL folds) are property-pinned to
each other by PatternMachineSpec, and the DuckDB oracle is strict-hash
green on the fixture at sf0.001/0.01/0.1. This script removes the
remaining fixture dependence: it generates RANDOM events tables (random
types incl. boundaries, random timestamps incl. exact-span ties and
same-timestamp event_id ties), runs the exact oracle SQL the driver runs
(read from a Verify dump's oracle_sql.json), and compares every
(user, pattern) count against an independent Python re-implementation of
the PatternMachine transition (subsequence / windowed / contiguous-KMP).

Usage: python3 tools/fuzz_cep_oracle.py <verify_out_dir> [rounds=30]
"""
import json
import random
import re
import sys

import duckdb

BOUNDARY = set("esp")
SPAN_US = 30 * 60 * 1_000_000
QSPAN_US = 24 * 3600 * 1_000_000  # the windowed-quantified arm's 24h span


def machine_sub(evs, pat):
    prog = cnt = 0
    m = len(pat)
    for t, _ in evs:
        matched = t == pat[prog]
        completed = matched and prog + 1 == m
        if completed:
            cnt += 1
            prog = 0
        elif matched:
            prog += 1
        if t in BOUNDARY:
            prog = 0
    return cnt


def machine_win(evs, pat, span):
    prog = cnt = first = 0
    m = len(pat)
    for t, tsu in evs:
        if prog > 0 and tsu - first > span:
            prog, first = 0, 0
        matched = t == pat[prog]
        completed = matched and prog + 1 == m
        if matched and prog == 0:
            first = tsu
        if completed:
            cnt += 1
            prog, first = 0, 0
        elif matched:
            prog += 1
        if t in BOUNDARY:
            prog, first = 0, 0
    return cnt


def machine_contig(evs, pat):
    # KMP automaton with non-overlapping reset (mirror of Compiled.delta)
    m = len(pat)
    fail = [0] * (m + 1)
    k = 0
    for i in range(1, m):
        while k > 0 and pat[i] != pat[k]:
            k = fail[k]
        if pat[i] == pat[k]:
            k += 1
        fail[i + 1] = k
    prog = cnt = 0
    for t, _ in evs:
        s = prog
        while s > 0 and t != pat[s]:
            s = fail[s]
        nxt = s + 1 if t == pat[s] else 0
        if nxt == m:
            cnt += 1
            prog = 0
        else:
            prog = nxt
        if t in BOUNDARY:
            prog = 0
    return cnt


def machine_win_brute(evs, pat, span):
    """INDEPENDENT windowed reformulation (r16 ADVICE: machine_win above
    is a direct port of stepT, so oracle agreement validated translation
    only). This is the O(n^2) attempt enumeration derived from the
    dialect-tier prose: per segment, take the earliest first-element
    occurrence at/after the scan position as the attempt start; walk
    forward matching needed elements while each arriving event is within
    span of the start; completion counts and resumes AFTER it; an event
    beyond the span kills the attempt BEFORE participating and scanning
    resumes AT it; a partial alive at segment end dies (non-backtracking:
    no later start in the segment is revisited)."""
    m = len(pat)
    segs, cur = [], []
    for e in evs:
        cur.append(e)
        if e[0] in BOUNDARY:
            segs.append(cur)
            cur = []
    segs.append(cur)
    total = 0
    for seg in segs:
        pos = 0
        while pos < len(seg):
            a = next((i for i in range(pos, len(seg)) if seg[i][0] == pat[0]),
                     None)
            if a is None:
                break
            first = seg[a][1]
            k, j = 1, a + 1
            completed = m == 1
            expired = False
            while not completed and not expired and j < len(seg):
                if seg[j][1] - first > span:
                    expired = True
                else:
                    if seg[j][0] == pat[k]:
                        k += 1
                        completed = k == m
                    j += 1
            if completed:
                total += 1
                pos = a + 1 if m == 1 else j
            elif expired:
                pos = j
            else:
                break  # partial alive at segment end
    return total


def machine_win_quant(evs, blocks, span):
    """Windowed x quantified (r18): the block-DP prose enumeration —
    attempts tracked as (block index, count-in-block) states, the
    leftmost-attempt anchor as the span clock, expiry before the event
    participates — mirroring the Scala spec's bruteWindowedQuant (the
    prose-derived form, independent of the subset DFA the engine
    compiles). blocks: list of (chars, min, max|None)."""
    n_b = len(blocks)

    def max_of(bi):
        mx = blocks[bi][2]
        return 10 ** 9 if mx is None else mx

    def consume(st, ch):
        bi, cnt = st
        out = set()
        if cnt < max_of(bi) and ch in blocks[bi][0]:
            out.add((bi, cnt + 1))
        if cnt >= blocks[bi][1]:
            j = bi + 1
            while j < n_b:
                if ch in blocks[j][0] and max_of(j) > 0:
                    out.add((j, 1))
                if blocks[j][1] != 0:
                    break
                j += 1
        return out

    def accepts(st):
        bi, cnt = st
        return (cnt >= blocks[bi][1]
                and all(blocks[k][1] == 0 for k in range(bi + 1, n_b)))

    segs, cur = [], []
    for e in evs:
        cur.append(e)
        if e[0] in BOUNDARY:
            segs.append(cur)
            cur = []
    segs.append(cur)
    total = 0
    for seg in segs:
        anchor, states = None, set()
        for ch, tsu in seg:
            if anchor is not None and tsu - anchor > span:
                anchor, states = None, set()
            nxt = set()
            for st in states | {(0, 0)}:
                nxt |= consume(st, ch)
            if any(accepts(s) for s in nxt):
                total += 1
                anchor, states = None, set()
            elif not nxt:
                anchor, states = None, set()
            else:
                if anchor is None:
                    anchor = tsu
                states = nxt
    return total


def quant_regex(evs, lazy_re):
    """Quantified-contiguous reference via Python's re engine — an
    INDEPENDENT formulation (lazy non-overlapping scan), not a port of
    the Scala subset-DFA. Contiguous matches contain only pattern chars
    (compile forbids non-final boundary elements), so no segment
    handling is needed: a boundary char breaks adjacency like any
    non-pattern char."""
    return len(re.findall(lazy_re, "".join(t for t, _ in evs)))


PATTERNS = {
    "vp": lambda e: machine_sub(e, "vp"),
    "vcp": lambda e: machine_sub(e, "vcp"),
    "cv": lambda e: machine_sub(e, "cv"),
    "vp_w30": lambda e: machine_win(e, "vp", SPAN_US),
    "vv_adj": lambda e: machine_contig(e, "vv"),
    "vvc_q": lambda e: quant_regex(e, r"v{2,}?c"),
    "vva_alt": lambda e: quant_regex(e, r"v{2}[cp]"),
    "vvc_qw": lambda e: machine_win_quant(
        e, [("v", 2, None), ("c", 1, 1)], QSPAN_US),
}


def main():
    out_dir = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["q_window_pattern"]
    rnd = random.Random(20260815)
    alphabet = "vcpesx"
    fails = 0
    for r in range(rounds):
        rows = []
        for u in range(rnd.randint(1, 12)):
            tsu = 1_700_000_000_000_000
            for i in range(rnd.randint(0, 150)):
                # gaps cluster around the span so both windowed sides
                # occur; 1-in-6 zero gaps exercise (ts, event_id) ties
                gap = 0 if rnd.random() < 0.17 else rnd.randint(1, 2 * SPAN_US)
                # a fifth of gaps stretch toward the LONG quantified span
                # so vvc_qw's 24h window sees both sides too (r18)
                if rnd.random() < 0.20:
                    gap = rnd.randint(SPAN_US, 2 * QSPAN_US)
                # occasionally land EXACTLY on a span boundary
                if rnd.random() < 0.05:
                    gap = SPAN_US
                if rnd.random() < 0.05:
                    gap = QSPAN_US
                tsu += gap
                rows.append((u, i, tsu, rnd.choice(alphabet)))
        con = duckdb.connect()
        con.execute("""CREATE TABLE events AS
          SELECT user_id, event_id, make_timestamp(tsu) AS ts,
                 t || '___' AS event_type
          FROM (SELECT * FROM (VALUES {}) v(user_id, event_id, tsu, t))"""
          .format(",".join(f"({u},{i},{tsu},'{t}')" for u, i, tsu, t in rows))
          if rows else
          """CREATE TABLE events (user_id BIGINT, event_id BIGINT,
             ts TIMESTAMP, event_type VARCHAR)""")
        got = {(u, p): n for u, p, n in con.execute(sql).fetchall()}
        # expected from the python machines
        by_user = {}
        for u, i, tsu, t in sorted(rows, key=lambda x: (x[0], x[2], x[1])):
            by_user.setdefault(u, []).append((t, tsu))
        want = {}
        for u, evs in by_user.items():
            # python-side crosscheck: the stepT port and the independent
            # prose-derived enumeration must agree before either is used
            # as the oracle's expectation
            assert machine_win(evs, "vp", SPAN_US) == \
                machine_win_brute(evs, "vp", SPAN_US), \
                f"user {u}: stepT port != brute attempt enumeration"
            for name, fn in PATTERNS.items():
                n = fn(evs)
                if n > 0:
                    want[(u, name)] = n
        if got != want:
            fails += 1
            diff = {k: (want.get(k), got.get(k))
                    for k in set(want) | set(got) if want.get(k) != got.get(k)}
            print(f"round {r}: MISMATCH {dict(list(diff.items())[:5])}")
    print(f"{rounds} rounds, {fails} mismatching" if fails
          else f"OK: {rounds} random tables, all (user, pattern) counts match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
