#!/usr/bin/env python3
"""Retire the round(quotient, k) cross-engine defect class.

Scans Scala sources for `round(EXPR, k)` call sites, classifies each as
code-context (Spark Column API) or string-context (SQL text destined for
Spark expr() or the DuckDB oracle), and rewrites:

  code   round(E, 6) -> round6(E)          (graft.ops.Exact helpers)
  code   round(E, 9) -> round9(E)
  string round(E, 6) -> floor(CAST((E) AS DOUBLE)*1000000 + 0.5)/1000000
  string round(E, 9) -> floor(CAST((E) AS DOUBLE)*1000000000 + 0.5)/1000000000

floor of an exactly-computed double then float-division by a power of ten
is the same IEEE op sequence in Spark and DuckDB, so the two engines can
never split on a terminating-quotient half-way decimal (the text_bigram_lm
defect class, BENCH_DELTA risk register).

Usage: retire_round.py report|apply file...
"""
import re
import sys


def scan_sites(src):
    """Yield (start, end, arg, k, ctx) for each round( call. ctx is 'code'
    or 'str'. Tracks Scala string/comment state character-by-character."""
    sites = []
    i, n = 0, len(src)
    state = 'code'  # code | line_comment | block_comment | str | tstr
    while i < n:
        c = src[i]
        if state == 'code':
            if src.startswith('//', i):
                state = 'line_comment'; i += 2; continue
            if src.startswith('/*', i):
                state = 'block_comment'; i += 2; continue
            if src.startswith('"""', i):
                state = 'tstr'; i += 3; continue
            if c == '"':
                state = 'str'; i += 1; continue
        elif state == 'line_comment':
            if c == '\n':
                state = 'code'
            i += 1; continue
        elif state == 'block_comment':
            if src.startswith('*/', i):
                state = 'code'; i += 2; continue
            i += 1; continue
        elif state == 'str':
            if c == '\\':
                i += 2; continue
            if c == '"':
                state = 'code'; i += 1; continue
            if not src.startswith('round(', i):
                i += 1; continue
        elif state == 'tstr':
            if src.startswith('"""', i):
                state = 'code'; i += 3; continue
            if not src.startswith('round(', i):
                i += 1; continue

        if state in ('code', 'str', 'tstr') and src.startswith('round(', i):
            prev = src[i - 1] if i > 0 else ' '
            if re.match(r'[A-Za-z0-9_.]', prev):
                i += 1; continue
            # parse balanced parens from the (
            j = i + len('round(')
            depth = 1
            args, cur = [], []
            instr = None
            while j < n and depth > 0:
                ch = src[j]
                if instr:
                    if ch == '\\' and instr == '"':
                        cur.append(src[j:j + 2]); j += 2; continue
                    if ch == instr:
                        instr = None
                    cur.append(ch); j += 1; continue
                if ch in ('"', "'") and state == 'code':
                    instr = ch; cur.append(ch); j += 1; continue
                if ch == "'" and state in ('str', 'tstr'):
                    # SQL single-quoted literal inside the outer Scala string
                    instr = ch; cur.append(ch); j += 1; continue
                if ch == '(':
                    depth += 1
                elif ch == ')':
                    depth -= 1
                    if depth == 0:
                        j += 1; break
                elif ch == ',' and depth == 1:
                    args.append(''.join(cur)); cur = []; j += 1; continue
                cur.append(ch); j += 1
            args.append(''.join(cur))
            ctx = 'code' if state == 'code' else 'str'
            k = args[-1].strip() if len(args) > 1 else None
            sites.append((i, j, args, k, ctx))
            i = j; continue
        i += 1
    return sites


SQL_TMPL = {
    '6': 'floor(CAST(({e}) AS DOUBLE)*1000000 + 0.5)/1000000',
    '9': 'floor(CAST(({e}) AS DOUBLE)*1000000000 + 0.5)/1000000000',
}
CODE_TMPL = {'6': 'round6({e})', '9': 'round9({e})'}


def main():
    mode = sys.argv[1]
    for path in sys.argv[2:]:
        src = open(path).read()
        sites = scan_sites(src)
        out, pos, nrep, skipped = [], 0, 0, []
        for (s, e, args, k, ctx) in sites:
            line = src[:s].count('\n') + 1
            if len(args) != 2 or k not in ('6', '9'):
                skipped.append((line, ctx, k, src[s:e][:60]))
                continue
            arg = args[0].strip()
            tmpl = CODE_TMPL[k] if ctx == 'code' else SQL_TMPL[k]
            rep = tmpl.format(e=arg)
            if mode == 'report':
                print(f"{path}:{line} {ctx} k={k} {arg[:70]!r}")
            out.append(src[pos:s]); out.append(rep); pos = e; nrep += 1
        out.append(src[pos:])
        for (line, ctx, k, frag) in skipped:
            print(f"SKIP {path}:{line} {ctx} k={k} {frag!r}")
        if mode == 'apply':
            open(path, 'w').write(''.join(out))
            print(f"{path}: {nrep} rewritten, {len(skipped)} skipped")


if __name__ == '__main__':
    main()
