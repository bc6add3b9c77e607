#!/usr/bin/env python3
"""Retire the HALF_UP `round(·,6)` divergence class (VERDICT r15 task 1).

Rewrites every `round(EXPR, 6)` site in the given Scala sources to the
portable guarded floor form, in lockstep on both sides of each
query/oracle pair:

  - Scala code context  -> `r6(EXPR)` (graft.functions.Portable.r6)
  - string (SQL) context -> `CASE WHEN abs(EXPR) < 8.0e9
                             THEN floor((EXPR) * 1e6 + 0.5) / 1e6
                             ELSE (EXPR) END`  (Portable.r6Sql's expansion)

The state machine tracks Scala line/block comments (nested), single- and
triple-quoted strings, and char literals; matches inside comments are
left untouched. Balanced-paren argument matching honors quotes inside
the argument text. Only calls whose LAST top-level argument is exactly
`6` are rewritten; other scales (0/1/2/4) are out of the r15-fuzzed
divergence class and stay.

Usage: python3 tools/retire_round6.py file.scala [...]   (in place)
       add --dry-run to only print per-file counts.
"""
import re
import sys

IDENT = re.compile(r"[A-Za-z0-9_.]")


def regions(src: str):
    """Yield (start, end, kind) for comment/string regions; kind in
    {'line', 'block', 'str', 'triple', 'char'}."""
    i, n = 0, len(src)
    out = []
    while i < n:
        c = src[i]
        if src.startswith("//", i):
            j = src.find("\n", i)
            j = n if j < 0 else j
            out.append((i, j, "line"))
            i = j
        elif src.startswith("/*", i):
            depth, j = 1, i + 2
            while j < n and depth:
                if src.startswith("/*", j):
                    depth += 1
                    j += 2
                elif src.startswith("*/", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            out.append((i, j, "block"))
            i = j
        elif src.startswith('"""', i):
            j = src.find('"""', i + 3)
            # consume any extra trailing quotes (Scala allows """x"""")
            j = n if j < 0 else j + 3
            while j < n and src[j] == '"':
                j += 1
            out.append((i, j, "triple"))
            i = j
        elif c == '"':
            j = i + 1
            while j < n and src[j] != '"':
                j += 2 if src[j] == "\\" else 1
            out.append((i, j + 1, "str"))
            i = j + 1
        elif c == "'" and i + 2 < n and (
                src[i + 1] == "\\" and i + 3 < n and src[i + 3] == "'"
                or src[i + 1] != "\\" and src[i + 2] == "'"):
            j = i + (4 if src[i + 1] == "\\" else 3)
            out.append((i, j, "char"))
            i = j
        else:
            i += 1
    return out


def kind_at(regs, pos):
    for s, e, k in regs:
        if s <= pos < e:
            return k
    return "code"


def match_args(src: str, open_paren: int):
    """From src[open_paren]=='(', return (close_index, [top-level args])
    respecting nested parens and quoted text inside the arguments."""
    depth, i, n = 0, open_paren, len(src)
    args, start = [], open_paren + 1
    while i < n:
        c = src[i]
        if c in "\"'":
            q = c
            i += 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append(src[start:i])
                return i, args
        elif c == "," and depth == 1:
            args.append(src[start:i])
            start = i + 1
        i += 1
    raise ValueError(f"unbalanced parens at {open_paren}")


def rewrite(src: str):
    regs = regions(src)
    edits = []  # (start, end, replacement)
    skipped = []
    for m in re.finditer(r"\bround\(", src):
        k = kind_at(regs, m.start())
        if k in ("line", "block"):
            continue
        close, args = match_args(src, m.end() - 1)
        if len(args) < 2 or args[-1].strip() != "6":
            skipped.append((k, src[m.start():close + 1][:60]))
            continue
        inner = ", ".join(a.strip() for a in args[:-1])
        # normalize internal whitespace of multi-line SQL args
        if k in ("str", "triple"):
            e = re.sub(r"\s+", " ", inner).strip()
            rep = (f"CASE WHEN abs({e}) < 8.0e9 THEN floor(({e}) * 1e6"
                   f" + 0.5) / 1e6 ELSE ({e}) END")
        else:
            prev = src[m.start() - 1] if m.start() else " "
            if IDENT.match(prev):
                skipped.append(("qualified", src[m.start() - 10:close + 1][:60]))
                continue
            rep = f"r6({inner})"
        edits.append((m.start(), close + 1, rep))
    for s, e, rep in reversed(edits):
        src = src[:s] + rep + src[e:]
    n_code = sum(1 for s, e, r in edits if r.startswith("r6("))
    n_sql = len(edits) - n_code
    return src, n_code, n_sql, skipped


IMPORT = "import graft.functions.Portable.r6\n"


def ensure_import(src: str) -> str:
    if re.search(r"^import graft\.functions\.Portable", src, re.M):
        return src
    lines = src.split("\n")
    last_imp = max(i for i, l in enumerate(lines) if l.startswith("import"))
    lines.insert(last_imp + 1, IMPORT.rstrip("\n"))
    return "\n".join(lines)


def main():
    dry = "--dry-run" in sys.argv
    files = [a for a in sys.argv[1:] if not a.startswith("--")]
    for path in files:
        with open(path) as f:
            src = f.read()
        out, n_code, n_sql, skipped = rewrite(src)
        if n_code:
            out = ensure_import(out)
        print(f"{path}: {n_code} code + {n_sql} sql sites rewritten, "
              f"{len(skipped)} non-scale-6 left")
        for k, frag in skipped:
            if k == "qualified":
                print(f"  !! qualified call skipped: {frag}")
        if not dry and (n_code or n_sql):
            with open(path, "w") as f:
                f.write(out)


if __name__ == "__main__":
    main()
