#!/usr/bin/env python3
"""CI guard: every bounded-work constant (member caps, probe widths)
that a query's Scala implementation uses must be ENCODED in that
query's oracle SQL — otherwise a fixture hot enough to make the cap
bind would silently diverge from the oracle (the qd8/qd9/qm3/qd13
treatment, now checked mechanically instead of by convention).

Method: parse src/main for `val <Name>Cap = <int>` / `val ProbeCells =
<int>` constants, split each source file into `def` bodies, propagate
cap references through same-package helper calls to a fixpoint, and
for every query name present in the oracle map require each referenced
constant's VALUE to appear as a number token in the rendered oracle
SQL (proves the interpolation, not just a comment mention).

Usage: python3 tools/check_caps.py [<verifyOutDir>]
  <verifyOutDir> must hold oracle_sql.json (default /tmp/verify01).
Exit 0 = green; 1 = a capped query's oracle lacks the cap value.
"""
import glob
import json
import os
import re
import sys


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify01"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "src", "main", "scala")
    sources = glob.glob(os.path.join(root, "**", "*.scala"), recursive=True)

    # constant name -> int value (caps, tuned probe widths, and the
    # index-layout multiplicity/probe constants the production search
    # queries pin — qs7's IndexAssign/SearchProbes)
    const_re = re.compile(r"val\s+(\w*Cap|ProbeCells|\w*Probes|\w*Assign)\s*=\s*(\d+)")
    consts = {}
    text_by_file = {}
    # strip comments before any scanning: a scaladoc block sits between
    # two defs and would otherwise be attributed to the PREVIOUS def's
    # body, and doc mentions of a cap ([[CellCap]]) are not uses.
    # Trailing // comments are stripped only on quote-free lines — the
    # oracle SQL strings use DuckDB's // integer division.
    def strip_comments(src: str) -> str:
        src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
        out = []
        for line in src.split("\n"):
            if line.lstrip().startswith("//"):
                out.append("")
            elif "//" in line and '"' not in line:
                out.append(line[:line.index("//")])
            else:
                out.append(line)
        return "\n".join(out)

    for path in sources:
        with open(path) as f:
            raw = f.read()
        text = strip_comments(raw)
        text_by_file[path] = text
        for name, val in const_re.findall(text):
            consts[name] = int(val)

    # (file, def name) -> body. A body ends at the next member
    # declaration (`def` or `val` at 2-space indent), so a file's
    # trailing oracle-map val never gets swallowed into the last def.
    # Scoped PER FILE: generic names (dot, main, apply, process) repeat
    # across files and a global map would cross-contaminate cap sets.
    def_re = re.compile(r"^  (?:private[^\n]*?\s)?def\s+(\w+)", re.M)
    member_re = re.compile(r"^  (?:private[^\n]*?\s)?(?:def|val|var)\s+\w+", re.M)
    ident = re.compile(r"\b(\w+)\b")
    caps_by_query = {}
    for path, text in text_by_file.items():
        boundaries = [m.start() for m in member_re.finditer(text)] + [len(text)]
        bodies = {}
        for m in def_re.finditer(text):
            end = min(b for b in boundaries if b > m.start())
            bodies.setdefault(m.group(1), "")
            bodies[m.group(1)] += text[m.start():end]
        caps = {name: {w for w in ident.findall(body) if w in consts}
                for name, body in bodies.items()}
        # fixpoint within the file: a def inherits the caps of every
        # same-file helper it mentions (cross-file cap use is always a
        # direct `Other.XxxCap` reference, caught by the direct scan)
        changed = True
        while changed:
            changed = False
            for name, body in bodies.items():
                for callee in set(ident.findall(body)):
                    if callee != name and callee in caps and not caps[callee] <= caps[name]:
                        caps[name] |= caps[callee]
                        changed = True
        for name, used in caps.items():
            if name in oracle and used:
                caps_by_query.setdefault(name, set()).update(used)

    failures = []
    checked = 0
    for qname, used in sorted(caps_by_query.items()):
        sql = oracle[qname]
        checked += 1
        sql_numbers = set(re.findall(r"\d+", sql))
        print(f"  {qname}: {', '.join(sorted(used))}")
        for cap in sorted(used):
            if str(consts[cap]) not in sql_numbers:
                failures.append((qname, cap, consts[cap]))
    for qname, cap, val in failures:
        print(f"FAIL {qname}: uses {cap}={val} but the oracle SQL "
              f"does not contain {val}")
    print(f"{checked} capped queries checked, {len(failures)} missing encodings")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
