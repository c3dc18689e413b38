#!/usr/bin/env python3
"""Append cut members + registry entries from extract_theme.py cut files
into an EXISTING theme module: members are inserted before the module's
`val queries` declaration, and the queries/oracles Map literals gain the
cut entries. Companion to extract_theme.py (ExtrasN retirement)."""
import re
import sys

sys.path.insert(0, "tools")
from extract_theme import find_map


def parse_cut(path):
    text = open(path).read()
    m = re.split(r"// ====== CUT MEMBERS ======\n", text)[1]
    mem, rest = re.split(r"// ====== QUERIES ENTRIES ======\n", m)
    q, o = re.split(r"// ====== ORACLES ENTRIES ======\n", rest)
    qentries = [l.rstrip().rstrip(",") for l in q.strip().split("\n") if l.strip()]
    ob = o.strip().rstrip(",")
    oentries = [ob] if ob else []
    return mem.rstrip(), qentries, oentries


def add_entries(src, val_name, entries):
    if not entries:
        return src
    found = find_map(src, val_name)
    assert found, f"no {val_name} map found"
    start, open_end, existing, close_idx = found
    allent = existing + entries
    body = ",\n    ".join(allent)
    head = src[:open_end]
    return head + "\n    " + body + ")" + src[close_idx + 1:]


def main():
    target = sys.argv[1]
    cutfiles = sys.argv[2:]
    src = open(target).read()
    members, qents, oents = [], [], []
    for cf in cutfiles:
        m, q, o = parse_cut(cf)
        members.append(m)
        qents.extend(q)
        oents.extend(o)
    # insert members before the `val queries` declaration line
    m = re.search(r"\n  (?:private(?:\[\w+\])? )?(?:lazy )?val queries\b", src)
    assert m, "no queries val"
    ins = m.start() + 1
    # back up over any preceding comment/separator lines tied to the registry
    lines_before = src[:ins]
    block = "\n".join(members) + "\n\n"
    src = lines_before + block + src[ins:]
    src = add_entries(src, "queries", qents)
    src = add_entries(src, "oracles", oents)
    open(target, "w").write(src)
    print(f"appended {len(members)} member blocks, {len(qents)} query entries into {target}")


if __name__ == "__main__":
    main()
