#!/usr/bin/env python3
"""Theme-extraction helper for the ExtrasN retirement (VERDICT r10 #7).

Splits a graft operators file into top-level object members (separator
comment + scaladoc + definition), cuts named members and registry map
entries, and emits them for reassembly into a theme module. Pure text
surgery — the compiler + Verify/precheck gate every move.

Usage:
  extract_theme.py list <file>                  # show member map
  extract_theme.py cut <file> <m1,m2,..> [--keys k1,k2,..] [--apply]
      prints the cut member text to stdout; with --apply also rewrites
      <file> with the members and the named queries/oracles keys removed.
"""
import re
import sys

MEMBER_RE = re.compile(
    r"^  (?:@\w+\s+)?(?:private(?:\[\w+\])? |protected )?(?:lazy )?"
    r"(?:final )?(val|def|object|class|case class|type|var) ([A-Za-z0-9_]+)")
SEP_RE = re.compile(r"^  // -{6,}")
DOC_RE = re.compile(r"^  /\*\*")


def scan_strings(line, in_triple):
    """Return triple-quote state after this line (crude but fits the repo:
    triple quotes always appear as standalone \" tripled tokens)."""
    i = 0
    while True:
        j = line.find('"""', i)
        if j < 0:
            return in_triple
        in_triple = not in_triple
        i = j + 3


def parse_members(lines):
    """Yield (name, start, end) for each top-level member, where start
    includes the member's preceding separator/scaladoc/blank lines and
    end is exclusive. Lines inside triple-quoted strings never open a
    member."""
    members = []  # (name, def_line_idx)
    in_triple = False
    depth_brace = 0
    for idx, ln in enumerate(lines):
        if not in_triple and depth_brace <= 1:
            m = MEMBER_RE.match(ln)
            if m:
                members.append((m.group(2), idx))
        if not in_triple or '"""' in ln:
            pass
        in_triple = scan_strings(ln, in_triple)
        if not in_triple:
            # track braces outside strings, roughly: strip simple strings
            stripped = re.sub(r'"(?:\\.|[^"\\])*"', '', ln)
            stripped = re.sub(r"//.*", "", stripped)
            depth_brace += stripped.count("{") - stripped.count("}")
    # attach leading comment block to each member; end = next member's
    # leading-block start (or EOF)
    spans = []
    starts = []
    for name, didx in members:
        s = didx
        while s > 0:
            prev = lines[s - 1]
            if (prev.strip() == "" or SEP_RE.match(prev) or DOC_RE.match(prev)
                    or prev.lstrip().startswith("*") or prev.lstrip().startswith("*/")
                    or prev.lstrip().startswith("//")):
                s -= 1
            else:
                break
        # don't swallow leading blanks shared with previous member's tail
        while s < didx and lines[s].strip() == "":
            s += 1
        starts.append((name, s, didx))
    for i, (name, s, didx) in enumerate(starts):
        e = starts[i + 1][1] if i + 1 < len(starts) else len(lines)
        spans.append((name, s, e))
    return spans


def split_map_entries(text):
    """Given the text after 'Map(' up to its balanced close, yield raw
    entry strings split on depth-1 commas (string- and comment-aware)."""
    entries, buf = [], []
    depth = 1
    i = 0
    n = len(text)
    while i < n and depth > 0:
        c = text[i]
        if text.startswith('//', i):
            j = text.find('\n', i)
            if j < 0:
                j = n
            buf.append(text[i:j]); i = j; continue
        if text.startswith('"""', i):
            j = text.find('"""', i + 3)
            buf.append(text[i:j + 3]); i = j + 3; continue
        if c == '"':
            j = i + 1
            while j < n:
                if text[j] == '\\':
                    j += 2; continue
                if text[j] == '"':
                    break
                j += 1
            buf.append(text[i:j + 1]); i = j + 1; continue
        if c in '({[':
            depth += 1
        elif c in ')}]':
            depth -= 1
            if depth == 0:
                entries.append(''.join(buf)); break
        if c == ',' and depth == 1:
            entries.append(''.join(buf)); buf = []
        else:
            buf.append(c)
        i += 1
    return [e for e in (x.strip() for x in entries) if e], i  # i = idx of closing paren


def find_map(src, val_name):
    m = re.search(r"\n  (?:private(?:\[\w+\])? )?(?:lazy )?val %s\b" % val_name, src)
    if not m:
        return None
    mo = re.compile(r"=\s*Map\(").search(src, m.end())
    if not mo:
        return None
    open_end = mo.end()
    entries, close_off = split_map_entries(src[open_end:])
    return m.start(), open_end, entries, open_end + close_off


ENTRY_KEY_RE = re.compile(r'(?:\s*//[^\n]*\n)*\s*"([a-z0-9_]+)"\s*->')


def remove_keys_from_map(src, val_name, keys):
    found = find_map(src, val_name)
    if not found:
        return src, []
    start, open_end, entries, close_idx = found
    kept, taken = [], []
    for e in entries:
        km = ENTRY_KEY_RE.match(e)
        if km and km.group(1) in keys:
            taken.append(e)
        else:
            kept.append(e)
    if not taken:
        return src, []
    body = ",\n    ".join(kept)
    new_map = "Map(\n    " + body + ")" if kept else "Map()"
    head = src[:open_end - len("Map(")]
    return head + new_map + src[close_idx + 1:], taken


def main():
    cmd = sys.argv[1]
    path = sys.argv[2]
    src = open(path).read()
    lines = src.split("\n")
    spans = parse_members(lines)
    if cmd == "list":
        for name, s, e in spans:
            print(f"{name}\t{s + 1}\t{e}")
        return
    assert cmd == "cut"
    names = set(sys.argv[3].split(","))
    keys = set()
    apply = "--apply" in sys.argv
    for a in sys.argv[4:]:
        if a.startswith("--keys="):
            keys = set(a[len("--keys="):].split(","))
    cut_ranges = []
    seen = set()
    for name, s, e in spans:
        if name in names:
            cut_ranges.append((s, e))
            seen.add(name)
    missing = names - seen
    if missing:
        sys.stderr.write(f"MISSING members: {sorted(missing)}\n")
        sys.exit(1)
    cut_text = []
    for s, e in cut_ranges:
        cut_text.append("\n".join(lines[s:e]).rstrip() + "\n")
    remaining_lines = []
    cutset = set()
    for s, e in cut_ranges:
        cutset.update(range(s, e))
    for i, ln in enumerate(lines):
        if i not in cutset:
            remaining_lines.append(ln)
    new_src = "\n".join(remaining_lines)
    qtaken = otaken = []
    if keys:
        new_src, qtaken = remove_keys_from_map(new_src, "queries", keys)
        new_src, otaken = remove_keys_from_map(new_src, "oracles", keys)
    print("// ====== CUT MEMBERS ======")
    for t in cut_text:
        print(t)
    print("// ====== QUERIES ENTRIES ======")
    for e in qtaken:
        print(e + ",")
    print("// ====== ORACLES ENTRIES ======")
    for e in otaken:
        print(e + ",")
    if apply:
        open(path, "w").write(new_src)
        sys.stderr.write(f"applied: {path} rewritten\n")


if __name__ == "__main__":
    main()
