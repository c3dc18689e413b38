#!/usr/bin/env python3
"""Rewrite `ExtrasN.<member>` references to `graft.operators.<Module>.<member>`
across src/ after a theme move. Members are qualified fully so no import
edits are needed. Usage:
  rewrite_refs.py <NewModule> <member1,member2,...>
"""
import re
import subprocess
import sys

module = sys.argv[1]
members = sys.argv[2].split(",")
pat = re.compile(
    r"(?:graft\.operators\.|operators\.)?Extras\d+\.(" + "|".join(map(re.escape, members)) + r")\b")
files = subprocess.check_output(
    ["grep", "-rl", "-E", r"Extras[0-9]+\.(" + "|".join(members) + r")\b",
     "src/"], text=True).split()
for f in files:
    s = open(f).read()
    s2 = pat.sub(r"graft.operators.%s.\1" % module, s)
    if s2 != s:
        open(f, "w").write(s2)
        print("rewrote", f)
