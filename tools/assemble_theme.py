#!/usr/bin/env python3
"""Assemble a NEW theme module from extract_theme.py cut files.
Usage: assemble_theme.py <out.scala> <header.txt> <cut1> <cut2> ...
header.txt = package+imports+scaladoc+`object X {` opening."""
import re
import sys

out, header_path = sys.argv[1], sys.argv[2]
cuts = sys.argv[3:]
members, qentries, oentries = [], [], []
for path in cuts:
    text = open(path).read()
    m = re.split(r"// ====== CUT MEMBERS ======\n", text)[1]
    mem, rest = re.split(r"// ====== QUERIES ENTRIES ======\n", m)
    q, o = re.split(r"// ====== ORACLES ENTRIES ======\n", rest)
    if mem.strip():
        members.append(mem.rstrip())
    qentries.extend([l.rstrip().rstrip(",") for l in q.strip().split("\n") if l.strip()])
    ob = o.strip().rstrip(",")
    if ob:
        oentries.append(ob)

header = open(header_path).read().rstrip() + "\n"
body = "\n\n".join(members)
qlines = ",\n    ".join(qentries)
qmap = ("  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n    "
        + qlines + ")")
omap = "  val oracles: Map[String, String] = Map(\n    " + ",\n    ".join(oentries) + ")"
text = (header + "\n" + body
        + "\n\n  // ------------------------------------------------------------ registry\n\n"
        + qmap + "\n\n" + omap + "\n}\n")
open(out, "w").write(text)
print("written", out, len(text.split(chr(10))), "lines,", len(qentries), "keys")
