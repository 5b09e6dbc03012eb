#!/usr/bin/env python3
"""Replay a PgDmlDiffTool script against live PostgreSQL IN ONE
SESSION and emit the same dump format as pg_capture.py.

pg_capture.py spawns one psql per statement — fine for autocommit
sweeps, useless for transaction scripts (BEGIN dies with its psql).
This tool drives a single long-lived psql over pipes; after every
statement it echoes a sentinel carrying psql's :SQLSTATE variable, so
errors are harvested without re-execution (no sequence double-burn)
and session state (transaction blocks, SET CONSTRAINTS, savepoints)
persists across the whole script.

Script lines (same grammar as pg_capture.py):
  <sql>      execute, print `TAG <command tag>` or `TAG ERR <sqlstate>`
  ?<table>   print `STATE <table> <n>` + sorted `|`-joined rows
  !<query>   print `Q <n>` + sorted rows (or `Q ERR <sqlstate>`)
  ><sql>     row-returning statement: `ROWS <n>` + sorted rows + `TAG <tag>`

Usage: pg_capture_txn.py script.sql out.txt
"""
import os
import subprocess
import sys
import tempfile


def main():
    script, outpath = sys.argv[1], sys.argv[2]
    env = dict(os.environ)
    env.setdefault("PGPASSWORD", "postgres")
    errf = tempfile.TemporaryFile()
    p = subprocess.Popen(
        ["psql", "-h", env.get("PGHOST", "localhost"),
         "-U", env.get("PGUSER", "postgres"), "-X", "-A",
         "-P", "null=\\N", "-P", "footer=off"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=errf,
        text=True, env=env)

    seq = [0]

    def run(stmt):
        """Execute one statement; return (lines_before_sentinel, sqlstate)."""
        seq[0] += 1
        mark = f"__GRAFT_{seq[0]}__"
        p.stdin.write(stmt.rstrip(";") + ";\n")
        p.stdin.write(f"\\echo {mark} :SQLSTATE\n")
        p.stdin.flush()
        lines = []
        while True:
            line = p.stdout.readline()
            if not line:
                raise RuntimeError("psql died")
            line = line.rstrip("\n")
            if line.startswith(mark):
                state = line.split()[-1]
                return lines, state
            lines.append(line)

    out = []
    for raw in open(script, encoding="utf-8"):
        line = raw.rstrip("\n")
        if not line.strip():
            continue
        if line.startswith("?") or line.startswith("!"):
            q = ("SELECT * FROM " + line[1:].strip()) if line.startswith("?") \
                else line[1:].strip()
            head = "STATE " + line[1:].strip() if line.startswith("?") else "Q"
            lines, state = run(q)
            if state != "00000":
                out.append(f"{head} ERR {state}")
                continue
            rows = sorted(r for r in lines[1:] if r != "")  # drop header
            out.append(f"{head} {len(rows)}")
            out.extend(rows)
        elif line.startswith(">"):
            lines, state = run(line[1:].strip())
            if state != "00000":
                out.append(f"ROWS ERR {state}")
                continue
            body = [r for r in lines if r != ""]
            tag = body[-1]
            rows = sorted(body[1:-1])
            out.append(f"ROWS {len(rows)}")
            out.extend(rows)
            out.append(f"TAG {tag}")
        else:
            lines, state = run(line)
            if state != "00000":
                out.append(f"TAG ERR {state}")
                continue
            tag = next((r for r in reversed(lines) if r.strip()), "OK")
            out.append(f"TAG {tag}")
    p.stdin.close()
    p.wait()
    with open(outpath, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")


if __name__ == "__main__":
    main()
