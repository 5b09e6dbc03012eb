#!/usr/bin/env python3
"""Replay a PgDmlDiffTool script against live PostgreSQL and emit the
same dump format, for capturing differential fixtures.

Script lines:
  <sql>      execute, print `TAG <command tag>` or `TAG ERR <sqlstate>`
  ?<table>   print `STATE <table> <n>` + sorted `|`-joined rows
  !<query>   print `Q <n>` + sorted rows (or `Q ERR <sqlstate>`)
  ><sql>     execute a row-returning statement (RETURNING): print
             `ROWS <n>` + sorted rows + `TAG <tag>`

Usage: pg_capture.py script.sql out.txt  [connects to localhost:5432
as postgres, password from PGPASSWORD or 'postgres']
"""
import os
import subprocess
import sys


def psql(stmt, tuples_only):
    # VERBOSITY verbose on the FIRST execution so a failure's SQLSTATE
    # is harvested without re-running the statement — re-execution
    # (the old verbose_code fallback) double-burned sequence draws in
    # failing statements with serial DEFAULTs, corrupting every
    # subsequent serial value in the fixture
    args = ["psql", "-h", os.environ.get("PGHOST", "localhost"),
            "-U", os.environ.get("PGUSER", "postgres"), "-X", "-A",
            "-P", "null=\\N", "-P", "footer=off",
            "-c", "\\set VERBOSITY verbose"]
    if tuples_only:
        args.append("-t")
    args += ["-c", stmt]
    env = dict(os.environ)
    env.setdefault("PGPASSWORD", "postgres")
    return subprocess.run(args, capture_output=True, text=True, env=env)


def stderr_code(p):
    for line in p.stderr.splitlines():
        if line.startswith("ERROR:  ") and len(line) > 13 and line[13] == ":":
            return line[8:13]
    return "?????"


def main():
    script, outpath = sys.argv[1], sys.argv[2]
    out = []
    for raw in open(script, encoding="utf-8"):
        line = raw.rstrip("\n")
        if not line.strip():
            continue
        if line.startswith("?") or line.startswith("!"):
            q = ("SELECT * FROM " + line[1:].strip()) if line.startswith("?") \
                else line[1:].strip()
            p = psql(q, tuples_only=True)
            head = "STATE " + line[1:].strip() if line.startswith("?") else "Q"
            if p.returncode != 0 or "ERROR:" in p.stderr:
                out.append(f"{head} ERR {stderr_code(p)}")
                continue
            rows = sorted(r for r in p.stdout.splitlines() if r != "")
            out.append(f"{head} {len(rows)}")
            out.extend(rows)
        elif line.startswith(">"):
            stmt = line[1:].strip()
            p = psql(stmt, tuples_only=False)
            if p.returncode != 0 or "ERROR:" in p.stderr:
                out.append(f"ROWS ERR {stderr_code(p)}")
                continue
            lines = [r for r in p.stdout.splitlines() if r != ""]
            # unaligned, footer off: header, rows..., command tag
            tag = lines[-1]
            rows = sorted(lines[1:-1])
            out.append(f"ROWS {len(rows)}")
            out.extend(rows)
            out.append(f"TAG {tag}")
        else:
            p = psql(line, tuples_only=False)
            if p.returncode != 0 or "ERROR:" in p.stderr:
                out.append(f"TAG ERR {stderr_code(p)}")
                continue
            lines = [r for r in p.stdout.splitlines() if r != ""]
            out.append(f"TAG {lines[-1] if lines else 'OK'}")
    with open(outpath, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")


if __name__ == "__main__":
    main()
