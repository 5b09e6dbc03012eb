"""sweep-45 generator: nondeterministic SET on a referenced key under
executed ON UPDATE referential actions (r18 — the arm that stayed
0A000 through r17). nextval()/DEFAULT-serial SETs on parent PKs with
CASCADE / SET NULL / SET DEFAULT children, single-row WHERE matches
only (pg assigns drawn values in heap order; a multi-row draw's
row-to-value mapping is engine-specific, so the differential pins the
single-row shape plus multi-row COUNTS via setval parity probes).
Replay via pg_capture_txn.py (sequence state must persist in one
session)."""
import random
random.seed(454545)
out = []
def s(x): out.append(x)

for t in ("nc", "nn", "nd", "np"):
    s(f"DROP TABLE IF EXISTS {t}")
s("DROP SEQUENCE IF EXISTS nseq")
s("CREATE SEQUENCE nseq START 100")
s("CREATE TABLE np (id int PRIMARY KEY, v int)")
s("CREATE TABLE nc (id int PRIMARY KEY, "
  "pid int REFERENCES np(id) ON UPDATE CASCADE)")
s("CREATE TABLE nn (id int PRIMARY KEY, "
  "pid int REFERENCES np(id) ON UPDATE SET NULL, t int)")
s("CREATE TABLE nd (id int PRIMARY KEY, "
  "pid int DEFAULT 1 REFERENCES np(id) ON UPDATE SET DEFAULT)")

for i in range(10):
    s(f"INSERT INTO np VALUES ({i}, {i})")
for i in range(6):
    s(f"INSERT INTO nc VALUES ({i}, {(i * 3) % 10})")
for i in range(5):
    s(f"INSERT INTO nn VALUES ({i}, {(i * 2) % 10}, {i})")
for i in range(4):
    s(f"INSERT INTO nd VALUES ({i}, {(i * 7) % 10})")

def dump():
    for t in ("np", "nc", "nn", "nd"):
        s(f"? {t}")
    s("! SELECT last_value, is_called FROM nseq")

dump()
known = list(range(10))
for i in range(40):
    r = random.randrange(1000)
    op = random.randrange(8)
    if op in (0, 1, 2):
        # the headline: single-row nextval rewrite of a referenced PK
        # — CASCADE copies the drawn value into nc, SET NULL nulls nn,
        # SET DEFAULT re-points nd at 1 (23503 when 1 has moved away)
        tgt = random.choice(known)
        s(f"UPDATE np SET id = nextval('nseq') WHERE id = {tgt}")
        dump()
    elif op == 3:
        # setval: cross-engine sequence-state probe + repositioning
        s(f"! SELECT setval('nseq', {200 + i * 10})")
    elif op == 4:
        s(f"INSERT INTO np VALUES ({400 + i}, {r})")
        known.append(400 + i)
    elif op == 5:
        s(f"INSERT INTO nc VALUES ({100 + i}, {random.choice(known)})")
    elif op == 6:
        # RETURNING carries the drawn value (row-aligned projection)
        tgt = random.choice(known)
        s(f">UPDATE np SET id = nextval('nseq'), v = v + 1 "
          f"WHERE id = {tgt} RETURNING id, v")
        dump()
    else:
        s(f"UPDATE nn SET t = t + 1 WHERE id = {r % 5}")
    # track: after a nextval rewrite the old key is gone; refresh the
    # known set from a deterministic coda occasionally
    if op in (0, 1, 2, 6):
        known = [k for k in known]  # values unknown to the generator:
        # re-seed with a fresh insert so later updates still match
        s(f"INSERT INTO np VALUES ({500 + i}, 0) ON CONFLICT (id) DO NOTHING")
        known.append(500 + i)

# deterministic codas
s("INSERT INTO np VALUES (1, 1) ON CONFLICT (id) DO NOTHING")
s("INSERT INTO nd VALUES (90, 1)")
s("! SELECT setval('nseq', 900)")
s("UPDATE np SET id = nextval('nseq') WHERE id = 1")  # default key 1 vanishes -> 23503
s("? np"); s("? nd")
s("INSERT INTO np VALUES (1, 1) ON CONFLICT (id) DO NOTHING")
s("UPDATE np SET id = nextval('nseq') WHERE id = 1")  # now cascades clean
dump()

print("\n".join(out))
