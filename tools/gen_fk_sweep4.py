"""sweep-43 generator: randomized differential over EXECUTED ON UPDATE
referential actions (r17 late batch) — CASCADE (incl. a natural-key
2-level chain up.id -> uc.pid(PK) -> ug.cpid and a self-referencing
tree), SET NULL (incl. NOT NULL -> 23502), SET DEFAULT (incl. the
default key vanishing -> 23503), a NO ACTION blocker, UPDATE...FROM
arms, and interleaved inserts/deletes. State dumps after every
key-rewriting wave."""
import random
random.seed(434343)
out = []
def s(x): out.append(x)

for t in ("ug", "ux", "un", "unn", "ud", "ut", "uc", "up", "usrc"):
    s(f"DROP TABLE IF EXISTS {t}")
s("CREATE TABLE up (id int PRIMARY KEY, v int)")
# natural-key chain: uc's PK IS the FK, so a cascaded pid change
# re-fires ug's ON UPDATE CASCADE (true 2-level)
s("CREATE TABLE uc (pid int PRIMARY KEY REFERENCES up(id) ON UPDATE CASCADE, w int)")
s("CREATE TABLE ug (id int PRIMARY KEY, "
  "cpid int REFERENCES uc(pid) ON UPDATE CASCADE, z int)")
s("CREATE TABLE ux (id int PRIMARY KEY, pid int REFERENCES up(id))")
s("CREATE TABLE un (id int PRIMARY KEY, "
  "pid int REFERENCES up(id) ON UPDATE SET NULL, t int)")
s("CREATE TABLE unn (id int PRIMARY KEY, "
  "pid int NOT NULL REFERENCES up(id) ON UPDATE SET NULL)")
s("CREATE TABLE ud (id int PRIMARY KEY, "
  "pid int DEFAULT 1 REFERENCES up(id) ON UPDATE SET DEFAULT)")
s("CREATE TABLE ut (id int PRIMARY KEY, boss int REFERENCES ut(id) ON UPDATE CASCADE)")
s("CREATE TABLE usrc (k int, m int)")

for i in range(14):
    s(f"INSERT INTO up VALUES ({i}, {i * 2})")
for i in range(0, 14, 2):
    s(f"INSERT INTO uc VALUES ({i}, {i % 5})")
for i in range(10):
    s(f"INSERT INTO ug VALUES ({i}, {(i * 2) % 14 - (i * 2) % 14 % 2}, {i})")
for i in range(4):
    s(f"INSERT INTO ux VALUES ({i}, {(i * 3) % 14})")
for i in range(8):
    s(f"INSERT INTO un VALUES ({i}, {i % 14}, {i})")
for i in range(6):
    s(f"INSERT INTO ud VALUES ({i}, {(i * 5) % 14})")
s("INSERT INTO ut VALUES (0, NULL), (1, 0), (2, 0), (3, 1), (4, 3)")
for i in range(6):
    s(f"INSERT INTO usrc VALUES ({i}, {(i * 7) % 20})")

def dump(tabs=("up", "uc", "ug", "ux", "un", "ud", "ut")):
    for t in tabs:
        s(f"? {t}")

dump()
for i in range(70):
    r = random.randrange(1000)
    op = random.randrange(12)
    if op in (0, 1, 2):
        # the headline: PK rewrite fires CASCADE chain + SET NULL +
        # SET DEFAULT; 23503 when a ux row still references the key;
        # 23505 when the new key collides
        s(f"UPDATE up SET id = {20 + r % 30} WHERE id = {r % 25}")
    elif op == 3:
        # multi-row key shift (whole wave in one statement)
        s(f"UPDATE up SET id = id + 40 WHERE v >= {r % 24} AND v < {r % 24 + 4}")
    elif op == 4:
        # UPDATE...FROM arm rewriting the key from a join
        s(f"UPDATE up SET id = s.m + 25 FROM usrc s "
          f"WHERE up.id = s.k + {r % 5}")
    elif op == 5:
        # self-referencing CASCADE: renumber a tree node
        s(f"UPDATE ut SET id = {10 + r % 20} WHERE id = {r % 10}")
    elif op == 6:
        # non-key update: actions must NOT fire
        s(f"UPDATE up SET v = {r} WHERE id = {r % 30}")
    elif op == 7:
        s(f"INSERT INTO up VALUES ({r % 35}, {r % 24})")
    elif op == 8:
        s(f"INSERT INTO un VALUES ({8 + i}, {r % 35}, {r})")
        s(f"INSERT INTO ud VALUES ({6 + i}, {r % 35})")
    elif op == 9:
        s(f"INSERT INTO ux VALUES ({4 + i}, {r % 35})")
    elif op == 10:
        s(f"DELETE FROM ux WHERE id = {r % 20}")
    else:
        s(f"INSERT INTO uc VALUES ({r % 35}, {r % 5})")
    if op <= 5:
        dump()

# deterministic codas
s("DELETE FROM ux")                      # disarm the NO ACTION blocker
s("INSERT INTO up VALUES (90, 90) ON CONFLICT (id) DO NOTHING")
s("INSERT INTO unn VALUES (1, 90)")
s("UPDATE up SET id = 91 WHERE id = 90") # SET NULL on NOT NULL -> 23502
s("? unn")
s("DELETE FROM unn")
s("INSERT INTO up VALUES (1, 1) ON CONFLICT (id) DO NOTHING")
s("INSERT INTO ud VALUES (95, 1)")
s("UPDATE up SET id = 92 WHERE id = 1")  # SET DEFAULT to 1 while 1 vanishes -> 23503
s("? up"); s("? ud")
s("INSERT INTO up VALUES (1, 1) ON CONFLICT (id) DO NOTHING")
s("INSERT INTO up VALUES (5, 5) ON CONFLICT (id) DO NOTHING")
s("INSERT INTO ud VALUES (96, 5)")
s("UPDATE up SET id = 93 WHERE id = 5")  # SET DEFAULT -> 1 (exists) succeeds
s("? ud")
s(">UPDATE up SET id = 94 WHERE id = 93 RETURNING id, v")
dump()
for t in ("ug", "ux", "un", "unn", "ud", "ut", "uc", "up", "usrc"):
    s(f"DROP TABLE {t}")
open("src/test/resources/dml/script13.sql", "w").write("\n".join(out) + "\n")
print(len(out), "statements")
