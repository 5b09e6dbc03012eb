"""sweep-42 generator: randomized differential over EXECUTED ON DELETE
referential actions (r17) — CASCADE (incl. 2-level chains, a NO ACTION
grandchild behind a CASCADE child, and a self-referencing tree),
SET NULL (incl. a NOT NULL column -> 23502), SET DEFAULT (incl. the
default key vanishing -> 23503), mixed with inserts and DELETE...USING.
State dumps after every destructive wave."""
import random
random.seed(424242)
out = []
def s(x): out.append(x)

for t in ("fx", "fg", "fc", "fn", "fnn", "fd", "ft", "fp", "fsrc"):
    s(f"DROP TABLE IF EXISTS {t}")
s("CREATE TABLE fp (id int PRIMARY KEY, v int)")
s("CREATE TABLE fc (id int PRIMARY KEY, "
  "pid int REFERENCES fp(id) ON DELETE CASCADE, w int)")
s("CREATE TABLE fg (id int PRIMARY KEY, "
  "cid int REFERENCES fc(id) ON DELETE CASCADE, z int)")
s("CREATE TABLE fx (id int PRIMARY KEY, cid int REFERENCES fc(id))")
s("CREATE TABLE fn (id int PRIMARY KEY, "
  "pid int REFERENCES fp(id) ON DELETE SET NULL, t int)")
s("CREATE TABLE fnn (id int PRIMARY KEY, "
  "pid int NOT NULL REFERENCES fp(id) ON DELETE SET NULL)")
s("CREATE TABLE fd (id int PRIMARY KEY, "
  "pid int DEFAULT 1 REFERENCES fp(id) ON DELETE SET DEFAULT)")
s("CREATE TABLE ft (id int PRIMARY KEY, "
  "mgr int REFERENCES ft(id) ON DELETE CASCADE)")
s("CREATE TABLE fsrc (k int, m int)")

def seed():
    for i in range(12):
        s(f"INSERT INTO fp VALUES ({i}, {i * 2})")
    for i in range(16):
        s(f"INSERT INTO fc VALUES ({i}, {i % 12}, {i % 4})")
    for i in range(20):
        s(f"INSERT INTO fg VALUES ({i}, {i % 16}, {i})")
    for i in range(5):
        s(f"INSERT INTO fx VALUES ({i}, {(i * 3) % 16})")
    for i in range(8):
        s(f"INSERT INTO fn VALUES ({i}, {i % 12}, {i})")
    for i in range(6):
        s(f"INSERT INTO fd VALUES ({i}, {(i * 5) % 12})")
    # self-ref tree: 0 root; 1,2 under 0; 3,4 under 1; 5 under 3
    s("INSERT INTO ft VALUES (0, NULL), (1, 0), (2, 0), (3, 1), (4, 1), (5, 3)")
    for i in range(6):
        s(f"INSERT INTO fsrc VALUES ({i}, {(i * 7) % 12})")
seed()

def dump(tabs=("fp", "fc", "fg", "fx", "fn", "fd", "ft")):
    for t in tabs:
        s(f"? {t}")

dump()
for i in range(70):
    r = random.randrange(1000)
    op = random.randrange(12)
    if op in (0, 1):
        # the headline: parent delete fires CASCADE chains fp->fc->fg,
        # SET NULL on fn, SET DEFAULT on fd; blocked 23503 when a
        # cascaded fc row is still referenced by NO ACTION fx
        s(f"DELETE FROM fp WHERE id = {r % 14}")
    elif op == 2:
        # multi-row parent delete (whole wave in one statement)
        s(f"DELETE FROM fp WHERE v >= {r % 20} AND v < {r % 20 + 4}")
    elif op == 3:
        # DELETE...USING arm fires the same actions
        s(f"DELETE FROM fp USING fsrc s WHERE fp.id = s.m AND s.k = {r % 6}")
    elif op == 4:
        # self-referencing CASCADE subtree delete
        s(f"DELETE FROM ft WHERE id = {r % 7}")
    elif op == 5:
        # direct child delete cascades to fg, blocked by nothing
        s(f"DELETE FROM fc WHERE id = {r % 18}")
    elif op == 6:
        s(f"INSERT INTO fp VALUES ({r % 16}, {r % 20})")
    elif op == 7:
        s(f"INSERT INTO fc VALUES ({16 + i}, {r % 16}, {r % 4})")
    elif op == 8:
        s(f"INSERT INTO fg VALUES ({20 + i}, {r % 30}, {r})")
    elif op == 9:
        s(f"INSERT INTO fn VALUES ({8 + i}, {r % 16}, {r})")
        s(f"INSERT INTO fd VALUES ({6 + i}, {r % 16})")
    elif op == 10:
        # fx insert re-arms the NO ACTION blocker
        s(f"INSERT INTO fx VALUES ({5 + i}, {r % 25})")
    else:
        # fx delete disarms it
        s(f"DELETE FROM fx WHERE id = {r % 20}")
    if op <= 5:
        dump()

# deterministic codas
s("DELETE FROM fx")                     # disarm NO ACTION blocker
s("INSERT INTO fnn VALUES (1, 2)")      # NOT NULL SET NULL arm
s("DELETE FROM fp WHERE id = 2")        # -> 23502 (fnn.pid NOT NULL)
s("? fnn")
s("DELETE FROM fnn")
s("INSERT INTO fp VALUES (1, 999) ON CONFLICT (id) DO NOTHING")
s("INSERT INTO fd VALUES (90, 1), (91, 1)")
s("DELETE FROM fp WHERE id = 1")        # SET DEFAULT to 1 while deleting 1 -> 23503
s("? fp"); s("? fd")
s("INSERT INTO fp VALUES (1, 1)")
s("INSERT INTO fd VALUES (92, 3) ON CONFLICT (id) DO NOTHING")
s("INSERT INTO fp VALUES (3, 3) ON CONFLICT (id) DO NOTHING")
s("DELETE FROM fp WHERE id = 3")        # SET DEFAULT -> 1 (exists) succeeds
s("? fd")
s(">DELETE FROM fp WHERE id = 5 RETURNING id, v")  # RETURNING over a cascading delete
dump()
s("DELETE FROM ft WHERE id = 0")        # whole remaining tree
s("? ft")
for t in ("fx", "fg", "fc", "fn", "fnn", "fd", "ft", "fp", "fsrc"):
    s(f"DROP TABLE {t}")
open("src/test/resources/dml/script12.sql", "w").write("\n".join(out) + "\n")
print(len(out), "statements")
