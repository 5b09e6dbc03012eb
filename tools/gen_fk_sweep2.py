"""sweep-41d generator: randomized FK differential over the
UPDATE...FROM / DELETE...USING shapes (sweep-41c covers plain DML)."""
import random
random.seed(77177)
out = []
def s(x): out.append(x)
s("DROP TABLE IF EXISTS gkc")
s("DROP TABLE IF EXISTS gkp")
s("DROP TABLE IF EXISTS gsrc")
s("CREATE TABLE gkp (id int PRIMARY KEY, v int)")
s("CREATE TABLE gkc (id int PRIMARY KEY, pid int REFERENCES gkp (id), w int)")
s("CREATE TABLE gsrc (k int, nv int)")
for i in range(10):
    s(f"INSERT INTO gkp VALUES ({i}, {i * 3})")
for i in range(14):
    s(f"INSERT INTO gkc VALUES ({i}, {i % 10}, {i % 5})")
for i in range(8):
    s(f"INSERT INTO gsrc VALUES ({i}, {(i * 7) % 15})")
for i in range(90):
    r = random.randrange(1000)
    op = random.randrange(10)
    if op in (0, 1, 2):
        # child UPDATE...FROM: joined source drives pid (sometimes missing)
        s(f"UPDATE gkc SET pid = s.nv % 15 FROM gsrc s "
          f"WHERE gkc.id = s.k + {r % 7}")
    elif op in (3, 4):
        # parent DELETE...USING referencing children
        s(f"DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 "
          f"AND s.k = {r % 8}")
    elif op == 5:
        # parent UPDATE...FROM rewriting the referenced key
        s(f"UPDATE gkp SET id = s.nv % 18 FROM gsrc s "
          f"WHERE gkp.id = s.k + {r % 5}")
    elif op == 6:
        s(f"UPDATE gsrc SET nv = {r % 15} WHERE k = {r % 8}")
    elif op == 7:
        s(f"INSERT INTO gkp VALUES ({r % 18}, {r})")
    elif op == 8:
        s(f"INSERT INTO gkc VALUES ({14 + i}, {r % 14}, {r % 5})")
    else:
        s(f"DELETE FROM gkc USING gsrc s WHERE gkc.pid = s.nv % 12 "
          f"AND s.k = {r % 8} AND gkc.w = {r % 5}")
    if i % 8 == 7:
        s("? gkp"); s("? gkc"); s("? gsrc")
s("? gkp"); s("? gkc"); s("? gsrc")
s("DROP TABLE gkc")
s("DROP TABLE gkp")
s("DROP TABLE gsrc")
open("src/test/resources/dml/script11.sql", "w").write("\n".join(out) + "\n")
print(len(out), "statements")
