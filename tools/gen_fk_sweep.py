import random
random.seed(41041)
out = []
def s(x): out.append(x)
s("DROP TABLE IF EXISTS fkc")
s("DROP TABLE IF EXISTS fkd")
s("DROP TABLE IF EXISTS fkp")
s("CREATE TABLE fkp (id int PRIMARY KEY, v int)")
s("CREATE TABLE fkc (id int PRIMARY KEY, pid int REFERENCES fkp (id), w int)")
s("CREATE TABLE fkd (id int PRIMARY KEY, pid int REFERENCES fkp (id) ON DELETE RESTRICT, w int)")
cid = 0
for i in range(130):
    r = random.randrange(1000)
    op = random.randrange(12)
    if op in (0, 1, 2):
        s(f"INSERT INTO fkp VALUES ({r % 20}, {r})")
    elif op in (3, 4):
        cid += 1
        pid = "NULL" if r % 7 == 0 else str(r % 26)
        tbl = "fkc" if r % 3 else "fkd"
        s(f"INSERT INTO {tbl} VALUES ({cid}, {pid}, {r % 9})")
    elif op == 5:
        s(f"UPDATE fkc SET pid = {r % 26} WHERE id % 5 = {r % 5}")
    elif op == 6:
        s(f"UPDATE fkp SET id = {r % 22} WHERE id = {(r // 7) % 22}")
    elif op == 7:
        s(f"UPDATE fkp SET v = v + 1 WHERE id % 3 = {r % 3}")
    elif op == 8:
        s(f"DELETE FROM fkp WHERE id = {r % 22}")
    elif op == 9:
        tbl = "fkc" if r % 2 else "fkd"
        s(f"DELETE FROM {tbl} WHERE w = {r % 9}")
    elif op == 10:
        cid += 1
        s(f"INSERT INTO fkc VALUES ({cid % 40}, {r % 26}, {r % 9}) "
          f"ON CONFLICT (id) DO UPDATE SET pid = EXCLUDED.pid")
    else:
        s(f"INSERT INTO fkd VALUES ({cid % 30}, {r % 26}, {r % 9}) "
          f"ON CONFLICT (id) DO NOTHING")
    if i % 9 == 8:
        s("? fkp"); s("? fkc"); s("? fkd")
s("? fkp"); s("? fkc"); s("? fkd")
s("DROP TABLE fkc")
s("DROP TABLE fkd")
s("DROP TABLE fkp")
open("src/test/resources/dml/script10.sql", "w").write("\n".join(out) + "\n")
print(len(out), "statements")
