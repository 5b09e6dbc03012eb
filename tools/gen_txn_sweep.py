"""sweep-44 generator: randomized differential over TRANSACTION blocks
(r18) — BEGIN/COMMIT/ROLLBACK with real journal undo, SAVEPOINT /
ROLLBACK TO / RELEASE partial undo, failed-transaction state (25P02
guard, COMMIT-as-ROLLBACK), TRUNCATE-in-txn, DEFERRABLE constraints
(INITIALLY DEFERRED FK, deferrable-on-demand FK, deferrable UNIQUE)
under SET CONSTRAINTS flips, commit-time 23503/23505 with full
rollback, and FK ON DELETE CASCADE riding inside rolled-back blocks.
State dumps after every COMMIT/ROLLBACK. DDL stays OUTSIDE blocks
(documented auto-commit deviation); no serials (pre-reservation
deviation); replay via pg_capture_txn.py (single session — transaction
state must persist across statements)."""
import random
random.seed(444444)
out = []
def s(x): out.append(x)

for t in ("dfk", "dcd", "dci", "du", "tt", "dp"):
    s(f"DROP TABLE IF EXISTS {t}")
s("CREATE TABLE dp (id int PRIMARY KEY, v int)")
s("CREATE TABLE dci (id int PRIMARY KEY, "
  "pid int CONSTRAINT dci_pid_fkey REFERENCES dp(id) DEFERRABLE, w int)")
s("CREATE TABLE dcd (id int PRIMARY KEY, "
  "pid int CONSTRAINT dcd_pid_fkey REFERENCES dp(id) "
  "DEFERRABLE INITIALLY DEFERRED, z int)")
s("CREATE TABLE du (id int PRIMARY KEY, "
  "k int CONSTRAINT du_k_key UNIQUE DEFERRABLE INITIALLY DEFERRED, t int)")
s("CREATE TABLE tt (id int PRIMARY KEY, w int)")
s("CREATE TABLE dfk (id int PRIMARY KEY, "
  "pid int REFERENCES dp(id) ON DELETE CASCADE)")

for i in range(12):
    s(f"INSERT INTO dp VALUES ({i}, {i * 3})")
for i in range(6):
    s(f"INSERT INTO dci VALUES ({i}, {(i * 2) % 12}, {i})")
for i in range(6):
    s(f"INSERT INTO dcd VALUES ({i}, {(i * 3) % 12}, {i})")
for i in range(8):
    s(f"INSERT INTO du VALUES ({i}, {i * 10}, {i})")
for i in range(8):
    s(f"INSERT INTO tt VALUES ({i}, {i})")
for i in range(5):
    s(f"INSERT INTO dfk VALUES ({i}, {(i * 5) % 12})")

TABS = ("dp", "dci", "dcd", "du", "tt", "dfk")
def dump():
    for t in TABS:
        s(f"? {t}")

dump()

in_txn = False
sp_stack = []
sp_seq = [0]

def open_txn():
    global in_txn
    s("BEGIN")
    in_txn = True
    sp_stack.clear()

def close_txn(commit):
    global in_txn
    s("COMMIT" if commit else "ROLLBACK")
    in_txn = False
    sp_stack.clear()
    dump()

for i in range(90):
    r = random.randrange(1000)
    if not in_txn:
        open_txn()
        continue
    op = random.randrange(20)
    if op == 0:
        close_txn(commit=True)
    elif op == 1:
        close_txn(commit=False)
    elif op == 2:
        sp_seq[0] += 1
        name = f"sp{sp_seq[0]}"
        s(f"SAVEPOINT {name}")
        sp_stack.append(name)
    elif op == 3 and sp_stack:
        name = random.choice(sp_stack)
        s(f"ROLLBACK TO SAVEPOINT {name}")
        del sp_stack[sp_stack.index(name) + 1:]
    elif op == 4 and sp_stack:
        name = random.choice(sp_stack)
        s(f"RELEASE SAVEPOINT {name}")
        del sp_stack[sp_stack.index(name):]
    elif op == 5:
        # the headline: dangling child into the INITIALLY DEFERRED FK
        # (fine until COMMIT; sometimes repaired before then)
        s(f"INSERT INTO dcd VALUES ({50 + i}, {40 + r % 10}, {r})")
        if r % 3 == 0:
            s(f"INSERT INTO dp VALUES ({40 + r % 10}, {r}) "
              "ON CONFLICT (id) DO NOTHING")
    elif op == 6:
        # deferred-unique duplicate (du_k_key), sometimes repaired by
        # a later UPDATE re-separating the keys
        s(f"INSERT INTO du VALUES ({60 + i}, {(r % 8) * 10}, {r})")
        if r % 3 == 0:
            s(f"UPDATE du SET k = {1000 + i} WHERE id = {60 + i}")
    elif op == 7:
        # parent delete: CASCADE into dfk; NO ACTION probes for
        # dci (immediate unless SET DEFERRED) and dcd (deferred)
        s(f"DELETE FROM dp WHERE id = {r % 14}")
    elif op == 8:
        s("SET CONSTRAINTS ALL DEFERRED")
    elif op == 9:
        s("SET CONSTRAINTS ALL IMMEDIATE")
    elif op == 10:
        s("SET CONSTRAINTS dcd_pid_fkey IMMEDIATE")
    elif op == 11:
        s("SET CONSTRAINTS dci_pid_fkey, du_k_key DEFERRED")
    elif op == 12:
        # dangling child into the deferrable-but-IMMEDIATE FK: 23503
        # unless a SET CONSTRAINTS flip deferred it -> Failed state arm
        s(f"INSERT INTO dci VALUES ({70 + i}, {40 + r % 10}, {r})")
    elif op == 13:
        # duplicate pkey on the plain table: immediate 23505 ->
        # transaction goes Failed; next ops exercise the 25P02 guard
        s(f"INSERT INTO tt VALUES ({r % 8}, {r})")
        if r % 2 == 0:
            s(f"INSERT INTO tt VALUES ({100 + i}, {r})")  # 25P02
    elif op == 14:
        s(f"UPDATE tt SET w = w + {1 + r % 5} WHERE id % 3 = {r % 3}")
    elif op == 15:
        s(f"DELETE FROM dfk WHERE id = {r % 10}")
    elif op == 16:
        s(f"INSERT INTO tt VALUES ({200 + i}, {r})")
    elif op == 17:
        s("TRUNCATE tt")
        s(f"INSERT INTO tt VALUES (0, {r}), (1, {r + 1})")
    elif op == 18:
        s(f"UPDATE du SET t = t + 1 WHERE k < {r % 90}")
    else:
        s(f"DELETE FROM dcd WHERE id >= 50 AND id < {50 + r % 40}")

if in_txn:
    close_txn(commit=True)

# deterministic codas
s("SET CONSTRAINTS nosuch_cons DEFERRED")          # 42704
s("SET CONSTRAINTS tt_pkey DEFERRED")              # 42809 not deferrable
s("BEGIN")
s("INSERT INTO dcd VALUES (990, 991, 0)")          # dangling, deferred
s("SET CONSTRAINTS dcd_pid_fkey IMMEDIATE")        # 23503 NOW -> Failed
s("INSERT INTO tt VALUES (991, 0)")                # 25P02
s("COMMIT")                                        # reports ROLLBACK
dump()
s("BEGIN")
s("SAVEPOINT a")
s("INSERT INTO du VALUES (992, 0, 0)")             # dup k=0 (deferred)
s("ROLLBACK TO SAVEPOINT a")                       # undoes the dup
s("COMMIT")                                        # passes: probe sees clean state
dump()
s("BEGIN")
s("BEGIN")                                         # nested: warning no-op
s("DELETE FROM dp WHERE id = 0")                   # cascades into dfk
s("ROLLBACK")                                      # both tables restored
dump()

print("\n".join(out))
