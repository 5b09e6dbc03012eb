DROP TABLE IF EXISTS ford
DROP TABLE IF EXISTS fc3
DROP TABLE IF EXISTS fcust
CREATE TABLE fcust (id int PRIMARY KEY, name text, tier int)
CREATE TABLE ford (oid int PRIMARY KEY, cid int REFERENCES fcust (id), note text)
!SELECT conname, contype, pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'ford'::regclass ORDER BY conname
INSERT INTO fcust VALUES (1, 'a', 1), (2, 'b', 2), (3, 'c', 1)
INSERT INTO ford VALUES (10, 1, 'x'), (11, 2, 'y')
INSERT INTO ford VALUES (12, 9, 'z')
? ford
INSERT INTO ford VALUES (13, NULL, 'n')
? ford
UPDATE ford SET cid = 3 WHERE oid = 10
UPDATE ford SET cid = 99 WHERE oid = 11
? ford
DELETE FROM fcust WHERE id = 1
DELETE FROM fcust WHERE id = 3
? fcust
UPDATE fcust SET id = 5 WHERE id = 2
UPDATE fcust SET name = 'bb' WHERE id = 2
UPDATE fcust SET tier = tier + 1 WHERE id = 3
? fcust
DROP TABLE IF EXISTS fchild2
DROP TABLE IF EXISTS fpar2
CREATE TABLE fpar2 (a int, b int, v text, PRIMARY KEY (a, b))
CREATE TABLE fchild2 (id int PRIMARY KEY, x int, y int, FOREIGN KEY (x, y) REFERENCES fpar2 (a, b))
!SELECT pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'fchild2'::regclass AND contype = 'f'
INSERT INTO fpar2 VALUES (1, 1, 'p'), (1, 2, 'q')
INSERT INTO fchild2 VALUES (1, 1, 1), (2, 1, NULL), (3, NULL, 2)
INSERT INTO fchild2 VALUES (4, 2, 2)
? fchild2
DELETE FROM fpar2 WHERE a = 1 AND b = 2
DELETE FROM fpar2 WHERE a = 1 AND b = 1
? fpar2
CREATE TABLE fc3 (id int PRIMARY KEY, pid int)
INSERT INTO fc3 VALUES (1, 2), (2, 99)
ALTER TABLE fc3 ADD CONSTRAINT fc3fk FOREIGN KEY (pid) REFERENCES fcust (id)
!SELECT count(*) FROM pg_constraint WHERE conrelid = 'fc3'::regclass AND contype = 'f'
DELETE FROM fc3 WHERE pid = 99
ALTER TABLE fc3 ADD CONSTRAINT fc3fk FOREIGN KEY (pid) REFERENCES fcust (id)
!SELECT conname, pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'fc3'::regclass AND contype = 'f' ORDER BY conname
INSERT INTO fc3 VALUES (3, 77)
? fc3
DROP TABLE IF EXISTS ftree
CREATE TABLE ftree (id int PRIMARY KEY, parent int REFERENCES ftree (id))
INSERT INTO ftree VALUES (1, NULL), (2, 1), (3, 3)
INSERT INTO ftree VALUES (4, 9)
DELETE FROM ftree WHERE id = 1
DELETE FROM ftree WHERE id = 2
DELETE FROM ftree WHERE id = 1
? ftree
CREATE TABLE fbad (id int REFERENCES nosuch (id))
CREATE TABLE fbad (id int REFERENCES fcust (name))
CREATE TABLE fbad (id int REFERENCES fcust (tier))
DROP TABLE IF EXISTS fnopk
CREATE TABLE fnopk (n int)
CREATE TABLE fbad3 (id int REFERENCES fnopk)
CREATE TABLE fbad4 (id int, v text, FOREIGN KEY (id) REFERENCES fnopk (n))
DROP TABLE IF EXISTS frc
DROP TABLE IF EXISTS fr
CREATE TABLE fr (id int PRIMARY KEY)
CREATE TABLE frc (id int PRIMARY KEY, rid int REFERENCES fr (id) ON DELETE RESTRICT ON UPDATE RESTRICT)
!SELECT pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'frc'::regclass AND contype = 'f'
INSERT INTO fr VALUES (1), (2)
INSERT INTO frc VALUES (1, 1)
DELETE FROM fr WHERE id = 1
UPDATE fr SET id = 9 WHERE id = 1
UPDATE fr SET id = 9 WHERE id = 2
? fr
INSERT INTO frc VALUES (1, 99) ON CONFLICT (id) DO UPDATE SET rid = EXCLUDED.rid
INSERT INTO frc VALUES (2, 99) ON CONFLICT (id) DO NOTHING
INSERT INTO frc VALUES (1, 9) ON CONFLICT (id) DO UPDATE SET rid = EXCLUDED.rid
? frc
DROP TABLE IF EXISTS fsrc
CREATE TABLE fsrc (k int, nv int)
INSERT INTO fsrc VALUES (1, 77)
UPDATE frc SET rid = s.nv FROM fsrc s WHERE frc.id = s.k
UPDATE frc SET rid = 9 FROM fsrc s WHERE frc.id = s.k
DELETE FROM fr USING fsrc s WHERE fr.id = s.k
DELETE FROM fr USING frc c WHERE fr.id = c.rid
? fr
? frc
TRUNCATE fr
TRUNCATE frc, fr
? frc
? fr
DROP TABLE fr
DROP TABLE frc, fr
