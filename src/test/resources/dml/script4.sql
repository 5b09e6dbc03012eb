DROP TABLE IF EXISTS ck
CREATE TABLE ck (a int CHECK (a > 0), b int, c text, CHECK (b < 100), CONSTRAINT myck CHECK (a < b))
!SELECT conname, pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'ck'::regclass ORDER BY conname
INSERT INTO ck VALUES (1, 50, 'x'), (2, 60, 'y')
? ck
INSERT INTO ck VALUES (-1, 50, 'z')
? ck
INSERT INTO ck VALUES (NULL, 50, 'n')
? ck
INSERT INTO ck VALUES (5, 120, 'w')
INSERT INTO ck VALUES (70, 50, 'q')
UPDATE ck SET a = -5 WHERE b = 50 AND a = 1
UPDATE ck SET b = 200 WHERE a = 2
UPDATE ck SET a = a + 1 WHERE a = 1
? ck
ALTER TABLE ck ADD CONSTRAINT pos_b CHECK (b > 10)
INSERT INTO ck VALUES (3, 5, 'low')
ALTER TABLE ck ADD CHECK (b > 55)
ALTER TABLE ck ADD CHECK (b < 90)
!SELECT conname, pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'ck'::regclass ORDER BY conname
ALTER TABLE ck DROP CONSTRAINT myck
INSERT INTO ck VALUES (70, 50, 'q')
? ck
ALTER TABLE ck DROP CONSTRAINT nosuch
ALTER TABLE ck DROP CONSTRAINT IF EXISTS nosuch
ALTER TABLE ck RENAME COLUMN b TO bb
!SELECT conname, pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'ck'::regclass ORDER BY conname
INSERT INTO ck VALUES (2, 120, 'r')
ALTER TABLE ck DROP COLUMN bb
!SELECT conname, pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'ck'::regclass ORDER BY conname
INSERT INTO ck VALUES (-9, 'neg')
? ck
DROP TABLE IF EXISTS fkt
DROP TABLE IF EXISTS pkt
CREATE TABLE pkt (id int PRIMARY KEY, v text)
CREATE TABLE fkt (x int REFERENCES pkt (id), y int, z int, FOREIGN KEY (y) REFERENCES pkt (id), CONSTRAINT zfk FOREIGN KEY (z) REFERENCES pkt (id))
!SELECT conname, contype, pg_get_constraintdef(oid) FROM pg_constraint WHERE conrelid = 'fkt'::regclass ORDER BY conname
ALTER TABLE fkt ADD CONSTRAINT wfk FOREIGN KEY (x) REFERENCES pkt (id)
!SELECT conname, contype FROM pg_constraint WHERE conrelid = 'fkt'::regclass ORDER BY conname
ALTER TABLE fkt DROP CONSTRAINT zfk
!SELECT count(*) FROM pg_constraint WHERE conrelid = 'fkt'::regclass
DROP TABLE IF EXISTS cku
CREATE TABLE cku (id int PRIMARY KEY, n int CHECK (n >= 0))
INSERT INTO cku VALUES (1, 5), (2, 0)
DROP TABLE IF EXISTS cksrc
CREATE TABLE cksrc (k int, d int)
INSERT INTO cksrc VALUES (1, -10), (2, 3)
UPDATE cku SET n = n + s.d FROM cksrc s WHERE cku.id = s.k
? cku
UPDATE cku SET n = n + s.d FROM cksrc s WHERE cku.id = s.k AND s.d > 0
? cku
INSERT INTO cku VALUES (1, 9) ON CONFLICT (id) DO UPDATE SET n = -1
INSERT INTO cku VALUES (1, 9) ON CONFLICT (id) DO UPDATE SET n = EXCLUDED.n
? cku
INSERT INTO cku VALUES (3, -3) ON CONFLICT (id) DO NOTHING
? cku
