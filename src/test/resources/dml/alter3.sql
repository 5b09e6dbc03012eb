DROP TABLE IF EXISTS ix
CREATE TABLE ix (a int, b text)
INSERT INTO ix VALUES (1,'x'),(1,'y')
CREATE INDEX ix_a ON ix (a)
CREATE INDEX ix_a ON ix (a)
CREATE INDEX IF NOT EXISTS ix_a ON ix (a)
CREATE INDEX ON ix (b)
!SELECT indexname FROM pg_indexes WHERE tablename='ix'
CREATE UNIQUE INDEX ix_u ON ix (a)
DELETE FROM ix WHERE b='y'
CREATE UNIQUE INDEX ix_u ON ix (a)
INSERT INTO ix VALUES (1,'z')
CREATE INDEX ix_expr ON ix (lower(b))
CREATE INDEX ix_m ON ix USING hash (a)
CREATE INDEX nope ON ix (nosuch)
!SELECT indexname FROM pg_indexes WHERE tablename='ix'
ALTER TABLE ix DROP CONSTRAINT ix_u
DROP INDEX ix_a
DROP INDEX ix_a
DROP INDEX IF EXISTS ix_a
DROP INDEX ix_u
INSERT INTO ix VALUES (1,'z2')
?ix
CREATE INDEX nope ON nosuch (a)
ALTER TABLE ix DROP COLUMN a
!SELECT indexname FROM pg_indexes WHERE tablename='ix'
DROP TABLE IF EXISTS cx
CREATE TABLE cx (a int PRIMARY KEY)
!SELECT indexname FROM pg_indexes WHERE tablename='cx'
DROP INDEX cx_pkey
DROP TABLE ix
DROP TABLE cx
