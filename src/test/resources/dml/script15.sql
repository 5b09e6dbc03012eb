DROP TABLE IF EXISTS nc
DROP TABLE IF EXISTS nn
DROP TABLE IF EXISTS nd
DROP TABLE IF EXISTS np
DROP SEQUENCE IF EXISTS nseq
CREATE SEQUENCE nseq START 100
CREATE TABLE np (id int PRIMARY KEY, v int)
CREATE TABLE nc (id int PRIMARY KEY, pid int REFERENCES np(id) ON UPDATE CASCADE)
CREATE TABLE nn (id int PRIMARY KEY, pid int REFERENCES np(id) ON UPDATE SET NULL, t int)
CREATE TABLE nd (id int PRIMARY KEY, pid int DEFAULT 1 REFERENCES np(id) ON UPDATE SET DEFAULT)
INSERT INTO np VALUES (0, 0)
INSERT INTO np VALUES (1, 1)
INSERT INTO np VALUES (2, 2)
INSERT INTO np VALUES (3, 3)
INSERT INTO np VALUES (4, 4)
INSERT INTO np VALUES (5, 5)
INSERT INTO np VALUES (6, 6)
INSERT INTO np VALUES (7, 7)
INSERT INTO np VALUES (8, 8)
INSERT INTO np VALUES (9, 9)
INSERT INTO nc VALUES (0, 0)
INSERT INTO nc VALUES (1, 3)
INSERT INTO nc VALUES (2, 6)
INSERT INTO nc VALUES (3, 9)
INSERT INTO nc VALUES (4, 2)
INSERT INTO nc VALUES (5, 5)
INSERT INTO nn VALUES (0, 0, 0)
INSERT INTO nn VALUES (1, 2, 1)
INSERT INTO nn VALUES (2, 4, 2)
INSERT INTO nn VALUES (3, 6, 3)
INSERT INTO nn VALUES (4, 8, 4)
INSERT INTO nd VALUES (0, 0)
INSERT INTO nd VALUES (1, 7)
INSERT INTO nd VALUES (2, 4)
INSERT INTO nd VALUES (3, 1)
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
UPDATE np SET id = nextval('nseq') WHERE id = 3
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (500, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 0
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (501, 0) ON CONFLICT (id) DO NOTHING
INSERT INTO nc VALUES (102, 0)
UPDATE nn SET t = t + 1 WHERE id = 1
INSERT INTO np VALUES (404, 639)
UPDATE np SET id = nextval('nseq') WHERE id = 8
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (505, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 7
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (506, 0) ON CONFLICT (id) DO NOTHING
! SELECT setval('nseq', 270)
UPDATE np SET id = nextval('nseq') WHERE id = 7
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (508, 0) ON CONFLICT (id) DO NOTHING
>UPDATE np SET id = nextval('nseq'), v = v + 1 WHERE id = 505 RETURNING id, v
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (509, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 1
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (510, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 500
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (511, 0) ON CONFLICT (id) DO NOTHING
UPDATE nn SET t = t + 1 WHERE id = 4
! SELECT setval('nseq', 330)
UPDATE nn SET t = t + 1 WHERE id = 3
INSERT INTO np VALUES (415, 695)
>UPDATE np SET id = nextval('nseq'), v = v + 1 WHERE id = 6 RETURNING id, v
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (516, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 505
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (517, 0) ON CONFLICT (id) DO NOTHING
INSERT INTO nc VALUES (118, 404)
UPDATE np SET id = nextval('nseq') WHERE id = 4
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (519, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 404
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (520, 0) ON CONFLICT (id) DO NOTHING
UPDATE nn SET t = t + 1 WHERE id = 4
INSERT INTO nc VALUES (122, 506)
! SELECT setval('nseq', 430)
>UPDATE np SET id = nextval('nseq'), v = v + 1 WHERE id = 2 RETURNING id, v
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (524, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 2
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (525, 0) ON CONFLICT (id) DO NOTHING
INSERT INTO np VALUES (426, 102)
INSERT INTO nc VALUES (127, 426)
! SELECT setval('nseq', 480)
INSERT INTO nc VALUES (129, 7)
UPDATE np SET id = nextval('nseq') WHERE id = 505
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (530, 0) ON CONFLICT (id) DO NOTHING
! SELECT setval('nseq', 510)
UPDATE np SET id = nextval('nseq') WHERE id = 4
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (532, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 5
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (533, 0) ON CONFLICT (id) DO NOTHING
UPDATE nn SET t = t + 1 WHERE id = 4
! SELECT setval('nseq', 550)
>UPDATE np SET id = nextval('nseq'), v = v + 1 WHERE id = 525 RETURNING id, v
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (536, 0) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 525
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (537, 0) ON CONFLICT (id) DO NOTHING
>UPDATE np SET id = nextval('nseq'), v = v + 1 WHERE id = 537 RETURNING id, v
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
INSERT INTO np VALUES (538, 0) ON CONFLICT (id) DO NOTHING
INSERT INTO nc VALUES (139, 506)
INSERT INTO np VALUES (1, 1) ON CONFLICT (id) DO NOTHING
INSERT INTO nd VALUES (90, 1)
! SELECT setval('nseq', 900)
UPDATE np SET id = nextval('nseq') WHERE id = 1
? np
? nd
INSERT INTO np VALUES (1, 1) ON CONFLICT (id) DO NOTHING
UPDATE np SET id = nextval('nseq') WHERE id = 1
? np
? nc
? nn
? nd
! SELECT last_value, is_called FROM nseq
