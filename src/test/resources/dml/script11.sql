DROP TABLE IF EXISTS gkc
DROP TABLE IF EXISTS gkp
DROP TABLE IF EXISTS gsrc
CREATE TABLE gkp (id int PRIMARY KEY, v int)
CREATE TABLE gkc (id int PRIMARY KEY, pid int REFERENCES gkp (id), w int)
CREATE TABLE gsrc (k int, nv int)
INSERT INTO gkp VALUES (0, 0)
INSERT INTO gkp VALUES (1, 3)
INSERT INTO gkp VALUES (2, 6)
INSERT INTO gkp VALUES (3, 9)
INSERT INTO gkp VALUES (4, 12)
INSERT INTO gkp VALUES (5, 15)
INSERT INTO gkp VALUES (6, 18)
INSERT INTO gkp VALUES (7, 21)
INSERT INTO gkp VALUES (8, 24)
INSERT INTO gkp VALUES (9, 27)
INSERT INTO gkc VALUES (0, 0, 0)
INSERT INTO gkc VALUES (1, 1, 1)
INSERT INTO gkc VALUES (2, 2, 2)
INSERT INTO gkc VALUES (3, 3, 3)
INSERT INTO gkc VALUES (4, 4, 4)
INSERT INTO gkc VALUES (5, 5, 0)
INSERT INTO gkc VALUES (6, 6, 1)
INSERT INTO gkc VALUES (7, 7, 2)
INSERT INTO gkc VALUES (8, 8, 3)
INSERT INTO gkc VALUES (9, 9, 4)
INSERT INTO gkc VALUES (10, 0, 0)
INSERT INTO gkc VALUES (11, 1, 1)
INSERT INTO gkc VALUES (12, 2, 2)
INSERT INTO gkc VALUES (13, 3, 3)
INSERT INTO gsrc VALUES (0, 0)
INSERT INTO gsrc VALUES (1, 7)
INSERT INTO gsrc VALUES (2, 14)
INSERT INTO gsrc VALUES (3, 6)
INSERT INTO gsrc VALUES (4, 13)
INSERT INTO gsrc VALUES (5, 5)
INSERT INTO gsrc VALUES (6, 12)
INSERT INTO gsrc VALUES (7, 4)
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 1
INSERT INTO gkp VALUES (15, 771)
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 3
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 7
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 7
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 4
UPDATE gkp SET id = s.nv % 18 FROM gsrc s WHERE gkp.id = s.k + 1
? gkp
? gkc
? gsrc
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 0
INSERT INTO gkc VALUES (23, 12, 0)
INSERT INTO gkc VALUES (24, 2, 0)
INSERT INTO gkc VALUES (25, 3, 4)
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 3
INSERT INTO gkc VALUES (27, 7, 1)
UPDATE gsrc SET nv = 13 WHERE k = 2
DELETE FROM gkc USING gsrc s WHERE gkc.pid = s.nv % 12 AND s.k = 5 AND gkc.w = 1
? gkp
? gkc
? gsrc
UPDATE gsrc SET nv = 11 WHERE k = 2
INSERT INTO gkc VALUES (31, 2, 3)
UPDATE gsrc SET nv = 4 WHERE k = 1
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 0
INSERT INTO gkp VALUES (17, 881)
UPDATE gsrc SET nv = 14 WHERE k = 6
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 2
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 0
? gkp
? gkc
? gsrc
INSERT INTO gkc VALUES (38, 8, 2)
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 5
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
UPDATE gkp SET id = s.nv % 18 FROM gsrc s WHERE gkp.id = s.k + 3
INSERT INTO gkp VALUES (0, 360)
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 6
INSERT INTO gkc VALUES (44, 3, 3)
INSERT INTO gkp VALUES (12, 48)
? gkp
? gkc
? gsrc
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 6
INSERT INTO gkp VALUES (15, 537)
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
DELETE FROM gkc USING gsrc s WHERE gkc.pid = s.nv % 12 AND s.k = 0 AND gkc.w = 2
UPDATE gkp SET id = s.nv % 18 FROM gsrc s WHERE gkp.id = s.k + 4
UPDATE gsrc SET nv = 2 WHERE k = 2
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
INSERT INTO gkp VALUES (15, 303)
? gkp
? gkc
? gsrc
INSERT INTO gkc VALUES (54, 8, 4)
DELETE FROM gkc USING gsrc s WHERE gkc.pid = s.nv % 12 AND s.k = 1 AND gkc.w = 1
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 3
UPDATE gsrc SET nv = 9 WHERE k = 3
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 1
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 1
UPDATE gkp SET id = s.nv % 18 FROM gsrc s WHERE gkp.id = s.k + 1
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 2
? gkp
? gkc
? gsrc
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 2
INSERT INTO gkp VALUES (10, 172)
DELETE FROM gkc USING gsrc s WHERE gkc.pid = s.nv % 12 AND s.k = 4 AND gkc.w = 1
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 1
UPDATE gkp SET id = s.nv % 18 FROM gsrc s WHERE gkp.id = s.k + 4
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 1
INSERT INTO gkc VALUES (68, 12, 0)
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 2
? gkp
? gkc
? gsrc
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 4
UPDATE gkp SET id = s.nv % 18 FROM gsrc s WHERE gkp.id = s.k + 2
UPDATE gsrc SET nv = 9 WHERE k = 0
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 6
UPDATE gsrc SET nv = 6 WHERE k = 5
INSERT INTO gkc VALUES (75, 12, 4)
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 1
UPDATE gsrc SET nv = 2 WHERE k = 2
? gkp
? gkc
? gsrc
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 0
INSERT INTO gkc VALUES (79, 9, 0)
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 3
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 4
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 6
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
DELETE FROM gkc USING gsrc s WHERE gkc.pid = s.nv % 12 AND s.k = 6 AND gkc.w = 2
UPDATE gsrc SET nv = 1 WHERE k = 4
? gkp
? gkc
? gsrc
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 5
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 3
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 6
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 5
INSERT INTO gkp VALUES (11, 173)
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 0
? gkp
? gkc
? gsrc
UPDATE gsrc SET nv = 3 WHERE k = 6
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 1
DELETE FROM gkp USING gsrc s WHERE gkp.id = s.nv % 12 AND s.k = 2
UPDATE gsrc SET nv = 3 WHERE k = 3
UPDATE gsrc SET nv = 8 WHERE k = 7
INSERT INTO gkp VALUES (11, 587)
DELETE FROM gkc USING gsrc s WHERE gkc.pid = s.nv % 12 AND s.k = 6 AND gkc.w = 3
INSERT INTO gkc VALUES (101, 7, 3)
? gkp
? gkc
? gsrc
UPDATE gkp SET id = s.nv % 18 FROM gsrc s WHERE gkp.id = s.k + 3
UPDATE gkc SET pid = s.nv % 15 FROM gsrc s WHERE gkc.id = s.k + 5
? gkp
? gkc
? gsrc
DROP TABLE gkc
DROP TABLE gkp
DROP TABLE gsrc
