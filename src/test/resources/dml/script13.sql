DROP TABLE IF EXISTS ug
DROP TABLE IF EXISTS ux
DROP TABLE IF EXISTS un
DROP TABLE IF EXISTS unn
DROP TABLE IF EXISTS ud
DROP TABLE IF EXISTS ut
DROP TABLE IF EXISTS uc
DROP TABLE IF EXISTS up
DROP TABLE IF EXISTS usrc
CREATE TABLE up (id int PRIMARY KEY, v int)
CREATE TABLE uc (pid int PRIMARY KEY REFERENCES up(id) ON UPDATE CASCADE, w int)
CREATE TABLE ug (id int PRIMARY KEY, cpid int REFERENCES uc(pid) ON UPDATE CASCADE, z int)
CREATE TABLE ux (id int PRIMARY KEY, pid int REFERENCES up(id))
CREATE TABLE un (id int PRIMARY KEY, pid int REFERENCES up(id) ON UPDATE SET NULL, t int)
CREATE TABLE unn (id int PRIMARY KEY, pid int NOT NULL REFERENCES up(id) ON UPDATE SET NULL)
CREATE TABLE ud (id int PRIMARY KEY, pid int DEFAULT 1 REFERENCES up(id) ON UPDATE SET DEFAULT)
CREATE TABLE ut (id int PRIMARY KEY, boss int REFERENCES ut(id) ON UPDATE CASCADE)
CREATE TABLE usrc (k int, m int)
INSERT INTO up VALUES (0, 0)
INSERT INTO up VALUES (1, 2)
INSERT INTO up VALUES (2, 4)
INSERT INTO up VALUES (3, 6)
INSERT INTO up VALUES (4, 8)
INSERT INTO up VALUES (5, 10)
INSERT INTO up VALUES (6, 12)
INSERT INTO up VALUES (7, 14)
INSERT INTO up VALUES (8, 16)
INSERT INTO up VALUES (9, 18)
INSERT INTO up VALUES (10, 20)
INSERT INTO up VALUES (11, 22)
INSERT INTO up VALUES (12, 24)
INSERT INTO up VALUES (13, 26)
INSERT INTO uc VALUES (0, 0)
INSERT INTO uc VALUES (2, 2)
INSERT INTO uc VALUES (4, 4)
INSERT INTO uc VALUES (6, 1)
INSERT INTO uc VALUES (8, 3)
INSERT INTO uc VALUES (10, 0)
INSERT INTO uc VALUES (12, 2)
INSERT INTO ug VALUES (0, 0, 0)
INSERT INTO ug VALUES (1, 2, 1)
INSERT INTO ug VALUES (2, 4, 2)
INSERT INTO ug VALUES (3, 6, 3)
INSERT INTO ug VALUES (4, 8, 4)
INSERT INTO ug VALUES (5, 10, 5)
INSERT INTO ug VALUES (6, 12, 6)
INSERT INTO ug VALUES (7, 0, 7)
INSERT INTO ug VALUES (8, 2, 8)
INSERT INTO ug VALUES (9, 4, 9)
INSERT INTO ux VALUES (0, 0)
INSERT INTO ux VALUES (1, 3)
INSERT INTO ux VALUES (2, 6)
INSERT INTO ux VALUES (3, 9)
INSERT INTO un VALUES (0, 0, 0)
INSERT INTO un VALUES (1, 1, 1)
INSERT INTO un VALUES (2, 2, 2)
INSERT INTO un VALUES (3, 3, 3)
INSERT INTO un VALUES (4, 4, 4)
INSERT INTO un VALUES (5, 5, 5)
INSERT INTO un VALUES (6, 6, 6)
INSERT INTO un VALUES (7, 7, 7)
INSERT INTO ud VALUES (0, 0)
INSERT INTO ud VALUES (1, 5)
INSERT INTO ud VALUES (2, 10)
INSERT INTO ud VALUES (3, 1)
INSERT INTO ud VALUES (4, 6)
INSERT INTO ud VALUES (5, 11)
INSERT INTO ut VALUES (0, NULL), (1, 0), (2, 0), (3, 1), (4, 3)
INSERT INTO usrc VALUES (0, 0)
INSERT INTO usrc VALUES (1, 7)
INSERT INTO usrc VALUES (2, 14)
INSERT INTO usrc VALUES (3, 1)
INSERT INTO usrc VALUES (4, 8)
INSERT INTO usrc VALUES (5, 15)
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO un VALUES (8, 29, 379)
INSERT INTO ud VALUES (6, 29)
UPDATE up SET id = id + 40 WHERE v >= 6 AND v < 10
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO ux VALUES (6, 24)
INSERT INTO uc VALUES (27, 2)
UPDATE up SET id = 29 WHERE id = 19
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO uc VALUES (14, 4)
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 4
? up
? uc
? ug
? ux
? un
? ud
? ut
DELETE FROM ux WHERE id = 8
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 2
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO ux VALUES (13, 27)
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 3
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = id + 40 WHERE v >= 17 AND v < 21
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 0
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE ut SET id = 24 WHERE id = 4
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 3
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = id + 40 WHERE v >= 3 AND v < 7
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = 26 WHERE id = 16
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = 36 WHERE id = 21
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET v = 801 WHERE id = 21
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 3
? up
? uc
? ug
? ux
? un
? ud
? ut
DELETE FROM ux WHERE id = 10
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 4
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = 42 WHERE id = 17
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO up VALUES (21, 19)
UPDATE up SET id = id + 40 WHERE v >= 23 AND v < 27
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = 33 WHERE id = 3
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO up VALUES (18, 14)
INSERT INTO ux VALUES (31, 34)
UPDATE up SET v = 849 WHERE id = 9
INSERT INTO ux VALUES (33, 22)
INSERT INTO up VALUES (15, 9)
UPDATE up SET id = 43 WHERE id = 23
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE ut SET id = 29 WHERE id = 9
? up
? uc
? ug
? ux
? un
? ud
? ut
DELETE FROM ux WHERE id = 17
UPDATE up SET id = id + 40 WHERE v >= 16 AND v < 20
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = id + 40 WHERE v >= 8 AND v < 12
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET v = 319 WHERE id = 19
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 0
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO uc VALUES (27, 2)
INSERT INTO un VALUES (47, 24, 794)
INSERT INTO ud VALUES (45, 24)
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 4
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE ut SET id = 26 WHERE id = 6
? up
? uc
? ug
? ux
? un
? ud
? ut
DELETE FROM ux WHERE id = 15
DELETE FROM ux WHERE id = 5
UPDATE up SET id = 20 WHERE id = 15
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO ux VALUES (49, 27)
INSERT INTO ux VALUES (50, 8)
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 0
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO up VALUES (13, 1)
INSERT INTO up VALUES (33, 5)
INSERT INTO up VALUES (13, 1)
INSERT INTO un VALUES (59, 18, 438)
INSERT INTO ud VALUES (57, 18)
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 3
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = 27 WHERE id = 12
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO uc VALUES (19, 4)
INSERT INTO ux VALUES (59, 10)
INSERT INTO uc VALUES (17, 2)
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 1
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 0
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = id + 40 WHERE v >= 1 AND v < 5
? up
? uc
? ug
? ux
? un
? ud
? ut
DELETE FROM ux WHERE id = 13
UPDATE ut SET id = 18 WHERE id = 8
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO un VALUES (70, 24, 339)
INSERT INTO ud VALUES (68, 24)
UPDATE up SET id = id + 40 WHERE v >= 3 AND v < 7
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = 42 WHERE id = 12
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = id + 40 WHERE v >= 5 AND v < 9
? up
? uc
? ug
? ux
? un
? ud
? ut
INSERT INTO ux VALUES (70, 8)
UPDATE up SET id = s.m + 25 FROM usrc s WHERE up.id = s.k + 0
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE up SET id = 22 WHERE id = 22
? up
? uc
? ug
? ux
? un
? ud
? ut
UPDATE ut SET id = 16 WHERE id = 6
? up
? uc
? ug
? ux
? un
? ud
? ut
DELETE FROM ux
INSERT INTO up VALUES (90, 90) ON CONFLICT (id) DO NOTHING
INSERT INTO unn VALUES (1, 90)
UPDATE up SET id = 91 WHERE id = 90
? unn
DELETE FROM unn
INSERT INTO up VALUES (1, 1) ON CONFLICT (id) DO NOTHING
INSERT INTO ud VALUES (95, 1)
UPDATE up SET id = 92 WHERE id = 1
? up
? ud
INSERT INTO up VALUES (1, 1) ON CONFLICT (id) DO NOTHING
INSERT INTO up VALUES (5, 5) ON CONFLICT (id) DO NOTHING
INSERT INTO ud VALUES (96, 5)
UPDATE up SET id = 93 WHERE id = 5
? ud
>UPDATE up SET id = 94 WHERE id = 93 RETURNING id, v
? up
? uc
? ug
? ux
? un
? ud
? ut
DROP TABLE ug
DROP TABLE ux
DROP TABLE un
DROP TABLE unn
DROP TABLE ud
DROP TABLE ut
DROP TABLE uc
DROP TABLE up
DROP TABLE usrc
