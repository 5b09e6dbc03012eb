DROP TABLE IF EXISTS fx
DROP TABLE IF EXISTS fg
DROP TABLE IF EXISTS fc
DROP TABLE IF EXISTS fn
DROP TABLE IF EXISTS fnn
DROP TABLE IF EXISTS fd
DROP TABLE IF EXISTS ft
DROP TABLE IF EXISTS fp
DROP TABLE IF EXISTS fsrc
CREATE TABLE fp (id int PRIMARY KEY, v int)
CREATE TABLE fc (id int PRIMARY KEY, pid int REFERENCES fp(id) ON DELETE CASCADE, w int)
CREATE TABLE fg (id int PRIMARY KEY, cid int REFERENCES fc(id) ON DELETE CASCADE, z int)
CREATE TABLE fx (id int PRIMARY KEY, cid int REFERENCES fc(id))
CREATE TABLE fn (id int PRIMARY KEY, pid int REFERENCES fp(id) ON DELETE SET NULL, t int)
CREATE TABLE fnn (id int PRIMARY KEY, pid int NOT NULL REFERENCES fp(id) ON DELETE SET NULL)
CREATE TABLE fd (id int PRIMARY KEY, pid int DEFAULT 1 REFERENCES fp(id) ON DELETE SET DEFAULT)
CREATE TABLE ft (id int PRIMARY KEY, mgr int REFERENCES ft(id) ON DELETE CASCADE)
CREATE TABLE fsrc (k int, m int)
INSERT INTO fp VALUES (0, 0)
INSERT INTO fp VALUES (1, 2)
INSERT INTO fp VALUES (2, 4)
INSERT INTO fp VALUES (3, 6)
INSERT INTO fp VALUES (4, 8)
INSERT INTO fp VALUES (5, 10)
INSERT INTO fp VALUES (6, 12)
INSERT INTO fp VALUES (7, 14)
INSERT INTO fp VALUES (8, 16)
INSERT INTO fp VALUES (9, 18)
INSERT INTO fp VALUES (10, 20)
INSERT INTO fp VALUES (11, 22)
INSERT INTO fc VALUES (0, 0, 0)
INSERT INTO fc VALUES (1, 1, 1)
INSERT INTO fc VALUES (2, 2, 2)
INSERT INTO fc VALUES (3, 3, 3)
INSERT INTO fc VALUES (4, 4, 0)
INSERT INTO fc VALUES (5, 5, 1)
INSERT INTO fc VALUES (6, 6, 2)
INSERT INTO fc VALUES (7, 7, 3)
INSERT INTO fc VALUES (8, 8, 0)
INSERT INTO fc VALUES (9, 9, 1)
INSERT INTO fc VALUES (10, 10, 2)
INSERT INTO fc VALUES (11, 11, 3)
INSERT INTO fc VALUES (12, 0, 0)
INSERT INTO fc VALUES (13, 1, 1)
INSERT INTO fc VALUES (14, 2, 2)
INSERT INTO fc VALUES (15, 3, 3)
INSERT INTO fg VALUES (0, 0, 0)
INSERT INTO fg VALUES (1, 1, 1)
INSERT INTO fg VALUES (2, 2, 2)
INSERT INTO fg VALUES (3, 3, 3)
INSERT INTO fg VALUES (4, 4, 4)
INSERT INTO fg VALUES (5, 5, 5)
INSERT INTO fg VALUES (6, 6, 6)
INSERT INTO fg VALUES (7, 7, 7)
INSERT INTO fg VALUES (8, 8, 8)
INSERT INTO fg VALUES (9, 9, 9)
INSERT INTO fg VALUES (10, 10, 10)
INSERT INTO fg VALUES (11, 11, 11)
INSERT INTO fg VALUES (12, 12, 12)
INSERT INTO fg VALUES (13, 13, 13)
INSERT INTO fg VALUES (14, 14, 14)
INSERT INTO fg VALUES (15, 15, 15)
INSERT INTO fg VALUES (16, 0, 16)
INSERT INTO fg VALUES (17, 1, 17)
INSERT INTO fg VALUES (18, 2, 18)
INSERT INTO fg VALUES (19, 3, 19)
INSERT INTO fx VALUES (0, 0)
INSERT INTO fx VALUES (1, 3)
INSERT INTO fx VALUES (2, 6)
INSERT INTO fx VALUES (3, 9)
INSERT INTO fx VALUES (4, 12)
INSERT INTO fn VALUES (0, 0, 0)
INSERT INTO fn VALUES (1, 1, 1)
INSERT INTO fn VALUES (2, 2, 2)
INSERT INTO fn VALUES (3, 3, 3)
INSERT INTO fn VALUES (4, 4, 4)
INSERT INTO fn VALUES (5, 5, 5)
INSERT INTO fn VALUES (6, 6, 6)
INSERT INTO fn VALUES (7, 7, 7)
INSERT INTO fd VALUES (0, 0)
INSERT INTO fd VALUES (1, 5)
INSERT INTO fd VALUES (2, 10)
INSERT INTO fd VALUES (3, 3)
INSERT INTO fd VALUES (4, 8)
INSERT INTO fd VALUES (5, 1)
INSERT INTO ft VALUES (0, NULL), (1, 0), (2, 0), (3, 1), (4, 1), (5, 3)
INSERT INTO fsrc VALUES (0, 0)
INSERT INTO fsrc VALUES (1, 7)
INSERT INTO fsrc VALUES (2, 2)
INSERT INTO fsrc VALUES (3, 9)
INSERT INTO fsrc VALUES (4, 4)
INSERT INTO fsrc VALUES (5, 11)
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp USING fsrc s WHERE fp.id = s.m AND s.k = 0
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fx WHERE id = 5
DELETE FROM ft WHERE id = 4
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fc WHERE id = 11
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE v >= 7 AND v < 11
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fg VALUES (25, 2, 902)
INSERT INTO fp VALUES (15, 19)
INSERT INTO fp VALUES (3, 15)
INSERT INTO fc VALUES (24, 13, 1)
DELETE FROM fp WHERE v >= 6 AND v < 10
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fx WHERE id = 9
INSERT INTO fx VALUES (16, 12)
INSERT INTO fp VALUES (11, 15)
DELETE FROM fp WHERE v >= 4 AND v < 8
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fn VALUES (22, 11, 203)
INSERT INTO fd VALUES (20, 11)
DELETE FROM fp WHERE id = 13
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fg VALUES (36, 5, 455)
INSERT INTO fp VALUES (15, 19)
INSERT INTO fx VALUES (23, 2)
INSERT INTO fp VALUES (10, 6)
DELETE FROM fp WHERE v >= 8 AND v < 12
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fp VALUES (14, 14)
INSERT INTO fg VALUES (42, 19, 169)
INSERT INTO fc VALUES (39, 14, 2)
INSERT INTO fp VALUES (1, 1)
DELETE FROM fx WHERE id = 18
INSERT INTO fg VALUES (46, 10, 10)
DELETE FROM fp USING fsrc s WHERE fp.id = s.m AND s.k = 2
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fx WHERE id = 11
INSERT INTO fx VALUES (34, 20)
INSERT INTO fn VALUES (38, 12, 140)
INSERT INTO fd VALUES (36, 12)
DELETE FROM fp USING fsrc s WHERE fp.id = s.m AND s.k = 4
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fc WHERE id = 13
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE id = 11
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fg VALUES (54, 22, 382)
INSERT INTO fx VALUES (40, 1)
DELETE FROM ft WHERE id = 6
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fc WHERE id = 17
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fp VALUES (7, 19)
INSERT INTO fg VALUES (59, 16, 226)
INSERT INTO fc VALUES (56, 11, 3)
DELETE FROM fp WHERE v >= 16 AND v < 20
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fc WHERE id = 4
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE id = 6
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fx VALUES (49, 12)
DELETE FROM fp USING fsrc s WHERE fp.id = s.m AND s.k = 4
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE id = 4
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE id = 11
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fc WHERE id = 9
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fn VALUES (57, 5, 789)
INSERT INTO fd VALUES (55, 5)
DELETE FROM fp WHERE v >= 9 AND v < 13
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM ft WHERE id = 4
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE v >= 3 AND v < 7
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fx WHERE id = 15
INSERT INTO fc VALUES (70, 15, 3)
DELETE FROM fx WHERE id = 2
DELETE FROM fp WHERE id = 5
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE id = 1
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fc WHERE id = 0
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM ft WHERE id = 0
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp WHERE id = 10
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fc VALUES (77, 2, 2)
DELETE FROM fp WHERE id = 3
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM ft WHERE id = 0
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fc WHERE id = 4
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM fp USING fsrc s WHERE fp.id = s.m AND s.k = 5
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fc VALUES (82, 6, 2)
DELETE FROM ft WHERE id = 3
? fp
? fc
? fg
? fx
? fn
? fd
? ft
INSERT INTO fx VALUES (73, 14)
INSERT INTO fp VALUES (8, 8)
DELETE FROM fx
INSERT INTO fnn VALUES (1, 2)
DELETE FROM fp WHERE id = 2
? fnn
DELETE FROM fnn
INSERT INTO fp VALUES (1, 999) ON CONFLICT (id) DO NOTHING
INSERT INTO fd VALUES (90, 1), (91, 1)
DELETE FROM fp WHERE id = 1
? fp
? fd
INSERT INTO fp VALUES (1, 1)
INSERT INTO fd VALUES (92, 3) ON CONFLICT (id) DO NOTHING
INSERT INTO fp VALUES (3, 3) ON CONFLICT (id) DO NOTHING
DELETE FROM fp WHERE id = 3
? fd
>DELETE FROM fp WHERE id = 5 RETURNING id, v
? fp
? fc
? fg
? fx
? fn
? fd
? ft
DELETE FROM ft WHERE id = 0
? ft
DROP TABLE fx
DROP TABLE fg
DROP TABLE fc
DROP TABLE fn
DROP TABLE fnn
DROP TABLE fd
DROP TABLE ft
DROP TABLE fp
DROP TABLE fsrc
