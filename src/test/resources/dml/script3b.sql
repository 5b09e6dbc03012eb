DROP TABLE IF EXISTS ufa
DROP TABLE IF EXISTS ufs
DROP TABLE IF EXISTS ufz
DROP TABLE IF EXISTS ufc
CREATE TABLE ufa (id serial, a int, b text, f double precision)
CREATE TABLE ufs (k int, d int, t text)
CREATE TABLE ufz (k int, m int)
INSERT INTO ufs VALUES (1, 5, 'one'), (2, 7, NULL), (3, -2, 'three'), (5, 9, 'five')
INSERT INTO ufz VALUES (1, 100), (3, -100)
INSERT INTO ufa (a, b, f) VALUES (10, 'p', 0.25), (20, 'q', NULL), (30, NULL, 1.5), (40, 'r', 100.0)
UPDATE ufa SET b = s.tag FROM (SELECT 'zz' AS tag) s
? ufa
UPDATE ONLY ufa SET a = a + s.d FROM ufs s WHERE ufa.id = s.k
? ufa
DELETE FROM ufa AS u USING ufs AS s WHERE u.id = s.k AND s.d < 0
? ufa
UPDATE ufa SET a = 5 FROM ufs s WHERE ufa.id = s.k AND s.d IS NULL
? ufa
>UPDATE ufa u SET f = 9.5 FROM ufs s WHERE u.id = s.k RETURNING u.id * 2 AS twice, s.t AS tag
? ufa
>UPDATE ufa SET a = a + coalesce(z.m, 0) FROM ufs s LEFT JOIN ufz z ON s.k = z.k WHERE ufa.id = s.k RETURNING ufa.id, ufa.a, z.m
? ufa
UPDATE ufa SET b = 'none' FROM ufs s WHERE ufa.id = s.k AND s.d > 1000
? ufa
>DELETE FROM ufa USING ufs s WHERE ufa.id = s.k AND s.t = 'one' RETURNING ufa.b, s.d
? ufa
CREATE TABLE ufc (id int PRIMARY KEY, v text NOT NULL, n int)
INSERT INTO ufc VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)
UPDATE ufc SET v = NULL FROM ufs s WHERE ufc.id = s.k AND s.k = 1
? ufc
UPDATE ufc SET id = 3 FROM ufs s WHERE ufc.id = s.k AND s.k = 2
? ufc
UPDATE ufc SET n = s.d * 10 FROM ufs s WHERE ufc.id = s.k
? ufc
DELETE FROM ufc USING ufs s WHERE ufc.n = s.d
? ufc
