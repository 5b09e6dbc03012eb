DROP TABLE IF EXISTS ufa
DROP TABLE IF EXISTS ufs
DROP TABLE IF EXISTS ufz
CREATE TABLE ufa (id serial, a int, b text, f double precision)
CREATE TABLE ufs (k int, d int, t text)
CREATE TABLE ufz (k int, m int)
INSERT INTO ufs VALUES (1, 23, 'hello world'), (2, 3, 'Q'), (3, 20, NULL), (4, 26, ''), (5, -1, 'x'), (6, 7, 'x'), (7, 19, ''), (8, 14, NULL), (9, 18, 'x'), (10, 16, 'hello world'), (11, 22, 'y''z'), (12, 2, 'x')
INSERT INTO ufz VALUES (8, 1), (3, 7), (7, 9), (9, 6), (4, -10), (1, -6), (12, 5)
INSERT INTO ufa (a, b, f) VALUES (-2, 'Q', -0.25), (4, 'hello world', NULL), (8, NULL, 1.5), (2, 'y''z', 100.0), (18, '', -0.25), (21, 'x', 100.0), (22, NULL, NULL), (NULL, 'x', NULL), (7, 'x', 100.0), (3, 'Q', -0.25), (17, 'y''z', NULL), (11, 'Q', -0.25), (-3, 'hello world', 7.75), (17, '', NULL)
DELETE FROM ufa USING ufs s WHERE ufa.id = s.k AND s.d < 5
? ufa
UPDATE ufa SET a = coalesce(ufa.a, 0) + z.m FROM ufs s JOIN ufz z ON s.k = z.k WHERE ufa.id = s.k
? ufa
UPDATE ufa SET b = b || s.t FROM ufs s WHERE ufa.id = s.k AND s.k % 3 = 0
? ufa
UPDATE ufa SET b = upper(ufa.b) FROM ufs s WHERE ufa.id = s.k AND s.t IS NULL
? ufa
UPDATE ufa SET (a, f) = (s.d * 2, s.d * 0.25) FROM ufs s WHERE ufa.id = s.k AND ufa.a IS NOT NULL
? ufa
INSERT INTO ufa (a, b, f) VALUES (-3, 'Q', 100.0), (9, 'hello world', 1.5), (15, 'Q', 1.5)
? ufa
DELETE FROM ufa u USING ufs s, ufz z WHERE u.id = s.k AND s.k = z.k AND z.m > 4
? ufa
UPDATE ufa SET b = upper(ufa.b) FROM ufs s WHERE ufa.id = s.k AND s.t IS NULL
? ufa
UPDATE ufa u SET b = s.t FROM ufs s WHERE u.id = s.k AND s.d > 10
? ufa
UPDATE ufa SET a = coalesce(ufa.a, 0) + s.d FROM ufs s WHERE ufa.id = s.k
? ufa
DELETE FROM ufa u USING ufs s, ufz z WHERE u.id = s.k AND s.k = z.k AND z.m > 1
? ufa
UPDATE ufa SET b = upper(ufa.b) FROM ufs s WHERE ufa.id = s.k AND s.t IS NULL
? ufa
DELETE FROM ufa USING ufs s WHERE ufa.a = s.d AND s.d < 4
? ufa
>DELETE FROM ufa u USING ufz z WHERE u.id = z.k AND z.m < 3 RETURNING u.id, u.b, z.m
? ufa
UPDATE ufa SET a = o.a + 1 FROM ufa o WHERE ufa.id = o.id + 1
? ufa
UPDATE ufa SET (a, f) = (s.d * 2, s.d * 0.25) FROM ufs s WHERE ufa.id = s.k AND ufa.a IS NOT NULL
? ufa
UPDATE ufa SET b = b || s.t FROM ufs s WHERE ufa.id = s.k AND s.k % 3 = 1
? ufa
UPDATE ufa SET (a, f) = (s.d * 2, s.d * 0.25) FROM ufs s WHERE ufa.id = s.k AND ufa.a IS NOT NULL
? ufa
DELETE FROM ufa USING ufs s WHERE ufa.id = s.k AND s.d < 2
? ufa
UPDATE ufa SET a = coalesce(ufa.a, 0) + z.m FROM ufs s JOIN ufz z ON s.k = z.k WHERE ufa.id = s.k
? ufa
UPDATE ufa SET b = b || s.t FROM ufs s WHERE ufa.id = s.k AND s.k % 3 = 0
? ufa
UPDATE ufa SET b = upper(ufa.b) FROM ufs s WHERE ufa.id = s.k AND s.t IS NULL
? ufa
UPDATE ufa SET a = o.a + 1 FROM ufa o WHERE ufa.id = o.id + 1
? ufa
UPDATE ufa SET f = sub.sd FROM (SELECT sum(d) * 0.5 AS sd FROM ufs WHERE d > 9) sub WHERE ufa.a < sub.sd
? ufa
>UPDATE ufa u SET f = coalesce(u.f, 0) + 1 FROM ufs s WHERE u.id = s.k AND u.b IS NOT NULL RETURNING u.*, s.k
? ufa
INSERT INTO ufa (a, b, f) VALUES (17, 'Q', 1.5), (4, NULL, -0.25)
? ufa
DELETE FROM ufa u USING ufs s, ufz z WHERE u.id = s.k AND s.k = z.k AND z.m > 5
? ufa
DELETE FROM ufa USING ufs s WHERE ufa.a = s.d AND s.d < 8
? ufa
UPDATE ufa SET a = coalesce(ufa.a, 0) + z.m FROM ufs s JOIN ufz z ON s.k = z.k WHERE ufa.id = s.k
? ufa
UPDATE ufa SET (a, f) = (s.d * 2, s.d * 0.25) FROM ufs s WHERE ufa.id = s.k AND ufa.a IS NOT NULL
? ufa
UPDATE ufa SET (a, f) = (s.d * 2, s.d * 0.25) FROM ufs s WHERE ufa.id = s.k AND ufa.a IS NOT NULL
? ufa
DELETE FROM ufa USING ufs s WHERE ufa.a = s.d AND s.d < 4
? ufa
UPDATE ufa u SET b = s.t FROM ufs s WHERE u.id = s.k AND s.d > 2
? ufa
UPDATE ufa SET f = 0.5 FROM ufs s WHERE ufa.a = s.d
? ufa
DELETE FROM ufa u USING ufs s, ufz z WHERE u.id = s.k AND s.k = z.k AND z.m > 5
? ufa
UPDATE ufa SET b = b || s.t FROM ufs s WHERE ufa.id = s.k AND s.k % 3 = 2
? ufa
INSERT INTO ufa (a, b, f) VALUES (3, 'Q', 7.75), (14, 'x', -0.25), (-3, NULL, NULL), (-1, 'y''z', 1.5), (13, 'x', -0.25)
? ufa
UPDATE ufa SET a = coalesce(ufa.a, 0) + s.d FROM ufs s WHERE ufa.id = s.k
? ufa
INSERT INTO ufa (a, b, f) VALUES (0, '', 7.75), (NULL, '', 100.0), (20, 'Q', -0.25), (-5, NULL, 100.0)
? ufa
INSERT INTO ufa (a, b, f) VALUES (13, 'Q', NULL), (24, 'Q', NULL), (21, 'Q', 1.5)
? ufa
UPDATE ufa SET f = sub.sd FROM (SELECT sum(d) * 0.5 AS sd FROM ufs WHERE d > 7) sub WHERE ufa.a < sub.sd
? ufa
>UPDATE ufa SET a = s.d FROM ufs s WHERE ufa.id = s.k AND s.d % 3 = 1 RETURNING ufa.id, ufa.a, s.t
? ufa
DELETE FROM ufa USING ufs s WHERE ufa.a = s.d AND s.d < 0
? ufa
>UPDATE ufa u SET f = coalesce(u.f, 0) + 1 FROM ufs s WHERE u.id = s.k AND u.b IS NOT NULL RETURNING u.*, s.k
? ufa
UPDATE ufa SET a = o.a + 1 FROM ufa o WHERE ufa.id = o.id + 1
? ufa
UPDATE ufa SET a = coalesce(ufa.a, 0) + s.d FROM ufs s WHERE ufa.id = s.k
? ufa
