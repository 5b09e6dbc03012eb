DROP TABLE IF EXISTS dml_t
CREATE TABLE dml_t (id serial, a int, b text, f double precision)
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'Q', -0.25),(NULL, 'y''z', NULL),(NULL, '', 100.0)
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'y''z', 1.5)
INSERT INTO dml_t (a, b, f) VALUES (NULL, '', 1.5),(17, 'y''z', 100.0),(13, 'x', 1.5)
INSERT INTO dml_t (a, b, f) VALUES (8, 'hello world', 1.5),(1, 'x', NULL),(NULL, 'hello world', -0.25)
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'Q', 100.0),(NULL, NULL, NULL),(12, 'Q', -0.25)
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'x', 1.5),(19, 'x', 1.5),(-2, 'hello world', 100.0)
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'hello world', -0.25),(1, 'Q', NULL),(NULL, '', 1.5)
INSERT INTO dml_t (a, b, f) VALUES (9, 'hello world', 1.5)
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'y''z', NULL),(20, NULL, -0.25),(NULL, '', -0.25)
INSERT INTO dml_t (a, b, f) VALUES (15, NULL, 100.0)
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'y''z', -0.25)
INSERT INTO dml_t (a, b, f) VALUES (13, '', 100.0),(NULL, 'y''z', 100.0),(NULL, 'x', 1.5)
DELETE FROM dml_t WHERE id IN (1,3,5,7)
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (7, '', 100.0)
? dml_t
DELETE FROM dml_t WHERE b IS NOT NULL AND a > 0
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'Q', -0.25)
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (-2, NULL, 1.5),(NULL, 'Q', -0.25)
? dml_t
UPDATE dml_t SET a = NULL
? dml_t
DELETE FROM dml_t WHERE a < 3
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'y''z', -0.25),(NULL, '', NULL)
? dml_t
DELETE FROM dml_t WHERE a BETWEEN 2 AND 9
? dml_t
UPDATE dml_t SET a = -a WHERE a = id
? dml_t
UPDATE dml_t SET b = b || '!'
? dml_t
UPDATE dml_t SET f = f * 2 WHERE a = id
? dml_t
DELETE FROM dml_t WHERE a < 3
? dml_t
UPDATE dml_t SET f = a + 0.5 WHERE length(b) > 2
? dml_t
UPDATE dml_t SET b = lower(b) WHERE id IN (1,3,5,7)
? dml_t
UPDATE dml_t SET b = CASE WHEN a > 3 THEN 'big' ELSE 'small' END WHERE a BETWEEN 2 AND 9
? dml_t
UPDATE dml_t SET a = NULL
? dml_t
UPDATE dml_t SET a = DEFAULT WHERE id % 2 = 0
? dml_t
UPDATE dml_t SET b = lower(b)
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (17, NULL, -0.25)
? dml_t
UPDATE dml_t SET b = lower(b) WHERE a BETWEEN 2 AND 9
? dml_t
UPDATE dml_t SET f = f * 2 WHERE a < 3
? dml_t
UPDATE dml_t SET a = DEFAULT WHERE b IS NOT NULL AND a > 0
? dml_t
UPDATE dml_t SET f = f * 2 WHERE a > 5
? dml_t
UPDATE dml_t SET b = CASE WHEN a > 3 THEN 'big' ELSE 'small' END WHERE a > 5
? dml_t
UPDATE dml_t SET a = a + 1 WHERE length(b) > 2
? dml_t
UPDATE dml_t SET b = lower(b) WHERE b = 'x'
? dml_t
UPDATE dml_t SET f = a + 0.5 WHERE b = 'x'
? dml_t
DELETE FROM dml_t WHERE f IS NULL
? dml_t
UPDATE dml_t SET a = DEFAULT
? dml_t
DELETE FROM dml_t WHERE b = 'x'
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'x', 100.0),(6, NULL, 100.0)
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'x', 100.0)
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'y''z', 100.0)
? dml_t
UPDATE dml_t SET a = NULL WHERE b LIKE 'h%'
? dml_t
DELETE FROM dml_t WHERE length(b) > 2
? dml_t
UPDATE dml_t SET f = a + 0.5
? dml_t
INSERT INTO dml_t (a, b, f) VALUES (NULL, 'x', 1.5)
? dml_t
UPDATE dml_t SET f = a + 0.5 WHERE a BETWEEN 2 AND 9
? dml_t
UPDATE dml_t SET (a, b) = (0, 'reset') WHERE a = id
? dml_t
