DROP TABLE IF EXISTS dml_f
DROP TYPE IF EXISTS dmood
CREATE TYPE dmood AS ENUM ('sad','ok','happy')
CREATE TABLE dml_f (id serial, r int4range, m dmood, n numeric(8,2))
INSERT INTO dml_f (r, m, n) VALUES ('[2 , 9]', NULL, NULL),('(,3)', 'happy', 0)
INSERT INTO dml_f (r, m, n) VALUES (NULL, 'sad', NULL),(NULL, NULL, 123.45)
INSERT INTO dml_f (r, m, n) VALUES ('(,3)', 'sad', 1.5),('[1,5)', 'happy', 1.5)
INSERT INTO dml_f (r, m, n) VALUES ('[1,5)', 'happy', 0),(NULL, 'happy', 1.5)
INSERT INTO dml_f (r, m, n) VALUES ('[2 , 9]', 'happy', 123.45),('[2 , 9]', NULL, 123.45)
INSERT INTO dml_f (r, m, n) VALUES ('[1,5)', 'happy', 123.45),('[2 , 9]', 'sad', 123.45)
DELETE FROM dml_f WHERE isempty(r)
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('empty', 'sad', 123.45)
? dml_f
DELETE FROM dml_f WHERE m = 'ok'
? dml_f
UPDATE dml_f SET r = '[0 , 2]' WHERE id % 2 = 1
? dml_f
UPDATE dml_f SET m = (CASE WHEN n > 0 THEN 'ok' ELSE 'sad' END)::dmood WHERE r @> 3
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('empty', 'sad', 123.45)
? dml_f
UPDATE dml_f SET r = int4range(1, id + 2) WHERE n > 0
? dml_f
UPDATE dml_f SET m = 'happy' WHERE r @> 3
? dml_f
UPDATE dml_f SET (m, n) = ('sad', 9.99) WHERE id % 2 = 1
? dml_f
UPDATE dml_f SET m = (CASE WHEN n > 0 THEN 'ok' ELSE 'sad' END)::dmood WHERE id % 2 = 1
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('(,3)', 'sad', -2.25)
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('empty', NULL, 1.5)
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('empty', NULL, NULL)
? dml_f
UPDATE dml_f SET n = n * 2 WHERE id % 2 = 1
? dml_f
INSERT INTO dml_f (r, m, n) VALUES (NULL, 'happy', 123.45)
? dml_f
DELETE FROM dml_f WHERE m = 'ok'
? dml_f
DELETE FROM dml_f WHERE m = 'ok'
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('(,3)', 'happy', 123.45)
? dml_f
INSERT INTO dml_f (r, m, n) VALUES (NULL, NULL, -2.25)
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('empty', NULL, 1.5)
? dml_f
INSERT INTO dml_f (r, m, n) VALUES ('empty', 'happy', 123.45)
? dml_f
DELETE FROM dml_f WHERE r @> 3
? dml_f
UPDATE dml_f SET m = 'happy' WHERE isempty(r)
? dml_f
UPDATE dml_f SET m = (CASE WHEN n > 0 THEN 'ok' ELSE 'sad' END)::dmood WHERE r @> 3
? dml_f
