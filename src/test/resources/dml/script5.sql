DROP TABLE IF EXISTS su
DROP TABLE IF EXISTS sus
CREATE TABLE su (id int, a int, b text, f double precision)
CREATE TABLE sus (k int, d int, t text)
INSERT INTO su VALUES (1, 10, 'x', 0.5), (2, 20, 'y', 1.5), (3, 30, 'z', NULL)
INSERT INTO sus VALUES (1, 100, 'one'), (2, 200, 'two'), (5, 500, 'five')
UPDATE su SET (a, b) = (SELECT d, t FROM sus WHERE sus.k = su.id) WHERE id < 3
? su
UPDATE su SET (a, b) = (SELECT d, t FROM sus WHERE sus.k = su.id) WHERE id = 3
? su
UPDATE su SET a = (SELECT max(d) FROM sus) WHERE id = 1
? su
UPDATE su SET a = (SELECT d FROM sus WHERE sus.k = su.id + 1)
? su
UPDATE su SET (a, f) = (SELECT d * 2, d * 0.25 FROM sus WHERE sus.k = su.id)
? su
UPDATE su SET b = (SELECT t FROM sus WHERE sus.t = 'nomatch')
? su
