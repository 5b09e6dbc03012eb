DROP TABLE IF EXISTS st6
CREATE TABLE st6 (id serial PRIMARY KEY, v int, t text DEFAULT 'd')
INSERT INTO st6 (v) VALUES (1), (2), (3)
?st6
INSERT INTO st6 (id, v) VALUES (DEFAULT, 10), (99, 11), (DEFAULT, 12)
?st6
!SELECT last_value, is_called FROM st6_id_seq
INSERT INTO st6 (v, t) VALUES (20, DEFAULT), (21, 'x')
?st6
>INSERT INTO st6 (v) VALUES (30), (31) RETURNING id, v
?st6
INSERT INTO st6 (id, v) VALUES (5, 40)
?st6
INSERT INTO st6 (id, v) VALUES (DEFAULT, 70), (1, 71)
?st6
!SELECT nextval('st6_id_seq')
INSERT INTO st6 (v) VALUES (50), (51) ON CONFLICT DO NOTHING
?st6
INSERT INTO st6 (id, v) VALUES (4, 60) ON CONFLICT (id) DO UPDATE SET v = excluded.v
?st6
INSERT INTO st6 (id, v) VALUES (DEFAULT, 80), (DEFAULT, 81) ON CONFLICT (id) DO NOTHING
?st6
!SELECT last_value, is_called FROM st6_id_seq
UPDATE st6 SET v = v + 100 WHERE id <= 3
?st6
DELETE FROM st6 WHERE v > 150
?st6
DROP TABLE st6
