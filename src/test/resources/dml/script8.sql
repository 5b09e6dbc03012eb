DROP TABLE IF EXISTS ss1
DROP TABLE IF EXISTS ss2
DROP TABLE IF EXISTS ssrc
DROP TABLE IF EXISTS ssrc2
CREATE TABLE ss1 (id serial, v int)
CREATE TABLE ssrc (n int)
INSERT INTO ssrc VALUES (10), (20), (30)
INSERT INTO ss1 (v) SELECT n FROM ssrc ORDER BY n
? ss1
!SELECT last_value, is_called FROM ss1_id_seq
INSERT INTO ss1 (v) SELECT n + 1 FROM ssrc WHERE n > 10 ORDER BY n
? ss1
!SELECT last_value, is_called FROM ss1_id_seq
INSERT INTO ss1 (v) SELECT n FROM ssrc WHERE n > 99
!SELECT last_value, is_called FROM ss1_id_seq
INSERT INTO ss1 VALUES (DEFAULT, 7)
? ss1
!SELECT last_value, is_called FROM ss1_id_seq
INSERT INTO ss1 (id, v) SELECT 100, n FROM ssrc WHERE n = 10
!SELECT last_value, is_called FROM ss1_id_seq
>INSERT INTO ss1 (v) SELECT n * 2 FROM ssrc ORDER BY n RETURNING id, v
? ss1
CREATE TABLE ssrc2 (n int)
INSERT INTO ssrc2 VALUES (30), (10), (20)
CREATE TABLE ss2 (id serial, v int)
INSERT INTO ss2 (v) SELECT n FROM ssrc2 ORDER BY n
? ss2
INSERT INTO ss2 (v) SELECT n FROM ssrc2 ORDER BY n DESC
? ss2
!SELECT last_value, is_called FROM ss2_id_seq
INSERT INTO ss2 SELECT n, n FROM ssrc2 WHERE n = 10
? ss2
!SELECT last_value, is_called FROM ss2_id_seq
DROP TABLE ss1
DROP TABLE ss2
DROP TABLE ssrc
DROP TABLE ssrc2
